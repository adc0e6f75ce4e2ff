"""Perceptual image hashing (kaggle/fisheries/utils/hash/).

Reference semantics:

- ``AverageHash`` (AverageHash.java:30-55): grayscale 8x8 resize,
  bit = value > mean over the 64 resized pixels (row-major bit
  order, the getRGB scan), hex via HashUtil.toHex.
- ``GradientHash`` (GradientHash.java:24-41): grayscale 9x8 resize,
  bit = cell(x,y) < cell(x+1,y), X-MAJOR bit order (x outer loop).
- ``Blockhash`` (Blockhash.java:24-231): the commonsmachinery
  block-mean-value hash ported EXACTLY — even path (integer block
  sums) and uneven path (float32 fractional block weights with
  Java's per-assignment int truncation `blocks[i][j] += f`), band
  medians with the reference's off-by-one even-length median pair
  (indices n/2 and n/2+1, Blockhash.java:56-64), the
  `v > m || (|v-m| < 1 && m > half_block_value)` bit rule, and the
  alpha==0 -> 765 transparent-pixel rule.
- ``HashUtil.toHex`` / ``hammingDistance`` (HashUtil.java:16-39):
  BigInteger bit-string -> zero-padded hex; per-nibble popcount.

Documented substitutions (the reference delegates these two steps to
imgscalr/Java2D, whose resampling kernels are not reproducible
without the library):

- grayscale: Scalr.OP_GRAYSCALE (ColorConvertOp CS_GRAY) is replaced
  by the reference's OWN Luminosity extractor formula
  (int)(0.21 R + 0.72 G + 0.07 B) (features/color/Luminosity.java).
- resize: Scalr.resize(FIT_EXACT, w, h) is replaced by an EXACT
  integer area-mean: scaled by the output dimension, every
  pixel/cell overlap is an integer, every cell has the identical
  denominator w*h, and the > mean / < neighbor comparisons reduce to
  pure integer comparisons — so the hashes are order-independent,
  engine-portable, and SQL-derivable for the gate oracle.

Spark shape: ONE column-pruned Arrow pass computes all hashes
(numpy matrix products per image, no per-pixel Python); near-dup
pairing is the SimHash 4x16-bit pigeonhole band join (complete for
Hamming <= 3) over the 64-bit hash — an equality join, never
all-pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.multimodal import decode_bmp

_ONE_BITS = (0, 1, 1, 2, 1, 2, 2, 3, 1, 2, 2, 3, 2, 3, 3, 4)


def to_hex(bit_string: str, length: int) -> str:
    """HashUtil.toHex: BigInteger(bits, 2).toString(16) left-padded
    with zeros to `length` (throws when the hex is longer, like the
    reference's substring)."""
    hex_str = format(int(bit_string, 2), "x")
    if len(hex_str) > length:
        raise ValueError("hex longer than pad length")
    return "0" * (length - len(hex_str)) + hex_str


def hamming_distance(hash1: str, hash2: str) -> int:
    """HashUtil.hammingDistance over hex strings (per-nibble
    popcount; iterates hash1's length like the reference)."""
    return sum(_ONE_BITS[int(a, 16) ^ int(b, 16)]
               for a, b in zip(hash1, hash2))


# ------------------------------------------------- area-mean resize

def luminosity(img: np.ndarray) -> np.ndarray:
    """(int)(0.21 R + 0.72 G + 0.07 B) — the documented grayscale
    substitution (features/color/Luminosity.java)."""
    px = img[:, :, :3].astype(np.float64)
    return (0.21 * px[:, :, 0] + 0.72 * px[:, :, 1]
            + 0.07 * px[:, :, 2]).astype(np.int64)


def _overlap_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Integer overlap weights [n_out, n_in]: pixel i covers
    [i*n_out, (i+1)*n_out), cell o covers [o*n_in, (o+1)*n_in) in
    1/n_out units; every cell's weights sum to n_in."""
    i = np.arange(n_in)
    o = np.arange(n_out)[:, None]
    lo = np.maximum(i * n_out, o * n_in)
    hi = np.minimum((i + 1) * n_out, (o + 1) * n_in)
    return np.maximum(0, hi - lo).astype(np.int64)


def area_cell_sums(gray: np.ndarray, out_w: int,
                   out_h: int) -> np.ndarray:
    """[out_h, out_w] integer cell sums; each cell's denominator is
    uniformly w*h, so comparisons between cells (and against the
    global mean) stay in integers."""
    h, w = gray.shape
    oy = _overlap_matrix(out_h, h)
    ox = _overlap_matrix(out_w, w)
    return oy @ gray.astype(np.int64) @ ox.T


def average_hash(img: np.ndarray) -> str:
    """AverageHash.java:30-55 with the documented resize/grayscale
    substitution: bit = cell average > mean of the 64 cell averages
    (== 64*cell_sum > total, integers), row-major bit order."""
    cells = area_cell_sums(luminosity(img), 8, 8)
    bits = (64 * cells > cells.sum()).astype(int).ravel()  # row-major
    return to_hex("".join(map(str, bits)), 16)


def gradient_hash(img: np.ndarray) -> str:
    """GradientHash.java:24-41: 9x8 cells, bit = cell(x,y) <
    cell(x+1,y), X-MAJOR bit order (x outer loop)."""
    cells = area_cell_sums(luminosity(img), 9, 8)
    bits = (cells[:, :8] < cells[:, 1:]).astype(int)
    return to_hex("".join(map(str, bits.T.ravel())), 16)


# ---------------------------------------------------------- blockhash

def _bh_median(values: list[int]) -> float:
    """Blockhash.java:56-64 — NOTE the reference's even-length pair is
    indices n/2 and n/2+1 (0-based), NOT the conventional (n/2-1,
    n/2); kept bug-for-bug."""
    m = sorted(values)
    n = len(m)
    if n % 2 == 0:
        return (m[n // 2] + m[n // 2 + 1]) / 2.0
    return float(m[n // 2])


def _bh_bits(blocks: list[int], pixels_per_block: int,
             bits: int) -> list[int]:
    """translate_blocks_to_bits (Blockhash.java:66-85)."""
    half = pixels_per_block * 256 * 3 // 2
    bandsize = len(blocks) // 4
    out = list(blocks)
    for i in range(4):
        band = out[i * bandsize:(i + 1) * bandsize]
        m = _bh_median(band)
        for j in range(i * bandsize, (i + 1) * bandsize):
            v = out[j]
            out[j] = 1 if (v > m or (abs(v - m) < 1 and m > half)) \
                else 0
    return out


def _bh_hex(bits_arr: list[int]) -> str:
    """bits_to_hexhash (Blockhash.java:87-97)."""
    out = []
    for i in range(0, len(bits_arr), 4):
        dec = sum(bits_arr[i + 3 - j] << j for j in range(4))
        out.append(format(dec, "x"))
    return "".join(out)


def _pixel_value(img: np.ndarray) -> np.ndarray:
    """R+G+B per pixel; fully transparent (alpha 0) pixels count 765
    (Blockhash.java:113-119)."""
    v = img[:, :, :3].astype(np.int64).sum(axis=2)
    if img.shape[2] == 4:
        v = np.where(img[:, :, 3] == 0, 765, v)
    return v


def blockhash(img: np.ndarray, bits: int = 16) -> str:
    """bmvbhash (Blockhash.java:131-231): even path when both dims
    divide by `bits` (integer block sums); else the uneven path with
    float32 fractional weights and Java's per-assignment truncating
    `int += float` accumulation, replayed in the reference's exact
    y-then-x scan order."""
    h, w = img.shape[:2]
    vals = _pixel_value(img)
    if w % bits == 0 and h % bits == 0:
        bw, bh = w // bits, h // bits
        blocks = vals.reshape(bits, bh, bits, bw).sum(axis=(1, 3))
        return _bh_hex(_bh_bits([int(x) for x in blocks.ravel()],
                                bw * bh, bits))

    block_width = np.float32(w) / np.float32(bits)
    block_height = np.float32(h) / np.float32(bits)
    even_x = w % bits == 0
    even_y = h % bits == 0
    blocks = [[0] * bits for _ in range(bits)]
    for y in range(h):
        if even_y:
            top = bottom = int(np.float32(y) / block_height)
            wt, wb = np.float32(1), np.float32(0)
        else:
            y_mod = np.float32((y + 1)) % block_height
            y_frac = y_mod - np.float32(int(y_mod))
            y_int = y_mod - y_frac
            wt = np.float32(1) - y_frac
            wb = y_frac
            if y_int > 0 or y + 1 == h:
                top = bottom = int(np.float32(y) / block_height)
            else:
                top = int(np.float32(y) / block_height)
                bottom = int(np.ceil(np.float32(y) / block_height))
        for x in range(w):
            avg = np.float32(vals[y, x])
            if even_x:
                left = right = int(np.float32(x) / block_width)
                wl, wr = np.float32(1), np.float32(0)
            else:
                x_mod = np.float32((x + 1)) % block_width
                x_frac = x_mod - np.float32(int(x_mod))
                x_int = x_mod - x_frac
                wl = np.float32(1) - x_frac
                wr = x_frac
                if x_int > 0 or x + 1 == w:
                    left = right = int(np.float32(x) / block_width)
                else:
                    left = int(np.float32(x) / block_width)
                    right = int(np.ceil(np.float32(x) / block_width))
            # Java `int += float` truncates the SUM on every assignment
            blocks[top][left] = int(np.float32(blocks[top][left])
                                    + avg * wt * wl)
            blocks[top][right] = int(np.float32(blocks[top][right])
                                     + avg * wt * wr)
            blocks[bottom][left] = int(np.float32(blocks[bottom][left])
                                       + avg * wb * wl)
            blocks[bottom][right] = int(
                np.float32(blocks[bottom][right]) + avg * wb * wr)
    flat = [blocks[i][j] for i in range(bits) for j in range(bits)]
    return _bh_hex(_bh_bits(flat, int(block_width * block_height),
                            bits))


def hash64(hex_hash: str) -> int:
    """64-bit signed two's-complement value of a 16-hex-char hash
    (band-join / bit_count friendly)."""
    v = int(hex_hash, 16)
    return v - (1 << 64) if v >= (1 << 63) else v


# ------------------------------------------------------------ stages

HASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("ahash", T.StringType()),
    T.StructField("ghash", T.StringType()),
    T.StructField("bhash", T.StringType()),
    T.StructField("ahash64", T.LongType()),
    T.StructField("ghash64", T.LongType()),
])


def image_hash_stage(media: DataFrame,
                     id_col: str = "media_id",
                     content_col: str = "content") -> DataFrame:
    """(media_id, ahash, ghash, bhash hex; ahash64/ghash64 signed) —
    ONE column-pruned Arrow pass over the image rows."""
    imgs = media.where(F.col("kind") == "image") if \
        "kind" in media.columns else media
    src = imgs.select(F.col(id_col).alias("media_id"),
                      F.col(content_col).alias("content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp(bytes(content))
                a = average_hash(img)
                g = gradient_hash(img)
                rows.append((int(mid), a, g, blockhash(img),
                             hash64(a), hash64(g)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              HASH_SCHEMA.fields])

    return src.mapInPandas(run, HASH_SCHEMA)


def phash_dup_pairs(hashes: DataFrame, max_hamming: int = 3,
                    hash_col: str = "ahash64") -> DataFrame:
    """Near-dup image pairs by perceptual-hash Hamming distance:
    4x16-bit pigeonhole bands (COMPLETE for Hamming <= 3) -> equality
    join per band, exact verify via bit_count(xor) JVM-side. Never
    all-pairs; same scale shape as kgp.dedup.simhash_near_dups."""
    if max_hamming > 3:
        raise ValueError("4x16 banding is only complete for <= 3")
    sigs = hashes.select("media_id", F.col(hash_col).alias("h"))
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("h", i * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
        for i in range(4)])
    buckets = (sigs.withColumn("bk", F.explode(bands))
               .select("media_id", "h",
                       F.col("bk.band").alias("band"),
                       F.col("bk.chunk").alias("chunk")))
    le, r = buckets.alias("l"), buckets.alias("r")
    pairs = (le.join(r, (F.col("l.band") == F.col("r.band")) &
                     (F.col("l.chunk") == F.col("r.chunk")) &
                     (F.col("l.media_id") < F.col("r.media_id")))
             .select(F.col("l.media_id").alias("a"),
                     F.col("r.media_id").alias("b"),
                     F.bit_count(F.col("l.h").bitwiseXOR(F.col("r.h")))
                     .alias("hamming"))
             .distinct())
    return pairs.where(F.col("hamming") <= max_hamming)
