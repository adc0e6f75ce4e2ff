"""Audio fingerprinting + duplicate detection over decoded PCM.

The fingerprint is the energy-difference sign code of Haitsma &
Kalker, "A Highly Robust Audio Fingerprinting System" (ISMIR 2002),
collapsed to the time axis: the clip is cut into K equal index
segments, each segment's energy is the EXACT integer sum of squared
int16 samples, and bit s of the code is [E(s+1) > E(s)]. With K=33
that yields a 32-bit fingerprint per clip that is invariant to

  * gain scaling (every energy scales by g^2 — all comparisons keep
    their sign), and
  * polarity inversion (squares are unchanged),

which is precisely the robustness the sign-of-difference code is
built for. Every quantity is integer-exact (decode_wav returns
int16/2^15 floats that round back to the original integers), so a
DuckDB oracle can recompute the fingerprints bit-for-bit from a
closed-form PCM description.

Scale shape (100 TB posture):
  * fingerprints: ONE column-pruned mapInPandas pass over
    (media_id, content) — audio bytes never shuffle;
  * duplicate pairs: the 4x8-bit pigeonhole band join (any pair at
    Hamming distance <= 3 agrees on at least one of 4 bands — same
    trick as kgp.dedup.simhash_near_dups), so candidate generation is
    an equality join on (band, chunk), never an all-pairs cross join;
    the exact Hamming verify is a pure-JVM bit_count(xor) on the
    already-joined 8-byte codes.

Reference analog: none — Palladian has no audio stack; this is a
first-class training-data-pipeline operator (multimodal dedup) per
the round brief, built beside kgp.multimodal's WAV codec.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.multimodal import decode_wav

N_SEGMENTS = 33  # K equal index segments -> K-1 = 32 fingerprint bits


def segment_energies(pcm: np.ndarray, k: int = N_SEGMENTS) -> np.ndarray:
    """Exact int64 energy per equal index segment: segment s covers
    sample indices [floor(s*n/k), floor((s+1)*n/k)). Clips shorter
    than k samples are rejected (every segment must be non-empty for
    the difference code to be defined)."""
    n = len(pcm)
    if n < k:
        raise ValueError(f"clip of {n} samples < {k} segments")
    x = pcm.astype(np.int64)
    bounds = (np.arange(k + 1) * n) // k
    sq = np.concatenate(([0], np.cumsum(x * x)))
    return sq[bounds[1:]] - sq[bounds[:-1]]


def fingerprint(pcm: np.ndarray, k: int = N_SEGMENTS) -> int:
    """The (k-1)-bit energy-difference sign code as a non-negative
    Python int (32 bits at the default k, so it always fits a Spark
    LongType without sign games)."""
    e = segment_energies(pcm, k)
    bits = 0
    for s in range(k - 1):
        if e[s + 1] > e[s]:
            bits |= 1 << s
    return bits


FP_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("fp", T.LongType()),
])


def audio_fingerprints(media: DataFrame,
                       k: int = N_SEGMENTS) -> DataFrame:
    """Audio rows -> (media_id, fp): one column-pruned mapInPandas
    pass; each WAV decodes to exact int16 PCM (round(x * 32768)) and
    collapses to its 32-bit fingerprint. Clips shorter than k samples
    are dropped (no code is defined for them)."""
    src = media.where("kind = 'audio'").select("media_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                x, _rate = decode_wav(bytes(content))
                pcm = np.round(x * 32768.0).astype(np.int64)
                if len(pcm) < k:
                    continue
                rows.append((int(mid), fingerprint(pcm, k)))
            yield pd.DataFrame(rows, columns=["media_id", "fp"])

    return src.mapInPandas(run, FP_SCHEMA)


def fp_dup_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate clips by fingerprint Hamming distance
    <= max_hamming, via the 4x8-bit pigeonhole band join (complete
    for max_hamming <= 3: four disjoint bands, at most three
    differing bits, so some band is bit-identical). Returns
    (a, b, hamming) with a < b; the verify is pure-JVM
    bit_count(xor) — no Python touches the pair set."""
    if max_hamming > 3:
        raise ValueError("4-band pigeonhole is complete only for "
                         f"max_hamming <= 3, got {max_hamming}")
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("fp", i * 8)
                 .bitwiseAND(F.lit(0xFF)).alias("chunk"))
        for i in range(4)])
    buckets = (fps.withColumn("bk", F.explode(bands))
               .select("media_id", "fp",
                       F.col("bk.band").alias("band"),
                       F.col("bk.chunk").alias("chunk")))
    l, r = buckets.alias("l"), buckets.alias("r")
    return (l.join(r, (F.col("l.band") == F.col("r.band")) &
                   (F.col("l.chunk") == F.col("r.chunk")) &
                   (F.col("l.media_id") < F.col("r.media_id")))
            .select(F.col("l.media_id").alias("a"),
                    F.col("r.media_id").alias("b"),
                    F.bit_count(
                        F.col("l.fp").bitwiseXOR(F.col("r.fp")))
                    .alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .groupBy("a", "b")
            .agg(F.min("hamming").cast("int").alias("hamming")))


def audio_near_dups(media: DataFrame, max_hamming: int = 3,
                    k: int = N_SEGMENTS) -> DataFrame:
    """media -> (a, b, hamming): fingerprint + pigeonhole-banded
    duplicate pairs in one call."""
    return fp_dup_pairs(audio_fingerprints(media, k), max_hamming)


def synth_companion_clips(docs: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """Gate decoration: deterministic re-encoded COPIES of the synth
    audio clips — a gain-doubled clip (new id +1_000_000) for audio
    ids %5==0 and a polarity-flipped clip (+2_000_000) for ids %5==2.
    Both transforms are exact in int16 (synth samples are in
    [-2048, 2047], so x2 stays well inside range), and both leave the
    energy-difference fingerprint provably unchanged — the invariance
    the dup-pair gate exists to test. One Arrow pass, no shuffle."""
    from kgp.multimodal import AUDIO_RATE, encode_wav, synth_samples

    src = docs.where(f"{id_col} % 3 = 1 AND {id_col} % 5 IN (0, 2)") \
        .select(F.col(id_col).cast("long").alias("src"))

    @F.pandas_udf(T.BinaryType())
    def comp_wav(mid: pd.Series) -> pd.Series:
        out = []
        for s in mid:
            s = int(s)
            pcm = synth_samples(s).astype(np.int64)
            pcm = pcm * 2 if s % 5 == 0 else -pcm
            out.append(encode_wav(pcm.astype(np.int16), AUDIO_RATE))
        return pd.Series(out)

    return src.select(
        (F.col("src") + F.when(F.col("src") % 5 == 0, 1000000)
         .otherwise(2000000)).alias("media_id"),
        F.lit("audio").alias("kind"),
        comp_wav("src").alias("content"))
