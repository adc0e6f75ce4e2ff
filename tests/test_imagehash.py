"""Perceptual image hashing (kaggle/fisheries/utils/hash/):
toHex/hammingDistance ports, AverageHash/GradientHash with the
integer area-mean resize, the exact Blockhash port (even + uneven
paths), and the banded dup-pair stage."""

from __future__ import annotations

import numpy as np
import pytest

from kgp.imagehash import (area_cell_sums, average_hash, blockhash,
                           gradient_hash, hamming_distance, hash64,
                           image_hash_stage, luminosity,
                           phash_dup_pairs, to_hex)
from kgp.multimodal import synth_media, synth_pixel_array

SF_TEST = "/root/testdata/sf0.001"


# ------------------------------------------------------------ HashUtil

def test_to_hex():
    # HashUtil.toHex: BigInteger semantics + zero pad
    assert to_hex("0" * 64, 16) == "0" * 16
    assert to_hex("1" * 64, 16) == "f" * 16
    assert to_hex("0000" + "1" * 60, 16) == "0fffffffffffffff"
    assert to_hex("1010", 1) == "a"
    with pytest.raises(ValueError):
        to_hex("1" * 8, 1)  # the reference's substring would throw


def test_hamming_distance():
    # HashUtil.hammingDistance nibble popcount
    assert hamming_distance("00", "00") == 0
    assert hamming_distance("f0", "0f") == 8
    assert hamming_distance("ab12", "ab13") == 1
    assert hamming_distance("ffff", "0000") == 16


def test_hash64_twos_complement():
    assert hash64("0" * 16) == 0
    assert hash64("f" * 16) == -1
    assert hash64("7" + "f" * 15) == 2 ** 63 - 1
    assert hash64("8" + "0" * 15) == -(2 ** 63)


# ---------------------------------------------------- area-mean cells

def test_area_cell_sums_identity_and_uniform():
    g = np.arange(64, dtype=np.int64).reshape(8, 8)
    # 8x8 -> 8x8 is the identity scaled by 64 (weights 8*8 per cell)
    assert (area_cell_sums(g, 8, 8) == g * 64).all()
    # uniform image -> uniform cells with denominator w*h
    u = np.full((5, 7), 9, dtype=np.int64)
    cells = area_cell_sums(u, 8, 8)
    assert (cells == 9 * 5 * 7).all()


def test_area_cell_sums_exact_halves():
    # 2x2 -> 1x1: single cell = total sum
    g = np.array([[1, 2], [3, 4]], dtype=np.int64)
    assert area_cell_sums(g, 1, 1)[0, 0] == 10
    # 4x1 row -> 2 cells of two pixels each (scaled by 4*1)
    row = np.array([[1, 3, 5, 7]], dtype=np.int64)
    cells = area_cell_sums(row, 2, 1)
    assert cells.tolist() == [[(1 + 3) * 2, (5 + 7) * 2]]


# --------------------------------------------------- average/gradient

def test_average_hash_known_bitmap():
    """Half-dark half-bright 8x8 grayscale image: bits = bright half."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, 4:, :] = 200
    h = average_hash(img)
    # rows are 00001111 -> 0x0f per row
    assert h == "0f" * 8


def test_gradient_hash_monotone_ramp():
    """Strictly increasing columns -> every right neighbor is larger
    -> all bits 1."""
    img = np.zeros((8, 9, 3), dtype=np.uint8)
    img[:, :, :] = (np.arange(9) * 20)[None, :, None].astype(np.uint8)
    assert gradient_hash(img) == "f" * 16
    # decreasing -> all zero
    img2 = img[:, ::-1, :].copy()
    assert gradient_hash(img2) == "0" * 16


def test_average_hash_uniform_image_all_zero():
    img = np.full((6, 10, 3), 123, dtype=np.uint8)
    assert average_hash(img) == "0" * 16  # strict >, never true


# ---------------------------------------------------------- blockhash

def test_blockhash_even_path_known():
    """8x8 image, bits=4 -> 2x2 integer block sums; band medians use
    the reference's (n/2, n/2+1) even-length pair."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, 4:, :] = 100
    h = blockhash(img, bits=4)
    assert len(h) == 4  # 16 bits -> 4 hex chars
    # each band is one row of 4 blocks: [0, 0, 1200, 1200]
    # median pair (idx 2,3) -> m=1200; v>m false everywhere;
    # |v-m|<1 for the two bright blocks, m <= half(4*2*256*3/2=3072)
    # -> all zero
    assert h == "0000"


def test_blockhash_even_median_quirk():
    """Band [0, 10, 20, 30]: reference median = (m[2]+m[3])/2 = 25,
    NOT the conventional (m[1]+m[2])/2 = 15 -> only v=30 exceeds."""
    img = np.zeros((4, 16, 3), dtype=np.uint8)
    # bits=4 on 16x4: blocksize_x=4, blocksize_y=1; four bands = rows
    img[0, 0:4] = 0
    img[0, 4:8] = 10
    img[0, 8:12] = 20
    img[0, 12:16] = 30
    h = blockhash(img, bits=4)
    # row 0 blocks: sums = [0,120,240,360]/3ch -> values 0,10*4*3=120,
    # 240*... median pair idx(2,3) -> (240*3? ) -> only the last block
    # exceeds -> bits 0001 -> hex '1'; rows 1-3 all zero -> '0'
    assert h[0] == "1" and h[1:] == "000"


def test_blockhash_uneven_path_runs_and_is_deterministic():
    for mid in (0, 6, 21, 33, 90):
        img = synth_pixel_array(mid)
        h1 = blockhash(img, bits=16)
        h2 = blockhash(img, bits=16)
        assert h1 == h2 and len(h1) == 64
        assert set(h1) <= set("0123456789abcdef")


def test_blockhash_transparent_pixels_count_765():
    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    rgba[:, :, 3] = 255
    rgba[:2, :, 3] = 0  # top half transparent -> value 765
    h = blockhash(rgba, bits=4)
    dark = blockhash(rgba[:, :, :3].copy(), bits=4)
    assert h != dark  # transparency changed block values


def test_blockhash_shift_similarity():
    """A one-pixel shift of a smooth gradient must stay within a small
    Hamming distance of the original (the perceptual property)."""
    base = np.zeros((16, 16, 3), dtype=np.uint8)
    base[:, :, :] = (np.arange(16) * 12)[None, :, None].astype(np.uint8)
    shifted = np.roll(base, 1, axis=1)
    d = hamming_distance(blockhash(base), blockhash(shifted))
    assert d <= 64  # 256-bit hash, <= 25% flipped
    rand = np.random.RandomState(0).randint(
        0, 256, (16, 16, 3)).astype(np.uint8)
    d_rand = hamming_distance(blockhash(base), blockhash(rand))
    assert d < d_rand  # closer than an unrelated image


# ------------------------------------------------------------- stages

def test_image_hash_stage_matches_twins(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    rows = image_hash_stage(media).collect()
    assert len(rows) > 0
    for r in rows[:25]:
        img = synth_pixel_array(r["media_id"])
        assert r["ahash"] == average_hash(img)
        assert r["ghash"] == gradient_hash(img)
        assert r["bhash"] == blockhash(img)
        assert r["ahash64"] == hash64(r["ahash"])


def test_phash_dup_pairs_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    hashes = image_hash_stage(media).persist()
    got = {(r["a"], r["b"]): r["hamming"]
           for r in phash_dup_pairs(hashes, max_hamming=3).collect()}
    hs = {r["media_id"]: r["ahash"] for r in hashes.collect()}
    import itertools
    want = {}
    for a, b in itertools.combinations(sorted(hs), 2):
        d = hamming_distance(hs[a], hs[b])
        if d <= 3:
            want[(a, b)] = d
    assert got == want
    hashes.unpersist()


def test_phash_dup_pairs_rejects_wide_radius(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    with pytest.raises(ValueError):
        phash_dup_pairs(image_hash_stage(media), max_hamming=4)


def test_image_hashes_duckdb_parity(spark):
    import duckdb

    from kgp.oracle import image_hashes_sql
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    got = {r["media_id"]: (r["ahash"], r["ghash"])
           for r in image_hash_stage(media).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_TEST}/documents.parquet'")
    want = con.execute(image_hashes_sql()).fetchall()
    assert len(want) == len(got) > 0
    for mid, ah, gh in want:
        assert got[mid] == (ah, gh), mid


def test_image_hash_stage_plan_no_shuffle(spark):
    from kgp.imagehash import image_hash_stage
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    plan = image_hash_stage(media) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one Arrow pass over the scan
