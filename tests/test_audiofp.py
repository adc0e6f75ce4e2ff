"""Audio fingerprint + duplicate detection (kgp/audiofp.py)."""
from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from kgp.audiofp import (N_SEGMENTS, audio_fingerprints, audio_near_dups,
                         fingerprint, fp_dup_pairs, segment_energies)
from kgp.multimodal import encode_wav, synth_samples

AUDIO_RATE = 8000


# ----------------------------------------------------- scalar core


def test_segment_energies_exact():
    # 66 samples over 33 segments -> every segment exactly 2 samples
    pcm = np.arange(66, dtype=np.int64) - 33
    e = segment_energies(pcm)
    assert len(e) == N_SEGMENTS
    for s in range(N_SEGMENTS):
        a, b = pcm[2 * s], pcm[2 * s + 1]
        assert e[s] == a * a + b * b
    assert e.sum() == (pcm * pcm).sum()


def test_segment_bounds_floor_law():
    # ragged n: floor boundaries partition the index space exactly
    pcm = synth_samples(97).astype(np.int64)  # n = 197
    e = segment_energies(pcm)
    assert e.sum() == (pcm * pcm).sum()
    n = len(pcm)
    lens = [((s + 1) * n) // N_SEGMENTS - (s * n) // N_SEGMENTS
            for s in range(N_SEGMENTS)]
    assert sum(lens) == n and min(lens) >= 1


def test_too_short_clip_raises():
    with pytest.raises(ValueError):
        segment_energies(np.zeros(N_SEGMENTS - 1, dtype=np.int64))


def test_fingerprint_bit_semantics():
    # energies strictly increasing -> all 32 bits set
    pcm = np.repeat(np.arange(1, 34, dtype=np.int64), 3)
    assert fingerprint(pcm) == (1 << 32) - 1
    # strictly decreasing -> all clear
    assert fingerprint(pcm[::-1].copy()) == 0


def test_gain_and_polarity_invariance():
    for mid in (1, 7, 22, 103, 400):
        pcm = synth_samples(mid).astype(np.int64)
        base = fingerprint(pcm)
        assert fingerprint(pcm * 2) == base       # exact gain x2
        assert fingerprint(pcm * 5) == base       # exact gain x5
        assert fingerprint(-pcm) == base          # polarity flip


def test_fingerprint_discriminates():
    fps = {m: fingerprint(synth_samples(m).astype(np.int64))
           for m in (1, 4, 7, 10, 13, 16, 19, 22)}
    assert len(set(fps.values())) > 1


# ----------------------------------------------------- spark stages


def _media_df(spark, mids):
    rows = [(int(m), "audio",
             bytearray(encode_wav(synth_samples(m), AUDIO_RATE)))
            for m in mids]
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary")


def test_audio_fingerprints_stage(spark):
    mids = [1, 4, 7, 10, 13]
    got = {r["media_id"]: r["fp"]
           for r in audio_fingerprints(_media_df(spark, mids)).collect()}
    want = {m: fingerprint(synth_samples(m).astype(np.int64))
            for m in mids}
    assert got == want


def test_pigeonhole_complete_vs_brute_force(spark):
    mids = list(range(1, 300, 3))
    fps = {m: fingerprint(synth_samples(m).astype(np.int64))
           for m in mids}
    want = sorted((a, b, bin(fps[a] ^ fps[b]).count("1"))
                  for a, b in combinations(mids, 2)
                  if bin(fps[a] ^ fps[b]).count("1") <= 3)
    got = sorted(map(tuple, audio_near_dups(_media_df(spark, mids))
                     .collect()))
    assert got == want
    assert len(want) > 0  # non-degenerate on the synth corpus


def test_dup_pair_detects_rescaled_copy(spark):
    # a gain-doubled re-encode of clip 7 under a new id must pair at 0
    rows = [(7, "audio", bytearray(encode_wav(synth_samples(7),
                                              AUDIO_RATE))),
            (1000007, "audio",
             bytearray(encode_wav(
                 (synth_samples(7).astype(np.int64) * 2)
                 .astype(np.int16), AUDIO_RATE)))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary")
    pairs = audio_near_dups(media).collect()
    assert [(p["a"], p["b"], p["hamming"])
            for p in pairs] == [(7, 1000007, 0)]


def test_max_hamming_guard(spark):
    fps = spark.createDataFrame([(1, 5)], "media_id long, fp long")
    with pytest.raises(ValueError):
        fp_dup_pairs(fps, max_hamming=4)


def test_plan_no_cartesian_no_python_in_pairs(spark):
    fps = spark.createDataFrame(
        [(i, i * 37 % 251) for i in range(20)],
        "media_id long, fp long")
    plan = fp_dup_pairs(fps)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
        assert marker not in plan
