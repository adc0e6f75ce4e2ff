"""Image feature extractors (palladian-image-processing features/):
RGBtoHSB port, HistogramStats moments/percentiles, bounds, symmetry,
and the gate-stage DuckDB parity."""

from __future__ import annotations

import colorsys

import duckdb
import numpy as np
import pytest

from kgp.imagefeatures import (EXTRACTORS, HistStats, bounds_features,
                               extract_values, image_features_stage,
                               rgb_to_hsb, statistics_features,
                               symmetry_features)
from kgp.multimodal import synth_media, synth_pixel_array

SF_TEST = "/root/testdata/sf0.001"


# ------------------------------------------------------------ RGBtoHSB

def test_rgb_to_hsb_matches_colorsys():
    """java.awt.Color.RGBtoHSB is rgb_to_hsv on [0,1]-scaled floats;
    check the vectorized port against colorsys over a value sweep."""
    rng = np.random.RandomState(7)
    r = rng.randint(0, 256, 500)
    g = rng.randint(0, 256, 500)
    b = rng.randint(0, 256, 500)
    hue, sat, bri = rgb_to_hsb(r, g, b)
    for i in range(500):
        eh, es, ev = colorsys.rgb_to_hsv(r[i] / 255, g[i] / 255,
                                         b[i] / 255)
        assert hue[i] == pytest.approx(eh, abs=1e-9)
        assert sat[i] == pytest.approx(es, abs=1e-9)
        assert bri[i] == pytest.approx(ev, abs=1e-9)


def test_rgb_to_hsb_achromatic():
    hue, sat, bri = rgb_to_hsb(np.array([0, 128, 255]),
                               np.array([0, 128, 255]),
                               np.array([0, 128, 255]))
    assert (hue == 0).all() and (sat == 0).all()
    assert bri == pytest.approx([0, 128 / 255, 1.0])


def test_extract_values_luminosity_truncates():
    img = np.array([[[100, 200, 50]]], dtype=np.uint8)
    # (int)(0.21*100 + 0.72*200 + 0.07*50) = (int)168.5 = 168
    assert extract_values(img, "luminosity")[0] == 168


# ------------------------------------------------------ HistogramStats

def test_histstats_population_moments():
    """POPULATION (isSample=false) moments — cross-check the
    histogram-space computation against direct numpy formulas."""
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 256, 10_000)
    s = HistStats(vals)
    v = vals.astype(np.float64)
    m = v.mean()
    m2 = ((v - m) ** 2).mean()
    m3 = ((v - m) ** 3).mean()
    m4 = ((v - m) ** 4).mean()
    assert s.count == 10_000
    assert s.sum() == v.sum()
    assert s.mean() == pytest.approx(m)
    assert s.min() == v.min() and s.max() == v.max()
    assert s.range() == v.max() - v.min()
    assert s.stddev() == pytest.approx(np.sqrt(m2))
    assert s.rel_stddev() == pytest.approx(np.sqrt(m2) / m)
    assert s.skewness() == pytest.approx(m3 / m2 ** 1.5)
    assert s.kurtosis() == pytest.approx(m4 / m2 ** 2 - 3)


def test_histstats_constant_input():
    # HistogramStats.java:199-225 returns 0 (not NaN/-3) at variance 0
    s = HistStats(np.full(50, 42))
    assert s.stddev() == 0 and s.skewness() == 0 and s.kurtosis() == 0
    assert s.percentile(50) == 42


def test_histstats_percentile_fatstats_rule():
    """FatStats percentile over the cumulated histogram: with n*p/100
    integral, average of the two straddling values; else the
    ceil(n*p/100)-th value (1-based)."""
    s = HistStats(np.array([1, 2, 3, 4]))
    # p=50 -> n=2.0 integral -> (value#2 + value#3)/2 = (2+3)/2
    assert s.percentile(50) == 2.5
    # p=30 -> n=1.2 -> ceil=2 -> 2nd value = 2
    assert s.percentile(30) == 2.0
    s5 = HistStats(np.array([10, 20, 30, 40, 50]))
    # p=50 -> n=2.5 -> ceil=3 -> 3rd value = 30
    assert s5.percentile(50) == 30.0
    # p=40 -> n=2.0 integral -> (20+30)/2
    assert s5.percentile(40) == 25.0


# --------------------------------------------------- feature families

def test_bounds_features():
    img = np.zeros((3, 5, 3), dtype=np.uint8)
    f = bounds_features(img)
    assert f == {"width": 5, "height": 3, "ratio": 3 / 5}


def test_statistics_features_shape_and_values():
    img = synth_pixel_array(6)
    f = statistics_features(img)
    # 7 extractors x (10 scalars + 9 percentiles)
    assert len(f) == len(EXTRACTORS) * 19
    red = img[:, :, 0].astype(np.float64).ravel()
    assert f["red_mean"] == pytest.approx(red.mean())
    assert f["red_sum"] == red.sum()
    assert f["red_count"] == red.size
    assert f["red_min"] == red.min() and f["red_max"] == red.max()


def test_symmetry_perfectly_symmetric_image():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 0] = 77
    f = symmetry_features(img, extractors=("red",))
    assert f["symmetry-horizontal-red"] == 1.0
    assert f["symmetry-vertical-red"] == 1.0
    assert f["symmetry-both-red"] == 1.0
    assert f["symmetry-180-rotated-red"] == f["symmetry-both-red"]


def test_symmetry_known_value():
    """2x1 red image [0, 255]: vertical flip swaps them ->
    similarity = 1 - sqrt(mean((255/255)^2)) = 0."""
    img = np.zeros((1, 2, 3), dtype=np.uint8)
    img[0, 1, 0] = 255
    f = symmetry_features(img, extractors=("red",))
    assert f["symmetry-vertical-red"] == pytest.approx(0.0)
    assert f["symmetry-horizontal-red"] == 1.0  # one row, flip = id


# ------------------------------------------------------- gate parity

def test_image_features_stage_duckdb_parity(spark):
    from kgp.oracle import image_features_sql
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    got = {r["media_id"]: r.asDict()
           for r in image_features_stage(media).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_TEST}/documents.parquet'")
    cols = [d[0] for d in con.execute(image_features_sql()).description]
    want = con.execute(image_features_sql()).fetchall()
    assert len(got) == len(want) > 0
    for row in want:
        w = dict(zip(cols, row))
        g = got[w["media_id"]]
        for c in cols:
            assert g[c] == pytest.approx(w[c], abs=1e-9), \
                (w["media_id"], c, g[c], w[c])


def test_image_features_stage_plan_single_arrow_pass(spark):
    """Column pruning must reach the scan (content+media_id only) and
    the stage is ONE Arrow eval over the filtered scan — no shuffle."""
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    plan = image_features_stage(media) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------- round-3 extractor families

def test_fatstats_twin_goldens():
    from kgp.imagefeatures import FatStatsF
    s = FatStatsF([2.0, 1.0, 3.0, 4.0])
    assert s.mean() == 2.5 and s.sum() == 10 and s.range() == 3
    # sample stddev of 1..4 = sqrt(5/3)
    assert s.stddev() == pytest.approx(np.sqrt(5 / 3))
    # FatStats percentile: p50 over n=4 -> integral 2 -> (v2+v3)/2
    assert s.percentile(50) == 2.5 and s.median() == 2.5
    assert s.percentile(30) == 2.0  # 1.2 -> ceil 2 -> 2nd value
    one = FatStatsF([7.0])
    assert one.stddev() == 0.0
    empty = FatStatsF()
    assert np.isnan(empty.mean()) and np.isnan(empty.percentile(50))


def test_detect_frequencies_flat_and_checker():
    from kgp.imagefeatures import detect_frequencies
    flat = np.full((5, 5, 3), 100, dtype=np.uint8)
    s = detect_frequencies(flat)
    assert s.count() == 9 and s.mean() == 0.0
    # checkerboard: every interior pixel's distinct neighbor set is
    # {opposite, same}; sampled 7 cells = 4 opposite + 3 same (or
    # 3/4) -> v = |delta|/255 * (1/2 per distinct value)
    chk = np.zeros((5, 5, 3), dtype=np.uint8)
    chk[::2, ::2] = 255
    chk[1::2, 1::2] = 255
    s2 = detect_frequencies(chk)
    assert s2.mean() > 0.4  # high-frequency image scores high


def test_frequency_features_dct_is_the_as_written_noop():
    """The reference's DCT call is commented out -> toDct reduces to
    min(blue+128, 255); a flat blue>=127 image becomes flat 255 ->
    dct-mean 0."""
    from kgp.imagefeatures import frequency_features
    img = np.zeros((6, 6, 3), dtype=np.uint8)
    img[:, :, 2] = 200
    f = frequency_features(img)
    assert f["frequency-dct-mean"] == 0.0
    assert f["frequency-mean"] == 0.0


def test_grid_similarity_features():
    from kgp.imagefeatures import grid_similarity_features
    # four identical quadrants -> all 6 pair sims are 1.0
    img = np.tile(np.arange(16, dtype=np.uint8).reshape(4, 4)[..., None],
                  (2, 2, 3))
    f = grid_similarity_features(img, divisions=2)
    assert f["2x2-similarity_min"] == 1.0
    assert f["2x2-similarity_sum"] == 6.0
    assert f["2x2-similarity_stdDev"] == 0.0
    assert f["2x2-similarity_50-percentile"] == 1.0
    with pytest.raises(ValueError):
        grid_similarity_features(img, divisions=1)


def test_grid_similarity_leftover_pixels_dropped():
    from kgp.imagefeatures import grid_similarity_features
    # 5x5 with d=2 -> 2x2 cells; row/col 4 never read (set to noise)
    img = np.zeros((5, 5, 3), dtype=np.uint8)
    base = grid_similarity_features(img, divisions=2)
    noisy = img.copy()
    noisy[4, :, :] = 200
    noisy[:, 4, :] = 133
    assert grid_similarity_features(noisy, divisions=2) == base


def test_detect_edges_flat_image_is_zero():
    from kgp.imagefeatures import detect_edges
    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert (detect_edges(flat) == 0).all()


def test_detect_edges_vertical_step_found():
    from kgp.imagefeatures import detect_edges, edginess_features
    img = np.zeros((12, 12, 3), dtype=np.uint8)
    img[:, 6:, :] = 250
    edges = detect_edges(img)
    # erosion pushes the bright region right; a gradient ridge exists
    assert edges.max() == 255
    feats = edginess_features(img)
    assert feats["edginess-max"] == 255.0
    flat_feats = edginess_features(np.zeros((12, 12, 3), np.uint8))
    assert flat_feats["edginess-mean"] == 0.0
    assert feats["edginess-mean"] > flat_feats["edginess-mean"]


def test_color_features_booleans():
    from kgp.imagefeatures import color_features
    img = np.zeros((6, 6, 3), dtype=np.uint8)
    img[:, :, 0] = 230  # strong red (not near-white/near-black)
    f = color_features(img)
    assert f["main_color-Red"] is True
    assert f["main_color-Blue"] is False
    assert all(isinstance(v, bool) for v in f.values())


def test_local_features_grid_rename():
    from kgp.imagefeatures import bounds_features, local_features
    img = np.zeros((8, 12, 3), dtype=np.uint8)
    f = local_features(img, 2, bounds_features)
    # 4 cells x 3 bounds features, cell dims 6x4
    assert len(f) == 12
    assert f["local-0-width"] == 6 and f["local-0-height"] == 4
    assert f["local-3-ratio"] == 4 / 6
    with pytest.raises(ValueError):
        local_features(img, 1, bounds_features)


def test_grid_similarity_stage_duckdb_parity(spark):
    import duckdb

    from kgp.imagefeatures import grid_similarity_stage
    from kgp.oracle import grid_similarity_sql
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    got = {r["media_id"]: r.asDict()
           for r in grid_similarity_stage(media).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_TEST}/documents.parquet'")
    cur = con.execute(grid_similarity_sql())
    cols = [d[0] for d in cur.description]
    want = cur.fetchall()
    assert len(want) == len(got) > 0
    for row in want:
        w = dict(zip(cols, row))
        g = got[w["media_id"]]
        for c in cols:
            assert g[c] == w[c], (w["media_id"], c, g[c], w[c])


def test_frequency_stage_matches_twin(spark):
    from kgp.imagefeatures import detect_frequencies, frequency_stage
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    rows = frequency_stage(media).collect()
    assert len(rows) > 0
    for r in rows[:10]:
        s = detect_frequencies(synth_pixel_array(r["media_id"]))
        assert r["freq_count"] == s.count()
        assert r["freq_mean"] == round(s.mean(), 9)
        assert r["freq_median"] == s.median()
