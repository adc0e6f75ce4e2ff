"""Upstream HistogramStatsTest + BlockhashTest reproduced on the
reference's own fixtures.

Sources:
- HistogramStatsTest.java:14-77 (assertions copied 1:1; population
  moments, the FatStats percentile rule, mode)
- BlockhashTest.java:23-49 (official blockhash.io test data — every
  *_16_2.txt golden within the upstream Hamming<15 tolerance; this
  port lands at <=2 on every image incl. the RGBA PNGs whose
  transparent pixels read 765)
"""

import glob
import re

import numpy as np

from kgp.imagefeatures import HistStats
from kgp.imagehash import blockhash, hamming_distance
from kgp.multimodal import decode_image

DELTA = 0.0001
DATA = ("/root/reference/palladian-image-processing/src/test/"
        "resources/blockhash-data")


def _stats() -> HistStats:
    vals = []
    for v, n in [(0, 2), (1, 2), (2, 4), (3, 3), (4, 4), (5, 5),
                 (6, 5), (7, 2), (8, 3), (9, 4)]:
        vals += [v] * n
    return HistStats(np.array(vals), max_value=10)


def test_histogram_stats():
    stats = _stats()
    assert abs(stats.min() - 0) < DELTA
    assert abs(stats.max() - 9) < DELTA
    assert stats.count == 34
    assert abs(stats.sum() - 164) < DELTA
    assert abs(stats.mean() - 164 / 34) < DELTA
    assert abs(stats.range() - 9) < DELTA
    assert abs(stats.median() - 5) < DELTA
    assert abs(stats.percentile(10) - 1) < DELTA
    assert abs(stats.stddev() - 2.639859491) < DELTA
    assert abs(stats.skewness() - -0.048559743) < DELTA
    assert abs(stats.kurtosis() - -0.955284212) < DELTA
    assert abs(stats.mode() - 5) < DELTA


def test_histogram_stats_edge_case():
    stats = HistStats(np.array([1] * 10), max_value=3)
    assert abs(stats.variance() - 0) < DELTA


def test_blockhash_official_testdata():
    images = sorted(glob.glob(f"{DATA}/*.jpg")
                    + glob.glob(f"{DATA}/*.png"))
    assert len(images) >= 17
    for img_path in images:
        base = re.sub(r"\.(jpg|png)$", "", img_path)
        img = decode_image(open(img_path, "rb").read(),
                           keep_alpha=True)
        expected = open(f"{base}_16_2.txt").read().split(" ")[1] \
            .strip()
        got = blockhash(img, 16)
        distance = hamming_distance(got, expected)
        assert distance < 15, (img_path, distance)
        # this port's measured bound on the official set
        assert distance <= 2, (img_path, distance)


# ------------------------------------- SymmetryFeatureExtractorTest
# (SymmetryFeatureExtractorTest.java:22-53 on the reference's own
# symmetry-*.png / symmetric.jpg fixtures)

RES_IP = ("/root/reference/palladian-image-processing/src/test/"
          "resources")


def _sym(name):
    from kgp.imagefeatures import symmetry_features
    img = decode_image(open(f"{RES_IP}/{name}", "rb").read())
    return symmetry_features(img, extractors=("luminosity",))


def test_symmetry_toy_examples():
    f = _sym("symmetry-1.png")
    assert f["symmetry-horizontal-luminosity"] > 0.99

    f = _sym("symmetry-2.png")
    assert f["symmetry-vertical-luminosity"] > 0.99

    f = _sym("symmetry-3.png")
    assert f["symmetry-both-luminosity"] > 0.99
    assert f["symmetry-180-rotated-luminosity"] > 0.99

    f = _sym("symmetry-4.png")
    for k in ("symmetry-horizontal-luminosity",
              "symmetry-vertical-luminosity",
              "symmetry-both-luminosity",
              "symmetry-180-rotated-luminosity"):
        assert f[k] > 0.99, k


def test_symmetry_real_photo():
    f = _sym("symmetric.jpg")
    # the upstream assertion (variable names there are swapped):
    # vertical similarity exceeds horizontal on this photo
    assert f["symmetry-vertical-luminosity"] > \
        f["symmetry-horizontal-luminosity"]


def test_statistics_extractor_all_finite():
    # StatisticsFeatureExtractorTest.java:21-28 (HSB extractors on
    # the reference's 51612.jpg)
    import math

    from kgp.imagefeatures import statistics_features
    img = decode_image(open(f"{RES_IP}/51612.jpg", "rb").read())
    feats = statistics_features(
        img, extractors=("hue", "saturation", "brightness"))
    for k, v in feats.items():
        assert not math.isnan(float(v)), k
