"""Region / color / local feature extractors (kgp/regionfeatures.py),
including the reference's own test photos decoded with kgp.jpegcodec."""
from __future__ import annotations

import os

import numpy as np
import pytest

from kgp.imagefeatures import statistics_features
from kgp.multimodal import encode_bmp, synth_pixel_array
from kgp.regionfeatures import (REGION_KEYS, color_features,
                                color_features_stage, color_frequencies,
                                dilate5, flood_regions, local_features,
                                region_features, region_features_stage,
                                _packed)

REF_RES = ("/root/reference/palladian-image-processing/"
           "src/test/resources")


# ------------------------------------------------------- dilate


def test_dilate5_max_plus_one_clamped():
    img = np.zeros((7, 7, 3), dtype=np.uint8)
    img[3, 3] = (100, 200, 255)
    d = dilate5(img)
    # within the 5x5 reach of the bright pixel: max+1 per band
    assert tuple(d[1, 1]) == (101, 201, 255)  # 255 clamps
    assert tuple(d[3, 5]) == (101, 201, 255)
    # outside the reach: zero neighborhood -> 0+1
    assert tuple(d[0, 6]) == (1, 1, 1)


def test_color_frequencies_order():
    img = np.zeros((1, 5, 3), dtype=np.uint8)
    img[0, 0] = img[0, 1] = img[0, 2] = (5, 5, 5)
    img[0, 3] = (9, 9, 9)
    img[0, 4] = (1, 1, 1)
    freqs = color_frequencies(_packed(img))
    assert freqs[0] == (5 * 65536 + 5 * 256 + 5, 3)
    # tie between the two singletons -> packed ascending
    assert freqs[1][0] < freqs[2][0]
    assert freqs[1][1] == freqs[2][1] == 1


def test_flood_regions_8_connectivity_and_scan_order():
    mask = np.zeros((5, 5), dtype=bool)
    mask[0, 0] = mask[1, 1] = True       # diagonal -> ONE region
    mask[4, 4] = True                    # separate region
    sizes = flood_regions(mask)
    assert sizes == [2, 1]               # x-outer/y-inner discovery


def test_region_features_centered_square():
    # 20x20 dark background with a 6x6 mid-gray square dead center
    img = np.zeros((20, 20, 3), dtype=np.uint8)
    img[7:13, 7:13] = (120, 60, 30)
    feats = region_features(img)
    assert set(feats) == set(REGION_KEYS)
    # the dilated square (region grows by the 5x5 reach) is the one
    # region left after background removal
    assert feats["number_regions"] == 1.0
    assert feats["main_region_size"] == feats["mean_region_size"]
    assert feats["main_region_size"] == 10 * 10  # 6 + 2*2 dilate halo
    assert feats["main_region_coverage"] == 1.0
    assert feats["main_region_dominance"] == 100 / 400
    assert feats["main_region_width"] == 10 / 20


def test_region_features_too_small_raises():
    with pytest.raises(ValueError):
        region_features(np.zeros((8, 8, 3), dtype=np.uint8))


@pytest.mark.parametrize("name", ["51612.jpg", "339720.jpg",
                                  "261444.jpg"])
def test_region_features_reference_photos(name):
    """The reference's own RegionFeatureExtractorTest contract (no
    NaN on its three photos), with the photos decoded by
    kgp.jpegcodec — strengthened to all-finite."""
    path = os.path.join(REF_RES, name)
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    from kgp.jpegcodec import decode_jpeg
    img = decode_jpeg(open(path, "rb").read())
    feats = region_features(img)
    assert set(feats) == set(REGION_KEYS)
    for key, val in feats.items():
        assert np.isfinite(val), (key, val)
    assert feats["number_regions"] >= 1


# ------------------------------------------------------- color


def test_color_features_one_hot():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:] = (200, 30, 30)  # clearly red-ish
    feats = color_features(img)
    assert all(k.startswith("main_color-") for k in feats)
    assert any(feats.values())
    assert not all(feats.values())


def test_color_features_blank_image_all_false():
    img = np.full((4, 4, 3), 255, dtype=np.uint8)  # near-white: no
    feats = color_features(img)                    # clusters at all
    assert not any(feats.values())


# ------------------------------------------------------- local


def test_local_features_grid_keys_and_values():
    img = synth_pixel_array(6)  # 10x10
    feats = local_features(img, 2, lambda c: statistics_features(c))
    # 4 cells, keys prefixed cell-<i+1>/4-
    prefixes = {k.split("-", 2)[1] for k in feats}
    assert prefixes == {"1/4", "2/4", "3/4", "4/4"}
    # cell 1 (x-major: xi=0, yi=0) = top-left 5x5 block
    want = statistics_features(img[:5, :5])
    for key, val in want.items():
        assert feats[f"cell-1/4-{key}"] == val


def test_local_features_divisions_guard():
    with pytest.raises(ValueError):
        local_features(synth_pixel_array(6), 1, lambda c: {})


# ------------------------------------------------------- stages


def test_stages_on_spark(spark):
    big = np.zeros((12, 12, 3), dtype=np.uint8)
    big[4:8, 4:8] = (120, 60, 30)
    rows = [(1, "image", bytearray(encode_bmp(big))),
            (2, "image", bytearray(encode_bmp(
                synth_pixel_array(0))))]  # 4x4: skipped by region
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary")
    reg = region_features_stage(media).collect()
    assert {r["media_id"] for r in reg} == {1}
    got = {r["feature"]: r["value"] for r in reg}
    assert got == pytest.approx(region_features(big))
    col = color_features_stage(media).collect()
    assert {r["media_id"] for r in col} == {1, 2}
    local = {(r["media_id"], r["color_name"]): r["present"]
             for r in col}
    for key, val in color_features(big).items():
        assert local[(1, key)] == val
