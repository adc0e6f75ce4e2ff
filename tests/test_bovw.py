"""Bag-of-visual-words pipeline (kgp/bovw.py)."""
from __future__ import annotations

import numpy as np
import pytest

from kgp.bovw import (bow_histograms, build_vocabulary,
                      grid_patch_descriptors, image_descriptors,
                      seed_vocabulary, _luminosity)
from kgp.multimodal import encode_bmp, synth_pixel_array


def test_luminosity_trunc_not_round():
    img = np.full((1, 1, 3), 255, dtype=np.uint8)
    # 0.21*255 + 0.72*255 + 0.07*255 = 254.99999... in IEEE doubles
    # -> trunc 254 (both engines run the same double expression)
    assert _luminosity(img)[0, 0] == 254
    img2 = np.zeros((1, 1, 3), dtype=np.uint8)
    img2[0, 0] = (10, 20, 30)  # 2.1 + 14.4 + 2.1 = 18.6 -> 18
    assert _luminosity(img2)[0, 0] == 18


def test_grid_patch_descriptor_hand_golden():
    # 4x4 image, divisions=2 -> cells 2x2, quadrants 1x1: each
    # descriptor is just the 4 luminosity values of the cell, in
    # (qx, qy) order: d0=(0,0) d1=(0,1) d2=(1,0) d3=(1,1)
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[..., 0] = np.arange(16, dtype=np.uint8).reshape(4, 4) * 10
    lum = _luminosity(img)
    descs = dict(grid_patch_descriptors(img, 2))
    assert set(descs) == {0, 1, 2, 3}
    # cell index is x-major: cell 1 = (xi=0, yi=1) -> rows 2:4, cols 0:2
    want = [lum[2, 0], lum[3, 0], lum[2, 1], lum[3, 1]]
    assert descs[1].tolist() == want


def test_descriptor_order_matches_reference_cell_order():
    img = synth_pixel_array(6)  # 10x10
    descs = grid_patch_descriptors(img, 2)
    assert [c for c, _ in descs] == [0, 1, 2, 3]  # x-major


def test_tiny_image_yields_no_descriptors():
    img = np.zeros((3, 3, 3), dtype=np.uint8)  # cells 1x1 < 2
    assert grid_patch_descriptors(img, 2) == []


def _media_df(spark, mids):
    rows = [(int(m), "image", bytearray(encode_bmp(synth_pixel_array(m))))
            for m in mids]
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary")


def test_image_descriptors_stage(spark):
    mids = [0, 3, 6, 9]
    got = {(r["media_id"], r["cell"]):
           (r["d0"], r["d1"], r["d2"], r["d3"])
           for r in image_descriptors(_media_df(spark, mids)).collect()}
    for m in mids:
        for cell, d in grid_patch_descriptors(synth_pixel_array(m), 2):
            assert got[(m, cell)] == tuple(d.tolist())


def test_bow_assignment_first_wins_ties(spark):
    media = _media_df(spark, [0])
    # duplicate centroids: every distance ties -> word 0 always wins
    descs = grid_patch_descriptors(synth_pixel_array(0), 2)
    c = descs[0][1].astype(np.float64)
    rows = bow_histograms(media, np.stack([c, c, c])).collect()
    words = {r["word"] for r in rows}
    assert words <= {0}


def test_bow_histogram_counts_sum_to_cells(spark):
    mids = [0, 3, 6, 9, 12, 30, 60]
    media = _media_df(spark, mids)
    vocab = seed_vocabulary(image_descriptors(media), seed_mod=30)
    assert vocab.shape == (12, 4)  # 3 seed images x 4 cells
    rows = bow_histograms(media, vocab).collect()
    per_img = {}
    for r in rows:
        per_img[r["media_id"]] = per_img.get(r["media_id"], 0) + r["cnt"]
    assert per_img == {m: 4 for m in mids}


def test_bow_parity_with_local_numpy(spark):
    mids = [0, 3, 6, 9, 30]
    media = _media_df(spark, mids)
    vocab = seed_vocabulary(image_descriptors(media), seed_mod=30)
    got = {(r["media_id"], r["word"]): r["cnt"]
           for r in bow_histograms(media, vocab).collect()}
    want: dict[tuple[int, int], int] = {}
    for m in mids:
        for _, d in grid_patch_descriptors(synth_pixel_array(m), 2):
            dist = ((vocab.astype(np.float64)
                     - d.astype(np.float64)) ** 2).sum(axis=1)
            w = int(dist.argmin())
            want[(m, w)] = want.get((m, w), 0) + 1
    assert got == want


def test_seed_vocabulary_empty_slice_raises(spark):
    media = _media_df(spark, [3, 6])  # nothing at %30==0
    with pytest.raises(ValueError):
        seed_vocabulary(image_descriptors(media), seed_mod=30)


def test_build_vocabulary_kmeans(spark):
    media = _media_df(spark, [0, 3, 6, 9, 12, 15])
    cents = build_vocabulary(image_descriptors(media), k=3, seed=7)
    assert cents.shape == (3, 4)
    assert np.isfinite(cents).all()
