"""ImageHandler pixel-op port tests — grayscale truncation, the
white-ignoring channel averages over the full pixel count, subtract /
similarity quirks (integer /255 in MSE), isDuplicate, boxFit/boxCrop
geometry, and the Spark pair stage against the closed-form corpus."""

from __future__ import annotations

import numpy as np
import pytest

from kgp.imageops import (box_crop, box_fit, get_average_blue,
                          get_average_gray, get_average_green,
                          get_average_red, get_similarity, image_dup_stage,
                          is_duplicate, rescale_image, subtract_images,
                          to_gray_scale)
from kgp.multimodal import synth_media, synth_pixel_array


def _img(rows):
    return np.array(rows, dtype=np.uint8)


def test_to_gray_scale_truncates():
    img = _img([[[100, 50, 200]]])
    # 0.3*100 + 0.59*50 + 0.11*200 = 30 + 29.5 + 22 = 81.5 -> 81
    assert tuple(to_gray_scale(img)[0, 0]) == (81, 81, 81)
    white = _img([[[255, 255, 255]]])
    # 0.3*255 + 0.59*255 + 0.11*255 = 255.00000000000003 in IEEE
    # doubles (same left-to-right order as the Java sum) -> int 255
    assert to_gray_scale(white)[0, 0, 0] == 255


def test_average_gray():
    img = _img([[[255, 0, 0], [0, 255, 0]],
                [[0, 0, 255], [10, 10, 10]]])
    grays = [int(0.3 * 255), int(0.59 * 255), int(0.11 * 255),
             int(0.3 * 10 + 0.59 * 10 + 0.11 * 10)]
    assert get_average_gray(img) == pytest.approx(sum(grays) / 4)


def test_average_channels_ignore_white_quirk():
    img = _img([[[255, 255, 255], [100, 50, 20]]])
    # white skipped from the sum but STILL in the denominator
    assert get_average_red(img, ignore_white=True) == \
        pytest.approx(0.3 * 100 / 2)
    assert get_average_green(img, ignore_white=True) == \
        pytest.approx(0.59 * 50 / 2)
    assert get_average_blue(img, ignore_white=True) == \
        pytest.approx(0.11 * 20 / 2)
    assert get_average_red(img, ignore_white=False) == \
        pytest.approx(0.3 * 355 / 2)


def test_subtract_images_width_mismatch_and_min_height():
    a = _img([[[10, 10, 10]], [[20, 20, 20]]])  # 2x1
    b = _img([[[10, 10, 10]]])                  # 1x1
    out = subtract_images(a, b)
    assert tuple(out[0, 0]) == (0, 0, 0)
    assert tuple(out[1, 0]) == (0, 0, 0)  # beyond min height: black
    wide = _img([[[0, 0, 0], [0, 0, 0]]])
    assert subtract_images(a, wide) is a  # width mismatch returns img1


def test_mse_integer_division_quirk():
    # gray delta 255 contributes 1; any smaller delta contributes 0
    black = np.zeros((2, 2, 3), dtype=np.uint8)
    white = np.full((2, 2, 3), 255, dtype=np.uint8)
    grayish = np.full((2, 2, 3), 254, dtype=np.uint8)
    # white gray = 255 (IEEE sum above) -> delta 255 -> contributes 1
    assert get_similarity(black, white, "mse") == 1.0
    # gray(254) = int(254.00000000000003) = 254 -> delta < 255 -> 0
    assert get_similarity(black, grayish, "mse") == 0.0


def test_minkowski_and_diffg():
    black = np.zeros((2, 2, 3), dtype=np.uint8)
    assert get_similarity(black, black, "minkowski") == 1.0
    assert get_similarity(black, black, "diffg") == 1.0
    white = np.full((2, 2, 3), 255, dtype=np.uint8)
    # subtracted gray = 255 (IEEE sum) -> fully different -> 0.0
    assert get_similarity(black, white, "diffg") == 0.0
    assert get_similarity(black, white, "unknown") == 0.0


def test_is_duplicate():
    img = synth_pixel_array(12)
    assert is_duplicate(None, img) is True  # null quirk
    assert is_duplicate(img, img.copy()) is True
    noise = (img.astype(int) + 128).clip(0, 255).astype(np.uint8)
    assert is_duplicate(img, noise) in (True, False)  # just runs


def test_box_fit_geometry():
    img = np.zeros((200, 600, 3), dtype=np.uint8)  # h=200 w=600
    out = box_fit(img, 200, 200)
    assert out.shape[:2] == (round(200 * 200 / 600), 200)  # 67x200
    up = box_fit(np.zeros((10, 20, 3), dtype=np.uint8), 40, 40)
    assert up.shape[:2] == (20, 40)


def test_box_crop_geometry():
    # reference javadoc example 1: 600x200 image into a 200x100 box
    img = np.zeros((200, 600, 3), dtype=np.uint8)
    out = box_crop(img, 200, 100)
    assert out.shape[:2] == (100, 200)
    # example 2: 100x400 (wxh) into 200x100
    img2 = np.zeros((400, 100, 3), dtype=np.uint8)
    out2 = box_crop(img2, 200, 100)
    assert out2.shape[:2] == (100, 200)
    # no crop when image already fits
    small = np.zeros((50, 50, 3), dtype=np.uint8)
    assert box_crop(small, 50, 50).shape[:2] == (50, 50)


def test_rescale_nearest_is_deterministic():
    img = synth_pixel_array(30)
    a = rescale_image(img, 5, 5)
    b = rescale_image(img, 5, 5)
    assert (a == b).all()


def test_image_dup_stage_matches_twin(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200)
    media = synth_media(spark, docs)
    got = {(r["id_a"], r["id_b"]): (r["diffg"], r["is_dup"])
           for r in image_dup_stage(media, shift=39).collect()}
    assert got
    for (ia, ib), (diffg, dup) in list(got.items())[:20]:
        i1, i2 = synth_pixel_array(ia), synth_pixel_array(ib)
        want = get_similarity(i1, i2, "diffg")
        assert diffg == pytest.approx(want)
        assert dup == (want > 0.82)


# --------------------------------------------------------- gaussian blur

def test_gaussian_kernel_reference_shape():
    from kgp.imageops import gaussian_kernel
    k = gaussian_kernel(3)
    assert len(k) == 7
    assert k.sum() == pytest.approx(1.0, abs=1e-6)
    assert k[3] == k.max()                    # centered
    assert np.allclose(k, k[::-1])            # symmetric
    with pytest.raises(ValueError):
        gaussian_kernel(0)


def test_gaussian_blur_uniform_invariant():
    from kgp.imageops import gaussian_blur
    flat = np.full((9, 14, 3), 77, dtype=np.uint8)
    out = gaussian_blur(flat, 4)
    assert out.shape == flat.shape
    # replicate padding keeps a uniform image exactly uniform,
    # including the corners (the extend fills corners too)
    assert (out == 77).all()


def test_gaussian_blur_smooths_and_conserves_roughly():
    from kgp.imageops import gaussian_blur
    img = np.zeros((11, 11, 3), dtype=np.uint8)
    img[5, 5] = 255
    out = gaussian_blur(img, 2)
    assert out[5, 5, 0] == out.max()
    assert out[5, 4, 0] > 0 and out[0, 0, 0] == 0
    # variance strictly drops
    assert out[:, :, 0].astype(float).var() < \
        img[:, :, 0].astype(float).var()


def test_gaussian_blur_edge_vs_interior():
    from kgp.imageops import gaussian_blur
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    out1 = gaussian_blur(img, 3)
    out2 = gaussian_blur(img, 3)
    assert (out1 == out2).all()  # deterministic
