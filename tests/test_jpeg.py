"""Baseline JPEG codec (kgp.jpegcodec) — exactness contract on
tile-constant grayscale, lossy-path PSNR floors, subsampling,
restart markers, honest limits."""

from __future__ import annotations

import numpy as np
import pytest

from kgp.jpegcodec import (decode_jpeg, encode_jpeg, quality_tables,
                           rgb_to_ycbcr, ycbcr_to_rgb)
from kgp.multimodal import decode_image


def _smooth(h=40, w=56):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([(xx * 3 + yy * 2) % 256, (xx + yy) % 256,
                     (xx * 2) % 256], -1).astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_tile_constant_gray_exact_with_unit_qt():
    """Module-docstring contract: constant 8x8 tiles + all-ones quant
    table -> bit-exact grayscale round trip."""
    rng = np.random.RandomState(3)
    tiles = rng.randint(0, 256, size=(5, 7))
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1) \
        .astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, qt_override=np.ones(64, int)))
    assert (dec[:, :, 0] == img).all()
    assert (dec[:, :, 0] == dec[:, :, 1]).all()       # gray stacked


def test_psnr_floors_and_quality_order():
    img = _smooth()
    p90 = _psnr(decode_jpeg(encode_jpeg(img, 90)), img)
    p50 = _psnr(decode_jpeg(encode_jpeg(img, 50)), img)
    assert p90 > 45 and p50 > 38
    assert p90 > p50                                  # quality ladder
    assert len(encode_jpeg(img, 50)) < len(encode_jpeg(img, 90))


def test_determinism():
    img = _smooth(24, 32)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)


def test_subsampling_420_and_restart_markers():
    img = _smooth()
    for sub in ("444", "420"):
        for rst in (0, 2, 5):
            dec = decode_jpeg(encode_jpeg(img, 90, subsample=sub,
                                          restart_interval=rst))
            assert dec.shape == img.shape
            assert _psnr(dec, img) > 40
    # 420 stream really is subsampled: smaller at equal quality
    assert len(encode_jpeg(img, 90, subsample="420")) < \
        len(encode_jpeg(img, 90, subsample="444"))


def test_odd_dimensions_and_gray_input():
    rng = np.random.RandomState(11)
    odd = rng.randint(0, 256, size=(13, 21, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, 85)).shape == (13, 21, 3)
    g = rng.randint(0, 256, size=(9, 10), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(g, 85)).shape == (9, 10, 3)


def test_color_convert_round_trip_bounds():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    back = ycbcr_to_rgb(rgb_to_ycbcr(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_quality_tables_monotone():
    l50, c50 = quality_tables(50)
    l90, _ = quality_tables(90)
    assert (l90 <= l50).all() and l50.min() >= 1 and c50.max() <= 255


def test_honest_limits_and_sniff():
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTJPEG")
    # arithmetic-coded SOF (C9) raises NotImplementedError
    img = _smooth(8, 8)
    data = bytearray(encode_jpeg(img, 80))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    # decode_image sniffs JFIF magic
    out = decode_image(encode_jpeg(img, 90))
    assert out.shape == (8, 8, 3)


# ------------------------------------------------------- progressive


def test_progressive_decodes_identical_to_baseline():
    """The progressive scan script transmits the SAME quantized
    coefficients as the baseline scan, so both decode bit-identically
    — every DC/AC first + refinement path must be exact for this to
    hold."""
    rng = np.random.RandomState(11)
    for shape, gray, sub in [((16, 24), True, "444"),
                             ((17, 9), True, "444"),
                             ((16, 16), False, "444"),
                             ((18, 22), False, "420"),
                             ((8, 8), False, "444"),
                             ((40, 33), False, "420")]:
        if gray:
            img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        else:
            img = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
        for q in (40, 75, 92):
            base = encode_jpeg(img, q, subsample=sub)
            prog = encode_jpeg(img, q, subsample=sub, progressive=True)
            assert prog[:2] == b"\xff\xd8" and b"\xff\xc2" in prog
            assert (decode_jpeg(prog) == decode_jpeg(base)).all(), \
                (shape, gray, sub, q)


def test_progressive_scan_count():
    gray2d = _smooth(16, 16)[:, :, 0]
    gray = encode_jpeg(gray2d, 80, progressive=True)
    color = encode_jpeg(_smooth(16, 16), 80, progressive=True)
    assert gray.count(b"\xff\xda") == 6       # IJG gray script
    assert color.count(b"\xff\xda") == 10     # IJG color script


def test_progressive_tile_constant_gray_exact_unit_qt():
    # the lossless contract holds through the progressive path too:
    # successive approximation must reassemble every coefficient bit
    v = np.repeat(np.repeat(
        np.arange(12, dtype=np.uint8).reshape(3, 4) * 20 + 8,
        8, axis=0), 8, axis=1)
    ones = np.ones(64, dtype=np.int32)
    data = encode_jpeg(v, qt_override=ones, progressive=True)
    out = decode_jpeg(data)
    assert (out[:, :, 0] == v).all()


def test_progressive_via_decode_image_sniff():
    img = _smooth(9, 13)
    prog = encode_jpeg(img, 85, progressive=True)
    assert (decode_image(prog) == decode_jpeg(prog)).all()
