"""PNG codec tests — pure zlib+numpy implementation (kgp.multimodal).

The decoder is checked against a HAND-FILTERED spec fixture (not just
round-trips with our own encoder), and the encoder against the filter
cycle contract."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from kgp.multimodal import (PNG_MAGIC, _png_chunk, decode_image,
                            decode_png, encode_png, synth_pixel_array)


def test_round_trip_all_filters():
    # h >= 5 exercises every filter type in the row cycle
    for mid in [0, 3, 9, 27, 120, 333]:
        img = synth_pixel_array(mid)
        if img.shape[0] < 5:
            img = np.tile(img, (3, 1, 1))[:6]
        assert decode_png(encode_png(img)).tolist() == img.tolist()


def test_round_trip_random_content():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def _hand_png(color: int, bpp: int, rows: list[bytes], w: int,
              h: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(rows))
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def test_decoder_against_hand_filtered_fixture():
    """Spec check: Sub/Up/Average/Paeth filtered bytes computed BY
    HAND for a 2x2 RGB image px = [[(10,20,30),(40,60,80)],
    [(15,25,35),(55,75,95)]]."""
    # row 0, filter 1 (Sub):  (10,20,30), (40-10, 60-20, 80-30)
    r0 = bytes([1, 10, 20, 30, 30, 40, 50])
    # row 1, filter 2 (Up):   (15-10, 25-20, 35-30), (55-40, 75-60, 95-80)
    r1 = bytes([2, 5, 5, 5, 15, 15, 15])
    png = _hand_png(2, 3, [r0, r1], 2, 2)
    exp = [[[10, 20, 30], [40, 60, 80]], [[15, 25, 35], [55, 75, 95]]]
    assert decode_png(png).tolist() == exp

    # Average + Paeth fixture, same target pixels
    # row 0 Average: left/up = 0 -> (10,20,30); x1: pred=(10+0)//2 etc.
    r0a = bytes([3, 10, 20, 30, 40 - 5, 60 - 10, 80 - 15])
    # row 1 Paeth: x0 pred = up (a=0,b=up,c=0 -> b); x1 pred: a=left
    # (15,25,35), b=up (40,60,80), c=upleft (10,20,30);
    # p = a+b-c = (45,65,85); pa=(30,40,50), pb=(5,5,5), pc=(35,45,55)
    # -> b wins -> pred = (40,60,80)
    r1a = bytes([4, 5, 5, 5, 15, 15, 15])
    assert decode_png(_hand_png(2, 3, [r0a, r1a], 2, 2)).tolist() == exp


def test_rgba_alpha_dropped_and_gray_stacked():
    rgba_row = bytes([0, 1, 2, 3, 255, 4, 5, 6, 128])
    png = _hand_png(6, 4, [rgba_row], 2, 1)
    assert decode_png(png).tolist() == [[[1, 2, 3], [4, 5, 6]]]
    gray = _hand_png(0, 1, [bytes([0, 9, 200])], 2, 1)
    assert decode_png(gray).tolist() == [[[9, 9, 9], [200, 200, 200]]]


def test_honest_limits():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)   # palette
    png = PNG_MAGIC + _png_chunk(b"IHDR", ihdr) \
        + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(png)
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG!")


def test_decode_image_sniffs_png():
    img = synth_pixel_array(6)
    assert (decode_image(encode_png(img)) == img).all()
