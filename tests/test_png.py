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


def test_malformed_inputs_raise():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)   # palette
    png = PNG_MAGIC + _png_chunk(b"IHDR", ihdr) \
        + _png_chunk(b"IEND", b"")                        # no PLTE
    with pytest.raises(ValueError):
        decode_png(png)
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG!")
    bad = struct.pack(">IIBBBBB", 2, 1, 16, 3, 0, 0, 0)   # 16-bit pal
    with pytest.raises(ValueError):
        decode_png(PNG_MAGIC + _png_chunk(b"IHDR", bad)
                   + _png_chunk(b"IEND", b""))


def _full_png(w: int, h: int, depth: int, color: int,
              rows: list[bytes], interlace: int = 0,
              plte: bytes | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       interlace)
    out = PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(b"".join(rows))) \
        + _png_chunk(b"IEND", b"")


def test_palette_8bit():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    rows = [bytes([0, 3, 0, 1]), bytes([0, 2, 2, 3])]
    out = decode_png(_full_png(3, 2, 8, 3, rows, plte=plte))
    assert out.tolist() == [[[7, 8, 9], [255, 0, 0], [0, 255, 0]],
                            [[0, 0, 255], [0, 0, 255], [7, 8, 9]]]


def test_palette_4bit_odd_width_padding_bits():
    # w=3 at 4 bpp -> 2 bytes/row, low nibble of byte 2 is padding
    plte = bytes(
        [10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42])
    rows = [bytes([0, 0x01, 0x20]),     # idx 0,1,2 (+pad)
            bytes([0, 0x33, 0x10])]     # idx 3,3,1 (+pad)
    out = decode_png(_full_png(3, 2, 4, 3, rows, plte=plte))
    assert out.tolist() == [
        [[10, 11, 12], [20, 21, 22], [30, 31, 32]],
        [[40, 41, 42], [40, 41, 42], [20, 21, 22]]]


def test_palette_index_out_of_range_raises():
    plte = bytes([1, 2, 3])                       # one entry
    rows = [bytes([0, 0x05])]                     # index 5
    with pytest.raises(ValueError):
        decode_png(_full_png(1, 1, 8, 3, rows, plte=plte))


def test_gray_1bit_and_2bit():
    # 1-bit, w=10 -> 2 bytes/row; bits 1010 1010 11xx xxxx
    rows = [bytes([0, 0b10101010, 0b11000000])]
    out = decode_png(_full_png(10, 1, 1, 0, rows))
    exp = [255, 0, 255, 0, 255, 0, 255, 0, 255, 255]
    assert out[:, :, 0].tolist() == [exp]
    assert (out[:, :, 0] == out[:, :, 2]).all()
    # 2-bit: samples 0..3 widen by 85
    rows = [bytes([0, 0b00011011])]               # 0,1,2,3
    out = decode_png(_full_png(4, 1, 2, 0, rows))
    assert out[0, :, 1].tolist() == [0, 85, 170, 255]


def test_gray_alpha_and_16bit_narrowing():
    # gray+alpha 8-bit: alpha dropped
    rows = [bytes([0, 33, 200, 77, 0])]
    out = decode_png(_full_png(2, 1, 8, 4, rows))
    assert out.tolist() == [[[33, 33, 33], [77, 77, 77]]]
    # 16-bit RGB: round(v/257) — 257->1, 128->0, 129->1, 65535->255
    px = struct.pack(">HHHHHH", 257, 128, 129, 65535, 0, 513)
    out = decode_png(_full_png(2, 1, 16, 2, [bytes([0]) + px]))
    assert out.tolist() == [[[1, 0, 1], [255, 0, 2]]]
    # 16-bit gray with a Sub filter (filter bpp = 2 bytes)
    row = bytes([1]) + struct.pack(">HH", 0x0102, 0x0101)
    out = decode_png(_full_png(2, 1, 16, 0, [row]))
    # second sample = 0x0102 + 0x0101 (bytewise mod-256 sums)
    assert out[0, 1, 0] == round((0x0203) / 257)


def _adam7_rows(px: np.ndarray, depth: int = 8) -> list[bytes]:
    """Reference interlacer: emit each Adam7 pass's scanlines with
    filter 0 (independent of the decoder's pass math beyond the spec
    offsets)."""
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    rows = []
    for sx, sy, dx, dy in passes:
        sub = px[sy::dy, sx::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in range(sub.shape[0]):
            rows.append(bytes([0]) + sub[r].astype(np.uint8).tobytes())
    return rows


def test_adam7_interlaced_rgb():
    rng = np.random.RandomState(3)
    for shape in [(7, 5), (8, 8), (1, 1), (2, 3), (16, 9)]:
        px = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
        png = _full_png(shape[1], shape[0], 8, 2, _adam7_rows(px),
                        interlace=1)
        assert decode_png(png).tolist() == px.tolist()


def test_adam7_interlaced_palette_4bit():
    # sub-byte interlaced: each pass packs its OWN rows to byte
    # boundaries
    plte = b"".join(bytes([i * 16, i * 16 + 1, i * 16 + 2])
                    for i in range(16))
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 16, size=(5, 3), dtype=np.uint8)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    rows = []
    for sx, sy, dx, dy in passes:
        sub = idx[sy::dy, sx::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in range(sub.shape[0]):
            vals = sub[r]
            packed = bytearray()
            for i in range(0, len(vals), 2):
                hi = int(vals[i]) << 4
                lo = int(vals[i + 1]) if i + 1 < len(vals) else 0
                packed.append(hi | lo)
            rows.append(bytes([0]) + bytes(packed))
    png = _full_png(3, 5, 4, 3, rows, interlace=1, plte=plte)
    exp = np.array([[[v * 16, v * 16 + 1, v * 16 + 2] for v in row]
                    for row in idx.tolist()])
    assert decode_png(png).tolist() == exp.tolist()


def test_decode_image_sniffs_png():
    img = synth_pixel_array(6)
    assert (decode_image(encode_png(img)) == img).all()
