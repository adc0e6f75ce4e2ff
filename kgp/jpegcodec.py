"""JPEG codec — pure numpy, no external libraries.

A REAL Huffman JFIF implementation (ITU-T T.81), baseline sequential
AND progressive:

- encoder: grayscale or RGB (4:4:4 or 4:2:0, BT.601 YCbCr), Annex K
  quantization tables with IJG quality scaling, Annex K standard
  Huffman tables, byte stuffing, deterministic output; SOF0 baseline
  or SOF2 progressive with the IJG default scan script (spectral
  selection + successive approximation, EOB runs);
- decoder: baseline (SOF0/SOF1) and progressive (SOF2) streams —
  grayscale, 4:4:4 and 2x1/1x2/2x2-subsampled color, DRI/RSTn restart
  markers, multi-scan coefficient accumulation with DC/AC first and
  refinement passes; arithmetic coding and hierarchical/lossless SOFs
  raise NotImplementedError (honest limit).

Exactness contract used by the png/jpeg driver gates: an image whose
every 8x8 tile is CONSTANT has all AC energy exactly zero up to float
noise far below the quantization step, so with the all-ones
quantization table the decoded grayscale equals the input EXACTLY
(DC = 8*(v-128) is integer; quantize/dequantize/IDCT invert it
bit-for-bit). tests/test_jpeg.py pins that and the lossy-path PSNR.

Spark mapping: like the PNG/BMP codecs this runs inside mapInPandas
batches (kgp.multimodal.decode_image sniffs JPEG magic); payloads
stay binary columns.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------- constant tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 — example quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K.3 — standard Huffman tables: (BITS[1..16], HUFFVAL)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# Progressive AC scans need EOBn symbols (0x10..0xE0) that the Annex
# K sequential tables do not contain — libjpeg solves this with
# per-scan optimized Huffman tables; we use one FLAT table instead:
# all 255 symbols at 8 bits (canonical codes 0..254; the all-ones
# 8-bit code stays unused per T.81 C.2). ~Kraft 255/256, legal
# everywhere, ~1.5x the optimized size — correctness over compression.
HT_AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0],
              list(range(255)))

# orthonormal 8-point DCT-II matrix: F = _DCT @ block @ _DCT.T
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_DCT[0, :] = 1.0 / (2.0 * np.sqrt(2.0))


def quality_tables(quality: int = 75
                   ) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (libjpeg
    jcparam.c:jpeg_quality_scaling semantics, public algorithm)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(QT_LUMA), s(QT_CHROMA)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol -> (code, length) per T.81 Annex C canonical assignment."""
    out: dict[int, tuple] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) -> symbol for the decoder."""
    enc = _build_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def pad_align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)

    def marker(self, byte: int) -> None:
        self.pad_align()
        self.out += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(_mag_bits(diff, s), s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]           # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[run * 16 + s]
        bw.write(code, ln)
        bw.write(_mag_bits(v, s), s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]               # EOB
        bw.write(code, ln)
    return dc


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


# ----------------------------------------- progressive scan encoders
# T.81 Annex G / the public libjpeg jcphuff.c algorithms. The scan
# script below is the IJG default (jcparam.c jpeg_simple_progression):
# DC first at Al=1, luma AC split 1-5/6-63 at Al=2, chroma AC at Al=1,
# then the successive-approximation refinement scans, DC refine last
# among the firsts. Each tuple: (component indices, Ss, Se, Ah, Al).


def _prog_script(ncomp: int) -> list[tuple]:
    if ncomp == 1:
        return [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0)]


class _AcProgState:
    """EOB-run + buffered-correction-bit state shared across the
    blocks of one AC scan (the run and its correction bits span
    blocks and flush together)."""

    def __init__(self, bw: _BitWriter, ac_codes: dict):
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.bits: list[int] = []

    def flush_eobrun(self) -> None:
        """Emit the pending EOBn symbol, then the correction bits the
        run carried (jcphuff.c emit_eobrun: a no-op when no run is
        pending — buffered bits then wait for the next symbol)."""
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.bits:
                self.bw.write(b, 1)
            self.bits = []


def _encode_ac_first(st: _AcProgState, zz: np.ndarray, ss: int,
                     se: int, al: int) -> None:
    bw, ac = st.bw, st.ac
    run = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        v = (-((-t) >> al)) if t < 0 else (t >> al)   # toward zero
        if v == 0:
            run += 1
            continue
        st.flush_eobrun()
        while run > 15:
            code, ln = ac[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac[run * 16 + s]
        bw.write(code, ln)
        bw.write(_mag_bits(v, s), s)
        run = 0
    if run > 0:                 # block ends in zeros: join the EOB run
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _encode_ac_refine(st: _AcProgState, zz: np.ndarray, ss: int,
                      se: int, al: int) -> None:
    """jcphuff.c encode_mcu_AC_refine ordering: each emitted symbol is
    followed first by its sign/extra bits, THEN by the correction bits
    buffered since the previous symbol; correction bits at a block's
    tail travel with the EOB run and flush after the EOBn symbol."""
    bw, ac = st.bw, st.ac
    absv = []
    eob = ss - 1                          # last NEW nonzero (absv == 1)
    for k in range(ss, se + 1):
        t = int(zz[k])
        a = (-t if t < 0 else t) >> al
        absv.append(a)
        if a == 1:
            eob = k
    run = 0
    pending: list[int] = []               # correction bits this block
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            st.flush_eobrun()
            code, ln = ac[0xF0]
            bw.write(code, ln)
            run -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:                         # history coef: correction bit
            pending.append(t & 1)
            continue
        st.flush_eobrun()
        code, ln = ac[run * 16 + 1]
        bw.write(code, ln)
        bw.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        st.eobrun += 1
        st.bits.extend(pending)           # carried with the EOB run
        if st.eobrun == 0x7FFF or len(st.bits) > 900:
            st.flush_eobrun()


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)),
                   0, 255).astype(np.uint8)


def ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y = img[..., 0].astype(np.float64)
    cb = img[..., 1].astype(np.float64) - 128.0
    cr = img[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, hh: int, ww: int) -> np.ndarray:
    ph, pw = hh - plane.shape[0], ww - plane.shape[1]
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _block_grid(plane: np.ndarray, rows: int, cols: int,
                qt: np.ndarray) -> np.ndarray:
    """plane (rows*8 x cols*8) -> (rows, cols, 64) quantized zigzag."""
    blocks = (plane.reshape(rows, 8, cols, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    f = np.einsum("ux,nxy,vy->nuv", _DCT, blocks - 128.0, _DCT)
    q = qt.reshape(8, 8).astype(np.float64)
    zz = np.round(f / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
    return zz.reshape(rows, cols, 64)


def _scan_block_order(comps_idx: list[int], samp: list[tuple],
                      mcux: int, mcuy: int, ndims: list[tuple]):
    """Yield (ci, row, col) in scan order: interleaved MCU traversal
    over the padded grid for multi-component scans, the component's
    own (non-MCU-padded) grid for single-component scans — T.81 A.2."""
    if len(comps_idx) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in comps_idx:
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            yield ci, my * vs + by, mx * hs + bx
    else:
        ci = comps_idx[0]
        nr, nc = ndims[ci]
        for r in range(nr):
            for c in range(nc):
                yield ci, r, c


def encode_jpeg(img: np.ndarray, quality: int = 75,
                qt_override: np.ndarray | None = None,
                subsample: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """HxW uint8 grayscale or HxWx3 uint8 RGB -> baseline JFIF bytes.
    subsample: '444' (default) or '420' (2x2 box-averaged chroma);
    restart_interval emits DRI + RSTn markers every k MCUs (baseline
    only); qt_override forces ONE table for every component (the
    all-ones table makes tile-constant grayscale exactly losslessly
    round-trippable — see module docstring). progressive=True emits
    SOF2 with the IJG default scan script (spectral selection +
    successive approximation); the quantized coefficients are
    IDENTICAL to the baseline encoding, so both decode to the same
    pixels — the exactness contract the tests pin."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l, qt_c = quality_tables(quality)
    if qt_override is not None:
        qt_l = qt_c = np.asarray(qt_override, dtype=np.int32).reshape(64)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(img)
        y = ycc[..., 0].astype(np.float64)
        cb = ycc[..., 1].astype(np.float64)
        cr = ycc[..., 2].astype(np.float64)
        if subsample == "420":
            he, we = -h % 2, -w % 2
            cb = _pad_to(cb, h + he, w + we)
            cr = _pad_to(cr, h + he, w + we)
            cb = cb.reshape((h + he) // 2, 2, (w + we) // 2, 2) \
                .mean(axis=(1, 3))
            cr = cr.reshape((h + he) // 2, 2, (w + we) // 2, 2) \
                .mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise NotImplementedError(f"subsample {subsample!r}")
        planes = [y, cb, cr]
    ncomp = len(planes)
    qts = [qt_l] if gray else [qt_l, qt_c, qt_c]
    tq = [0] if gray else [0, 1, 1]
    td_ta = [(0, 0)] if gray else [(0, 0), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                           # APP0
    out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
            + bytes(qt_l[ZIGZAG].astype(np.uint8)))    # DQT 0
    if not gray:
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([1])
                + bytes(qt_c[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, samp[ci][0] * 16 + samp[ci][1], tq[ci]])
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0x00, *HT_DC_LUMA)
    out += _dht_segment(0x10, *HT_AC_LUMA)
    if not gray:
        out += _dht_segment(0x01, *HT_DC_CHROMA)
        out += _dht_segment(0x11, *HT_AC_CHROMA)

    dc_tabs = [_build_codes(*HT_DC_LUMA), _build_codes(*HT_DC_CHROMA)]
    ac_tabs = [_build_codes(*HT_AC_LUMA), _build_codes(*HT_AC_CHROMA)]
    grids = []
    for ci in range(ncomp):
        hs, vs = samp[ci]
        rows, cols = mcuy * vs, mcux * hs
        plane = _pad_to(planes[ci], rows * 8, cols * 8)
        grids.append(_block_grid(plane, rows, cols, qts[ci]))

    if progressive:
        # redefine the AC tables with the flat EOBn-capable table
        # (DHT redefinition mid-stream is standard; DC stays Annex K)
        out += _dht_segment(0x10, *HT_AC_FLAT)
        if not gray:
            out += _dht_segment(0x11, *HT_AC_FLAT)
        flat = _build_codes(*HT_AC_FLAT)
        ac_tabs = [flat, flat]
        ndims = []
        for ci in range(ncomp):
            hs, vs = samp[ci]
            cw, ch = -(-w * hs // hmax), -(-h * vs // vmax)
            ndims.append((-(-ch // 8), -(-cw // 8)))
        for comps_idx, ss, se, ah, al in _prog_script(ncomp):
            sos = bytes([len(comps_idx)])
            for ci in comps_idx:
                d, a = td_ta[ci]
                sos += bytes([ci + 1, d * 16 + a])
            sos += bytes([ss, se, ah * 16 + al])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            bw = _BitWriter()
            if ss == 0 and ah == 0:                       # DC first
                preds = {ci: 0 for ci in comps_idx}
                for ci, r, c in _scan_block_order(
                        comps_idx, samp, mcux, mcuy, ndims):
                    dc = int(grids[ci][r, c][0]) >> al
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    s = _category(diff)
                    code, ln = dc_tabs[td_ta[ci][0]][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(_mag_bits(diff, s), s)
            elif ss == 0:                                 # DC refine
                for ci, r, c in _scan_block_order(
                        comps_idx, samp, mcux, mcuy, ndims):
                    bw.write((int(grids[ci][r, c][0]) >> al) & 1, 1)
            else:                                         # AC scan
                ci = comps_idx[0]
                st = _AcProgState(bw, ac_tabs[td_ta[ci][1]])
                for _, r, c in _scan_block_order(
                        [ci], samp, mcux, mcuy, ndims):
                    if ah == 0:
                        _encode_ac_first(st, grids[ci][r, c], ss, se,
                                         al)
                    else:
                        _encode_ac_refine(st, grids[ci][r, c], ss, se,
                                          al)
                st.flush_eobrun()
            out += bw.flush()
        out += b"\xff\xd9"                                # EOI
        return bytes(out)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        d, a = td_ta[ci]
        sos += bytes([ci + 1, d * 16 + a])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos   # SOS
    bw = _BitWriter()
    preds = [0] * ncomp
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu \
                    and n_mcu % restart_interval == 0:
                bw.marker(0xD0 + rst % 8)
                rst += 1
                preds = [0] * ncomp
            n_mcu += 1
            for ci in range(ncomp):
                hs, vs = samp[ci]
                d, a = td_ta[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = grids[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_tabs[d], ac_tabs[a])
    out += bw.flush()
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ------------------------------------------------------------ decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF   # spec: pad with 1s
                self.n += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0
                if nxt == 0x00:
                    self.pos += 1                   # stuffed
                else:
                    self.pos -= 1                   # marker: stop
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def align(self) -> None:
        self.n -= self.n % 8

    def huff(self, table: dict[tuple, int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _restart_sync(br: _BitReader, preds: dict, state: dict) -> None:
    """Byte-align, consume the RSTn marker, reset DC predictors and
    the EOB run (T.81 E.2.4 / G.2.1)."""
    br.acc = 0
    br.n = 0
    while br.pos + 1 < len(br.data):
        if br.data[br.pos] == 0xFF and br.data[br.pos + 1] != 0x00:
            if 0xD0 <= br.data[br.pos + 1] <= 0xD7:
                br.pos += 2
            break
        br.pos += 1
    for cid in preds:
        preds[cid] = 0
    state["eobrun"] = 0


def _dec_block_seq(br: _BitReader, blk: np.ndarray, dc_tab: dict,
                   ac_tab: dict, preds: dict, cid: int) -> None:
    s = br.huff(dc_tab)
    diff = _extend(br.read(s), s) if s else 0
    preds[cid] += diff
    blk[0] = preds[cid]
    i = 1
    while i < 64:
        rs = br.huff(ac_tab)
        if rs == 0x00:
            break
        if rs == 0xF0:
            i += 16
            continue
        i += rs >> 4
        sz = rs & 0xF
        if i > 63:
            raise ValueError("AC index overflow")
        blk[i] = _extend(br.read(sz), sz)
        i += 1


def _dec_ac_first(br: _BitReader, blk: np.ndarray, ac_tab: dict,
                  ss: int, se: int, al: int, state: dict) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.huff(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:                       # ZRL: 16 zeros
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1    # run includes this block
            if r:
                state["eobrun"] += br.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.read(s), s) << al
        k += 1


def _dec_ac_refine(br: _BitReader, blk: np.ndarray, ac_tab: dict,
                   ss: int, se: int, al: int, state: dict) -> None:
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = br.huff(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r)
                    if r:
                        state["eobrun"] += br.read(r)
                    break
                val = 0                       # ZRL: skip 16 zero-history
            else:                             # s == 1 by spec
                val = p1 if br.read(1) else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:                    # history: correction bit
                    if br.read(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se and val:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:                        # EOB-run correction bits
            c = int(blk[k])
            if c != 0:
                if br.read(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """JFIF -> HxWx3 uint8 RGB (grayscale stacked). Baseline
    sequential (SOF0/SOF1) AND progressive (SOF2) Huffman streams —
    spectral selection, successive approximation, EOB runs, interleaved
    and non-interleaved scans, DRI/RSTn. All scans accumulate into
    per-component coefficient grids; dequantize+IDCT run once,
    vectorized, at the end (so baseline and progressive encodings of
    the same coefficients decode bit-identically). Arithmetic coding
    and hierarchical/lossless SOFs raise (honest limit)."""
    data = bytes(content)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple] = []          # (cid, hs, vs, tq)
    comp_by_id: dict[int, tuple] = {}
    coefs: dict[int, np.ndarray] = {}
    ndims: dict[int, tuple] = {}     # non-interleaved block dims
    h = w = None
    hmax = vmax = mcux = mcuy = 0
    restart = 0
    progressive = False
    saw_scan = False

    def _run_scan(br: _BitReader, scan_comps: list[tuple], ss: int,
                  se: int, ah: int, al: int) -> None:
        preds = {cid: 0 for cid, _, _ in scan_comps}
        state = {"eobrun": 0}

        def block(cid: int, td: int, ta: int, r: int, c: int) -> None:
            blk = coefs[cid][r, c]
            if not progressive:
                _dec_block_seq(br, blk, dc_tabs[td], ac_tabs[ta],
                               preds, cid)
            elif ss == 0 and ah == 0:            # DC first
                s = br.huff(dc_tabs[td])
                diff = _extend(br.read(s), s) if s else 0
                preds[cid] += diff
                blk[0] = preds[cid] << al
            elif ss == 0:                        # DC refine
                if br.read(1):
                    blk[0] |= (1 << al)
            elif ah == 0:
                _dec_ac_first(br, blk, ac_tabs[ta], ss, se, al, state)
            else:
                _dec_ac_refine(br, blk, ac_tabs[ta], ss, se, al, state)

        n_unit = 0
        if len(scan_comps) > 1:                  # interleaved: MCU units
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and n_unit and n_unit % restart == 0:
                        _restart_sync(br, preds, state)
                    n_unit += 1
                    for cid, td, ta in scan_comps:
                        _, hs, vs, _tq = comp_by_id[cid]
                        for by in range(vs):
                            for bx in range(hs):
                                block(cid, td, ta, my * vs + by,
                                      mx * hs + bx)
        else:                                    # one block per unit
            cid, td, ta = scan_comps[0]
            nr, nc = ndims[cid]
            for r in range(nr):
                for c in range(nc):
                    if restart and n_unit and n_unit % restart == 0:
                        _restart_sync(br, preds, state)
                    n_unit += 1
                    block(cid, td, ta, r, c)

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01, 0xFF) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        if pos + 4 > len(data):
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq_id = body[b] >> 4, body[b] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                t = np.frombuffer(body[b + 1:b + 65],
                                  dtype=np.uint8).astype(np.int32)
                qts[tq_id] = t[UNZIGZAG]
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                nv = sum(bits)
                vals = list(body[b + 17:b + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _build_decode(bits, vals)
                b += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq_id = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq_id))
            comp_by_id = {c[0]: c for c in comps}
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, hs, vs, _tq in comps:
                coefs[cid] = np.zeros((mcuy * vs, mcux * hs, 64),
                                      dtype=np.int32)
                cw, ch = -(-w * hs // hmax), -(-h * vs // vmax)
                ndims[cid] = (-(-ch // 8), -(-cw // 8))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential/progressive Huffman JPEG "
                "(SOF0/SOF1/SOF2)")
        elif marker == 0xDD:
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tdta = body[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append((cid, tdta >> 4, tdta & 0xF))
            ss_, se_, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah_, al_ = ahal >> 4, ahal & 0xF
            if not progressive:
                ss_, se_, ah_, al_ = 0, 63, 0, 0
            elif ss_ > 0 and ns > 1:
                raise ValueError("interleaved progressive AC scan")
            entropy_start = pos + 2 + seglen
            br = _BitReader(data[entropy_start:])
            _run_scan(br, scan_comps, ss_, se_, ah_, al_)
            saw_scan = True
            p = entropy_start + br.pos
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] != 0x00 and \
                        not (0xD0 <= data[p + 1] <= 0xD7):
                    break
                p += 1
            pos = p
            continue
        pos += 2 + seglen
    if h is None or not saw_scan:
        raise ValueError("missing SOF/SOS")

    out_planes = []
    for cid, hs, vs, tq_id in comps:
        g = coefs[cid]
        rows, cols = g.shape[0], g.shape[1]
        q = qts[tq_id].astype(np.float64)        # natural order
        nat = g.reshape(-1, 64)[:, UNZIGZAG].astype(np.float64) * q
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("xu,nxy,yv->nuv", _DCT, blocks, _DCT) + 128.0
        plane = (pix.reshape(rows, cols, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8))
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        g8 = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g8, g8, g8], axis=-1)
    ycc = np.clip(np.round(np.stack(out_planes, axis=-1)),
                  0, 255).astype(np.uint8)
    return ycbcr_to_rgb(ycc)


__all__ = ["encode_jpeg", "decode_jpeg", "quality_tables",
           "rgb_to_ycbcr", "ycbcr_to_rgb", "QT_LUMA", "QT_CHROMA",
           "ZIGZAG"]
