"""Baseline JPEG codec — pure numpy, no external libraries.

A REAL sequential-DCT baseline JFIF implementation (ITU-T T.81):

- encoder: grayscale or RGB (4:4:4, BT.601 YCbCr), Annex K
  quantization tables with IJG quality scaling, Annex K standard
  Huffman tables, byte stuffing, deterministic output;
- decoder: baseline Huffman streams — grayscale, 4:4:4 and 2x1/1x2/
  2x2-subsampled color, DRI/RSTn restart markers; progressive or
  arithmetic coding raises NotImplementedError (honest limit).

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


def encode_jpeg(img: np.ndarray, quality: int = 75,
                qt_override: np.ndarray | None = None,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """HxW uint8 grayscale or HxWx3 uint8 RGB -> baseline JFIF bytes.
    subsample: '444' (default) or '420' (2x2 box-averaged chroma);
    restart_interval emits DRI + RSTn markers every k MCUs;
    qt_override forces ONE table for every component (the all-ones
    table makes tile-constant grayscale exactly losslessly
    round-trippable — see module docstring)."""
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
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof  # SOF0
    out += _dht_segment(0x00, *HT_DC_LUMA)
    out += _dht_segment(0x10, *HT_AC_LUMA)
    if not gray:
        out += _dht_segment(0x01, *HT_DC_CHROMA)
        out += _dht_segment(0x11, *HT_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        d, a = td_ta[ci]
        sos += bytes([ci + 1, d * 16 + a])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos   # SOS

    dc_tabs = [_build_codes(*HT_DC_LUMA), _build_codes(*HT_DC_CHROMA)]
    ac_tabs = [_build_codes(*HT_AC_LUMA), _build_codes(*HT_AC_CHROMA)]
    grids = []
    for ci in range(ncomp):
        hs, vs = samp[ci]
        rows, cols = mcuy * vs, mcux * hs
        plane = _pad_to(planes[ci], rows * 8, cols * 8)
        grids.append(_block_grid(plane, rows, cols, qts[ci]))
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


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JFIF -> HxWx3 uint8 RGB (grayscale stacked)."""
    data = bytes(content)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = []           # (cid, hs, vs, tq)
    h = w = None
    scan_comps = []
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
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
        elif marker == 0xC0 or marker == 0xC1:
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq_id = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq_id))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1)")
        elif marker == 0xDD:
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tdta = body[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append((cid, tdta >> 4, tdta & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if h is None or not scan_comps:
        raise ValueError("missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data[pos:])
    planes: dict[int, np.ndarray] = {}
    dims: dict[int, tuple] = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8),
                               dtype=np.float64)
        dims[cid] = (hs, vs)
    preds = {cid: 0 for cid, *_ in comps}
    comp_by_id = {c[0]: c for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align()
                # consume RSTn marker (FF D0-D7)
                while br.pos < len(br.data) and \
                        br.data[br.pos] == 0xFF and \
                        0xD0 <= br.data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                    break
                br.acc = 0
                br.n = 0
                preds = {cid: 0 for cid, *_ in comps}
            n_mcu += 1
            for cid, td, ta in scan_comps:
                _, hs, vs, tq_id = comp_by_id[cid]
                q = qts[tq_id].reshape(8, 8).astype(np.float64)
                for by in range(vs):
                    for bx in range(hs):
                        s = br.huff(dc_tabs[td])
                        diff = _extend(br.read(s), s) if s else 0
                        preds[cid] += diff
                        zz = np.zeros(64, dtype=np.float64)
                        zz[0] = preds[cid]
                        i = 1
                        while i < 64:
                            rs = br.huff(ac_tabs[ta])
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                i += 16
                                continue
                            i += rs >> 4
                            sz = rs & 0xF
                            if i > 63:
                                raise ValueError("AC index overflow")
                            zz[i] = _extend(br.read(sz), sz)
                            i += 1
                        blk = (zz[UNZIGZAG].reshape(8, 8)) * q
                        pix = _DCT.T @ blk @ _DCT + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = pix

    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    ycc = np.clip(np.round(np.stack(out_planes, axis=-1)),
                  0, 255).astype(np.uint8)
    return ycbcr_to_rgb(ycc)


__all__ = ["encode_jpeg", "decode_jpeg", "quality_tables",
           "rgb_to_ycbcr", "ycbcr_to_rgb", "QT_LUMA", "QT_CHROMA",
           "ZIGZAG"]
