"""Minimal REAL MP4 (ISO BMFF) muxer/demuxer for MJPEG video tracks.

Pure-python ISO/IEC 14496-12 box structure — no external libraries:

- ``encode_mp4_mjpeg``: frames (each a numpy image) → a valid MP4
  with ftyp/mdat/moov, one 'jpeg'-sample-entry video track and full
  stts/stsc/stsz/stco sample tables; every frame payload is a REAL
  baseline JPEG from kgp.jpegcodec.
- ``parse_mp4``: box-tree walk extracting movie timescale/duration,
  track dimensions and the per-sample (offset, size, ts) table.
- ``iter_frames``: demux + JPEG-decode each sample.

This closes the video third of the multimodal codec family: the MP4
*container* and the MJPEG *codec* are handled for real; compressed
codecs (H.264 etc.) are out of scope for a no-native-libs container
and raise NotImplementedError at the sample-entry check.

Spark mapping: kgp.multimodal.sample_frames sniffs the ftyp box and
demuxes real frames inside its mapInPandas pass.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int,
          body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version,
                                    flags.to_bytes(3, "big")) + body)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                            0, 0, 0x40000000)


def encode_mp4_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90,
                     qt_override: np.ndarray | None = None) -> bytes:
    """frames (HxW gray or HxWx3 RGB uint8, equal dims) → MP4 bytes
    with one MJPEG video track ('jpeg' sample entry, QuickTime-style
    fourcc). Deterministic for fixed inputs."""
    from kgp.jpegcodec import encode_jpeg
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality, qt_override=qt_override)
             for f in frames]
    sizes = [len(j) for j in jpegs]
    timescale = 1000
    sample_delta = timescale // fps
    duration = sample_delta * len(frames)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isommp41")
    # mdat follows ftyp; sample offsets are absolute file offsets
    mdat_payload = b"".join(jpegs)
    mdat = _box(b"mdat", mdat_payload)
    mdat_start = len(ftyp) + 8
    offsets = []
    off = mdat_start
    for s in sizes:
        offsets.append(off)
        off += s

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x10000, 0x100) + b"\x00" * 10
        + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 16
        + _UNITY_MATRIX + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0))            # lang 'und'
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"MJPEG\x00")
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg", b"\x00" * 6 + struct.pack(">H", 1)   # data_ref_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)      # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1) # frame count
        + b"\x05MJPEG" + b"\x00" * 26                 # compressor name
        + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(
        ">III", 1, len(frames), sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(
        ">II", 0, len(sizes)) + b"".join(
        struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(
        ">I", len(offsets)) + b"".join(
        struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int
          ) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_end) for each box in range."""
    pos = start
    while pos + 8 <= end:
        size, fourcc = struct.unpack_from(">I4s", data, pos)
        if size == 1:      # 64-bit largesize
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:    # to end of file
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError("corrupt box structure")
        yield fourcc, body, pos + size
        pos += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf"}


def parse_mp4(content: bytes) -> dict:
    """→ {timescale, duration_ms, width, height, codec, samples:
    [(offset, size, ts_ms)]}. Raises NotImplementedError for
    non-'jpeg' sample entries (compressed codecs need native libs)."""
    data = bytes(content)
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")
    info: dict = {"samples": []}
    stts_entries: list[tuple[int, int]] = []
    sizes: list[int] = []
    offsets: list[int] = []

    def visit(start: int, end: int) -> None:
        for fourcc, b, e in _walk(data, start, end):
            if fourcc in _CONTAINERS:
                visit(b, e)
            elif fourcc == b"mvhd":
                ver = data[b]
                if ver == 0:
                    ts, dur = struct.unpack_from(">II", data, b + 12)
                else:
                    ts = struct.unpack_from(">I", data, b + 20)[0]
                    dur = struct.unpack_from(">Q", data, b + 24)[0]
                info["timescale"] = ts
                info["duration_ms"] = int(dur * 1000 // max(ts, 1))
            elif fourcc == b"tkhd":
                info["width"] = struct.unpack_from(
                    ">I", data, e - 8)[0] >> 16
                info["height"] = struct.unpack_from(
                    ">I", data, e - 4)[0] >> 16
            elif fourcc == b"stsd":
                fcc = data[b + 12:b + 16]
                info["codec"] = fcc.decode("ascii", "replace")
                if fcc != b"jpeg":
                    raise NotImplementedError(
                        f"sample entry {info['codec']!r}: compressed "
                        "codecs need native libraries")
            elif fourcc == b"stts":
                n = struct.unpack_from(">I", data, b + 4)[0]
                for i in range(n):
                    cnt, delta = struct.unpack_from(
                        ">II", data, b + 8 + 8 * i)
                    stts_entries.append((cnt, delta))
            elif fourcc == b"stsz":
                fixed, n = struct.unpack_from(">II", data, b + 4)
                if fixed:
                    sizes.extend([fixed] * n)
                else:
                    for i in range(n):
                        sizes.append(struct.unpack_from(
                            ">I", data, b + 12 + 4 * i)[0])
            elif fourcc == b"stco":
                n = struct.unpack_from(">I", data, b + 4)[0]
                for i in range(n):
                    offsets.append(struct.unpack_from(
                        ">I", data, b + 8 + 4 * i)[0])

    visit(0, len(data))
    ts = info.get("timescale", 1000)
    t = 0
    deltas: list[int] = []
    for cnt, delta in stts_entries:
        deltas.extend([delta] * cnt)
    for i, (off, size) in enumerate(zip(offsets, sizes)):
        info["samples"].append((off, size, int(t * 1000 // max(ts, 1))))
        t += deltas[i] if i < len(deltas) else (deltas[-1]
                                                if deltas else 0)
    return info


def iter_frames(content: bytes) -> Iterator[tuple[int, int, bytes,
                                                  np.ndarray]]:
    """Demux + decode: yields (frame_idx, ts_ms, jpeg_bytes, pixels)
    per sample."""
    from kgp.jpegcodec import decode_jpeg
    data = bytes(content)
    info = parse_mp4(data)
    for i, (off, size, ts) in enumerate(info["samples"]):
        jpeg = data[off:off + size]
        yield i, ts, jpeg, decode_jpeg(jpeg)


__all__ = ["encode_mp4_mjpeg", "parse_mp4", "iter_frames"]
