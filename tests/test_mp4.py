"""MP4 (ISO BMFF) muxer/demuxer — kgp.mp4 — plus the real
sample_frames demux path."""

from __future__ import annotations

import numpy as np
import pytest

from kgp.jpegcodec import decode_jpeg
from kgp.mp4 import encode_mp4_mjpeg, iter_frames, parse_mp4


def _clip(mid=5, n=4, th=2, tw=3, exact=True):
    frames = []
    for f in range(n):
        tiles = ((7 * mid + 13 * f + 31 * np.arange(th)[:, None]
                  + 17 * np.arange(tw)[None, :]) % 256).astype(np.uint8)
        frames.append(np.repeat(np.repeat(tiles, 8, 0), 8, 1))
    qt = np.ones(64, int) if exact else None
    return frames, encode_mp4_mjpeg(frames, fps=10, qt_override=qt)


def test_box_structure_and_metadata():
    frames, mp4 = _clip()
    assert mp4[4:8] == b"ftyp"
    info = parse_mp4(mp4)
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (24, 16)
    assert info["timescale"] == 1000
    assert info["duration_ms"] == 400
    assert len(info["samples"]) == 4
    # stts: 100 ms cadence at fps=10
    assert [ts for _, _, ts in info["samples"]] == [0, 100, 200, 300]


def test_frames_decode_exactly():
    frames, mp4 = _clip()
    for i, ts, jpeg, px in iter_frames(mp4):
        assert jpeg[:2] == b"\xff\xd8"
        assert (px[:, :, 0] == frames[i]).all()


def test_lossy_clip_dimensions_and_count():
    rng = np.random.RandomState(2)
    frames = [rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
              for _ in range(3)]
    mp4 = encode_mp4_mjpeg(frames, fps=5, quality=85)
    out = list(iter_frames(mp4))
    assert len(out) == 3
    assert out[0][3].shape == (16, 24, 3)
    assert [ts for _, ts, _, _ in out] == [0, 200, 400]


def test_honest_limits():
    with pytest.raises(ValueError):
        parse_mp4(b"not an mp4 at all")
    # a non-jpeg sample entry must raise (compressed codecs)
    frames, mp4 = _clip()
    bad = bytearray(mp4)
    idx = bytes(bad).find(b"jpeg", bytes(bad).find(b"stsd"))
    bad[idx:idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        parse_mp4(bytes(bad))


def test_sample_frames_real_mp4_path(spark):
    from pyspark.sql import functions as F

    from kgp.multimodal import sample_frames

    frames, mp4 = _clip(mid=9, n=5)
    media = spark.createDataFrame(
        [(9, "video", "video/mp4", bytearray(mp4), (24, 16, 500, 0))],
        "media_id long, kind string, mime string, content binary, "
        "meta struct<width:int,height:int,duration_ms:int,"
        "sample_rate:int>")
    # every_ms=200 at 100 ms cadence -> frames 0, 2, 4
    got = sample_frames(media, every_ms=200, fake=False).collect()
    assert [(r["frame_idx"], r["ts_ms"]) for r in got] == \
        [(0, 0), (1, 200), (2, 400)]
    for r, want_f in zip(got, [0, 2, 4]):
        px = decode_jpeg(bytes(r["frame"]))
        assert (px[:, :, 0] == frames[want_f]).all()
