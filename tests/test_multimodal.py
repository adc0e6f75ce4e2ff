from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgp.multimodal import (AUDIO_RATE, decode_audio, decode_bmp,
                            decode_image, decode_wav, encode_bmp,
                            encode_wav, image_features, media_stats,
                            sample_frames, synth_media,
                            synth_pixel_array, synth_samples)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return synth_media(spark, docs).cache()


def test_media_schema_and_kinds(media):
    assert set(media.columns) == {"media_id", "kind", "mime", "content",
                                  "meta"}
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_unknown_codecs_still_raise():
    # payloads with no known magic must raise unless the fake stub is
    # requested (BMP/PNG/JPEG/WAV/MP4 all decode for real now)
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)
    with pytest.raises(NotImplementedError):
        decode_audio(b"xx", fake=False)


def test_bmp_roundtrip():
    img = synth_pixel_array(9)        # 13x5 non-multiple-of-4 width
    data = encode_bmp(img)
    assert data[:2] == b"BM"
    back = decode_bmp(data)
    assert back.shape == img.shape and np.array_equal(back, img)
    # odd widths exercise row padding
    img2 = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img2)), img2)


def test_wav_roundtrip():
    pcm = synth_samples(4)
    data = encode_wav(pcm, AUDIO_RATE)
    back, rate = decode_wav(data)
    assert rate == AUDIO_RATE
    assert back.dtype == np.float32 and len(back) == len(pcm)
    assert np.allclose(back * 32768.0, pcm)


def _wav(fmt, channels, rate, bits, payload, extensible=False):
    import struct
    if extensible:
        sub = struct.pack("<H", fmt) + b"\x00" * 14
        body = struct.pack("<HHIIHHHHI", 0xFFFE, channels, rate,
                           rate * channels * bits // 8,
                           channels * bits // 8, bits, 22, bits, 0) \
            + sub
    else:
        body = struct.pack("<HHIIHH", fmt, channels, rate,
                           rate * channels * bits // 8,
                           channels * bits // 8, bits)
    chunks = (b"fmt " + struct.pack("<I", len(body)) + body
              + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" \
        + chunks


def test_wav_full_pcm_coverage():
    import struct

    # unsigned 8-bit: 128 -> 0.0, 255 -> ~+1, 0 -> -1
    x, r = decode_wav(_wav(1, 1, 8000, 8, bytes([128, 255, 0])))
    assert r == 8000
    assert np.allclose(x, [0.0, 127 / 128, -1.0])
    # 24-bit signed: max positive / min negative / zero
    p24 = b"\xff\xff\x7f" + b"\x00\x00\x80" + b"\x00\x00\x00"
    x, _ = decode_wav(_wav(1, 1, 8000, 24, p24))
    assert np.allclose(x, [(2**23 - 1) / 2**23, -1.0, 0.0])
    # 32-bit signed
    p32 = struct.pack("<ii", 2**31 - 1, -(2**31))
    x, _ = decode_wav(_wav(1, 1, 8000, 32, p32))
    assert np.allclose(x, [(2**31 - 1) / 2**31, -1.0])
    # float32 passthrough
    pf = struct.pack("<ff", 0.25, -0.5)
    x, _ = decode_wav(_wav(3, 1, 44100, 32, pf))
    assert np.allclose(x, [0.25, -0.5])
    # float64 narrows
    pd_ = struct.pack("<dd", 0.125, -0.75)
    x, _ = decode_wav(_wav(3, 1, 44100, 64, pd_))
    assert np.allclose(x, [0.125, -0.75])
    # stereo downmix to mono (mean)
    ps = struct.pack("<hhhh", 1000, 3000, -2000, 0)
    x, _ = decode_wav(_wav(1, 2, 16000, 16, ps))
    assert np.allclose(x * 32768.0, [2000.0, -1000.0])
    # WAVE_FORMAT_EXTENSIBLE resolves the SubFormat
    x, _ = decode_wav(_wav(1, 1, 8000, 16,
                           struct.pack("<h", -16384), extensible=True))
    assert np.allclose(x, [-0.5])
    # compressed formats stay honest
    import pytest
    with pytest.raises(NotImplementedError):
        decode_wav(_wav(2, 1, 8000, 4, b"\x00\x00"))   # ADPCM
    with pytest.raises(ValueError):
        decode_wav(_wav(1, 1, 8000, 12, b"\x00\x00"))  # illegal depth


def test_decode_sniffs_real_payloads():
    img = synth_pixel_array(3)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    pcm = synth_samples(7)
    got = decode_audio(encode_wav(pcm, AUDIO_RATE))
    assert np.allclose(got * 32768.0, pcm)


def test_synth_media_payloads_decode_for_real(media):
    rows = media.where("kind in ('image','audio')") \
        .select("media_id", "kind", "content", "meta").limit(40).collect()
    assert rows
    for r in rows:
        if r.kind == "image":
            img = decode_image(r.content, fake=False)
            assert img.shape == (r.meta.height, r.meta.width, 3)
            assert np.array_equal(img, synth_pixel_array(r.media_id))
        else:
            pcm, rate = decode_wav(r.content)
            assert rate == r.meta.sample_rate == AUDIO_RATE
            assert len(pcm) == len(synth_samples(r.media_id))


def test_fake_decoder_deterministic():
    a = decode_image(b"same-bytes", fake=True)
    b = decode_image(b"same-bytes", fake=True)
    c = decode_image(b"other-bytes", fake=True)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8


def test_image_features_stage(media):
    feats = image_features(media, resize_to=8).collect()
    n_images = media.where("kind = 'image'").count()
    assert len(feats) == n_images
    r = feats[0]
    assert len(r.mean_rgb) == 3
    assert all(0 <= x <= 255 for x in r.mean_rgb)
    assert (r.out_width, r.out_height) == (8, 8)


def test_sample_frames_explodes_rows(media):
    frames = sample_frames(media, every_ms=10_000)
    rows = frames.collect()
    n_videos = media.where("kind = 'video'").count()
    assert len(rows) > n_videos  # one video -> many frames
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.media_id, []).append(r)
    some = next(iter(by_vid.values()))
    idxs = sorted(f.frame_idx for f in some)
    assert idxs == list(range(len(idxs)))
    assert all(len(f.frame) == 64 for f in some)


def test_media_stats_jvm_only(media):
    stats = {r.kind: r for r in media_stats(media).collect()}
    assert stats["image"].n > 0
    assert stats["image"].total_bytes > 0
    assert stats["video"].max_width <= 655


# ------------------------------------------------------ color analysis


def test_rgb_to_lab_reference_values():
    """ColorSpaceConverter math: canonical sRGB/D65 Lab values."""
    from kgp.multimodal import rgb_to_lab
    l, a, b = rgb_to_lab(255, 0, 0)
    assert abs(l - 53.23) < 0.1 and abs(a - 80.1) < 0.2 \
        and abs(b - 67.2) < 0.2
    l, a, b = rgb_to_lab(255, 255, 255)
    assert abs(l - 100.0) < 0.1 and abs(a) < 0.2 and abs(b) < 0.2
    l, a, b = rgb_to_lab(0, 0, 0)
    assert abs(l) < 0.01


def test_detect_colors_clusters_and_bounds():
    import numpy as np
    from kgp.multimodal import detect_colors
    px = np.zeros((6, 6, 3), dtype=np.uint8)
    px[:, :] = [252, 252, 252]      # near-white -> discarded
    px[:3, :] = [250, 12, 12]       # red block
    px[3:, :3] = [12, 12, 250]      # blue block (smaller)
    got = detect_colors(px)
    assert got[0][1] == "Red"       # most-populous cluster first
    assert ("Blue" in [m for _, m in got])
    # all-white image -> no clusters
    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    assert detect_colors(white) == []


def test_detect_colors_merges_close_shades():
    import numpy as np
    from kgp.multimodal import detect_colors
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[:, :2] = [200, 30, 30]
    px[:, 2:] = [210, 40, 40]       # within Lab distance 50 of above
    got = detect_colors(px)
    # one merged cluster; its center (205,35,35) sits nearest the
    # palette's Brown (#A52A2A) in Lab space
    assert len(got) == 1 and got[0][1] in ("Red", "Brown")


def test_dominant_colors_stage(spark):
    import numpy as np
    from kgp.multimodal import dominant_colors_stage, encode_bmp
    px = np.zeros((5, 5, 3), dtype=np.uint8)
    px[:, :] = [15, 15, 240]
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(px)))],
        "media_id long, kind string, content binary")
    [row] = dominant_colors_stage(media).collect()
    assert row.main_color == "Blue"


def test_audio_features_hand_golden_and_spark():
    import pandas as pd
    from kgp.multimodal import audio_features, synth_media
    from kgp.session import get_spark

    # hand-check frame 0 of media_id=1: pcm(i) = (13 + 17i) % 4096 - 2048
    mid = 1
    pcm = synth_samples(mid).astype(np.int64)
    fr = pcm[:64]
    neg = fr < 0
    exp_energy = int((fr * fr).sum())
    exp_zcr = int((neg[:-1] != neg[1:]).sum())
    exp_peak = int(np.abs(fr).max())

    spark = get_spark("t-audiofeat", cores=4)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 4, 7], "text": ["a", "b", "c"]}))
    media = synth_media(spark, docs)
    out = audio_features(media).orderBy("media_id", "frame_idx")
    rows = out.collect()
    r0 = [r for r in rows if r.media_id == 1 and r.frame_idx == 0][0]
    assert r0.energy_sumsq == exp_energy
    assert r0.zcr == exp_zcr
    assert r0.peak == exp_peak
    assert r0.start == 0
    # frame count per clip: 1 + (n - 64) // 32
    for m in (1, 4, 7):
        n = m % 400 + 100
        got = len([r for r in rows if r.media_id == m])
        assert got == 1 + (n - 64) // 32
