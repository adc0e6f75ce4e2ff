from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgp.multimodal import (decode_image, image_features, media_stats,
                            sample_frames, synth_media)

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


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


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
