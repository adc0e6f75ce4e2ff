"""Multimodal columns: images/audio/video as opaque binary + metadata.

Design for a 100 TB multimodal corpus:

  * media live as `binary` columns next to typed metadata structs
    (MEDIA_SCHEMA) — never exploded into rows of bytes, never
    driver-collected;
  * decode / feature-extract / resize / frame-sample run as
    `mapInPandas` stages: batch-in/batch-out, so a heavyweight decoder
    amortizes per-batch setup and the output schema can differ from
    the input (frames explode one video row into many frame rows);
  * the actual codec calls are STUBBED here (no image/audio libs in
    this container): `decode_image`/`decode_audio` raise
    NotImplementedError unless `fake=True`, where a deterministic fake
    decoder (seeded from the content hash) produces stable shapes so
    the Spark-side plumbing — schema, batching, partitioning, UDF
    signatures — is real and fully tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image|audio|video
    T.StructField("mime", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])


def synth_media(spark, docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from documents: content
    bytes are the doc text (opaque payload stand-in), kind cycles by
    id. Pure column expressions."""
    kind = (F.when(F.col(id_col) % 3 == 0, "image")
            .when(F.col(id_col) % 3 == 1, "audio")
            .otherwise("video"))
    mime = (F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
            ((F.col(id_col) * 7919) % 90000 + 1000).cast("int")
            .alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _content_seed(content: bytes) -> int:
    return int.from_bytes(blake2b(bytes(content or b""),
                                  digest_size=4).digest(), "big")


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """→ HxWx3 uint8. Real decoder STUB (PIL/cv2 not in container)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv — not available in this "
            "container; pass fake=True for the deterministic test stub")
    rng = np.random.RandomState(_content_seed(content))
    return rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)


def decode_audio(content: bytes, fake: bool = False) -> np.ndarray:
    """→ float32 mono PCM. Real decoder STUB (soundfile/ffmpeg absent)."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires soundfile/ffmpeg — not available; "
            "pass fake=True for the deterministic test stub")
    rng = np.random.RandomState(_content_seed(content))
    return rng.standard_normal(1600).astype(np.float32)


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
])


def image_features(media: DataFrame, resize_to: int = 16,
                   fake: bool = True) -> DataFrame:
    """Decode → resize → per-channel mean features, one mapInPandas
    stage over image rows. Column pruning matters: select only
    (media_id, content) before the UDF so Parquet never materializes
    unused metadata into the Python worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_image(content, fake=fake)
                # nearest-neighbor resize (numpy, no deps)
                idx = (np.linspace(0, img.shape[0] - 1, resize_to)
                       .astype(int))
                jdx = (np.linspace(0, img.shape[1] - 1, resize_to)
                       .astype(int))
                small = img[np.ix_(idx, jdx)]
                rows.append({
                    "media_id": int(mid),
                    "mean_rgb": [float(x) for x in
                                 small.reshape(-1, 3).mean(axis=0)],
                    "out_width": resize_to,
                    "out_height": resize_to,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURE_SCHEMA.fields])

    return (media.where(F.col("kind") == "image")
            .select("media_id", "content")
            .mapInPandas(run, IMAGE_FEATURE_SCHEMA))


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(media: DataFrame, every_ms: int = 10_000,
                  fake: bool = True) -> DataFrame:
    """Video → frame rows (one input row explodes to many output rows —
    the mapInPandas shape where input and output cardinality differ).
    Frame payloads are deterministic stubs of the decoder output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, dur in zip(pdf["media_id"], pdf["content"],
                                         pdf["duration_ms"]):
                if not fake:
                    raise NotImplementedError("video decoding stubbed")
                rng = np.random.RandomState(_content_seed(content))
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    rows.append({
                        "media_id": int(mid), "frame_idx": i,
                        "ts_ms": int(ts),
                        "frame": rng.bytes(64),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SCHEMA.fields])

    return (media.where(F.col("kind") == "video")
            .select("media_id", "content",
                    F.col("meta.duration_ms").alias("duration_ms"))
            .mapInPandas(run, FRAME_SCHEMA))


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind size/metadata aggregates — pure JVM columns (the kind
    of scan that must NOT decode anything)."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.sum(F.length("content")).alias("total_bytes"),
                 F.round(F.avg(F.length("content")), 4)
                 .alias("avg_bytes"),
                 F.max("meta.width").alias("max_width"))
            .orderBy("kind"))
