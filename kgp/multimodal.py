"""Multimodal columns: images/audio/video as opaque binary + metadata.

Design for a 100 TB multimodal corpus:

  * media live as `binary` columns next to typed metadata structs
    (MEDIA_SCHEMA) — never exploded into rows of bytes, never
    driver-collected;
  * decode / feature-extract / resize / frame-sample run as
    `mapInPandas` stages: batch-in/batch-out, so a heavyweight decoder
    amortizes per-batch setup and the output schema can differ from
    the input (frames explode one video row into many frame rows);
  * two codecs are REAL, pure-numpy implementations (no external
    libs): 24-bit uncompressed BMP and 16-bit PCM RIFF/WAV —
    `decode_image`/`decode_audio` sniff the magic bytes and decode
    them for real; formats that genuinely need native libraries
    (PNG/JPEG, MP4) still raise NotImplementedError unless `fake=True`
    selects the deterministic test stub. `synth_media` emits REAL BMP
    and WAV payloads whose pixels/samples are closed-form functions of
    the media_id, so a DuckDB oracle can verify the decoded features
    end-to-end (media_features).
"""

from __future__ import annotations

import struct
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


# ------------------------------------------------ pure-numpy codecs


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    BGR, bottom-up rows padded to 4 bytes)."""
    h, w, _ = img.shape
    row_size = (3 * w + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - 3 * w)
    rows = [img[r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1)]
    return header + info + b"".join(rows)


def decode_bmp(content: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → HxWx3 uint8 RGB."""
    content = bytes(content)
    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", content, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP")
    bottom_up = h > 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for r in range(h):
        start = offset + r * row_size
        row = np.frombuffer(content, dtype=np.uint8, count=3 * w,
                            offset=start).reshape(w, 3)[:, ::-1]
        out[h - 1 - r if bottom_up else r] = row
    return out


def encode_wav(pcm: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → RIFF/WAVE."""
    data = np.asarray(pcm, dtype="<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                      b"WAVE", b"fmt ", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16, b"data", len(data))
    return hdr + data


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE (PCM16 mono) → (float32 samples in [-1, 1), rate)."""
    content = bytes(content)
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only PCM16 mono WAV")
        elif cid == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return (pcm.astype(np.float32) / 32768.0), rate


# ----------------------------------------------------- synthetic media

AUDIO_RATE = 8000


def synth_dims(media_id: int) -> tuple[int, int]:
    """Closed-form image dims — mirrored by the DuckDB oracle SQL."""
    return media_id % 13 + 4, media_id % 7 + 4  # (w, h)


def synth_pixel_array(media_id: int) -> np.ndarray:
    """Deterministic pixel pattern: px[r,c,ch] = (id*7 + r*5 + c*3 +
    ch*11) % 256 — closed form, so decoded features are SQL-checkable."""
    w, h = synth_dims(media_id)
    r = np.arange(h)[:, None, None] * 5
    c = np.arange(w)[None, :, None] * 3
    ch = np.arange(3)[None, None, :] * 11
    return ((media_id * 7 + r + c + ch) % 256).astype(np.uint8)


def synth_samples(media_id: int) -> np.ndarray:
    n = media_id % 400 + 100
    return (((media_id * 13 + np.arange(n) * 17) % 4096) - 2048) \
        .astype(np.int16)


def synth_media(spark, docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from documents: image rows
    carry REAL BMP bytes, audio rows REAL WAV bytes (both closed-form
    functions of media_id — see synth_pixel_array / synth_samples),
    video rows an opaque payload. One Arrow pass for payload synthesis;
    metadata stays pure column expressions."""
    kind = (F.when(F.col(id_col) % 3 == 0, "image")
            .when(F.col(id_col) % 3 == 1, "audio")
            .otherwise("video"))
    mime = (F.when(F.col(id_col) % 3 == 0, "image/bmp")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4"))

    @F.pandas_udf(T.BinaryType())
    def content_udf(mid: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for i, t in zip(mid, text):
            i = int(i)
            if i % 3 == 0:
                out.append(encode_bmp(synth_pixel_array(i)))
            elif i % 3 == 1:
                out.append(encode_wav(synth_samples(i), AUDIO_RATE))
            else:
                out.append((t or "").encode("utf-8"))
        return pd.Series(out)

    mid = F.col(id_col)
    width = (F.when(mid % 3 == 0, mid % 13 + 4)
             .otherwise(mid % 640 + 16)).cast("int")
    height = (F.when(mid % 3 == 0, mid % 7 + 4)
              .otherwise(mid % 480 + 16)).cast("int")
    n_samples = mid % 400 + 100
    duration = (F.when(mid % 3 == 1,
                       (n_samples * 1000 / AUDIO_RATE).cast("int"))
                .otherwise(((mid * 7919) % 90000 + 1000).cast("int")))
    rate = (F.when(mid % 3 == 1, AUDIO_RATE).otherwise(16000)).cast("int")
    return docs.select(
        mid.alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        content_udf(mid, F.col(text_col)).alias("content"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            duration.cast("int").alias("duration_ms"),
            rate.alias("sample_rate"),
        ).alias("meta"),
    )


def _content_seed(content: bytes) -> int:
    return int.from_bytes(blake2b(bytes(content or b""),
                                  digest_size=4).digest(), "big")


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """→ HxWx3 uint8. BMP payloads decode for REAL (pure numpy);
    PNG/JPEG would need PIL/opencv (absent in this container) — those
    raise unless fake=True selects the deterministic stub."""
    if content is not None and bytes(content)[:2] == b"BM":
        return decode_bmp(content)
    if not fake:
        raise NotImplementedError(
            "only BMP decodes without PIL/opencv; pass fake=True for "
            "the deterministic test stub")
    rng = np.random.RandomState(_content_seed(content))
    return rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)


def decode_audio(content: bytes, fake: bool = False) -> np.ndarray:
    """→ float32 mono PCM. RIFF/WAV payloads decode for REAL (pure
    numpy); compressed formats would need soundfile/ffmpeg — those
    raise unless fake=True selects the deterministic stub."""
    if content is not None and bytes(content)[:4] == b"RIFF":
        return decode_wav(content)[0]
    if not fake:
        raise NotImplementedError(
            "only PCM WAV decodes without soundfile/ffmpeg; pass "
            "fake=True for the deterministic test stub")
    rng = np.random.RandomState(_content_seed(content))
    return rng.standard_normal(1600).astype(np.float32)


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
    T.StructField("sum_rgb", T.LongType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
])


def image_features(media: DataFrame, resize_to: int = 16,
                   fake: bool = False) -> DataFrame:
    """Decode → resize → per-channel mean + integer pixel-sum features,
    one mapInPandas stage over image rows. Column pruning matters:
    select only (media_id, content) before the UDF so Parquet never
    materializes unused metadata into the Python worker. sum_rgb is an
    exact integer so the DuckDB oracle can verify the real BMP decode
    path value-for-value."""

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
                    "sum_rgb": int(small.sum(dtype=np.int64)),
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
