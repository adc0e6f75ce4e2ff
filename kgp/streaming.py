"""Structured Streaming front-end for the KG pipeline.

A crawl is naturally a stream of pages; every per-document stage of
this pipeline (html → text, mention tagging) is STATELESS, so the same
column expressions and Arrow UDFs run unchanged under `readStream` —
the declarative-plan payoff: batch and streaming share one code path.

  * `stream_pages`   — file-source stream over the pages table
    (parquet dropped into a directory, the micro-batch stand-in for a
    Kafka/Iceberg CDC feed);
  * `stream_docs` / `stream_mentions` — the batch stages applied to
    the stream (extract_stage / detect_mentions verbatim);
  * `mention_rates`  — watermarked sliding-window aggregation (late
    pages beyond the watermark are dropped, state is bounded — the
    100 TB/day concern is state size, not throughput);
  * `run_stream`     — writeStream with checkpointLocation; the
    default availableNow trigger drains what exists and stops, which
    doubles as incremental batch (reprocessing only new files on every
    invocation — checkpoint-resume at the ingest edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp.html_text import extract_stage
from kgp.mentions import detect_mentions
from kgp.skew import host_of

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_pages(spark: SparkSession, path: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(path)


def stream_docs(pages: DataFrame) -> DataFrame:
    """Stateless — identical plan to the batch stage."""
    return extract_stage(pages)


def stream_mentions(docs: DataFrame, model_bc,
                    tag_dates: bool = True) -> DataFrame:
    """Stateless — the broadcast NER model is read-only on executors.
    warc_ts rides along so downstream windowed aggregations need no
    stream-stream join back to the pages."""
    return detect_mentions(docs, model_bc, tag_dates=tag_dates,
                           carry_cols=("warc_ts",))


def mention_rates(mentions: DataFrame, window: str = "1 hour",
                  watermark: str = "2 hours") -> DataFrame:
    """Mentions per (host, tag, event-time window) with a watermark:
    the stateful-aggregation shape — state is pruned once event time
    passes the watermark, so it stays bounded on an unbounded crawl.
    mentions must carry warc_ts (stream_mentions does)."""
    timed = mentions.withColumn("host", host_of(F.col("url")))
    return (timed.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window), "host", "tag")
            .agg(F.count("*").alias("n_mentions")))


def stream_dedup_exact(docs: DataFrame, watermark: str = "1 hour",
                       ts_col: str = "warc_ts",
                       text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: the batch fingerprint key
    (kgp.textstats.fingerprint — xxhash64 of whitespace-normalized,
    case-folded text) with ``dropDuplicatesWithinWatermark``, so a
    re-crawled page arriving within the watermark of its first copy is
    dropped and the dedup state is PRUNED once event time passes the
    watermark — bounded state on an unbounded crawl, the streaming
    complement of kgp.dedup.exact_dup_groups (same key, same
    normalization, so batch backfill and streaming ingest agree on
    what is a duplicate)."""
    from kgp.textstats import fingerprint
    keyed = docs.withColumn("_fp", fingerprint(F.col(text_col)))
    return (keyed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_fp"])
            .drop("_fp"))


def run_stream(df: DataFrame, out_path: str, checkpoint: str,
               output_mode: str = "append",
               fmt: str = "parquet"):
    """Start the sink with exactly-once file semantics and drain all
    currently-available input (availableNow). Returns the finished
    StreamingQuery."""
    q = (df.writeStream.format(fmt)
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
