"""Structured Streaming: the batch stages run unchanged on a stream,
checkpointed incremental processing, watermarked aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgp.corpus import seed_dictionary, synth_pages, training_docs
from kgp.html_text import extract_stage
from kgp.mentions import train_ner_model
from kgp.streaming import (mention_rates, run_stream, stream_docs,
                           stream_mentions, stream_pages)

SF = "/root/testdata/sf0.001"


def _write_batch(spark, src_dir, lo, hi):
    pages = synth_pages(spark, SF, with_doc_id=True) \
        .where(f"doc_id >= {lo} AND doc_id < {hi}").drop("doc_id")
    pages.write.mode("append").parquet(src_dir)
    return pages.count()


def test_streaming_extract_incremental(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    sink = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")

    n1 = _write_batch(spark, src, 0, 30)
    stream = stream_pages(spark, src)
    assert stream.isStreaming
    docs = stream_docs(stream)
    run_stream(docs.select("url", "text"), sink, ckpt)
    got1 = spark.read.parquet(sink)
    assert got1.count() == n1

    # second file drop → ONLY the new pages are processed (checkpoint)
    n2 = _write_batch(spark, src, 30, 50)
    run_stream(stream_docs(stream_pages(spark, src))
               .select("url", "text"), sink, ckpt)
    got2 = spark.read.parquet(sink)
    assert got2.count() == n1 + n2
    assert got2.select("url").distinct().count() == n1 + n2

    # byte identity holds through the streaming path too
    want = {r.url: r.text for r in
            synth_pages(spark, SF).select("url", "text").collect()}
    for r in got2.collect():
        assert want[r.url] == r.text


def test_streaming_mentions_and_watermarked_rates(spark, tmp_path):
    src = str(tmp_path / "pages_stream2")
    _write_batch(spark, src, 0, 25)

    pages_batch = synth_pages(spark, SF)
    docs_batch = extract_stage(pages_batch).persist()
    model = train_ner_model(spark, training_docs(docs_batch),
                            seed_dictionary(spark))
    bc = spark.sparkContext.broadcast(model)

    stream = stream_pages(spark, src)
    mentions = stream_mentions(stream_docs(stream), bc)
    assert mentions.isStreaming and "warc_ts" in mentions.columns
    rates = mention_rates(mentions)
    assert rates.isStreaming

    sink = str(tmp_path / "rates_out")
    ckpt = str(tmp_path / "ckpt2")
    # watermarked append-mode aggregation over a finite drain
    run_stream(rates, sink, ckpt, output_mode="append")
    # finalized windows may be empty with availableNow (watermark never
    # advances past the single micro-batch) — rerun as complete into
    # memory to check the aggregation itself
    q = (rates.writeStream.format("memory").queryName("rates_mem")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("select * from rates_mem").collect()
    assert rows
    assert {r.tag for r in rows} >= {"PER", "ORG", "CITY"}
    assert all(r.n_mentions > 0 for r in rows)


def test_streaming_dedup_exact(spark, tmp_path):
    """Re-crawled pages (identical text, later ts within the
    watermark) are dropped by the stateful streaming dedup; state key
    equals the batch dedup fingerprint."""
    from kgp.streaming import stream_dedup_exact

    src = str(tmp_path / "pages_dup")
    pages = synth_pages(spark, SF, with_doc_id=True) \
        .where("doc_id < 20").drop("doc_id")
    pages.write.mode("append").parquet(src)
    # the re-crawl: same pages, 10 minutes later (inside the watermark)
    pages.withColumn("warc_ts",
                     F.col("warc_ts") + F.expr("INTERVAL 10 MINUTES")) \
        .write.mode("append").parquet(src)

    deduped = stream_dedup_exact(stream_pages(spark, src))
    assert deduped.isStreaming
    sink = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt_dedup")
    run_stream(deduped.select("url", "text"), sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 20                       # one copy per page
    assert got.select("url").distinct().count() == 20


def test_streaming_curation_unchanged(spark, tmp_path):
    """The batch curation ops (C4 filter, stratified sample) run
    UNCHANGED on a stream — stateless column expressions."""
    from kgp.curation import c4_filter, stratified_sample

    src = str(tmp_path / "pages_cur")
    _write_batch(spark, src, 0, 15)
    docs = stream_docs(stream_pages(spark, src))
    filtered = c4_filter(docs, id_col="url")
    assert filtered.isStreaming
    sampled = stratified_sample(docs.withColumn("src", F.lit("a")),
                                {"a": 0.5}, id_col="url",
                                strata_col="src")
    assert sampled.isStreaming

    sink = str(tmp_path / "cur_out")
    run_stream(filtered, sink, str(tmp_path / "ckpt_cur"))
    got = spark.read.parquet(sink)
    assert got.count() == 15
    assert {"clean_text", "n_kept", "keep_doc"} <= set(got.columns)
