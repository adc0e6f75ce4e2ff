"""Training-data curation pipeline — the LLM-data twin of
kgp.pipeline.run_pipeline: exact + near deduplication, quality
signals, the curated survivor corpus, and the web graph, materialized
as resumable, lineage-tracked stage tables and runnable via
spark-submit --py-files (python -m kgp.datapipeline <sf_dir>
<out_dir>).

Until now these operators were composed only inside bench/composite.py
(timed, unmaterialized); a production corpus run needs the same
checkpoint-resume + per-partition-lineage contract the KG pipeline
has.  Stage DAG (each stage one parquet table + one pyarrow lineage
append, kgp.materialize):

  pages     input crawl table (pre-existing in production; the
            deterministic synth corpus here), spread on url
  dedup     (doc_id, exact_group, exact_canonical, near_group,
            near_canonical) — BOTH group structures in one
            table/write (the round-5 lineage lesson: per-stage fixed
            cost is real money at any scale)
  signals   one per-doc quality row: the Gopher signal columns +
            gopher_keep, the C4 line-filter outcome (clean_text,
            keep_doc), and the repetition signals — one joined write
  curated   the survivor corpus: exact-canonical AND near-canonical
            AND gopher_keep AND C4 keep_doc, carrying clean_text
  links / host_graph / ranks — web-graph tables over ALL pages (the
            graph wants the full crawl, not the curated subset)

Scale shape: every stage is an already-audited distributed operator
(8-byte-key dedup shuffles, pure-JVM signal columns, banded
LSH+verify funnel, co-partitioned graph propagation); this module
only sequences and materializes them.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp import corpus, curation, dedup, repetition, skew, webgraph
from kgp.pipeline import _stage


def _dedup_table(docs: DataFrame) -> DataFrame:
    exact = dedup.exact_dup_groups(docs).select(
        "doc_id",
        F.col("group_id").alias("exact_group"),
        F.col("is_canonical").alias("exact_canonical"))
    near = dedup.near_dup_groups(docs).select(
        "doc_id",
        F.col("group_id").alias("near_group"),
        F.col("is_canonical").alias("near_canonical"))
    return exact.join(near, "doc_id")


def _signals_table(docs: DataFrame) -> DataFrame:
    gopher = curation.gopher_quality_signals(docs).withColumn(
        "gopher_keep", curation.gopher_quality_filter())
    c4 = curation.c4_filter(docs).select(
        "doc_id", "clean_text", "n_kept",
        F.col("keep_doc").alias("c4_keep"))
    rep = repetition.repetition_signals(docs)
    return gopher.join(c4, "doc_id").join(rep, "doc_id")


def run_data_pipeline(spark: SparkSession, sf_dir: str, out_dir: str,
                      force: bool = False,
                      pages: DataFrame | None = None,
                      replicate: int = 1, heavy: int = 1) -> dict:
    """Run (or resume) the curation pipeline; returns the metrics
    dict and writes metrics.json, mirroring run_pipeline's contract.
    The curated corpus lands at {out_dir}/curated."""
    metrics: dict = {}
    nparts = spark.sparkContext.defaultParallelism

    pages_df = _stage(
        spark, out_dir, "pages",
        (lambda: skew.spread(pages, ["url"], nparts))
        if pages is not None
        else (lambda: skew.spread(
            corpus.synth_pages(spark, sf_dir, with_doc_id=True,
                               replicate=replicate, heavy=heavy),
            ["url"], nparts)),
        force=force, metrics=metrics)

    docs = pages_df.select("doc_id", "url", "text")

    dd = _stage(spark, out_dir, "dedup",
                lambda: _dedup_table(docs),
                force=force, metrics=metrics)
    sig = _stage(spark, out_dir, "signals",
                 lambda: _signals_table(docs),
                 force=force, metrics=metrics)

    def _curated() -> DataFrame:
        keep = (F.col("exact_canonical") & F.col("near_canonical")
                & F.col("gopher_keep") & F.col("c4_keep"))
        return (docs
                .join(dd, "doc_id")
                .join(sig.select("doc_id", "gopher_keep", "c4_keep",
                                 "clean_text"), "doc_id")
                .where(keep)
                .select("doc_id", "url", "clean_text"))

    _stage(spark, out_dir, "curated", _curated,
           force=force, metrics=metrics)

    links = _stage(spark, out_dir, "links",
                   lambda: webgraph.extract_links_stage(pages_df),
                   force=force, metrics=metrics)
    _stage(spark, out_dir, "host_graph",
           lambda: webgraph.host_graph(links),
           force=force, metrics=metrics)
    _stage(spark, out_dir, "ranks",
           lambda: webgraph.pagerank(
               links.select(F.col("src_url").alias("src"),
                            F.col("dst_url").alias("dst")),
               iterations=5),
           force=force, metrics=metrics)

    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    return metrics


def main() -> None:
    import argparse

    from kgp.session import get_spark
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sf_dir")
    p.add_argument("out_dir")
    p.add_argument("--force", action="store_true")
    p.add_argument("--cores", type=int, default=None)
    a = p.parse_args()
    spark = get_spark("kgp-data-pipeline", cores=a.cores)
    t0 = time.time()
    m = run_data_pipeline(spark, a.sf_dir, a.out_dir, force=a.force)
    m["wall_s"] = round(time.time() - t0, 3)
    print(json.dumps({k: v for k, v in m.items()}, default=str))


if __name__ == "__main__":
    main()
