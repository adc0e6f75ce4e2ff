"""Composite LLM-data-pipeline scaling bench: dedup + curation + webgraph.

The 2-vs-8 apparatus in bench/scaling.py covers the KG pipeline; this
one covers the OTHER first-class surface — the training-data
operators — with one composite job per level:

  exact dedup (8-byte-fp shuffle) -> minhash+LSH near-dup clusters
  (CC merge) -> Gopher/C4/repetition curation signals -> link
  extraction -> host graph -> PageRank(5).

Levels run in fresh subprocesses (a JVM's master can't change after
start); each level is min-of-REPEATS; efficiency = (dps_4N/dps_N)/4.

    python bench/composite.py --scaling [N] [sf_dir]   # N vs 4N -> md
    python bench/composite.py <cores> [sf_dir]         # one level JSON

Corpus: synth_pages(replicate=KGP_BENCH_REPLICATE, heavy=
KGP_BENCH_HEAVY) materialized to parquet OUTSIDE the timed wall (in
production it is the pre-existing crawl table).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICATE = int(os.environ.get("KGP_BENCH_REPLICATE", "4"))
HEAVY = int(os.environ.get("KGP_BENCH_HEAVY", "50"))
REPEATS = int(os.environ.get("KGP_BENCH_REPEATS", "2"))


def run_level(cores: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kgp import corpus, curation, dedup, repetition, skew, webgraph
    from kgp.session import get_spark

    spark = get_spark("kgp-composite", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="kgp-composite-")
    try:
        nparts = spark.sparkContext.defaultParallelism
        pages_df = skew.spread(
            corpus.synth_pages(spark, sf_dir, with_doc_id=True,
                               replicate=REPLICATE, heavy=HEAVY),
            ["url"], nparts)
        pages_df.write.mode("overwrite").parquet(f"{out_dir}/pages")
        pages = spark.read.parquet(f"{out_dir}/pages")
        n_docs = pages.count()

        stage_secs: dict[str, float] = {}

        def timed(name: str, fn):
            t0 = time.time()
            out = fn()
            stage_secs[name] = round(time.time() - t0, 3)
            return out

        t_all = time.time()
        docs = pages.select("doc_id", "text").persist()
        n_exact = timed("dedup_exact",
                        lambda: dedup.exact_dup_groups(docs).count())
        n_near = timed("near_dup_groups",
                       lambda: dedup.near_dup_groups(docs).count())
        n_gopher = timed(
            "gopher_filter",
            lambda: curation.gopher_quality_signals(docs)
            .where(curation.gopher_quality_filter()).count())
        n_c4 = timed("c4_filter",
                     lambda: curation.c4_filter(docs).count())
        n_rep = timed("repetition",
                      lambda: repetition.repetition_signals(docs)
                      .count())
        links = timed(
            "extract_links",
            lambda: webgraph.extract_links_stage(pages).persist())
        n_links = links.count()
        n_hosts = timed("host_graph",
                        lambda: webgraph.host_graph(links).count())
        n_ranked = timed(
            "pagerank",
            lambda: webgraph.pagerank(
                links.select(F.col("src_url").alias("src"),
                             F.col("dst_url").alias("dst")),
                iterations=5).count())
        wall = round(time.time() - t_all, 3)
        return {
            "metric": "composite_wall", "value": wall, "unit": "sec",
            "queries": stage_secs, "sf": sf_dir, "cores": cores,
            "docs": n_docs,
            "docs_per_sec": round(n_docs / wall, 3),
            "rows": {"exact": n_exact, "near": n_near,
                     "gopher_kept": n_gopher, "c4_kept": n_c4,
                     "repetition": n_rep, "links": n_links,
                     "hosts": n_hosts, "ranked": n_ranked},
        }
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


def run_level_subprocess(cores: int, sf_dir: str) -> dict:
    # heavy-text corpora decompress a default 128 MB parquet split to
    # ~1 GB of strings; at 8 concurrent tasks the 8 g default heap
    # OOMs (measured on the replicate-8/heavy-100 shape). Sizing the
    # heap to the corpus is exactly what a real cluster's executor
    # memory config does; callers can still override.
    env = dict(os.environ, PYTHONPATH=REPO)
    env.setdefault("KGP_DRIVER_MEM", "24g")
    best = None
    for _ in range(REPEATS):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cores),
             sf_dir], env=env, capture_output=True, text=True,
            check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or r["value"] < best["value"]:
            best = r
    return best


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--scaling":
        n = int(args[1]) if len(args) > 1 else 2
        sf_dir = args[2] if len(args) > 2 else os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        lo = run_level_subprocess(n, sf_dir)
        hi = run_level_subprocess(4 * n, sf_dir)
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
        result = {"metric": "composite_scaling_efficiency",
                  "value": round(eff, 3), "unit": "ratio",
                  "n_cores": n, "n4_cores": 4 * n,
                  "docs_per_sec_n": lo["docs_per_sec"],
                  "docs_per_sec_4n": hi["docs_per_sec"],
                  "wall_n": lo["value"], "wall_4n": hi["value"],
                  "sf": sf_dir}
        md = (
            "\n## Composite LLM-data-pipeline pair (dedup + curation"
            " + webgraph)\n\n"
            f"Input: `{sf_dir}` x replicate={REPLICATE}, heavy={HEAVY}"
            f" ({lo['docs']} docs), identical for both levels; one\n"
            "composite job: exact dedup -> minhash near-dup clusters "
            "(CC) -> Gopher/C4/repetition -> link extraction -> host "
            "graph -> PageRank(5). Same min-of-"
            f"{REPEATS} fresh-subprocess methodology as the headline "
            "pair.\n\n"
            "| level | cores | wall (s) | docs/s |\n|---|---|---|---|\n"
            f"| N | {n} | {lo['value']} | {lo['docs_per_sec']} |\n"
            f"| 4N | {4 * n} | {hi['value']} | {hi['docs_per_sec']} "
            "|\n\n"
            f"**Composite scaling efficiency = {eff:.3f}** "
            "(target >= 0.8)\n\nPer-stage wall seconds:\n\n"
            "| stage | N | 4N |\n|---|---|---|\n" +
            "".join(f"| {k} | {lo['queries'].get(k)} | "
                    f"{hi['queries'].get(k)} |\n"
                    for k in lo["queries"]))
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(md)
        print(json.dumps(result))
        return
    cores = int(args[0]) if args else 8
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(json.dumps(run_level(cores, sf_dir)))


if __name__ == "__main__":
    main()
