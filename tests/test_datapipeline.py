"""End-to-end tests for the training-data curation pipeline
(kgp.datapipeline): stage tables + resume + lineage, and equality of
the materialized curated corpus with the direct operator
composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kgp import curation, dedup, materialize
from kgp.datapipeline import run_data_pipeline

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("datapipe"))
    run_data_pipeline(spark, SF, out)
    return out


def test_stage_tables_exist(run_dir):
    for stage in ("pages", "dedup", "signals", "curated", "links",
                  "host_graph", "ranks"):
        assert os.path.exists(os.path.join(run_dir, stage,
                                           "_SUCCESS")), stage
    assert os.path.exists(os.path.join(run_dir, "metrics.json"))


def test_curated_matches_direct_composition(spark, run_dir):
    got = {r.doc_id for r in
           materialize.read_stage(spark, run_dir, "curated")
           .select("doc_id").collect()}
    docs = materialize.read_stage(spark, run_dir, "pages") \
        .select("doc_id", "text")
    exact_keep = {r.doc_id for r in dedup.exact_dup_groups(docs)
                  .where("is_canonical").collect()}
    near_keep = {r.doc_id for r in dedup.near_dup_groups(docs)
                 .where("is_canonical").collect()}
    gopher_keep = {r.doc_id for r in
                   curation.gopher_quality_signals(docs)
                   .where(curation.gopher_quality_filter())
                   .collect()}
    c4_keep = {r.doc_id for r in curation.c4_filter(docs)
               .where("keep_doc").collect()}
    want = exact_keep & near_keep & gopher_keep & c4_keep
    assert got == want
    assert got, "curated corpus must be non-empty at sf0.001"


def test_curated_carries_clean_text(spark, run_dir):
    cur = materialize.read_stage(spark, run_dir, "curated")
    assert set(cur.columns) == {"doc_id", "url", "clean_text"}
    assert cur.where(F.col("clean_text").isNull()).count() == 0


def test_resume_skips_everything(spark, run_dir):
    m = run_data_pipeline(spark, SF, run_dir)
    assert all(v.get("resumed") for v in m.values()
               if isinstance(v, dict) and "resumed" in v), m


def test_lineage_rows_per_stage(spark, run_dir):
    stages = {r.stage for r in
              materialize.lineage(spark, run_dir).collect()}
    assert {"pages", "dedup", "signals", "curated", "links",
            "host_graph", "ranks"} <= stages
