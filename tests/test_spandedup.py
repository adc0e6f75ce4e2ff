"""Cross-document duplicated-span detection/scrubbing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kgp.spandedup import (duplicated_spans, scrub_duplicated_spans,
                           span_shingles)

SF_TEST = "/root/testdata/sf0.001"

BOILER = "COPYRIGHT NOTICE ALL RIGHTS RESERVED FOREVER AND EVER."


def _docs(spark):
    rows = [
        (1, "unique text one " * 5 + BOILER),
        (2, BOILER + " unique text two " * 5),
        (3, "totally unrelated prose without any shared spans here " * 2),
        (4, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_shingles_positions(spark):
    df = spark.createDataFrame([(1, "a" * 25)], "doc_id long, text string")
    rows = span_shingles(df, span_len=10, stride=5).collect()
    assert sorted(r["pos"] for r in rows) == [0, 5, 10, 15]
    # doc shorter than span emits nothing
    short = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    assert span_shingles(short, span_len=10, stride=5).count() == 0


def test_duplicated_spans_found(spark):
    dup = duplicated_spans(_docs(spark), span_len=20, stride=5)
    rows = dup.collect()
    assert len(rows) > 0
    assert all(r["n_docs"] > 1 for r in rows)


def test_span_shingles_plan_pure_jvm(spark):
    plan = span_shingles(_docs(spark), 20, 5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_scrub_removes_from_non_owner_only(spark):
    out = {r["doc_id"]: r["text"]
           for r in scrub_duplicated_spans(_docs(spark), span_len=20,
                                           stride=5).collect()}
    # owner (min doc_id = 1) keeps the boilerplate
    assert BOILER[:20] in out[1]
    # doc 2 loses the shared region (stride-aligned cover of it)
    assert BOILER[:20] not in out[2]
    assert "unique text two" in out[2]
    # untouched docs pass through byte-identical
    assert out[3].startswith("totally unrelated")
    assert out[4] == "short"


def test_scrub_merges_overlapping_intervals(spark):
    # one long duplicated region -> overlapping shingles merge into
    # ONE cut, so no partial fragments survive inside it
    shared = "x" * 60
    df = spark.createDataFrame(
        [(1, "A" + shared + "B"), (2, "C" + shared + "D")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in scrub_duplicated_spans(df, span_len=20,
                                           stride=5).collect()}
    assert out[1] == "A" + shared + "B"     # owner untouched
    assert "x" * 20 not in out[2]
    assert out[2].startswith("C") and out[2].endswith("D")


def test_dup_spans_duckdb_parity(spark):
    from kgp.oracle import dup_spans_sql
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    got = {r["span_hash"]: (r["n_docs"], r["n_occurrences"])
           for r in duplicated_spans(docs).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_TEST}/documents.parquet'")
    want = con.execute(dup_spans_sql()).fetchall()
    assert len(want) == len(got) > 0
    for h, nd, no in want:
        assert got[h] == (nd, no), h
