"""DatasetStatistics port tests — per-column profiling semantics
(core/dataset/statistics/) against hand goldens, the pure twins, and
DuckDB parity on the real events table."""

from __future__ import annotations

import math

import duckdb
import pytest

from kgp.datasetstats import (classify_columns, dataset_statistics,
                              nominal_stats, nominal_value_counts,
                              numeric_stats)
from tests.conftest import SF_TEST


# ------------------------------------------------------------ pure twins


def test_numeric_stats_twin():
    # SlimStats semantics: mean/min/max over non-null, SAMPLE std
    s = numeric_stats([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0, None])
    assert s["num_nulls"] == 1
    assert s["mean"] == pytest.approx(5.0)
    assert s["min"] == 2.0 and s["max"] == 9.0
    assert s["std_dev"] == pytest.approx(math.sqrt(32.0 / 7.0))


def test_numeric_stats_single_and_empty():
    assert numeric_stats([3.5])["std_dev"] == 0.0
    empty = numeric_stats([None, None])
    assert empty["num_nulls"] == 2 and empty["mean"] is None


def test_nominal_stats_twin():
    s = nominal_stats(["a", "b", "a", None, "c", "a", "b"])
    assert s["num_nulls"] == 1
    assert s["num_unique"] == 3
    assert s["num_unique_including_null"] == 4
    # count-descending, value-ascending ties
    assert list(s["counts"]) == ["a", "b", "c"]
    assert s["counts"]["a"] == 3
    # getProbability = count / non-null total
    assert s["probabilities"]["a"] == pytest.approx(3 / 6)
    no_null = nominal_stats(["x"])
    assert no_null["num_unique_including_null"] == 1


# ------------------------------------------------------------ Spark side


def test_classify_columns_skips_unsupported(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, [1])],
        "id int, name string, v double, arr array<int>")
    got = classify_columns(df)
    # arrays (like the reference's unsupported Value types) are skipped
    assert got == [("id", "numeric"), ("name", "nominal"),
                   ("v", "numeric")]
    assert classify_columns(df, ["name"]) == [("name", "nominal")]


def test_dataset_statistics_golden(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 4.0), (3, "a", None), (None, None, 6.0)],
        "id int, cat string, v double")
    rows = {r["column"]: r.asDict()
            for r in dataset_statistics(df).collect()}
    assert rows["id"]["num_nulls"] == 1
    assert rows["id"]["mean"] == pytest.approx(2.0)
    assert rows["id"]["std_dev"] == pytest.approx(1.0)
    assert rows["id"]["min"] == 1.0 and rows["id"]["max"] == 3.0
    assert rows["cat"]["num_unique"] == 2
    assert rows["cat"]["num_nulls"] == 1
    assert rows["cat"]["mean"] is None
    assert rows["v"]["num_nulls"] == 1
    assert rows["v"]["std_dev"] == pytest.approx(2.0)


def test_dataset_statistics_matches_twin_on_events(spark):
    events = spark.read.parquet(f"{SF_TEST}/events.parquet")
    got = {r["column"]: r.asDict()
           for r in dataset_statistics(
               events, ["value", "event_type"]).collect()}
    raw = events.select("value", "event_type").collect()
    tw_num = numeric_stats([r["value"] for r in raw])
    tw_nom = nominal_stats([r["event_type"] for r in raw])
    assert got["value"]["mean"] == pytest.approx(tw_num["mean"])
    assert got["value"]["std_dev"] == pytest.approx(tw_num["std_dev"])
    assert got["value"]["min"] == tw_num["min"]
    assert got["value"]["max"] == tw_num["max"]
    assert got["event_type"]["num_unique"] == tw_nom["num_unique"]


def test_nominal_value_counts_duckdb_parity(spark):
    events = spark.read.parquet(f"{SF_TEST}/events.parquet")
    got = [(r["value"], r["count"], round(r["probability"], 9))
           for r in nominal_value_counts(events, "event_type").collect()]
    want = duckdb.sql(f"""
        SELECT event_type AS value, count(*) AS count,
               round(count(*) / sum(count(*)) OVER (), 9) AS probability
        FROM '{SF_TEST}/events.parquet'
        WHERE event_type IS NOT NULL
        GROUP BY 1 ORDER BY count DESC, value""").fetchall()
    assert got == [(v, c, float(p)) for v, c, p in want]


def test_empty_and_all_null_columns(spark):
    df = spark.createDataFrame([], "id int, name string")
    assert dataset_statistics(df).count() == 2
    nul = spark.createDataFrame([(None, None), (None, None)],
                                "id int, name string")
    rows = {r["column"]: r.asDict()
            for r in dataset_statistics(nul).collect()}
    assert rows["id"]["num_nulls"] == 2 and rows["id"]["mean"] is None
    assert rows["name"]["num_unique"] == 0
