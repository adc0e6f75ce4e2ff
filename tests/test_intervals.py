"""TimeIntervalParser port: reference semantics (two-pass precedence,
parsed-zero vs null), pure/JVM twin agreement, hostile inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgp.intervals import parse_time_interval, time_interval_col


def test_reference_doc_example():
    # TimeIntervalParser javadoc: 2 hours and 5 minutes => 125 minutes
    assert parse_time_interval(
        "the movie lasted 2 hours and 5 minutes") == 125 * 60


def test_unit_words():
    assert parse_time_interval("3 days") == 3 * 86400
    assert parse_time_interval("2 Days 4 hrs") == 2 * 86400 + 4 * 3600
    assert parse_time_interval("90 minutes") == 90 * 60
    assert parse_time_interval("45 mins") == 45 * 60
    assert parse_time_interval("10 secs") == 10
    assert parse_time_interval("1 day 1 hour 1 minute 1 second") \
        == 86400 + 3600 + 60 + 1


def test_parsed_zero_returns_zero_not_null():
    # the primary pass returns the accumulated long even when 0
    assert parse_time_interval("0 minutes") == 0


def test_compact_fallback():
    assert parse_time_interval("3h12m") == 3 * 3600 + 12 * 60
    assert parse_time_interval("2h") == 2 * 3600
    # all-zero compact total -> null (the > 0 rule)
    assert parse_time_interval("0h0m") is None


def test_no_interval():
    assert parse_time_interval("no interval mentioned here") is None
    assert parse_time_interval("") is None
    assert parse_time_interval(None) is None


def test_clean_strips_markup():
    assert parse_time_interval("<b>5</b> minutes&nbsp;long") == 300


def test_first_match_wins():
    assert parse_time_interval("5 hours then 7 hours") == 5 * 3600


def test_column_twin_matches_pure(spark):
    texts = ["the movie lasted 2 hours and 5 minutes", "3 days",
             "45 mins", "0 minutes", "3h12m", "0h0m", "2h",
             "no interval mentioned here", "10 secs read",
             "1 day 1 hour 1 minute 1 second", "5 hours then 7 hours"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text",
                     time_interval_col(F.col("text"))
                     .alias("seconds")).collect()
    for r in rows:
        assert r["seconds"] == parse_time_interval(r["text"]), r["text"]


def test_column_twin_plan_pure_jvm(spark):
    df = spark.createDataFrame([("2 hours",)], "text string")
    plan = df.select(time_interval_col(F.col("text"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_on_schedule_col(spark):
    from pyspark.sql import functions as F

    from kgp.intervals import on_schedule_col
    df = spark.createDataFrame(
        [("2026-08-20 12:30:00",),   # Thursday (dow 5)
         ("2026-08-21 12:30:00",),   # Friday
         ("2026-08-20 13:30:00",)],
        "s string").select(F.to_timestamp("s").alias("ts"))
    got = df.select(
        on_schedule_col(F.col("ts"), day_of_week=5, hour_of_day=12)
        .alias("a"),
        on_schedule_col(F.col("ts"), minute_of_hour=30).alias("b"),
        on_schedule_col(F.col("ts")).alias("c")).collect()
    assert [r["a"] for r in got] == [True, False, False]
    assert [r["b"] for r in got] == [True, True, True]
    assert [r["c"] for r in got] == [True, True, True]  # no fields set
    # day_of_month / day_of_year
    got = df.select(on_schedule_col(F.col("ts"), day_of_month=20,
                                    day_of_year=232).alias("d")).collect()
    assert [r["d"] for r in got] == [True, False, True]
