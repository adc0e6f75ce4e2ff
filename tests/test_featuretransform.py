"""extraction/feature transformer port tests — null replacement, the
boolean→1 quirk, nominal/combine/rename, domain reduction, the US
week-of-year formula, date differences (closed form vs the reference
walk twins) and the full date-particle set."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from kgp.featuretransform import (apply_domain_reducer,
                                  booleans_to_numeric, combine_features,
                                  date_difference, date_particles,
                                  fit_domain_reducer, rename_features,
                                  replace_nulls, us_week_col,
                                  us_week_of_year, weeks_difference,
                                  work_days_difference)


# ------------------------------------------------------------ pure twins


def test_us_week_of_year():
    # 2015-01-01 was a Thursday; US weeks start Sunday, week 1 = Jan 1
    assert us_week_of_year(dt.date(2015, 1, 1)) == 1
    assert us_week_of_year(dt.date(2015, 1, 3)) == 1   # Saturday
    assert us_week_of_year(dt.date(2015, 1, 4)) == 2   # Sunday
    assert us_week_of_year(dt.date(2015, 12, 31)) == 53


def test_weeks_difference_walk():
    # same US week -> 0
    assert weeks_difference(dt.date(2015, 1, 1),
                            dt.date(2015, 1, 2)) == 0
    # Saturday -> Sunday crosses the US week boundary
    assert weeks_difference(dt.date(2015, 1, 3),
                            dt.date(2015, 1, 4)) == 1
    # 8 days apart: two +1-week steps
    assert weeks_difference(dt.date(2015, 1, 5),
                            dt.date(2015, 1, 13)) == 2
    # symmetric (the reference swaps)
    assert weeks_difference(dt.date(2015, 1, 13),
                            dt.date(2015, 1, 5)) == 2


def test_work_days_difference_walk():
    mon = dt.date(2015, 1, 5)
    fri = dt.date(2015, 1, 9)
    assert work_days_difference(fri, mon) == 4
    assert work_days_difference(mon, fri) == 4
    # over a weekend: Fri -> Mon = 1 business day (Sat+Sun skipped)
    assert work_days_difference(dt.date(2015, 1, 12), fri) == 1
    assert work_days_difference(mon, mon) == 0


# ------------------------------------------------------------ Spark side


def test_replace_nulls_and_boolean_quirk(spark):
    df = spark.createDataFrame(
        [(1, None, None, True), (None, "x", 2.5, False),
         (3, "y", 1.0, None)],
        "a int, s string, v double, b boolean")
    out = replace_nulls(df).collect()
    assert [r["a"] for r in out] == [1, -1, 3]
    assert [r["s"] for r in out] == ["-1", "x", "y"]
    assert [r["v"] for r in out] == [-1.0, 2.5, 1.0]
    nums = booleans_to_numeric(df).collect()
    # TRUE and FALSE both become 1 (reference quirk); null stays null
    assert [r["b"] for r in nums] == [1, 1, None]


def test_to_nominal_combine_rename(spark):
    from kgp.featuretransform import to_nominal
    df = spark.createDataFrame([(1, 2.5, "x")], "a int, v double, s string")
    out = to_nominal(df, "v").collect()[0]
    assert out["v_nominal"] == "2.5"
    comb = combine_features(df, "a", "s").collect()[0]
    assert comb["a__s"] == "1__x"
    renamed = rename_features(df, "^([av])$", "f_\\1")
    assert renamed.columns == ["f_a", "f_v", "s"]


def test_domain_reducer(spark):
    df = spark.createDataFrame(
        [("A", "X"), ("A", "X"), ("B", "X"), ("C", "Y"), ("C", "Z")],
        "f string, label string")
    mapping = fit_domain_reducer(df, "f", "label")
    # A and B map to only X; C spans Y and Z -> unmapped
    assert mapping == {"A": "X", "B": "X"}
    out = {(r["f"]) for r in
           apply_domain_reducer(df, mapping, "f").collect()}
    assert out == {"reduced_X", "C"}
    kept = apply_domain_reducer(df, mapping, "f", keep_original=True)
    assert "f_reduced" in kept.columns
    row = kept.where(F.col("f") == "C").first()
    assert row["f_reduced"] == "C"


def test_us_week_col_matches_twin(spark):
    dates = [dt.date(2015, 1, 1) + dt.timedelta(days=i)
             for i in range(0, 1200, 7)] + \
            [dt.date(2016, 1, 1), dt.date(2016, 1, 3),
             dt.date(2017, 12, 31)]
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    got = df.select(us_week_col(F.col("d")).alias("w")).collect()
    for r, d in zip(got, dates):
        assert r["w"] == us_week_of_year(d), d


def test_date_difference_closed_form_vs_walk(spark):
    base = dt.date(2015, 6, 15)
    rows = [(base + dt.timedelta(days=i * 3),
             base + dt.timedelta(days=(i * i) % 40 - 10))
            for i in range(60)]
    df = spark.createDataFrame(rows, "d1 date, d2 date")
    got = date_difference(df, "d1", "d2").collect()
    for r, (d1, d2) in zip(got, rows):
        assert r["d1_minus_d2_days"] == (d1 - d2).days  # signed
        assert r["d1_minus_d2_weeks"] == weeks_difference(d1, d2), (d1, d2)
        assert r["d1_minus_d2_businessDays"] == \
            work_days_difference(d1, d2), (d1, d2)


def test_date_particles_day_precision(spark):
    df = spark.createDataFrame([(dt.date(2015, 1, 3),)], "d date")
    r = date_particles(df, "d").collect()[0]
    assert r["d_year_num"] == 2015 and r["d_year_nom"] == "Y2015"
    assert r["d_quarter"] == "WINTER"
    assert r["d_month_num"] == 1 and r["d_month_nom"] == "JANUARY"
    assert r["d_year-quarter"] == "2015-WINTER"
    assert r["d_year-month"] == "2015-1"  # unpadded
    assert r["d_week_num"] == 1 and r["d_week_nom"] == "cw_1"
    assert r["d_dayOfYear_num"] == 3 and r["d_dayOfYear_nom"] == "d_3"
    assert r["d_dayOfMonth_num"] == 3 and r["d_dayOfMonth_nom"] == "dm_3"
    assert r["d_dayOfWeek_num"] == 6  # Saturday, ISO
    assert r["d_dayOfWeek_nom"] == "SATURDAY"
    assert r["d_weekend"] is True
    assert r["d_year-week"] == "2015-1"


def test_date_particles_precisions(spark):
    df = spark.createDataFrame([(dt.date(2015, 7, 1),)], "d date")
    y = date_particles(df, "d", "year")
    assert "d_year_num" in y.columns and "d_month_num" not in y.columns
    m = date_particles(df, "d", "month")
    assert "d_month_num" in m.columns and "d_week_num" not in m.columns
    assert m.collect()[0]["d_quarter"] == "SUMMER"


def test_plan_no_python(spark):
    df = spark.createDataFrame([(dt.date(2015, 1, 3), dt.date(2015, 2, 1))],
                               "d1 date, d2 date")
    plan = date_particles(date_difference(df, "d1", "d2"), "d1") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


# ------------------------- image-processing dataset utils

def test_binarize_values(spark):
    from kgp.featuretransform import binarize_values
    df = spark.createDataFrame([(1.5, "x"), (0.0, "y"), (-2.0, "z")],
                               "v double, s string")
    rows = binarize_values(df, ["v"]).collect()
    assert [r["v"] for r in rows] == [True, False, False]
    with pytest.raises(ValueError):
        binarize_values(df, ["s"])


def test_relativize_values_int_truncation_quirk(spark):
    from kgp.featuretransform import relativize_values
    # Java: int bowSum += 1.7 -> 1; += 2.7 -> (int)(1+2.7)=3
    df = spark.createDataFrame([(1.7, 2.7)], "a double, b double")
    r = relativize_values(df, ["a", "b"]).collect()[0]
    assert r["a"] == pytest.approx(1.7 / 3)
    assert r["b"] == pytest.approx(2.7 / 3)
    # non-positive sum -> 0
    z = spark.createDataFrame([(0.0, 0.0)], "a double, b double")
    rz = relativize_values(z, ["a", "b"]).collect()[0]
    assert rz["a"] == 0.0 and rz["b"] == 0.0


def test_modulo_filter(spark):
    from kgp.featuretransform import modulo_filter
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    kept = sorted(r["id"] for r in
                  modulo_filter(df, "id", 3, 1).collect())
    # 1-based positions 1,4,7,10 -> ids 0,3,6,9
    assert kept == [0, 3, 6, 9]


def test_nan_infinite_filter_and_transformer(spark):
    from kgp.featuretransform import drop_nan_infinite, zero_nan_infinite
    df = spark.createDataFrame(
        [(1.0, 2.0), (float("nan"), 1.0), (1.0, float("inf")),
         (float("-inf"), 0.0)], "a double, b double")
    assert drop_nan_infinite(df).count() == 1
    rows = zero_nan_infinite(df).collect()
    vals = sorted((r["a"], r["b"]) for r in rows)
    assert vals == [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 2.0)]
