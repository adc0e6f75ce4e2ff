"""GeoText reader (kgp.geotext) — fold/subset goldens, latin-1 sha1,
USER-combination semantics, stage == literal-twin parity, plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgp.geotext import (geotext_docs, geotext_read_local, sha1_latin1)

LINES = [
    "USER_1\t?\t?\t33.5\t-87.6\tfirst tweet",       # uid 1 fold 1
    "USER_1\t?\t?\t33.5\t-87.6\tsecond tweet",
    "USER_a\t?\t?\t40.0\t-75.1\tcafé tweet",        # uid 10 fold 5
    "USER_3\t?\t?\t29.9\t-90.1\tanother user",      # uid 3 fold 3
]


def test_sha1_latin1_golden():
    # published SHA-1 test vector
    assert sha1_latin1("abc") == \
        "a9993e364706816aba3e25717850c26c9cd0d89d"


def test_twin_single_and_folds():
    out = geotext_read_local(LINES)
    assert [(r[1], r[2]) for r in out] == [
        ("USER_1", 1), ("USER_1", 1), ("USER_a", 5), ("USER_3", 3)]
    assert out[0][0] == "USER_1#" + sha1_latin1("first tweet")
    # subset filters by fold
    assert [r[1] for r in geotext_read_local(LINES, "TRAIN")] == [
        "USER_1", "USER_1", "USER_3"]
    assert [r[1] for r in geotext_read_local(LINES, "TEST")] == ["USER_a"]


def test_twin_user_combination():
    out = geotext_read_local(LINES, combination="USER")
    assert [(r[0], r[5]) for r in out] == [
        ("USER_1", "first tweet\nsecond tweet"),
        ("USER_a", "café tweet"),
        ("USER_3", "another user")]
    # first tweet's coordinate kept
    assert (out[0][3], out[0][4]) == (33.5, -87.6)


def test_twin_malformed_raises():
    with pytest.raises(ValueError, match="Illegal format"):
        geotext_read_local(["only\tthree\tcols"])


def test_stage_matches_twin(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "value string")
    for subset in (None, "TRAIN", "TEST"):
        for mode in ("SINGLE", "USER"):
            got = sorted(map(tuple, geotext_docs(
                df, subset, mode).collect()))
            want = sorted(geotext_read_local(LINES, subset, mode))
            assert got == want, (subset, mode)


def test_stage_malformed_raises(spark):
    df = spark.createDataFrame([("a\tb",)], "value string")
    with pytest.raises(Exception, match="Illegal format"):
        geotext_docs(df).collect()


def test_single_plan_zero_python(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "value string")
    plan = (geotext_docs(df, "TRAIN")
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "InPandas" not in plan
