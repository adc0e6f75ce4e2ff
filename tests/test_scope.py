from __future__ import annotations

from pyspark.sql import functions as F

from kgp.scope import (detect_scopes, scope_first, scope_frequency,
                       scope_midpoint, scope_population)

GAZ = ("id long, name string, type string, population long, "
       "lat double, lon double")
LNK = "url string, sent_idx int, start int, entity_id long"


def _gaz(spark):
    rows = [
        (1, "Smallville", "CITY", 900, 40.0, -75.0),
        (2, "Metropolis", "CITY", 5_000_000, 40.5, -74.0),
        (3, "Oz", "COUNTRY", 9_000_000, 41.0, -74.5),
        (4, "Nowhere", "CITY", None, None, None),     # no pop, no coord
        (5, "John Smith", "PER", None, None, None),   # not a location
    ]
    return spark.createDataFrame(rows, GAZ)


def test_scope_frequency(spark):
    links = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 0, 10, 1), ("u", 1, 0, 2),
         ("u", 1, 5, 5),                   # PER ignored
         ("v", 0, 0, 1), ("v", 0, 5, 2)],  # tie -> smaller entity_id
        LNK)
    got = {r.url: r.entity_id for r in
           scope_frequency(links, _gaz(spark)).collect()}
    assert got == {"u": 1, "v": 1}


def test_scope_population(spark):
    gaz = _gaz(spark)
    # no country present -> highest population wins
    links = spark.createDataFrame([("u", 0, 0, 1), ("u", 0, 9, 2)], LNK)
    assert scope_population(links, gaz).collect()[0].entity_id == 2
    # a COUNTRY beats even larger-population cities
    links2 = spark.createDataFrame([("u", 0, 0, 2), ("u", 0, 9, 3)], LNK)
    assert scope_population(links2, gaz).collect()[0].entity_id == 3
    # only population-less locations -> no row (reference returns null)
    links3 = spark.createDataFrame([("u", 0, 0, 4)], LNK)
    assert scope_population(links3, gaz).count() == 0


def test_scope_midpoint(spark):
    # two mentions near (40, -75), one outlier: midpoint sits between
    # the cluster members; entity 2 at (40.5, -74) is closest to the
    # midpoint of {1, 1, 3}? cluster around entity 1 dominates
    links = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 1, 0, 1), ("u", 2, 0, 3)], LNK)
    got = scope_midpoint(links, _gaz(spark)).collect()[0]
    assert got.entity_id == 1         # midpoint pulled to the cluster
    # coordinate-less locations never rank
    links2 = spark.createDataFrame([("u", 0, 0, 4)], LNK)
    assert scope_midpoint(links2, _gaz(spark)).count() == 0


def test_scope_first(spark):
    links = spark.createDataFrame(
        [("u", 1, 0, 2), ("u", 0, 3, 4),   # first has no coordinate
         ("u", 0, 7, 3)], LNK)
    # (0, 3) is earliest but entity 4 lacks coordinates -> (0, 7) wins
    assert scope_first(links, _gaz(spark)).collect()[0].entity_id == 3


def test_detect_scopes_union(spark):
    links = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 0, 9, 2), ("u", 1, 0, 2)], LNK)
    got = {(r.method): r.entity_id for r in
           detect_scopes(links, _gaz(spark)).collect()}
    assert got == {"frequency": 2, "population": 2,
                   "midpoint": 2, "first": 1}


def test_no_python_in_plan(spark):
    links = spark.createDataFrame([("u", 0, 0, 1)], LNK)
    plan = detect_scopes(links, _gaz(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan
