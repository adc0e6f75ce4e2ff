"""Spatial2dIdMap twin tests: getBoundingBox/approximateDistance
goldens, the local map's box/closest semantics incl. the reference's
lng2:=lat2 argument-swap bug, and distributed == local parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgp.spatial import (Spatial2dIdMap, approximate_distance,
                         bounding_box, closest_to_stage,
                         find_in_box_stage)


def test_bounding_box_golden():
    lat1, lng1, lat2, lng2 = bounding_box(50.0, 8.0, 111.2)
    assert lat1 == pytest.approx(49.0)
    assert lat2 == pytest.approx(51.0)
    import math
    span = 111.2 / abs(math.cos(math.radians(50.0)) * 111.2)
    assert lng1 == pytest.approx(8.0 - span)
    assert lng2 == pytest.approx(8.0 + span)


def test_approximate_distance():
    # one degree of latitude ~ 111.19 km on the 6371 km sphere
    d = approximate_distance(50.0, 8.0, 51.0, 8.0)
    assert d == pytest.approx(111.19, abs=0.01)
    assert approximate_distance(10.0, 20.0, 10.0, 20.0) == 0.0
    # symmetric
    assert approximate_distance(1.0, 2.0, 3.0, 4.0) == \
        pytest.approx(approximate_distance(3.0, 4.0, 1.0, 2.0))


def test_local_map_box_and_closest():
    m = Spatial2dIdMap()
    m.put(50.0, 8.0, 1)
    m.put(50.5, 8.2, 2)
    m.put(52.0, 8.0, 3)
    m.put(50.1, 12.0, 4)
    assert m.find_in_box(49.5, 7.5, 51.0, 9.0) == {1, 2}
    # normalization applied on put (GeoUtils.normalizeLongitude)
    m.put(50.2, 368.0, 5)
    assert m.find_in_box(49.5, 7.5, 51.0, 9.0) == {1, 2, 5}
    # closest: sorted by approximateDistance from (50.05, 8.05)
    ids = m.closest_to(50.05, 8.05, 200_000, reference_bug=False)
    assert ids[0] == 1 and ids[1] == 5 and ids[2] == 2
    # the as-written bug uses lat2 as the lng upper bound: with
    # lat2 ~ 51.8 every lng <= 51.8 passes, so id=4 (lng 12) joins
    bug_ids = m.closest_to(50.05, 8.05, 200_000, reference_bug=True)
    assert 4 in bug_ids and 4 not in ids


def test_distributed_matches_local(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, rnd.uniform(-60, 60), rnd.uniform(-170, 170))
            for i in range(300)]
    m = Spatial2dIdMap()
    for i, la, lo in rows:
        m.put(la, lo, i)
    points = spark.createDataFrame(rows, "id long, lat double, lng double")
    queries = spark.createDataFrame(
        [(0, -10.0, 20.0, 30.0, 60.0), (1, 40.0, -120.0, 60.0, -80.0)],
        "qid long, lat1 double, lng1 double, lat2 double, lng2 double")
    got = find_in_box_stage(points, queries).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], set()).add(r["id"])
    assert by_q.get(0, set()) == m.find_in_box(-10, 20, 30, 60)
    assert by_q.get(1, set()) == m.find_in_box(40, -120, 60, -80)

    # closest_to_stage == local evident-intent twin per query
    qpts = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 45.0, 100.0)],
        "qid long, lat double, lng double")
    dist = closest_to_stage(points, qpts, 2000.0).collect()
    for qid, qla, qlo in [(0, 0.0, 0.0), (1, 45.0, 100.0)]:
        want = m.closest_to(qla, qlo, 2_000_000, reference_bug=False)
        gotq = sorted([r for r in dist if r["qid"] == qid],
                      key=lambda r: r["rank"])
        assert [r["id"] for r in gotq] == want


def test_no_python_in_plan(spark):
    points = spark.createDataFrame([(1, 0.0, 0.0)],
                                   "id long, lat double, lng double")
    queries = spark.createDataFrame(
        [(0, -1.0, -1.0, 1.0, 1.0)],
        "qid long, lat1 double, lng1 double, lat2 double, lng2 double")
    plan = (find_in_box_stage(points, queries)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # cell blocking: the join is an equi-join, not a cartesian one
    assert "CartesianProduct" not in plan
