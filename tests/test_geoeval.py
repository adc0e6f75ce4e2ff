"""Geo evaluation (kgp/geoeval.py) — GeoEvaluationResult.java port:
walk quirks, 100 km correctness, and the distributed aggregation."""

from __future__ import annotations

import pytest

from kgp.geoeval import (geo_counters, geo_evaluate_document,
                         geo_evaluation)

# (start, end, tag, lat, lng)
BERLIN = (52.52, 13.40)
POTSDAM = (52.39, 13.06)       # ~34 km from Berlin
MUNICH = (48.14, 11.58)        # ~500 km from Berlin


def test_congruent_correct_and_distance():
    gold = [(0, 6, "CITY", *BERLIN)]
    tagged = [(0, 6, "CITY", *POTSDAM)]
    items = geo_evaluate_document(gold, tagged)
    assert [i["result"] for i in items] == ["CORRECT"]
    c, rt, rl = geo_counters(items)
    assert (c, rt, rl) == (1, 1, 1)        # 34 km < 100 km
    tagged_far = [(0, 6, "CITY", *MUNICH)]
    c, rt, rl = geo_counters(geo_evaluate_document(gold, tagged_far))
    assert (c, rt, rl) == (0, 1, 1)        # span right, geo wrong


def test_overlap_error4_continues_walk():
    """An overlapping tagged span claims SEVERAL golds (the walk does
    not break on ERROR4) and suppresses its own ERROR1."""
    gold = [(0, 10, "CITY", *BERLIN), (12, 20, "CITY", *POTSDAM)]
    tagged = [(5, 15, "CITY", *BERLIN)]
    items = geo_evaluate_document(gold, tagged)
    results = [i["result"] for i in items]
    assert results.count("ERROR4") == 2
    assert "ERROR1" not in results


def test_spurious_and_missed():
    gold = [(0, 6, "CITY", *BERLIN)]
    tagged = [(20, 26, "CITY", *MUNICH)]
    items = geo_evaluate_document(gold, tagged)
    assert sorted(i["result"] for i in items) == ["ERROR1", "ERROR2"]
    c, rt, rl = geo_counters(items)
    # ERROR1 has no gold coordinate -> skipped from counters; ERROR2
    # counts as relevant
    assert (c, rt, rl) == (0, 0, 1)


def test_only_city_poi_with_gold_coordinate_counted():
    gold = [(0, 6, "COUNTRY", *BERLIN), (8, 14, "CITY", None, None)]
    tagged = [(0, 6, "COUNTRY", *BERLIN), (8, 14, "CITY", *BERLIN)]
    c, rt, rl = geo_counters(geo_evaluate_document(gold, tagged))
    assert (c, rt, rl) == (0, 0, 0)


def test_geo_evaluation_distributed(spark):
    gold = spark.createDataFrame(
        [("u1", 0, 6, "CITY", BERLIN[0], BERLIN[1]),
         ("u1", 20, 28, "CITY", MUNICH[0], MUNICH[1]),
         ("u2", 0, 6, "POI", POTSDAM[0], POTSDAM[1])],
        "url string, start int, end int, tag string, "
        "lat double, lng double")
    tagged = spark.createDataFrame(
        [("u1", 0, 6, "CITY", POTSDAM[0], POTSDAM[1]),   # geo-correct
         ("u1", 20, 28, "CITY", BERLIN[0], BERLIN[1]),   # 500 km off
         ("u2", 40, 46, "CITY", MUNICH[0], MUNICH[1])],  # spurious
        "url string, start int, end int, tag string, "
        "lat double, lng double")
    [row] = geo_evaluation(gold, tagged).collect()
    # u1: CORRECT(34km ok) + CORRECT(500km geo-wrong); u2: ERROR1
    # (no coord->skip) + ERROR2(gold POI missed)
    assert (row.correct, row.retrieved, row.relevant) == (1, 2, 3)
    assert row.precision == pytest.approx(0.5)
    assert row.recall == pytest.approx(1 / 3, abs=1e-6)
