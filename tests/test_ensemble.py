"""Vote-aggregation strategies + MultilabelEvaluator ports."""

from __future__ import annotations

import pytest

from kgp.ensemble import (aggregate_averaged, aggregate_majority,
                          aggregate_one_vote, aggregate_unanimous,
                          multilabel_result, multilabel_rows)

ROWS = [
    # item 1: two classifiers
    (1, "c1", "food", 0.9), (1, "c1", "drinks", 0.4),
    (1, "c2", "food", 0.6), (1, "c2", "drinks", 0.8),
    # item 2: two classifiers, disagreement on food
    (2, "c1", "food", 0.2), (2, "c2", "food", 0.7),
]
SCHEMA = "item_id long, classifier_id string, label string, prob double"
LABELS = ["food", "drinks", "outdoor"]


def _scores(rows):
    return {(r["item_id"], r["label"]): r["score"] for r in rows}


def test_majority(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _scores(aggregate_majority(df, threshold=0.5).collect())
    # item1 food: both >0.5 -> 2/2; drinks: one vote -> 1/2
    assert got[(1, "food")] == 1.0
    assert got[(1, "drinks")] == 0.5
    assert got[(2, "food")] == 0.5
    assert (2, "drinks") not in got  # unvoted labels absent


def test_majority_per_label_thresholds(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _scores(aggregate_majority(
        df, threshold=0.5, thresholds={"drinks": 0.3}).collect())
    assert got[(1, "drinks")] == 1.0  # both 0.4 and 0.8 clear 0.3


def test_unanimous(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _scores(aggregate_unanimous(df, LABELS, 0.5).collect())
    # item1 food: unanimous -> (0.9+0.6)/2; drinks: not -> 0
    assert got[(1, "food")] == pytest.approx(0.75)
    assert got[(1, "drinks")] == 0.0
    assert got[(1, "outdoor")] == 0.0  # full universe emitted
    assert got[(2, "food")] == 0.0
    assert len(got) == 6


def test_one_vote(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _scores(aggregate_one_vote(df, 0.5).collect())
    assert got[(1, "food")] == 0.9      # strongest vote
    assert got[(1, "drinks")] == 0.8
    assert got[(2, "food")] == 0.7
    assert (1, "outdoor") not in got


def test_averaged(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _scores(aggregate_averaged(df, LABELS).collect())
    assert got[(1, "food")] == pytest.approx(0.75)
    assert got[(1, "drinks")] == pytest.approx(0.6)
    assert got[(1, "outdoor")] == 0.0   # never voted -> 0
    assert got[(2, "food")] == pytest.approx(0.45)


def test_multilabel_rows_and_result(spark):
    df = spark.createDataFrame(
        [(["a", "b"], ["a"]),        # p=1, r=0.5
         (["a"], ["a", "b"]),        # p=0.5, r=1
         ([], ["x"]),                # p=0, r=1 (empty true)
         (["y"], [])],               # p=1 (empty assigned), r=0
        "true_labels array<string>, assigned_labels array<string>")
    rows = {(r["n_true"], r["n_assigned"]): (r["precision"], r["recall"])
            for r in multilabel_rows(df).collect()}
    assert rows[(2, 1)] == (1.0, 0.5)
    assert rows[(1, 2)] == (0.5, 1.0)
    assert rows[(0, 1)] == (0.0, 1.0)
    assert rows[(1, 0)] == (1.0, 0.0)
    p, r, f1 = multilabel_result(df)
    assert p == pytest.approx((1 + 0.5 + 0 + 1) / 4)
    assert r == pytest.approx((0.5 + 1 + 1 + 0) / 4)
    assert f1 == pytest.approx(2 * p * r / (p + r))


def test_multilabel_result_empty_raises(spark):
    df = spark.createDataFrame(
        [], "true_labels array<string>, assigned_labels array<string>")
    with pytest.raises(ValueError):
        multilabel_result(df)


# ------------------------------------------------- label dependencies

def test_dependency_matrix(spark):
    from kgp.ensemble import dependency_matrix
    df = spark.createDataFrame(
        [(["a", "b"],), (["a"],), (["b", "c"],)],
        "labels array<string>")
    priors, deps = dependency_matrix(df, header_in_total=False)
    assert priors["a"] == pytest.approx(2 / 3)
    assert priors["c"] == pytest.approx(1 / 3)
    # dep(a -> b): co(a,b)=1 / count(b)=2
    assert deps[("a", "b")] == 0.5
    assert deps[("b", "a")] == 0.5
    assert deps[("c", "b")] == 0.5
    # header quirk: divisor + 1
    p2, _ = dependency_matrix(df, header_in_total=True)
    assert p2["a"] == pytest.approx(2 / 4)


def test_aggregate_dependency_hand_golden(spark):
    from kgp.ensemble import aggregate_dependency
    # one item, ONE classifier with two labels
    df = spark.createDataFrame(
        [(1, "c1", "a", 0.8), (1, "c1", "b", 0.5)],
        "item_id long, classifier_id string, label string, prob double")
    priors = {"a": 0.6, "b": 0.4}
    deps = {("a", "b"): 0.5, ("b", "a"): 0.25}
    got = {(r["item_id"], r["label"]): r["score"]
           for r in aggregate_dependency(df, priors, deps,
                                         ["a", "b", "z"]).collect()}
    # score(a) = 0.6*0.8 + 0.4*dep(b->a)*0.5 = 0.48 + 0.4*0.25*0.5 = 0.53
    # score(b) = 0.4*0.5 + 0.6*dep(a->b)*0.8 = 0.2 + 0.24 = 0.44
    # maxScore = max(1, .53) = 1; n = 1
    assert got[(1, "a")] == pytest.approx(0.53)
    assert got[(1, "b")] == pytest.approx(0.44)
    assert got[(1, "z")] == 0.0


def test_aggregate_dependency_normalizes_by_max(spark):
    from kgp.ensemble import aggregate_dependency
    df = spark.createDataFrame(
        [(1, "c1", "a", 1.0), (1, "c2", "a", 1.0)],
        "item_id long, classifier_id string, label string, prob double")
    priors = {"a": 1.0}
    got = {r["label"]: r["score"]
           for r in aggregate_dependency(df, priors, {},
                                         ["a"]).collect()}
    # per-classifier score 1.0, sum 2.0 > 1 -> maxScore 2; n=2 -> 0.5
    assert got["a"] == pytest.approx(0.5)
