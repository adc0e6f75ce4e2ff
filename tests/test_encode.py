"""Encoders + nominal classifier (kgp.encode)."""

from __future__ import annotations

import pytest

from kgp.encode import (frequency_encode, label_encode, nominal_predict,
                        nominal_train)


def _df(spark):
    return spark.createDataFrame(
        [(1, "b", "x"), (2, "a", "x"), (3, "c", None), (4, "a", "y")],
        "id long, f1 string, f2 string")


def test_label_encode_sorted_indexes(spark):
    got = {r.id: (r.f1_index, r.f2_index)
           for r in label_encode(_df(spark), ["f1", "f2"]).collect()}
    # f1 sorted: a=0, b=1, c=2; f2: x=0, y=1; null stays null
    assert got == {1: (1, 0), 2: (0, 0), 3: (2, None), 4: (0, 1)}


def test_frequency_encode_strategies(spark):
    got = {r.id: r.f2_frequency for r in
           frequency_encode(_df(spark), ["f2"]).collect()}
    assert got[1] == pytest.approx(0.5)      # x: 2/4
    assert got[4] == pytest.approx(0.25)     # y: 1/4
    assert got[3] is None                    # keep_null
    got = {r.id: r.f2_frequency for r in
           frequency_encode(_df(spark), ["f2"],
                            null_strategy="assign_frequency").collect()}
    assert got[3] == pytest.approx(0.25)     # null count 1/4


def test_nominal_classifier_shared_row_space(spark):
    """Values colliding across feature columns share a matrix row —
    the reference quirk (NominalClassifier.java:26-39)."""
    train = spark.createDataFrame(
        [("x", "x", "pos"), ("x", "y", "pos"), ("y", "y", "neg")],
        "f1 string, f2 string, category string")
    model = nominal_train(train, ["f1", "f2"])
    rows = {(r.value, r.category): (r.n, r.row_sum)
            for r in model.collect()}
    # value 'x' appears 3 times total (f1 twice, f2 once), all pos
    assert rows[("x", "pos")] == (3, 3)
    # value 'y': f2-pos once, f1-neg once, f2-neg once
    assert rows[("y", "pos")] == (1, 3)
    assert rows[("y", "neg")] == (2, 3)


def test_nominal_predict_probabilities(spark):
    train = spark.createDataFrame(
        [("x", "pos")] * 3 + [("x", "neg")] * 1 + [("y", "neg")] * 4,
        "f1 string, category string")
    model = nominal_train(train, ["f1"])
    test = spark.createDataFrame([(1, "x"), (2, "y")],
                                 "id long, f1 string")
    got = {r.id: r for r in
           nominal_predict(test, model, ["f1"], "id").collect()}
    assert got[1].predicted == "pos"
    assert got[1].probability == pytest.approx(0.75)
    assert got[2].predicted == "neg" and got[2].probability == 1.0


def test_nominal_predict_tie_break(spark):
    train = spark.createDataFrame(
        [("x", "b"), ("x", "a")], "f1 string, category string")
    model = nominal_train(train, ["f1"])
    test = spark.createDataFrame([(1, "x")], "id long, f1 string")
    got = nominal_predict(test, model, ["f1"], "id").collect()[0]
    assert got.predicted == "a"              # name-asc tie
