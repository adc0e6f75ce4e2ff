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


# ------------------------------------------- normalizers (utils/ port)


def test_minmax_normalizer_golden(spark):
    """MinMaxNormalizerTest.testMinMaxNormalization goldens."""
    from kgp.encode import apply_minmax, fit_minmax
    df = spark.createDataFrame(
        [(50.0, 1000.0), (10.0, 10000.0), (5.0, 10.0)],
        "v1 double, v2 double")
    stats = fit_minmax(df, ["v1", "v2"])
    rows = sorted(apply_minmax(df, stats).collect(),
                  key=lambda r: -r.v1)
    assert rows[0].v1 == pytest.approx(1.0)
    assert rows[1].v1 == pytest.approx(0.1111, abs=1e-3)
    assert rows[2].v1 == pytest.approx(0.0)
    assert rows[0].v2 == pytest.approx(0.0999, abs=1e-3)
    assert rows[1].v2 == pytest.approx(1.0)
    assert rows[2].v2 == pytest.approx(0.0)


def test_minmax_equal_min_max(spark):
    """MinMaxNormalizerTest.testNormalizationWithEqualMinMax:
    degenerate range -> value - min."""
    from kgp.encode import apply_minmax, fit_minmax
    fit = spark.createDataFrame([(0.9,), (0.9,)], "test double")
    stats = fit_minmax(fit, ["test"])
    out = spark.createDataFrame([(5.0,)], "test double")
    assert apply_minmax(out, stats).collect()[0].test == \
        pytest.approx(4.1)


def test_zscore_normalizer_golden(spark):
    """ZScoreNormalizerTest.testZScoreNormalization: sample stddev
    (n-1 denominator, SlimStats.java:109-117)."""
    from kgp.encode import apply_zscore, fit_zscore
    df = spark.createDataFrame(
        [(35.0,), (36.0,), (46.0,), (68.0,), (70.0,)], "v1 double")
    stats = fit_zscore(df, ["v1"])
    got = sorted(r.v1 for r in apply_zscore(df, stats).collect())
    want = [-0.9412, -0.8824, -0.2941, 1.0, 1.1176]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-3)


def test_zscore_zero_stddev(spark):
    """ZScoreNormalizerTest.testNormalizationWithEqualMinMax:
    stddev 0 -> value - mean."""
    from kgp.encode import apply_zscore, fit_zscore
    fit = spark.createDataFrame([(0.9,), (0.9,)], "test double")
    stats = fit_zscore(fit, ["test"])
    out = spark.createDataFrame([(0.9,), (0.0,), (1.8,)],
                                "test double")
    got = sorted(r.test for r in apply_zscore(out, stats).collect())
    assert got == pytest.approx([-0.9, 0.0, 0.9], abs=1e-3)


def test_normalizers_skip_all_null_columns(spark):
    from kgp.encode import fit_minmax, fit_zscore
    df = spark.createDataFrame([(None, 1.0), (None, 2.0)],
                               "a double, b double")
    assert "a" not in fit_minmax(df, ["a", "b"])
    assert "a" not in fit_zscore(df, ["a", "b"])


# ----------------------------------------------- one-hot (DummyVariableCreator)


def test_one_hot_golden(spark):
    """DummyVariableCreatorTest.testDummyVariableCreator: 4-value f1
    -> 4 columns; boolean f2 -> single f2:true; (beta, false) row."""
    from kgp.encode import apply_one_hot, fit_one_hot
    fit = spark.createDataFrame(
        [("alpha", "true"), ("beta", "false"), ("gamma", "true"),
         ("delta", "false"), ("alpha", "true")],
        "f1 string, f2 string")
    mapping = fit_one_hot(fit, ["f1", "f2"])
    assert sorted(mapping["f1"]) == ["alpha", "beta", "delta", "gamma"]
    assert mapping["f2"] == ["true"]
    assert sum(len(v) for v in mapping.values()) == 5

    df = spark.createDataFrame([("beta", "false")],
                               "f1 string, f2 string")
    row = apply_one_hot(df, mapping).collect()[0].asDict()
    assert row["f1:beta"] == 1
    assert row["f1:alpha"] == row["f1:gamma"] == row["f1:delta"] == 0
    assert row["f2:true"] == 0
    row = apply_one_hot(
        spark.createDataFrame([("beta", "true")],
                              "f1 string, f2 string"),
        mapping).collect()[0].asDict()
    assert row["f2:true"] == 1


def test_one_hot_two_value_collapse_and_null(spark):
    """<= 2 uniques INCLUDING null collapse to one indicator
    (DummyVariableCreator.java:85-99); sorted-first substitutes the
    reference's HashSet pick; unseen values -> all zeros."""
    from kgp.encode import apply_one_hot, fit_one_hot
    fit = spark.createDataFrame(
        [("red", "x"), ("blue", None), ("red", None)],
        "c1 string, c2 string")
    mapping = fit_one_hot(fit, ["c1", "c2"])
    assert mapping["c1"] == ["blue"]      # 2 values -> sorted-first
    assert mapping["c2"] == ["x"]         # {x, null} -> x only
    df = spark.createDataFrame([("green", None)],
                               "c1 string, c2 string")
    row = apply_one_hot(df, mapping).collect()[0].asDict()
    assert row["c1:blue"] == 0 and row["c2:x"] == 0


def test_one_hot_keep_original(spark):
    from kgp.encode import apply_one_hot, fit_one_hot
    fit = spark.createDataFrame([("a",), ("b",), ("c",)], "f string")
    mapping = fit_one_hot(fit, ["f"])
    out = apply_one_hot(fit, mapping, keep_original=True)
    assert "f" in out.columns and "f:a" in out.columns


def test_one_hot_plan_pure_jvm(spark):
    from kgp.encode import apply_one_hot
    from tests.test_plans import plan_of
    df = spark.createDataFrame([("a",)], "f string")
    plan = plan_of(apply_one_hot(df, {"f": ["a", "b"]}))
    assert "Python" not in plan and "Exchange" not in plan
