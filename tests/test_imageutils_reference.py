"""Upstream palladian-image-processing utils + experimental
CooccurrenceMatrix test vectors, transcribed mechanically.

Sources (assertions copied 1:1):
- MultilabelEvaluatorTest.java:19-48
- InstanceValueTransformerTest.java:30-45
- ModuloFilterTest.java:12-23
- CooccurrenceMatrixTest.java:12-50 (the Jurafsky 2012 bigram table)
"""

import pytest
from pyspark.sql import functions as F

from kgp.cooccurrence import CooccurrenceMatrixLocal
from kgp.ensemble import multilabel_rows
from kgp.featuretransform import (binarize_values, modulo_filter,
                                  relativize_values)

DELTA = 0.001


def _ml(spark, actual, assigned):
    df = spark.createDataFrame(
        [(list(actual), list(assigned))],
        "true_labels array<int>, assigned_labels array<int>")
    return multilabel_rows(df).collect()[0]


def test_multilabel_evaluator(spark):
    r = _ml(spark, {1, 2, 3}, {1, 2, 4, 5})
    assert abs(r["precision"] - 0.5) < DELTA
    assert abs(r["recall"] - 0.6666666667) < DELTA
    f1 = 2 * r["precision"] * r["recall"] / (r["precision"]
                                             + r["recall"])
    assert abs(f1 - 0.5714285714) < DELTA

    r = _ml(spark, set(), set())
    assert r["precision"] == 1.0 and r["recall"] == 1.0

    r = _ml(spark, {1}, set())
    assert r["precision"] == 1.0
    assert r["recall"] == 0.0

    r = _ml(spark, set(), {1})
    assert r["precision"] == 0.0
    assert r["recall"] == 1.0


def test_binarizer_and_relativizer(spark):
    df = spark.createDataFrame(
        [(3, 5, 2, 0, 10)],
        "`word-a` int, `word-b` int, `word-c` int, `word-d` int, "
        "`other-value` int")
    words = ["word-a", "word-b", "word-c", "word-d"]
    b = binarize_values(df, words).collect()[0]
    assert b["word-a"] is True
    assert b["word-d"] is False
    assert b["other-value"] == 10        # untouched

    r = relativize_values(df, words).collect()[0]
    assert abs(r["word-a"] - 0.3) < 1e-9
    assert r["word-d"] == 0.0
    assert r["other-value"] == 10


def test_modulo_filter(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "pos long")
    # ModuloFilter(true): keep positions 0,2,4 (alternating from
    # true); ModuloFilter(false): 1,3,5
    even = sorted(r["pos"] for r in
                  modulo_filter(df, "pos", 2, 1).collect())
    odd = sorted(r["pos"] for r in
                 modulo_filter(df, "pos", 2, 0).collect())
    assert even == [0, 2, 4]
    assert odd == [1, 3, 5]


def test_cooccurrence_matrix_phrase_probs():
    m = CooccurrenceMatrixLocal()
    m.add("i", "i", 5).add("want", "i", 2).add("to", "i", 2) \
        .add("chinese", "i", 1).add("food", "i", 15)
    m.add("lunch", "i", 2).add("spend", "i", 2)
    m.add("i", "want", 827)
    m.add("want", "to", 608).add("to", "to", 4).add("eat", "to", 2) \
        .add("spend", "to", 1)
    m.add("i", "eat", 9).add("want", "eat", 91).add("to", "eat", 686)
    m.add("want", "chinese", 6).add("to", "chinese", 2) \
        .add("eat", "chinese", 16).add("food", "chinese", 1)
    m.add("want", "food", 6).add("eat", "food", 2) \
        .add("chinese", "food", 82).add("food", "food", 4)
    m.add("lunch", "food", 1)
    m.add("want", "lunch", 5).add("to", "lunch", 6) \
        .add("eat", "lunch", 42).add("chinese", "lunch", 1)
    m.add("i", "spend", 2).add("want", "spend", 1) \
        .add("to", "spend", 211)
    for t, c in [("i", 2533), ("want", 927), ("to", 2417),
                 ("eat", 746), ("chinese", 158), ("food", 1093),
                 ("lunch", 341), ("spend", 278)]:
        m.set(t, c)

    assert m.get_count("chinese") == 158
    assert m.get_count("to", "eat") == 686
    assert abs(m.conditional_probability("chinese", "want")
               - 0.0065) < 0.0001
    assert abs(m.conditional_probability("eat", "to") - 0.28) < 0.01
    assert abs(m.conditional_probability("to", "want") - 0.65) < 0.01
    assert abs(m.conditional_probability("food", "to") - 0) < 0.01
    assert abs(m.conditional_probability("want", "spend") - 0) < 0.01
