"""NBSVM port: the naive-Bayes log-count-ratio transform (hand
golden + distributed==sequential twin), label validation, end-to-end
classification."""

from __future__ import annotations

import math

import pytest

from kgp.nbsvm import (nb_ratio_local, nbsvm_fit_ratios, nbsvm_predict,
                       nbsvm_train, nbsvm_transform, transform_local)


def test_nb_ratio_hand_golden():
    # one positive doc {a:1}, one negative {b:1}:
    # p = [1+1, 1] = [2, 1]; q = [1, 2]; sums 3 each
    # r_a = log((2/3)/(1/3)) = log 2; r_b = log((1/3)/(2/3)) = -log 2
    inst = [({"a": 1.0}, "1"), ({"b": 1.0}, "0")]
    d, r = nb_ratio_local(inst, float32=False)
    assert r[d["a"]] == pytest.approx(math.log(2))
    assert r[d["b"]] == pytest.approx(-math.log(2))


def test_nb_ratio_rejects_other_labels():
    with pytest.raises(ValueError):
        nb_ratio_local([({"a": 1.0}, "yes")])


def test_transform_local_drops_unknown():
    d, r = nb_ratio_local([({"a": 2.0}, "1"), ({"b": 1.0}, "0")])
    out = transform_local(d, r, {"a": 3.0, "zzz": 5.0})
    assert set(out) == {"a"}
    assert out["a"] == pytest.approx(3.0 * r[d["a"]], rel=1e-6)


def test_distributed_ratios_match_twin(spark):
    rows = [({"good": 2.0, "fun": 1.0}, "1"),
            ({"good": 1.0}, "1"),
            ({"bad": 3.0, "dull": 1.0}, "0"),
            ({"bad": 1.0, "fun": 1.0}, "0")]
    df = spark.createDataFrame(
        rows, "tokens map<string,double>, category string")
    d_dist, r_dist = nbsvm_fit_ratios(df)
    d_loc, r_loc = nb_ratio_local(rows, float32=False)
    assert set(d_dist) == set(d_loc)
    for t in d_dist:
        assert r_dist[d_dist[t]] == pytest.approx(
            r_loc[d_loc[t]], rel=1e-5), t


def test_distributed_fit_rejects_other_labels(spark):
    df = spark.createDataFrame([({"a": 1.0}, "pos")],
                               "tokens map<string,double>, category string")
    with pytest.raises(ValueError):
        nbsvm_fit_ratios(df)


def test_nbsvm_end_to_end(spark):
    pos_words = ["great", "excellent", "loved", "wonderful"]
    neg_words = ["awful", "terrible", "hated", "boring"]
    rows = []
    for i in range(30):
        rows.append(({pos_words[i % 4]: 1.0,
                      pos_words[(i + 1) % 4]: 1.0, "movie": 1.0}, "1"))
        rows.append(({neg_words[i % 4]: 1.0,
                      neg_words[(i + 1) % 4]: 1.0, "movie": 1.0}, "0"))
    df = spark.createDataFrame(
        rows, "tokens map<string,double>, category string")
    d, r, model = nbsvm_train(df)
    test = spark.createDataFrame(
        [({"great": 1.0, "movie": 1.0}, "1"),
         ({"terrible": 1.0, "movie": 1.0}, "0"),
         ({"loved": 1.0, "wonderful": 1.0}, "1"),
         ({"boring": 1.0, "awful": 1.0}, "0")],
        "tokens map<string,double>, category string")
    pred = nbsvm_predict(test, d, r, model).collect()
    assert all(row["predicted"] == row["category"] for row in pred)
    assert all(0.0 <= row["p_true"] <= 1.0 for row in pred)


def test_nbsvm_transform_is_sparse_and_scaled(spark):
    df = spark.createDataFrame(
        [({"a": 2.0}, "1"), ({"b": 1.0}, "0")],
        "tokens map<string,double>, category string")
    d, r = nbsvm_fit_ratios(df)
    out = nbsvm_transform(df, d, r).collect()
    v = out[0]["features"]
    assert v.size == len(r)
    assert v.numNonzeros() == 1
