"""Feature rankers (kgp.featuresel)."""

from __future__ import annotations

import math

import pytest

from kgp.featuresel import chi_squared_ranking, information_gain_ranking


def _data(spark):
    # f_good perfectly separates the category, f_noise is independent,
    # f_const is constant
    rows = []
    for i in range(40):
        cat = "a" if i % 2 == 0 else "b"
        rows.append((cat, "va" if cat == "a" else "vb",
                     f"n{i % 2 ^ (i // 2) % 2}", "k"))
    return spark.createDataFrame(
        rows, "category string, f_good string, f_noise string,"
              " f_const string")


def test_chi_squared_separating_feature_wins(spark):
    df = _data(spark)
    got = {r.feature: r.score for r in chi_squared_ranking(
        df, ["f_good", "f_noise", "f_const"]).collect()}
    # perfect 2x2 separation: chi2 = N for each cell -> avg N,
    # summed over both values -> 2N
    assert got["f_good"] == pytest.approx(2 * 40, abs=1e-6)
    assert got["f_noise"] < 1e-6
    assert got["f_const"] == 0.0         # documented deviation


def test_chi_squared_hand_computed_cell(spark):
    # Manning IR-book contingency semantics on an asymmetric corpus
    rows = ([("pos", "x")] * 3 + [("pos", "y")] * 1
            + [("neg", "x")] * 1 + [("neg", "y")] * 5)
    df = spark.createDataFrame(rows, "category string, f string")
    n = 10
    def chi(n11, n10, n01, n00):
        num = (n11 + n10 + n01 + n00) * (n11 * n00 - n10 * n01) ** 2
        den = (n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00)
        return num / den
    # value x: pos cell (3,1,1,5), neg cell (1,3,5,1); value y mirrors
    want_x = (chi(3, 1, 1, 5) + chi(1, 3, 5, 1)) / 2
    want_y = (chi(1, 5, 3, 1) + chi(5, 1, 1, 3)) / 2
    got = {r.feature: r.score
           for r in chi_squared_ranking(df, ["f"]).collect()}
    assert got["f"] == pytest.approx(round(want_x + want_y, 6))


def test_information_gain_closed_form(spark):
    df = _data(spark)
    got = {r.feature: r.score for r in information_gain_ranking(
        df, ["f_good", "f_noise", "f_const"]).collect()}
    # H(C)=1 bit; perfect feature: G = 1; constant: G = 0
    assert got["f_good"] == pytest.approx(1.0, abs=1e-5)
    assert got["f_const"] == pytest.approx(0.0, abs=1e-6)
    assert got["f_noise"] == pytest.approx(0.0, abs=1e-5)


def test_information_gain_matches_formula(spark):
    rows = ([("pos", "x")] * 3 + [("pos", "y")] * 1
            + [("neg", "x")] * 1 + [("neg", "y")] * 5)
    df = spark.createDataFrame(rows, "category string, f string")
    def h(*counts):
        t = sum(counts)
        return sum(round(-c / t * math.log2(c / t), 9)
                   for c in counts if c)
    want = round(h(4, 6) + h(4, 6) - h(3, 1, 1, 5), 6)
    got = information_gain_ranking(df, ["f"]).collect()[0]
    assert got.score == pytest.approx(want, abs=1e-9)


def test_null_values_group_as_literal(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", None), ("b", "x")],
        "category string, f string")
    # nulls become the 'null' value -> f has 2 values, no crash
    assert chi_squared_ranking(df, ["f"]).count() == 1
    assert information_gain_ranking(df, ["f"]).count() == 1
