"""Upstream feature-ranking / discretization / encoder test vectors,
transcribed mechanically, run on the reference's OWN CSV fixtures.

Sources (assertions copied 1:1):
- DiscretizationTest.java:29-70 (idealized + wineData boundaries)
- InformationGainFeatureRankerTest.java:21-52 (playData Weka-verified
  + wineData vectors)
- ChiSquaredFeatureRankerTest.java:20-64 (wineData, Average AND
  RoundRobin merging)
- FeatureRankingTest.java:47-117 (sparse fixture — the chi² ranker
  iterates only PRESENT vector entries, include_nulls=False)
- FrequencyEncoderTest.java:36-63
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgp.encode import frequency_encode
from kgp.featuresel import (apply_mdl_bins, chi_squared_ranking,
                            chi_squared_round_robin, discretize,
                            fit_mdl_bins, information_gain_ranking)
from kgp.sources import read_csv_dataset

RES = "/root/reference/palladian-core/src/test/resources/classifier"
DELTA = 0.001

WINE_COLS = ["alcohol", "malicAcid", "ash", "alcalinityOfAsh",
             "magnesium", "totalPhenols", "flavonoids",
             "nonflavonoidPhenols", "proanthocyanins",
             "colorIntensity", "hue", "od280/od315ofDilutedWines",
             "proline"]


@pytest.fixture(scope="module")
def wine(spark):
    df = read_csv_dataset(spark, f"{RES}/wineData.csv")
    return df.cache()


@pytest.fixture(scope="module")
def wine_binned(wine):
    return discretize(wine, WINE_COLS).cache()


# ------------------------------------------------- DiscretizationTest


def test_binner_idealized_data(spark):
    rows = [(1.0, "A"), (2.0, "A"), (3.0, "A"), (4.0, "A"),
            (5.0, "B"), (6.0, "B"), (7.0, "C"), (8.0, "C"),
            (9.0, "D"), (10.0, "D")]
    df = spark.createDataFrame(rows, ["f", "category"])
    bounds = fit_mdl_bins(df, "f")
    assert [round(b, 3) for b in bounds] == [4.5, 6.5, 8.5]
    probe = spark.createDataFrame(
        [(0.0,), (4.5,), (5.0,), (7.5,), (100.0,)], ["f"])
    bins = [r[0] for r in probe.select(
        apply_mdl_bins(F.col("f"), bounds)).collect()]
    # Interval(-inf,4.5)=0, boundary value -> LOWER bin, etc.
    assert bins == [0, 0, 1, 2, 3]


def test_binner_wine_data(wine):
    expected = {
        "alcohol": [12.185, 12.78],
        "malicAcid": [1.42, 2.235],
        "ash": [2.03],
        "alcalinityOfAsh": [17.9],
        "magnesium": [88.5],
        "totalPhenols": [1.84, 2.335],
        "flavonoids": [0.975, 1.575, 2.31],
        "nonflavonoidPhenols": [0.395],
        "proanthocyanins": [1.27],
        "colorIntensity": [3.46, 7.55],
        "hue": [0.785, 0.975, 1.295],
        "od280/od315ofDilutedWines": [2.115, 2.475],
        "proline": [468.0, 755.0, 987.5],
    }
    for col, exp in expected.items():
        got = fit_mdl_bins(wine, col)
        assert len(got) == len(exp), col
        for g, e in zip(got, exp):
            assert abs(g - e) < DELTA, (col, got, exp)


# ------------------------------------- InformationGainFeatureRanker


def _scores(df):
    return {r["feature"]: r["score"] for r in df.collect()}


def test_information_gain_play_data(spark):
    df = read_csv_dataset(spark, f"{RES}/playData.txt")
    scores = _scores(information_gain_ranking(
        df, ["Outlook", "Temperature", "Humidity", "Windy"]))
    # values verified with Weka (upstream comment)
    assert abs(scores["Outlook"] - 0.2467) < DELTA
    assert abs(scores["Humidity"] - 0.1518) < DELTA
    assert abs(scores["Windy"] - 0.0481) < DELTA
    assert abs(scores["Temperature"] - 0.0292) < DELTA


def test_information_gain_wine_data(wine_binned):
    scores = _scores(information_gain_ranking(wine_binned, WINE_COLS))
    expected = {
        "flavonoids": 1.0151, "proline": 0.8278,
        "colorIntensity": 0.7438,
        "od280/od315ofDilutedWines": 0.7221, "hue": 0.6324,
        "alcohol": 0.6034, "totalPhenols": 0.5795,
        "malicAcid": 0.4306, "alcalinityOfAsh": 0.2772,
        "proanthocyanins": 0.2653, "magnesium": 0.2614,
        "nonflavonoidPhenols": 0.2198, "ash": 0.1649,
    }
    for col, exp in expected.items():
        assert abs(scores[col] - exp) < DELTA, (col, scores[col])


# ------------------------------------------ ChiSquaredFeatureRanker


def test_chi_squared_wine_average(wine_binned):
    scores = _scores(chi_squared_ranking(wine_binned, WINE_COLS))
    expected = {
        "od280/od315ofDilutedWines": 125.9867,
        "colorIntensity": 128.5980, "proline": 124.7087,
        "flavonoids": 160.0524, "alcohol": 105.8876,
        "hue": 95.2166, "totalPhenols": 97.2884,
        "alcalinityOfAsh": 62.9867, "malicAcid": 79.7351,
        "magnesium": 56.2174, "proanthocyanins": 60.1322,
        "ash": 35.6311, "nonflavonoidPhenols": 46.9911,
    }
    for col, exp in expected.items():
        assert abs(scores[col] - exp) < DELTA, (col, scores[col])


def test_chi_squared_wine_round_robin(wine_binned):
    scores = _scores(chi_squared_round_robin(wine_binned, WINE_COLS))
    expected = {
        "od280/od315ofDilutedWines": 37, "colorIntensity": 37,
        "proline": 37, "flavonoids": 36, "alcohol": 36,
        "hue": 35, "totalPhenols": 35, "alcalinityOfAsh": 33,
        "malicAcid": 32, "magnesium": 32, "proanthocyanins": 30,
        "ash": 28, "nonflavonoidPhenols": 23,
    }
    for col, exp in expected.items():
        assert abs(scores[col] - exp) < DELTA, (col, scores[col])


# -------------------------------------- FeatureRankingTest (sparse)


@pytest.fixture(scope="module")
def sparse_fixture(spark):
    # InstanceBuilder rows; a missing feature is ABSENT (-> null);
    # instance 4 sets "f" twice — the second set overwrites (map)
    rows = [
        ("c1", 2.0, 1.0, 1.0, 1.0, None, None),
        ("c1", 1.0, 1.0, 1.0, None, None, None),
        ("c2", None, None, None, 1.0, 1.0, 1.0),
        ("c2", None, None, None, 1.0, None, 1.0),
        ("c1", 1.0, None, 1.0, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, ["category", "a", "b", "c", "d", "e", "f"])
    return discretize(df, ["a", "b", "c", "d", "e", "f"]).cache()


def test_chi_square_feature_selection_sparse(sparse_fixture):
    scores = _scores(chi_squared_ranking(
        sparse_fixture, ["a", "b", "c", "d", "e", "f"],
        include_nulls=False))
    assert abs(scores["e"] - 1.875) < 0.0001
    assert abs(scores["d"] - 2.22222) < 0.0001
    assert abs(scores["b"] - 2.22222) < 0.0001
    for col in ("a", "c", "f"):
        assert abs(scores[col] - 5.0) < 0.0001


def test_chi_squared_round_robin_merge_sparse(sparse_fixture):
    scores = _scores(chi_squared_round_robin(
        sparse_fixture, ["a", "b", "c", "d", "e", "f"],
        include_nulls=False))
    assert scores["e"] == 1.0
    assert scores["d"] == 2.0
    assert scores["b"] == 3.0
    assert sorted(scores[c] for c in ("a", "c", "f")) == \
        [4.0, 5.0, 6.0]


def test_information_gain_sparse_order(sparse_fixture):
    # upstream asserts only the ORDER tiers: {a,c,f} > {b,d} > e
    scores = _scores(information_gain_ranking(
        sparse_fixture, ["a", "b", "c", "d", "e", "f"]))
    top = sorted(scores, key=scores.get, reverse=True)
    assert set(top[:3]) == {"a", "c", "f"}
    assert set(top[3:5]) == {"b", "d"}
    assert top[5] == "e"


# ------------------------------------------------ FrequencyEncoder


@pytest.fixture(scope="module")
def freq_dataset(spark):
    rows = [("a", "a"), ("a", "a"), ("a", "a"), ("b", "a"),
            ("b", "a"), ("c", None), ("d", None), ("e", None)]
    return spark.createDataFrame(rows, ["f1", "f2"]).cache()


def test_frequency_encoder_regular_values(spark, freq_dataset):
    test = spark.createDataFrame([("a", "a")], ["f1", "f2"])
    out = frequency_encode(test, ["f1", "f2"],
                           fit_df=freq_dataset).collect()[0]
    assert abs(out["f1_frequency"] - 3. / 8) < DELTA
    assert abs(out["f2_frequency"] - 5. / 8) < DELTA


def test_frequency_encoder_null_assign_frequency(spark, freq_dataset):
    test = spark.createDataFrame(
        [(None, None)], "f1 string, f2 string")
    out = frequency_encode(test, ["f1", "f2"],
                           null_strategy="assign_frequency",
                           fit_df=freq_dataset).collect()[0]
    assert out["f1_frequency"] == 0.0          # no nulls in f1
    assert abs(out["f2_frequency"] - 3. / 8) < DELTA


def test_frequency_encoder_null_keep_null(spark, freq_dataset):
    test = spark.createDataFrame(
        [(None, None)], "f1 string, f2 string")
    out = frequency_encode(test, ["f1", "f2"],
                           null_strategy="keep_null",
                           fit_df=freq_dataset).collect()[0]
    assert out["f1_frequency"] is None
    assert out["f2_frequency"] is None
