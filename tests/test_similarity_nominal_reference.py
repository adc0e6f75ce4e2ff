"""Upstream FeatureBasedSimilarity / NominalClassifier /
DatasetStatistics test vectors, transcribed mechanically.

Sources (assertions copied 1:1):
- FeatureBasedSimilarityTest.java:16-58 (char-3-gram padding
  batteries for DICE / JACCARD / OVERLAP)
- NominalClassifierTest.java:18-45
- DatasetStatisticsTest.java:17-44 (on the reference's own
  saheart.csv)
"""

import pytest

from kgp.strsim import feature_based_similarity
from kgp.textclassifier import FeatureSetting

DELTA = 0.01

CASES = [("", ""), ("", "string"), ("a", "a"), ("cat", "cat"),
         ("cat", "caat"), ("cat", "dog"), ("philipp", "philip"),
         ("philipp", "p"), ("word", "wort")]

EXPECTED = {
    "dice": [1.0, 0.0, 1.0, 1.0, 0.727, 0.0, 0.824, 0.333, 0.5],
    "jaccard": [1.0, 0.0, 1.0, 1.0, 0.571, 0.0, 0.7, 0.2, 0.333],
    "overlap": [1.0, 0.0, 1.0, 1.0, 0.8, 0.0, 0.875, 0.666, 0.5],
}


@pytest.mark.parametrize("kind", ["dice", "jaccard", "overlap"])
def test_ngram_similarity(kind):
    fs = FeatureSetting(mode="char", min_ngram=3, max_ngram=3,
                        padding=True)
    for (a, b), exp in zip(CASES, EXPECTED[kind]):
        got = feature_based_similarity(a, b, fs, kind)
        assert abs(got - exp) < DELTA, (kind, a, b, got, exp)


# -------------------------------------------- NominalClassifierTest


def test_nominal_classifier(spark):
    from pyspark.sql import functions as F

    from kgp.encode import nominal_predict, nominal_train
    rows = ([("f1", "A"), ("f1", "B"), ("f1", "B")]
            + [("f2", "A")] * 3 + [("f2", "B")] * 4)
    train = spark.createDataFrame(rows, "f string, category string")
    model = nominal_train(train, ["f"])
    cats = {r["category"] for r in
            model.select("category").distinct().collect()}
    assert cats == {"A", "B"}

    test = spark.createDataFrame([(1, "f2")], "id long, f string")
    out = nominal_predict(test, model, ["f"], "id").collect()[0]
    # P(A|f2)=3/7=0.4286, P(B|f2)=4/7=0.5714 -> argmax B
    assert out["predicted"] == "B"
    assert abs(out["probability"] - 0.5714) < 0.0001


# -------------------------------------------- DatasetStatisticsTest


def test_dataset_statistics(spark):
    from kgp.datasetstats import (dataset_statistics,
                                  nominal_value_counts)
    from kgp.sources import read_csv_dataset
    df = read_csv_dataset(
        spark, "/root/reference/palladian-core/src/test/resources/"
        "classifier/saheart.csv", field_separator=",")
    stats = {r["column"]: r.asDict()
             for r in dataset_statistics(df).collect()}

    sbp = stats["Sbp"]
    assert sbp["kind"] == "numeric"
    assert sbp["num_nulls"] == 0
    assert abs(sbp["mean"] - 138.33) < 0.01
    assert sbp["min"] == 101
    assert sbp["max"] == 218

    famhist = stats["Famhist"]
    assert famhist["kind"] == "nominal"
    assert famhist["num_nulls"] == 0
    assert famhist["num_unique"] == 2
    counts = {r["value"]: r["count"] for r in
              nominal_value_counts(df, "Famhist").collect()}
    assert counts["Absent"] == 270
    assert counts["Present"] == 192


# ------------------------------------- FeatureSettingAnalyzerTest
# (FeatureSettingAnalyzerTest.java:19-55 — property assertions over
# "The quick brown fox jumps over the lazy dog")

def test_feature_setting_analyzer():
    from kgp.textclassifier import FeatureSetting, analyze
    text = "The quick brown fox jumps over the lazy dog"

    tokens = analyze(text, FeatureSetting(mode="char", min_ngram=2,
                                          max_ngram=5))
    assert all(2 <= len(t) <= 5 for t in tokens)
    assert all(t == t.lower() for t in tokens)

    tokens = analyze(text, FeatureSetting(mode="char", min_ngram=1,
                                          max_ngram=1))
    assert all(len(t) == 1 for t in tokens)

    tokens = analyze(text, FeatureSetting(mode="char", min_ngram=1,
                                          max_ngram=1, max_terms=10))
    assert len(tokens) == 10

    tokens = analyze(text, FeatureSetting(mode="word", min_ngram=1,
                                          max_ngram=1))
    assert len(tokens) == 9
    assert all(t == t.lower() for t in tokens)

    tokens = analyze(text, FeatureSetting(mode="word", min_ngram=1,
                                          max_ngram=5))
    assert len(tokens) == 35

    tokens = analyze(text, FeatureSetting(mode="word", min_ngram=1,
                                          max_ngram=1, min_term_len=5,
                                          max_term_len=20))
    assert len(tokens) == 3
    assert all(5 <= len(t) <= 20 for t in tokens)
