"""CooccurrenceMatrix / PhraseProbabilityCalculator parity tests:
hand-computed golden on a tiny corpus (the reference's formulas,
CooccurrenceMatrix.java:104,123-131; PhraseProbabilityCalculator
.java:54-66) plus the Java \\s-split semantics the tokenizer must
keep (trailing empties dropped, interior kept)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgp.cooccurrence import (fit_cooccurrence_stage,
                              phrase_probability_stage)


@pytest.fixture(scope="module")
def tiny(spark):
    # corpus: "a b a" + "b a" -> items: a:3 b:2 (N=5, V=2)
    # bigrams: (a,b):1 (b,a):2
    return spark.createDataFrame(
        [(0, "a b a"), (1, "b a")], "doc_id long, text string")


def test_matrix_counts(tiny):
    m = fit_cooccurrence_stage(tiny)
    uni = {r["tok"]: r["c"] for r in m["unigrams"].collect()}
    assert uni == {"a": 3, "b": 2}
    big = {(r["tok_a"], r["tok_b"]): r["c"]
           for r in m["bigrams"].collect()}
    assert big == {("a", "b"): 1, ("b", "a"): 2}
    tot = m["totals"].collect()[0]
    assert (tot["n_items"], tot["n_unique"]) == (5, 2)


def test_phrase_probability_golden(tiny, spark):
    m = fit_cooccurrence_stage(tiny)
    phrases = spark.createDataFrame(
        [(0, "a b"), (1, "B A"), (2, "zzz"), (3, "a")],
        "phrase_id long, phrase string")
    out = {r["phrase_id"]: r["log_prob"]
           for r in phrase_probability_stage(phrases, m).collect()}
    # exact 1e-7-unit integer sums (the stage's determinism recipe)
    def u(x):
        return round(x * 1e7)
    # P(a) = (3+1)/(5+2); P(b|a) = (1+1)/(3+2)
    exp0 = (u(math.log10(4 / 7)) + u(math.log10(2 / 5))) / 1e7
    # lowercased: P(b) = (2+1)/7; P(a|b) = (2+1)/(2+2)
    exp1 = (u(math.log10(3 / 7)) + u(math.log10(3 / 4))) / 1e7
    # unseen unigram: (0+1)/7; single token -> no bigram terms
    exp2 = u(math.log10(1 / 7)) / 1e7
    exp3 = u(math.log10(4 / 7)) / 1e7
    assert out == {0: exp0, 1: exp1, 2: exp2, 3: exp3}


def test_java_split_semantics(spark):
    # "a  b " -> Java split("\\s"): ["a", "", "b"] (trailing dropped,
    # interior empty kept); the empty token is a real matrix item
    df = spark.createDataFrame([(0, "a  b ")], "doc_id long, text string")
    m = fit_cooccurrence_stage(df)
    uni = {r["tok"]: r["c"] for r in m["unigrams"].collect()}
    assert uni == {"a": 1, "": 1, "b": 1}
    big = {(r["tok_a"], r["tok_b"]): r["c"]
           for r in m["bigrams"].collect()}
    assert big == {("a", ""): 1, ("", "b"): 1}


def test_phrase_probability_stemmed(spark):
    """The Language constructor path (PhraseProbabilityCalculator
    .java:43-50 + stem():69-74): query tokens are raw-snowball-stemmed
    before lookup; the matrix keys stay raw."""
    from kgp.stemmer import snowball_en

    # matrix over already-stem-shaped tokens: walk:2 dog:1 (N=3, V=2)
    # bigram (walk, dog):1
    corpus = spark.createDataFrame(
        [(0, "walk dog"), (1, "walk")], "doc_id long, text string")
    m = fit_cooccurrence_stage(corpus)
    phrases = spark.createDataFrame(
        [(0, "walking dogs"), (1, "walk dog")],
        "phrase_id long, phrase string")
    out = {r["phrase_id"]: r["log_prob"]
           for r in phrase_probability_stage(
               phrases, m, language="en").collect()}
    assert snowball_en("walking") == "walk"   # the lookup key
    # stemmed "walking dogs" == raw "walk dog":
    # P(walk) = (2+1)/(3+2); P(dog|walk) = (1+1)/(2+2)
    exp = (round(math.log10(3 / 5) * 1e7)
           + round(math.log10(2 / 4) * 1e7)) / 1e7
    assert out == {0: exp, 1: exp}


def test_no_python_in_plan(tiny):
    m = fit_cooccurrence_stage(tiny)
    phrases = tiny.select(F.col("doc_id").alias("phrase_id"),
                          F.col("text").alias("phrase"))
    plan = (phrase_probability_stage(phrases, m)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan


def test_phrase_probability_partitioning_invariant(spark):
    """The r4 driver red in one test: with the old round(SUM(double), 6)
    the per-phrase score depended on double-summation ORDER, i.e. on
    shuffle partitioning (green at local[8], one row off by 1e-6 at
    local[32]).  The exact integer-unit sum must give bit-identical
    scores at ANY shuffle-partition count."""
    rows = [(i, " ".join(f"w{(i * 7 + j * 3) % 23}" for j in range(12)))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = fit_cooccurrence_stage(docs)
    phrases = docs.select(F.col("doc_id").alias("phrase_id"),
                          F.col("text").alias("phrase"))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        outs = []
        for parts in ("1", "7", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            outs.append({r.phrase_id: r.log_prob for r in
                         phrase_probability_stage(phrases, m).collect()})
        assert outs[0] == outs[1] == outs[2]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
