"""Sentiment classifier (kgp.sentiment — GermanSentimentClassifier
port)."""

from __future__ import annotations

import pytest

from kgp.sentiment import (load_sentiws, polarity, sentence_sums,
                           sentiment_stage)

# miniature SentiWS-format dictionary (format:
# Word|POS<TAB>value<TAB>synonyms)
SENTIWS = [
    "toll|ADJX\t0.5\tsuper,klasse",
    "gut|ADJX\t0.3716",
    "unschön|ADJX\t-0.2",
    "scheisse|ADJX\t-0.7\tmist",
    "schlecht|ADJX\t-0.5",
]
LEX = load_sentiws(SENTIWS)


def test_load_sentiws_pos_strip_and_synonyms():
    assert LEX["toll"] == 0.5
    assert LEX["super"] == 0.5 and LEX["klasse"] == 0.5  # synonyms
    assert LEX["mist"] == -0.7
    assert "toll|adjx" not in LEX                        # POS stripped
    # case-insensitive load
    assert load_sentiws(["GUT|ADJX\t1.0"])["gut"] == 1.0


def test_sentence_sums_plain_negation_emphasis():
    # plain lookup
    assert sentence_sums("das ist toll .", LEX) == (0.5, 0.0)
    # "nicht" directly before negates: positive -> negative
    assert sentence_sums("das ist nicht toll .", LEX) == (0.0, 0.5)
    # "nicht" TWO tokens before still negates
    # (GermanSentimentClassifier.java:164-168 beforeLastToken check)
    assert sentence_sums("das ist nicht so toll .", LEX) == (0.0, 0.5)
    # emphasis multiplies ("sehr" x2.0)
    p, n = sentence_sums("das ist sehr gut .", LEX)
    assert p == pytest.approx(2 * 0.3716) and n == 0.0
    # negated negative stays negative-side: -1 * -0.7 = +0.7 positive
    p, n = sentence_sums("das ist kein mist .", LEX)
    assert p == pytest.approx(0.7) and n == 0.0
    # trim strips punctuation glued to the token
    assert sentence_sums("die bahn ist scheisse!!!", LEX) == (0.0, 0.7)


def test_polarity_majority_and_tie():
    pos_text = "Das ist toll. Das ist sehr gut. Alles super."
    label, np_, nn = polarity(pos_text, LEX)
    assert label == "positive" and np_ >= 2 and nn == 0
    neg_text = "Die Bahn ist scheisse. Alles schlecht."
    label, np_, nn = polarity(neg_text, LEX)
    assert label == "negative" and nn == 2 and np_ == 0
    # no opinionated sentences -> 0/0 tie -> deterministic 'positive'
    assert polarity("Nichts dabei.", LEX) == ("positive", 0, 0)


def test_polarity_dominance_and_threshold_rules():
    # pos must dominate 2x: equal sums -> not opinionated
    mixed = "Das ist toll aber auch schlecht gewesen."
    label, np_, nn = polarity(mixed, LEX)
    assert (np_, nn) == (0, 0)
    # tiny values below the 0.008 floor are ignored
    tiny = load_sentiws(["mini|ADJX\t0.005"])
    assert polarity("Das ist mini.", tiny) == ("positive", 0, 0)


def test_sentiment_stage_spark(spark):
    docs = spark.createDataFrame(
        [(1, "Das ist toll. Das ist sehr gut."),
         (2, "Die Bahn ist scheisse. Alles schlecht."),
         (3, ""), (4, None)],
        "doc_id long, text string")
    got = {r.doc_id: (r.polarity, r.n_pos_sentences, r.n_neg_sentences)
           for r in sentiment_stage(docs, LEX).collect()}
    assert got[1] == ("positive", 2, 0)
    assert got[2] == ("negative", 0, 2)
    assert got[3] == ("positive", 0, 0)
    assert got[4] == ("positive", 0, 0)
    # zero shuffle: one Arrow pass over the scan
    plan = sentiment_stage(docs, LEX)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
