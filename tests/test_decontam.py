"""Benchmark decontamination (kgp.decontam) and unigram LM scoring
(kgp.lmscore)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kgp.decontam import decontaminate, norm_tokens, word_ngrams
from kgp.lmscore import (corpus_token_count, unigram_logprob,
                         unigram_vocab)


def _texts(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------- n-gram basics

def test_norm_tokens(spark):
    got = _texts(spark, [(1, "Hello, World!  It's 42%... done")]) \
        .select(norm_tokens(F.col("text")).alias("t")).collect()[0].t
    assert got == ["hello", "world", "it", "s", "42", "done"]


def test_word_ngrams_window_and_short_doc(spark):
    df = _texts(spark, [(1, "A b c d e"), (2, "too short"), (3, "")])
    got = {r.doc_id: r.g for r in df.select(
        "doc_id", word_ngrams(F.col("text"), 3).alias("g")).collect()}
    assert got[1] == ["a b c", "b c d", "c d e"]
    assert got[2] == []                    # fewer than n tokens
    assert got[3] == []                    # empty text


# --------------------------------------------------- decontamination

def test_decontaminate_flags_overlap(spark):
    canary = "alpha beta gamma delta"     # 4 tokens -> 2 trigrams
    train = _texts(spark, [
        (1, "clean document with plenty of original words here"),
        (2, "prefix words then " + canary + " and a suffix"),
        (3, canary),                       # the whole doc is the canary
    ])
    test = _texts(spark, [(100, "unrelated lead-in " + canary)],
                  "doc_id long, text string")
    got = {r.doc_id: r for r in
           decontaminate(train, test, n=3).collect()}
    assert not got[1].contaminated and got[1].n_matches == 0
    assert got[2].contaminated and got[2].n_matches >= 2
    assert got[3].contaminated and got[3].n_matches == 2
    assert got[3].n_ngrams == 2


def test_decontaminate_clean_corpus_all_false(spark):
    train = _texts(spark, [(i, f"unique text number {i} for row {i}")
                           for i in range(6)])
    test = _texts(spark, [(0, "completely different benchmark words "
                              "covering separate topics entirely")])
    out = decontaminate(train, test, n=3)
    assert out.where("contaminated").count() == 0
    assert out.count() == 6


def test_decontaminate_plan_broadcasts(spark):
    """The test n-gram set and the match counts join back broadcast —
    the corpus side never shuffles (the only Exchange feeds the
    matched-rows aggregation, not the corpus)."""
    train = _texts(spark, [(1, "a b c d e f g h")])
    test = _texts(spark, [(2, "c d e f g")])
    plan = decontaminate(train, test, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------- unigram LM

def test_unigram_vocab_cut_deterministic(spark):
    docs = _texts(spark, [(1, "b b b a a c"), (2, "a d")])
    got = [(r.word, r.cnt) for r in unigram_vocab(docs, max_vocab=2)
           .collect()]
    assert got == [("a", 3), ("b", 3)]    # tie a/b -> word asc


def test_unigram_logprob_closed_form(spark):
    docs = _texts(spark, [(1, "a a b"), (2, "a z"), (3, "")])
    vocab = unigram_vocab(docs, max_vocab=2)      # a:3, b:1
    t = corpus_token_count(docs)
    assert t == 5
    out = {r.doc_id: r for r in
           unigram_logprob(docs, vocab, t).collect()}
    denom = 5 + 2 + 1
    # exact 1e-7-unit integer sums (the stage's determinism recipe)
    u = lambda c: round(math.log((c + 1) / denom) * 1e7)  # noqa: E731
    assert out[1].n_tokens == 3
    assert out[1].avg_logp == (2 * u(3) + u(1)) / (3 * 1e7)
    assert out[2].n_tokens == 2
    assert out[2].avg_logp == (u(3) + u(0)) / (2 * 1e7)  # z is OOV
    assert out[3].n_tokens == 0 and out[3].avg_logp is None


def test_unigram_matches_duckdb(spark):
    """Engine parity on a small random-ish corpus: the oracle's SQL
    twin (same rounding ladder) lands on identical doubles."""
    import duckdb

    from kgp import oracle
    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(i % 9)))
            for i in range(40)]
    docs = _texts(spark, rows)
    vocab = unigram_vocab(docs, max_vocab=5)
    got = {r.doc_id: (r.n_tokens, r.avg_logp) for r in
           unigram_logprob(docs, vocab, corpus_token_count(docs))
           .collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {d: (n, a) for d, n, a in
            con.execute(oracle.unigram_lm_sql(max_vocab=5)).fetchall()}
    assert got == want
