"""BPE tokenizer training (Sennrich 2016): merge-loop goldens,
deterministic ties, distributed fit == local fit, encode round."""

from __future__ import annotations

import pytest

from kgp.bpe import (EOW, bpe_encode, encode_word, learn_bpe,
                     learn_bpe_from_counts, word_counts)


def test_learn_bpe_paper_flavor_golden():
    # the classic low/lower/newest/widest-style example
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe_from_counts(counts, 4)
    # 'es' (9), then 'est' (9), then 'est</w>' (9), then 'lo' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_learn_bpe_tie_break_deterministic():
    # 'ab' and 'cd' both appear twice -> lexicographic pair wins
    merges = learn_bpe_from_counts([("ab", 2), ("cd", 2)], 1)
    assert merges == [("a", "b")]


def test_learn_bpe_stops_when_nothing_repeats():
    merges = learn_bpe_from_counts([("abc", 1), ("def", 1)], 10)
    assert merges == []  # every pair has count 1 -> noise cutoff


def test_encode_word_applies_rank_order():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe_from_counts(counts, 10)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert "".join(encode_word("lowest", ranks)) == "lowest" + EOW
    # 'lowest' (unseen) decomposes into learned subwords
    toks = encode_word("lowest", ranks)
    assert "est" + EOW in toks or "est" in "".join(toks)
    # fully-unknown word falls back to characters + EOW
    assert encode_word("xyz", {}) == ["x", "y", "z", EOW]


def test_distributed_fit_matches_local(spark):
    texts = ["the low lower newest", "newest widest low",
             "the newest low low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = learn_bpe(df, 5)
    # local twin over hand counts
    from collections import Counter
    c = Counter(w for t in texts for w in t.lower().split())
    local = learn_bpe_from_counts(sorted(c.items()), 5)
    assert merges == local


def test_word_counts_shape(spark):
    df = spark.createDataFrame([(1, "A a b"), (2, "a B")],
                               "doc_id long, text string")
    got = {r["word"]: r["count"]
           for r in word_counts(df).collect()}
    assert got == {"a": 3, "b": 2}


def test_bpe_encode_stage(spark):
    df = spark.createDataFrame(
        [(1, "newest widest"), (2, "low"), (3, None)],
        "doc_id long, text string")
    merges = learn_bpe(df.where("text is not null"), 6)
    rows = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    assert rows[1]["n_tokens"] == len(rows[1]["tokens"]) > 0
    # every token stream reassembles the original words + markers
    joined = "".join(rows[1]["tokens"]).replace(EOW, " ").strip()
    assert joined == "newest widest"
    assert rows[3]["tokens"] == [] and rows[3]["n_tokens"] == 0


def test_bpe_corpus_compression(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    merges = learn_bpe(docs, 50)
    assert len(merges) == 50
    enc = bpe_encode(docs, merges)
    from pyspark.sql import functions as F
    n_bpe = enc.agg(F.sum("n_tokens")).collect()[0][0]
    chars = docs.agg(
        F.sum(F.length(F.regexp_replace(F.lower("text"), r"\s+", ""))))\
        .collect()[0][0]
    words = docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                        .alias("w")).where("w != ''").count()
    # subword count sits between word count and character count
    assert words < n_bpe < chars + words
