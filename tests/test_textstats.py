from __future__ import annotations

from pyspark.sql import functions as F

from kgp.textstats import text_stats


def _stats(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in text_stats(docs).collect()}


def test_token_counts(spark):
    s = _stats(spark, [(1, "the quick brown fox"), (2, ""), (3, "  a  b ")])
    assert s[1].n_tokens_ws == 4 and s[1].n_tokens_bpe == 4
    assert s[2].n_tokens_ws == 0
    assert s[3].n_tokens_ws == 2


def test_bpe_tokens_split_digits_and_symbols(spark):
    s = _stats(spark, [(1, "abc123 def-x!")])
    # abc,123,def,-,x,! = 6 pieces
    assert s[1].n_tokens_bpe == 6


def test_quality_score_separates_prose_from_junk(spark):
    prose = ("The quick brown fox jumps over the lazy dog near the river "
             "bank and then rests in the shade of a large tree.")
    junk = "!!! @@@ ### $$$ %%% ^^^ &&& *** ((( )))"
    s = _stats(spark, [(1, prose), (2, junk)])
    assert s[1].quality == 1.0
    assert s[2].quality <= 0.5
    assert s[1].stopword_ratio > 0.2
    assert s[2].punct_ratio > 0.5


def test_lang_id_markers(spark):
    s = _stats(spark, [
        (1, "the cat and the dog sat with me"),
        (2, "der hund und die katze sind nicht da"),
        (3, "le chat et la souris dans le jardin"),
        (4, "zzz qqq xxx"),
    ])
    assert s[1].lang_pred == "en"
    assert s[2].lang_pred == "de"
    assert s[3].lang_pred == "fr"
    assert s[4].lang_pred == "und"


def test_fingerprint_layout_insensitive(spark):
    s = _stats(spark, [(1, "Hello   World"), (2, "hello world"),
                       (3, "hello  world!")])
    assert s[1].fp == s[2].fp
    assert s[1].fp != s[3].fp
