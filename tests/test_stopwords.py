"""StopWordRemover: loader quirks, removal semantics, case-sensitive
membership, Spark stage parity, plan shape."""

import pytest

from kgp.stopwords import (STOPWORDS_DE, STOPWORDS_EN, is_stop_word,
                           load_stopwords, remove_stop_words,
                           remove_stopwords_stage, stop_token_col,
                           stopword_set)


def test_main_example():
    # StopWordRemover.main (StopWordRemover.java:186-189)
    assert remove_stop_words("is the", stopword_set("en")) == " "


def test_loader_quirks():
    # trimmed form gates the skip, RAW line is added lowercased
    got = load_stopwords(["# comment", "   ", " The ", "foo", "BAR"])
    assert got == {" the ", "foo", "bar"}


def test_removal_borders_and_casing():
    sw = {"the", "is"}
    # case-insensitive whole-word; 'theme'/'his' untouched
    assert remove_stop_words("The theme is his", sw) == " theme his"
    # dash punctuation blocks the border: 'e-the' keeps its word
    assert remove_stop_words("e-the stays", sw) == "e-the stays"


def test_removal_length_desc_order():
    # "isn't" removed as a whole before "isn" can eat its prefix
    sw = {"isn", "isn't"}
    assert remove_stop_words("it isn't here", sw) == "it here"


def test_is_stop_word_case_sensitive():
    sw = stopword_set("en")
    assert is_stop_word("the", sw) and not is_stop_word("The", sw)
    assert not is_stop_word("zebra", sw)


def test_language_sets():
    assert "the" in STOPWORDS_EN and "der" in STOPWORDS_DE
    assert stopword_set("xx") == set()


@pytest.fixture(scope="module")
def spark():
    from kgp.session import get_spark
    return get_spark()


def test_stage_matches_twin(spark):
    sw = stopword_set("en")
    texts = ["The quick brown fox is on the hill.",
             "No stop words here?",
             "THE THE the and of to in a", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.text_nostop for r in
           remove_stopwords_stage(df, "text", sw)
           .orderBy("text").collect()]
    want = [remove_stop_words(t, sw) for t in sorted(texts)]
    assert got == want


def test_stop_token_col_jvm(spark):
    from pyspark.sql import functions as F
    sw = stopword_set("en")
    df = spark.createDataFrame(
        [("the",), ("The",), ("zebra",)], "tok string")
    rows = df.select(
        "tok",
        stop_token_col(F.col("tok"), sw).alias("cs"),
        stop_token_col(F.col("tok"), sw,
                       case_sensitive=False).alias("ci")).collect()
    by = {r.tok: (r.cs, r.ci) for r in rows}
    assert by["the"] == (True, True)
    assert by["The"] == (False, True)
    assert by["zebra"] == (False, False)
    # predicate path is pure JVM
    plan = df.select(stop_token_col(F.col("tok"), sw).alias("x")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
