"""InformativenessAssigner port tests — corpus-frequency fit,
normalization quirks, the Java split/trim filter semantics, tagText,
and stage-vs-twin parity on the real documents table."""

from __future__ import annotations

import pytest

from kgp.informativeness import (filter_low_informativeness_stage,
                                 fit_frequencies,
                                 fit_informativeness_stage,
                                 get_informativeness,
                                 informativeness_model,
                                 normalize_frequencies,
                                 remove_low_informativeness, tag_text,
                                 tokenize_col)
from kgp.tokenize import tokenize
from tests.conftest import SF_TEST


# ------------------------------------------------------------ pure twins


def test_fit_frequencies():
    freqs = fit_frequencies(["the cat sat", "the dog"])
    # 5 tokens total, 'the' twice
    assert freqs["the"] == pytest.approx(2 / 5)
    assert freqs["cat"] == pytest.approx(1 / 5)
    assert fit_frequencies([]) == {}
    assert fit_frequencies([""]) == {}


def test_normalize_max_excludes_short_tokens_but_divides_them():
    # ',' is the most frequent token but len==1 -> excluded from the
    # max; 'aa' (freq 2/7) caps at 1; ',' normalizes ABOVE 1.
    freqs = fit_frequencies([", aa , aa , b ,"])
    norm = normalize_frequencies(freqs)
    assert norm["aa"] == pytest.approx(1.0)
    assert norm[","] == pytest.approx((4 / 7) / (2 / 7))
    assert norm["b"] == pytest.approx(0.5)


def test_normalize_all_short_tokens_is_identity():
    freqs = {"a": 0.6, ",": 0.4}
    assert normalize_frequencies(freqs) == freqs


def test_get_informativeness_default_one():
    assert get_informativeness({"x": 0.25}, "x") == 0.25
    assert get_informativeness({"x": 0.25}, "unseen") == 1.0


def test_remove_low_informativeness_java_split_semantics():
    norm = {"noise": 0.1, "signal": 0.9}
    # strictly-greater keep rule
    assert remove_low_informativeness(
        "signal noise signal", norm, 0.5) == "signal signal"
    assert remove_low_informativeness(
        "signal noise", norm, 0.9) == ""
    # unseen tokens default to 1 -> kept
    assert remove_low_informativeness(
        "fresh noise", norm, 0.5) == "fresh"
    # interior double space = empty token, unseen -> kept (doubled
    # space survives, the reference's += token + " " walk)
    assert remove_low_informativeness(
        "signal  signal", norm, 0.5) == "signal  signal"
    # trailing whitespace trimmed (Java split drops trailing empties)
    assert remove_low_informativeness(
        "signal noise  ", norm, 0.5) == "signal"


def test_tag_text_hue_and_shape():
    norm = {"Superman": 0.2}
    got = tag_text("Superman flies", norm)
    # 0.2*255 = 51 -> Java double "51.0"; unseen 'flies' -> 255.0
    assert got == (
        '<token style="color:hsl(51.0,100%, 35%)">Superman</token> '
        '<token style="color:hsl(255.0,100%, 35%)">flies</token> ')


# ------------------------------------------------------------ Spark side


def test_tokenize_col_matches_python_twin(spark):
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").limit(50)
    rows = docs.select("text",
                       tokenize_col(F.col("text")).alias("toks")
                       ).collect()
    for r in rows:
        assert r["toks"] == tokenize(r["text"])


def test_fit_stage_matches_twin(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    twin = normalize_frequencies(fit_frequencies(
        [r["text"] for r in docs.select("text").collect()]))
    got = {r["token"]: r["informativeness"]
           for r in fit_informativeness_stage(docs).collect()}
    assert set(got) == set(twin)
    for tok in list(twin)[:200]:
        assert got[tok] == pytest.approx(twin[tok]), tok


def test_filter_stage_matches_twin(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").limit(40)
    model = informativeness_model(
        spark.read.parquet(f"{SF_TEST}/documents.parquet"))
    got = {r["doc_id"]: r["filtered_text"]
           for r in filter_low_informativeness_stage(
               docs, model, 0.05).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == remove_low_informativeness(
            r["text"], model, 0.05)
    # the filter actually drops something at this limit
    joined = docs.select("doc_id", "text").collect()
    assert any(got[r["doc_id"]] != r["text"] for r in joined)


def test_fit_stage_plan_no_python(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    plan = fit_informativeness_stage(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
