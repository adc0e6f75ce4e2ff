"""WikipediaCaseDictionaryCreator: twin goldens, clean filter,
distributed == local, plan shape."""

import pytest

from kgp.wikicasedict import (clean_case_dictionary, clean_case_rows,
                              mine_case_dictionary,
                              mine_case_dictionary_local,
                              page_case_counts)


def test_page_case_counts_golden():
    # sentence-initial token skipped; bold/link markup stripped;
    # uppercase surface counts toward the lowercased key
    m = ("Lead '''betab''' Gammac x12. "
         "Head [[T9|deltab]] well-known Zetab.")
    total, upper = page_case_counts(m)
    assert total == {".": 2, "betab": 1, "gammac": 1, "x12": 1,
                     "deltab": 1, "well-known": 1, "zetab": 1}
    assert upper == {"gammac": 1, "zetab": 1}
    # sentence starters never appear
    assert "lead" not in total and "head" not in total


def test_short_and_non_real_sentences_skipped():
    total, _ = page_case_counts("Short no. One two.")
    assert total == {}  # both fail the only-real sentence gate


def test_template_dropped():
    total, _ = page_case_counts(
        "Alpha beta gamma. {{infobox|a=b}} Delta epsilon zeta.")
    assert total == {".": 2, "beta": 1, "gamma": 1,
                     "epsilon": 1, "zeta": 1}


def test_local_mine_namespace_filter_and_merge():
    pages = [
        (0, "Lead alpha beta Gamma."),
        (4, "Lead alpha beta Gamma."),  # non-MAIN: ignored
        (0, "Head alpha Beta gamma."),
    ]
    rows = mine_case_dictionary_local(pages)
    assert rows == [(".", 2, 0), ("alpha", 2, 0), ("beta", 2, 1),
                    ("gamma", 2, 1)]


def test_clean_case_rows():
    rows = [("beta", 10, 3), ("x12", 50, 0), (".", 99, 0),
            ("well-known", 10, 0), ("rare", 9, 1), ("ok", 11, 11)]
    assert clean_case_rows(rows) == [
        ("beta", 10, 3), ("well-known", 10, 0), ("ok", 11, 11)]


@pytest.fixture(scope="module")
def spark():
    from kgp.session import get_spark
    return get_spark()


def test_stage_matches_local(spark):
    pages = []
    for k in range(40):
        ns = 4 if k % 5 == 4 else 0
        text = (f"Lead beta{chr(97 + k % 7)} Gamma{chr(97 + k % 5)}"
                f" x{k}. Head [[T{k}|delta{chr(97 + k % 3)}]]"
                f" well-known Zeta{chr(97 + k % 7)}.")
        pages.append((k, ns, f"Page {k}", text))
    df = spark.createDataFrame(
        pages, "page_id long, namespace_id long, title string, "
               "text string")
    got = {(r.word, r.total, r.upper)
           for r in mine_case_dictionary(df).collect()}
    want = set(mine_case_dictionary_local(
        [(ns, t) for _, ns, _, t in pages]))
    assert got == want
    # clean filter on top (min_count=5 to bite on this small corpus)
    cleaned = {(r.word, r.total, r.upper) for r in
               clean_case_dictionary(
                   mine_case_dictionary(df), min_count=5).collect()}
    import re
    want_clean = {(w, t, u) for w, t, u in want
                  if t >= 5 and re.fullmatch(r"[A-Za-z\-]+", w)}
    assert cleaned == want_clean


def test_stage_plan_shape(spark):
    df = spark.createDataFrame(
        [(0, 0, "t", "Lead alpha beta gamma.", "junk")],
        "page_id long, namespace_id long, title string, "
        "text string, extra string")
    plan = mine_case_dictionary(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    mip = next(l for l in plan.splitlines() if "MapInPandas" in l)
    assert "extra" not in mip and "title" not in mip
    # exactly ONE shuffle: the word aggregation
    assert plan.count("Exchange") == 1
