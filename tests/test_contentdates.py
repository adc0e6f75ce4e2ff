"""ContentDateGetter/Rater port (kgp.contentdates)."""

import pytest

from tests.conftest import spark  # noqa: F401

HTML = """<html><head>
<meta property="article:published_time" content="2010-07-20" />
</head><body>
<h1>Some headline</h1>
<p>It was published on 2010-07-20 in the morning.</p>
<div>Event archive from 11.04.2009 is unrelated.</div>
<p>Contact: just text, no dates here.</p>
</body></html>"""


def test_keyword_priority_quirk():
    from kgp.contentdates import keyword_priority
    assert keyword_priority("published") == 1
    assert keyword_priority("datetime") == 3
    # the reference's MODIFIED class never matches (byte-vs-string
    # comparison quirk, KeyWords.java:78-81)
    assert keyword_priority("updated") == -1
    assert keyword_priority(None) == -1


def test_find_all_dates_masks_and_digit_rule():
    from kgp.contentdates import find_all_dates
    found = find_all_dates("on 2010-07-20 and again 2010-07-20.")
    assert [f.value for f in found] == ["2010-07-20", "2010-07-20"]
    # digit neighbor: the full YMD match ends at text end, so the
    # left-digit verdict stands (rejected) — but the reference's
    # as-written right-neighbor OVERWRITE (ContentDateGetter.java:
    # 318-326) then ACCEPTS the shorter YYYY-MM slice, whose right
    # neighbor is '-'
    assert [f.value for f in find_all_dates("id 92010-07-20")] == [
        "2010-07"]
    # fully digit-bounded full dates rejected; the '-'-bounded
    # YYYY-MM slice again survives via the overwrite
    assert [f.value for f in find_all_dates("92010-07-203")] == [
        "2010-07"]
    assert find_all_dates("920103") == []


def test_parse_parts_families():
    from kgp.contentdates import exactness, parse_parts
    p = parse_parts("2010-07-20", "YYYY-MM-DD")
    assert (p.year, p.month, p.day) == (2010, 7, 20)
    assert exactness(p) == 3
    p = parse_parts("11.04.2009", "DD.MM.YYYY")
    assert (p.year, p.month, p.day) == (2009, 4, 11)
    p = parse_parts("July 4th, 2011", "MMMM DD, YYYY")
    assert (p.year, p.month, p.day) == (2011, 7, 4)
    p = parse_parts("2010-07-20T14:30:05Z", "YYYY-MM-DDTHH:MM:SS+HH:MM")
    assert (p.hour, p.minute, p.second) == (14, 30, 5)
    assert exactness(p) == 6
    p = parse_parts("20101230", "YYYYMMDD")
    assert (p.year, p.month, p.day) == (2010, 12, 30)


def test_content_date_candidates_features():
    from kgp.contentdates import content_date_candidates
    from kgp.html_text import parse_html
    root = parse_html(HTML)
    cands = content_date_candidates(
        root, "https://ex.com/2010/07/20/article.html")
    by_val = {}
    for c in cands:
        by_val.setdefault(c["value"], c)
    assert "2010-07-20" in by_val and "11.04.2009" in by_val
    pub = by_val["2010-07-20"]
    # keyword "published" precedes the date in the same text node ->
    # closest-keyword hit (key_loc 2) with a positive distance score,
    # or node-level key_loc 1; class is PUBLISH either way
    assert pub["key_class"] == 1
    assert pub["key_loc"] in (1, 2)
    assert pub["in_meta"] is True        # meta tag carries the same day
    assert pub["in_url"] is True         # /2010/07/20/ in the url path
    assert pub["tag_name"] == "P"
    other = by_val["11.04.2009"]
    assert other["key_class"] in (0, 3)
    assert other["in_meta"] is False
    # ordinal positions: publish date comes first in the document
    assert pub["ord_doc_pos"] < other["ord_doc_pos"]
    # age order: 2010 date is newer -> earlier age rank
    assert pub["ord_age_pos"] < other["ord_age_pos"]
    # neighbor distances are symmetric between the two positioned dates
    assert pub["dist_pos_after"] == other["dist_pos_before"] > 0


def test_stage_rate_best(spark):
    from kgp import contentdates as cd
    pages = spark.createDataFrame(
        [("https://ex.com/a.html", HTML),
         ("https://ex.com/2009/04/11/b.html",
          "<html><body><p>posted 11.04.2009</p>"
          "<p>seen 2008-01-02</p></body></html>")],
        "url string, html string")
    cands = cd.content_dates_stage(pages)
    rated = cd.rate_content_dates(cands)
    best = {r.url: r for r in cd.best_content_dates(rated).collect()}
    assert best["https://ex.com/a.html"].value == "2010-07-20"
    # page b: the posted date also appears in the URL -> rate 1.0
    b = best["https://ex.com/2009/04/11/b.html"]
    assert b.value == "11.04.2009" and b.rate == 1.0


def test_trained_rater_roundtrip(spark):
    from kgp import contentdates as cd
    from pyspark.sql import functions as F
    pages = spark.createDataFrame(
        [("https://ex.com/a.html", HTML)], "url string, html string")
    cands = cd.content_dates_stage(pages)
    # teacher labels from the heuristic rater (disambig_ml pattern)
    labeled = cd.rate_content_dates(cands).withColumn(
        "label", (F.col("rate") > 0.5).cast("double"))
    model, feats = cd.train_content_date_rater(labeled)
    scored = cd.apply_trained_rater(cands, model)
    rows = scored.collect()
    assert all(0.0 <= r.rate <= 1.0 for r in rows)
    assert set(cands.columns).issubset(set(scored.columns))


def test_contentdates_hostile_inputs(spark):
    from kgp import contentdates as cd
    pages = spark.createDataFrame(
        [("u1", ""), ("u2", "<html><body></body></html>"),
         ("u3", "not html at all 2010-07-20"),
         ("u4", "<p>unclosed <b>deep " + "<div>" * 50 + "x 1.1.2001")],
        "url string, html string")
    cands = cd.content_dates_stage(pages)
    rows = cands.collect()   # must not throw
    assert all(r.url in {"u1", "u2", "u3", "u4"} for r in rows)
    # rating and best-date never crash on whatever survived
    best = cd.best_content_dates(cd.rate_content_dates(cands))
    assert best.count() <= 4


def test_forest_rater_matches_scalar_twin(spark):
    """tree_column scoring of the gate forest == the scalar
    ForestModel.probability on every synthetic training vector, and
    the publish+inUrl override wins (ContentDateRater.java:90-91)."""
    from kgp.contentdates import (RATER_FEATURES, gate_rater_forest,
                                  rate_with_forest,
                                  synth_rater_training)

    forest = gate_rater_forest()
    rows = synth_rater_training(120)
    df = spark.createDataFrame(
        [(i, *[feats[f] for f in RATER_FEATURES],
          1.0 if i % 11 == 0 else 0.0)
         for i, (feats, _label) in enumerate(rows)],
        ["i", *RATER_FEATURES, "in_url_d"])
    got = {r["i"]: r["rate"]
           for r in rate_with_forest(df).collect()}
    for i, (feats, _label) in enumerate(rows):
        if i % 11 == 0:
            assert got[i] == 1.0
        else:
            exp = round(forest.probability(feats, "pos"), 9)
            assert abs(got[i] - exp) < 1e-12, (i, got[i], exp)


def test_forest_rater_deterministic():
    """Two processes training gate_rater_forest must agree — assert
    the SQL rendering is stable across retrains in-process."""
    from kgp import contentdates as cd
    from kgp.dtree import train_forest, tree_sql
    a = tree_sql(cd.gate_rater_forest(), "pos")
    b = tree_sql(train_forest(cd.synth_rater_training(),
                              num_trees=10, seed=13), "pos")
    assert a == b
