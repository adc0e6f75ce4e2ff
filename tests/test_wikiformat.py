"""MediaWikiFormattingParser port tests — ALL 13 assertions from the
reference's own MediaWikiFormattingParserTest.java:53-77."""

import pytest

from kgp.wikiformat import format_to_html, parse_stats, \
    wiki_formatting_stage

REFERENCE_GOLDENS = [
    ("hello ' blah", "hello ' blah"),
    ("hello '' blah", "hello <i> blah"),
    ("hello ''' blah", "hello <b> blah"),
    ("hello l'''amour'' l'''ouest''' blah",
     "hello l'<i>amour</i> l<b>ouest</b> blah"),
    ("hello mon'''amour'' blah", "hello mon'<i>amour</i> blah"),
    ("hello '''amour'' '''blah '''blah",
     "hello '<i>amour</i> <b>blah </b>blah"),
    ("hello ''''amour''' now ''italics unbalanced, but that's ok",
     "hello '<b>amour</b> now <i>italics unbalanced, but that's ok"),
    ("hello ''''amour''' now, '''bold unbalanced, but that's ok",
     "hello '<b>amour</b> now, <b>bold unbalanced, but that's ok"),
    ("hello ''''amour''' now '''''bold and italics unbalanced, "
     "so invoke this special case",
     "hello ''<i>amour<b> now </i></b>bold and italics unbalanced, "
     "so invoke this special case"),
    ("hello ''''' blah", "hello <b><i> blah"),
    ("hello '''''''''' blah", "hello '''''<b><i> blah"),
    ("hello '''bold '''''''''' blah",
     "hello <b>bold '''''</b><i> blah"),
]


@pytest.mark.parametrize("markup,expected", REFERENCE_GOLDENS)
def test_reference_goldens(markup, expected):
    assert format_to_html(markup) == expected


def test_empty_and_edges():
    assert format_to_html("") == ""
    assert format_to_html("'") == "'"
    assert format_to_html("''") == "<i>"
    assert format_to_html("x''''''y") == "x'<b><i>y"  # 6 = 1 + 5


def test_parse_stats_counts():
    # full-map balance semantics: the FIRST ''' sees the raw future
    # runs (3 italic-ish + 3 bold-ish = both odd -> unbalanced) and
    # decomposes to ' + <i> (:113-124); the second ''' then sees an
    # even italic count and bolds
    html, nb, ni, nbi = parse_stats("a '''b''' c ''d'' e ''''' f")
    assert html == "a '<i>b<b> c </i>d<i> e </i></b> f"
    assert (nb, ni, nbi) == (1, 3, 1)


def test_stage(spark):
    df = spark.createDataFrame(
        [(i, m) for i, (m, _) in enumerate(REFERENCE_GOLDENS)],
        "doc_id int, text string")
    out = {r.doc_id: (r.html, r.n_bold) for r in
           wiki_formatting_stage(df).collect()}
    for i, (m, exp) in enumerate(REFERENCE_GOLDENS):
        assert out[i][0] == exp, m
    assert out[2][1] == 1  # one bold toggle in "hello ''' blah"


def test_fuzz_invariants():
    """Random apostrophe soup: the parser must terminate, consume
    every non-apostrophe character exactly once and in order, and
    keep toggle-tag structure well-formed per the TestingCallback
    semantics."""
    import random
    import re
    rng = random.Random(42)
    alphabet = ["'", "a", " ", "''", "'''", "b"]
    for _ in range(300):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 40)))
        html = format_to_html(s)
        # non-apostrophe chars survive in order
        stripped = re.sub(r"</?[bi]>", "", html)
        assert re.sub(r"'+", "", stripped) == re.sub(r"'+", "", s), s
        # tags come only from the known set
        assert not re.search(r"<(?!/?[bi]>)", html), s
