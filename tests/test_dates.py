"""Date stack: DateParser.findDates / DateAndTimeTagger port parity.

Semantics re-derived from DateParser.java:196-253 and the RegExp date
format constants; cases mirror the format families the tagger's
DEFAULT configuration covers in prose.
"""

from __future__ import annotations

from kgp.dates import (ALL_DATE_FORMATS, DEFAULT_TAGGER_FORMATS,
                       find_dates, tag_datetimes)


def strings(text, formats=None):
    return [(d.value, d.fmt) for d in find_dates(text, formats)]


def test_usa_long_month():
    got = strings("The merger was announced on March 3, 2021 in town.")
    assert got == [("March 3, 2021", "MMMM DD, YYYY")]


def test_iso_ymd_masks_shorter_formats():
    # the 3-part match masks the string before YYYY-MM could re-match
    got = strings("released 2021-03-03 worldwide")
    assert got == [("2021-03-03", "YYYY-MM-DD")]


def test_eu_dotted():
    assert strings("am 3.4.2021 war es") == [("3.4.2021", "DD.MM.YYYY")]
    assert strings("am 03.04. war es") == [("03.04.", "DD.MM.")]


def test_rfc_1123():
    got = strings("sent Tue, 03 Jun 2008 11:05:30 GMT today")
    assert got == [("Tue, 03 Jun 2008 11:05:30 GMT",
                    "WD, DD MMM YYYY HH:MM:SS TZ")]


def test_digit_neighbor_rejected():
    # DateParser.java:227-243: a digit before the match sets the
    # neighbor flag, but the end-of-match check OVERWRITES it (faithful
    # reference quirk) — so the 3-part match dies on the leading '5',
    # and the shorter YYYY-MM then matches with a '-' after it
    assert strings("code 52021-03-03") == [("2021-03", "YYYY-MM")]
    # a preceding period kills every candidate outright
    assert strings("v.2021-03-03") == []


def test_context_year_needs_default_formats():
    assert strings("it happened in 1989 already") == []
    got = strings("it happened in 1989 already", DEFAULT_TAGGER_FORMATS)
    assert got == [("1989", "YYYY")]


def test_tag_datetimes_multiple():
    got = [(d.value, d.fmt) for d in
           tag_datetimes("from 12.03.2021 until 2024 it ran")]
    assert ("12.03.2021", "DD.MM.YYYY") in got
    assert ("2024", "YYYY") in got


def test_datetime_mention_add_back():
    # PalladianNer.getAnnotations:462-470 — DATETIME joins the mention
    # stream; a bare month stays dropped as a date fragment
    from kgp.mentions import NerModel, tag_sentence
    model = NerModel(entity_dict={}, annotation_dict={}, priors={})
    got = tag_sentence("The merger closed on March 3, 2021 in town.",
                       100, model)
    assert {(m["surface"], m["tag"]) for m in got} == \
        {("March 3, 2021", "DATETIME")}
    d = next(m for m in got if m["tag"] == "DATETIME")
    assert d["start"] == 100 + 21
    assert all(f.pattern for f in ALL_DATE_FORMATS)


def test_url_date_formats():
    from kgp.dates import URL_DATE_FORMATS, find_dates
    got = find_dates("https://ex.com/2021/03/05/story.html",
                     URL_DATE_FORMATS)
    assert got and got[0].value == "2021/03/05"


def test_publish_date_priority():
    from kgp.html_text import parse_html
    from kgp.pagedates import get_publish_date, meta_dates
    html = ('<html><head>'
            '<meta property="article:published_time" '
            'content="2021-03-05T10:00:00Z">'
            '</head><body><p>Updated on March 9, 2021.</p></body></html>')
    root = parse_html(html)
    got = get_publish_date(root, "https://ex.com/2020/01/02/x.html",
                           "Updated on March 9, 2021.")
    assert got.source == "meta" and got.value.startswith("2021-03-05")
    # without meta, the URL wins over body text
    root2 = parse_html("<html><body><p>March 9, 2021.</p></body></html>")
    got2 = get_publish_date(root2, "https://ex.com/2020/01/02/x.html",
                            "March 9, 2021 was the day.")
    assert got2.source == "url" and got2.value == "2020/01/02"
    # content-only fallback
    got3 = get_publish_date(root2, "https://ex.com/about.html",
                            "March 9, 2021 was the day.")
    assert got3.source == "content" and got3.value == "March 9, 2021"
    assert meta_dates(root2) == []


def test_compact_iso_yyyymmdd():
    # ONE_PART_FORMATS tail (RegExp.java:124-125): runs last, guarded
    # by the digit-neighbor rule
    from kgp.dates import find_dates
    assert [(d.value, d.fmt) for d in
            find_dates("Released on 20210304 worldwide.")] == \
        [("20210304", "YYYYMMDD")]
    assert find_dates("The id 120210304 is not a date.") == []
    assert find_dates("Price 20211399 is not a date.") == []


def test_with_time_variants_mask_before_bare_dates():
    # TIME_FORMATS run before THREE_PART (ALL_DATE_FORMATS order,
    # RegExp.java:346-359): the timestamp masks as ONE date
    from kgp.dates import find_dates
    got = find_dates("At 2021-03-04T12:30:45Z the feed updated.")
    assert [(d.value, d.fmt) for d in got] == \
        [("2021-03-04T12:30:45Z", "YYYY-MM-DDTHH:MM:SS+HH:MM")]
    got = find_dates("Logged 03/04/2021 12:30:45 +01:00 by ops.")
    assert [d.fmt for d in got] == ["MM/DD/YYYY HH:MM:SS +UTC"]
    got = find_dates("Am 04.03.2021 12:30 GMT war es soweit.")
    assert [(d.value, d.fmt) for d in got] == \
        [("04.03.2021 12:30 GMT", "DD.MM.YYYY HH:MM:SS +UTC")]
    got = find_dates("On March 3, 2021, 10:15 PM the vote closed.")
    assert [(d.value, d.fmt) for d in got] == \
        [("March 3, 2021, 10:15 PM", "MMMM DD, YYYY HH:MM:SS +UTC")]
    got = find_dates("On 4. März 2021 14:00 UTC in Berlin.")
    assert [(d.value, d.fmt) for d in got] == \
        [("4. März 2021 14:00 UTC", "DD. MMMM YYYY HH:MM:SS +UTC")]


def test_bare_date_still_bare():
    from kgp.dates import find_dates
    got = find_dates("The merger was announced on March 3, 2021 in X.")
    assert [(d.value, d.fmt) for d in got] == \
        [("March 3, 2021", "MMMM DD, YYYY")]
