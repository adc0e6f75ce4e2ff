"""The reference's OWN ContentDateGetterTest (extraction/date/getter/
ContentDateGetterTest.java:30-71) reproduced against kgp.contentdates
on the reference's own fixture pages — candidate counts AND normalized
date strings, plus the findAllDates battery over texts/text01.txt
(142 found / 119 distinct date strings)."""

from __future__ import annotations

from kgp.contentdates import content_date_candidates, find_all_dates
from kgp.html_text import parse_html

_RES = "/root/reference/palladian-core/src/test/resources/"


def _candidates(page: str) -> list[dict]:
    root = parse_html(open(_RES + "webPages/" + page, "rb").read())
    return content_date_candidates(root)


def _norm(c: dict) -> str:
    s = f"{c['year']:04d}" if c["year"] != -1 else "0"
    if c["month"] != -1:
        s += f"-{c['month']:02d}"
    if c["day"] != -1:
        s += f"-{c['day']:02d}"
    return s


def test_get_content_date_zeit1():
    cands = _candidates("dateExtraction/zeit1.htm")
    assert [_norm(c) for c in cands] == [
        "2010-08-22", "2010-08-22", "2010-08-22", "2010-08-22",
        "2010-08-22", "2010-08"]


def test_get_content_date_zeit2():
    cands = _candidates("dateExtraction/zeit2.htm")
    assert [_norm(c) for c in cands] == ["2010-09-03", "2010-09-02"]


def test_get_content_date_website107():
    cands = _candidates("website107.html")
    assert len(cands) == 4
    assert _norm(cands[0]) == "2012-09-05"


def test_get_content_date_website108():
    assert len(_candidates("website108.html")) == 33


def test_find_all_dates_text01():
    # testGetFindAllDatesTime:61-71 — the text is NOT valid UTF-8;
    # Java's InputStreamReader substitutes U+FFFD (errors='replace'),
    # and readFileToString appends \n per line
    raw = open(_RES + "texts/text01.txt", encoding="utf-8",
               errors="replace").read()
    content = "".join(l + "\n" for l in raw.splitlines())
    dates = find_all_dates(content)
    assert len(dates) == 142
    # the upstream stringPos set collapses to distinct date strings
    # (DATEPOS_IN_DOC is unset at this stage)
    assert len({d.value for d in dates}) == 119
