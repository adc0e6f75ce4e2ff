"""Publish-date extraction — light WebPageDateEvaluator.

The reference's date stack mines page dates from three places and
rates them (UrlDateGetter, MetaDateGetter, ContentDateGetter under
/root/reference/palladian-core/src/main/java/ws/palladian/helper/date/
and .../retrieval/date/); the full evaluator scores candidates with a
trained rater. This port keeps the reference's SOURCE PRIORITY (meta
tags beat the URL beat body text — the same ordering its rater
effectively learns) over the ported format bank in kgp.dates, which
is the part a crawl pipeline needs: one deterministic publish-date
column per page.

Pure Python — runs inside the extraction pandas UDF.
"""

from __future__ import annotations

from typing import NamedTuple

from kgp.dates import (ALL_DATE_FORMATS, URL_DATE_FORMATS, find_dates)
from kgp.html_text import Node

# meta names/properties/itemprops that announce a publish date
# (MetaDateGetter semantics: http-equiv/name/property date headers)
_META_KEYS = {"article:published_time", "datepublished",
              "article:published", "date", "dc.date", "dc.date.issued",
              "publish-date", "publication_date", "sailthru.date",
              "og:published_time", "last-modified"}


class PageDate(NamedTuple):
    value: str        # raw matched date string
    fmt: str          # format key from the bank
    source: str       # meta | url | content


def meta_dates(root: Node) -> list[PageDate]:
    out: list[PageDate] = []
    for n in root.iter():
        if n.tag == "meta":
            key = str(n.attrs.get("property")
                      or n.attrs.get("name")
                      or n.attrs.get("itemprop") or "").lower()
            content = str(n.attrs.get("content") or "")
            if key in _META_KEYS and content:
                found = find_dates(content)
                if found:
                    d = found[0]
                    out.append(PageDate(d.value, d.fmt, "meta"))
        elif n.tag == "time":
            dt = str(n.attrs.get("datetime") or "")
            found = find_dates(dt) if dt else []
            if found:
                out.append(PageDate(found[0].value, found[0].fmt,
                                    "time"))
    return out


def url_dates(url: str) -> list[PageDate]:
    return [PageDate(d.value, d.fmt, "url")
            for d in find_dates(url, URL_DATE_FORMATS)]


def content_dates(text: str, head_chars: int = 2000) -> list[PageDate]:
    """Dates near the top of the article body (ContentDateGetter rates
    position; the head window is the cheap stand-in)."""
    return [PageDate(d.value, d.fmt, "content")
            for d in find_dates(text[:head_chars], ALL_DATE_FORMATS)]


_PRIORITY = {"meta": 0, "time": 1, "url": 2, "content": 3}


def get_publish_date(root: Node, url: str = "",
                     text: str = "") -> PageDate | None:
    """Best publish-date candidate by source priority: structured meta
    beats <time> beats the URL path beats body text."""
    candidates = (meta_dates(root) + url_dates(url)
                  + content_dates(text))
    if not candidates:
        return None
    return min(candidates, key=lambda c: _PRIORITY.get(c.source, 9))
