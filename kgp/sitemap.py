"""Sitemap / sitemap-index reading (sitemaps.org protocol).

Port of SitemapRetriever (palladian-retrieval/src/main/java/ws/
palladian/retrieval/analysis/SitemapRetriever.java):

- ``clean_up_sitemap`` (:169-186) — strip every xmlns namespace prefix
  EXCEPT ``image`` (so ``image:loc`` does not collapse into a phantom
  ``loc``), remove CDATA markers, squeeze newlines inside
  ``<loc>…</loc>``.
- ``get_sitemap_type`` (:188-199) — INDEX iff the text contains
  ``<sitemapindex`` or ``:sitemapindex ``; LIST otherwise.
- ``urls_from_sitemap`` (:220-268) — line-based LOC_PATTERN /
  PRIORITY_PATTERN regex scan, order-preserving dedup, optional
  goal-pattern include/exclude (Matcher.find semantics), and the
  reference's priority rule: priorities attach ONLY when the file's
  priority-tag count equals its url count.
- ``normalize_url`` (:270-287) — CDATA strip + the five-entity
  unescape chain + trim.

The reference walks sitemaps over live HTTP; the batch analog
(``sitemap_urls_stage``) reads a pre-crawled (url, content) table of
sitemap files: ONE column-pruned Arrow pass parses every file
(per-record gunzip for ``.gz`` members, falling back to the raw bytes
when the suffix lies — SitemapRetriever.java:80-85), emitting page
rows from LIST files and membership rows from INDEX files;
``resolve_index_members`` is one broadcast-able equi-join.
"""

from __future__ import annotations

import gzip
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.webgraph import _jtrim

# SitemapRetriever.java:33-34 (CASE_INSENSITIVE | DOTALL)
LOC_PATTERN = re.compile(r"(?<=>)[^>]+?(?=</loc)", re.I | re.S)
PRIORITY_PATTERN = re.compile(r"(?<=>)[0-9.]+?(?=</priority)",
                              re.I | re.S)

_NS_PATTERN = re.compile(r"(?<=xmlns:)([a-z0-9]+)(?=[=])")


def clean_up_sitemap(text: str) -> str:
    """SitemapRetriever.cleanUpSitemap:169-186."""
    for namespace in _NS_PATTERN.findall(text):
        if namespace.lower() != "image":
            text = text.replace(namespace + ":", "")
    text = text.replace("<![CDATA[", "").replace("]]>", "")
    text = re.sub(r"(\n+\s*)</loc>", "</loc>", text, flags=re.I)
    text = re.sub(r"<loc>(\n+\s*)", "<loc>", text, flags=re.I)
    return text


def get_sitemap_type(text: str) -> str:
    """SitemapRetriever.getSitemapType:188-199 — 'INDEX' or 'LIST'."""
    if "<sitemapindex" in text or ":sitemapindex " in text:
        return "INDEX"
    return "LIST"


def normalize_url(url: str) -> str:
    """SitemapRetriever.normalizeUrl:270-287 — CDATA, trim, and the
    reference's exact five-entity unescape chain (no full XML
    unescaping)."""
    url = url.replace("<![CDATA[", "").replace("]]>", "")
    url = _jtrim(url)
    url = url.replace("&amp;", "&")
    url = url.replace("&apos;", "'")
    url = url.replace("&quot;", '"')
    url = url.replace("&gt;", ">")
    url = url.replace("&lt;", "<")
    return url


def urls_from_sitemap(text: str, goal_pattern: str | None = None,
                      include: bool = True,
                      needs_cleaning: bool = True
                      ) -> list[tuple[str, float | None]]:
    """SitemapRetriever.getUrlsFromSitemap:224-268 — ordered distinct
    (url, priority) rows. priority is None for every row unless the
    file's priority count equals its url count (the reference's
    all-or-nothing mapping)."""
    if needs_cleaning:
        text = clean_up_sitemap(text)
    sitemap_urls: list[str] = []
    priority_strings: list[str] = []
    for line in text.split("\n"):
        sitemap_urls.extend(LOC_PATTERN.findall(line))
        priority_strings.extend(PRIORITY_PATTERN.findall(line))

    prio: dict[str, float] = {}
    if len(sitemap_urls) == len(priority_strings):
        for u, p in zip(sitemap_urls, priority_strings):
            try:
                prio[u] = float(p)
            except ValueError:
                pass

    pat = re.compile(goal_pattern) if goal_pattern is not None \
        and goal_pattern != ".*" else None
    out: list[tuple[str, float | None]] = []
    seen: set[str] = set()
    for url in sitemap_urls:
        matched = True if pat is None else bool(pat.search(url))
        if (matched and include) or (not matched and not include):
            clean = normalize_url(url)
            if clean not in seen:
                seen.add(clean)
                out.append((clean, prio.get(url)))
    return out


def index_members(text: str, needs_cleaning: bool = True) -> list[str]:
    """The INDEX branch (SitemapRetriever.java:119-126): loc entries
    of an index are member sitemap urls, normalized."""
    if needs_cleaning:
        text = clean_up_sitemap(text)
    out, seen = [], set()
    for url in LOC_PATTERN.findall(text):
        clean = normalize_url(url)
        if clean not in seen:
            seen.add(clean)
            out.append(clean)
    return out


def decode_sitemap_bytes(url: str, raw: bytes) -> str:
    """gz-suffixed members are gunzipped; when the suffix lies and the
    payload is not actually gzip, fall back to reading the raw bytes
    (SitemapRetriever.java:80-85)."""
    if url.lower().endswith(".gz") or raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except OSError:
            pass
    return raw.decode("utf-8", errors="replace")


SITEMAP_ROWS_SCHEMA = ("sitemap_url string, kind string, loc string, "
                       "priority double")


def sitemap_rows_stage(files: DataFrame,
                       goal_pattern: str | None = None,
                       include: bool = True) -> DataFrame:
    """files(url, content:binary) -> (sitemap_url, kind, loc,
    priority): kind='page' rows from LIST sitemaps (priority per the
    all-or-nothing rule), kind='sitemap' rows from INDEX files. One
    column-pruned Arrow pass, no shuffle."""

    def gen(batches):
        for pdf in batches:
            su, kind, loc, prio = [], [], [], []
            for u, raw in zip(pdf["url"], pdf["content"]):
                try:
                    text = decode_sitemap_bytes(u, bytes(raw))
                except Exception:
                    continue
                text = clean_up_sitemap(text)
                if get_sitemap_type(text) == "INDEX":
                    for m in index_members(text, needs_cleaning=False):
                        su.append(u)
                        kind.append("sitemap")
                        loc.append(m)
                        prio.append(None)
                else:
                    for page, p in urls_from_sitemap(
                            text, goal_pattern, include,
                            needs_cleaning=False):
                        su.append(u)
                        kind.append("page")
                        loc.append(page)
                        prio.append(p)
            if su:
                yield pd.DataFrame({"sitemap_url": su, "kind": kind,
                                    "loc": loc, "priority": prio})

    return files.select("url", "content").mapInPandas(
        gen, SITEMAP_ROWS_SCHEMA)


def resolve_index_members(rows: DataFrame) -> DataFrame:
    """(index_url, sitemap_url, page_url, priority): page rows of the
    LIST sitemaps an INDEX references — one equi-join (the member side
    is index-sized: broadcast-able)."""
    members = (rows.where(F.col("kind") == "sitemap")
               .select(F.col("sitemap_url").alias("index_url"),
                       F.col("loc").alias("sitemap_url")))
    pages = (rows.where(F.col("kind") == "page")
             .select("sitemap_url", F.col("loc").alias("page_url"),
                     "priority"))
    return F.broadcast(members).join(pages, "sitemap_url") \
        .select("index_url", "sitemap_url", "page_url", "priority")
