"""Sitemap reader (SitemapRetriever port): cleanup, type detection,
loc/priority regex scan, normalization, gzip handling, index joins."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from kgp.sitemap import (clean_up_sitemap, decode_sitemap_bytes,
                         get_sitemap_type, index_members, normalize_url,
                         resolve_index_members, sitemap_rows_stage,
                         urls_from_sitemap)

LIST_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">
<url><loc>http://a.com/1.html</loc><priority>0.8</priority></url>
<url><loc><![CDATA[http://a.com/2.html]]></loc><priority>0.5</priority></url>
<url><loc>
   http://a.com/3.html?x=1&amp;y=2</loc><priority>0.3</priority></url>
</urlset>"""

INDEX_XML = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>http://a.com/sitemap1.xml</loc></sitemap>
<sitemap><loc>http://a.com/sitemap2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_sitemap_type():
    assert get_sitemap_type(LIST_XML) == "LIST"
    assert get_sitemap_type(INDEX_XML) == "INDEX"


def test_clean_up_strips_namespaces_except_image():
    xml = ('<urlset xmlns:news="x" xmlns:image="y">'
           '<news:news>n</news:news>'
           '<image:loc>http://img.com/i.jpg</image:loc>'
           '<url><loc>http://a.com/p</loc></url></urlset>')
    cleaned = clean_up_sitemap(xml)
    assert "<news>" in cleaned  # news: prefix stripped
    # image: prefix NOT stripped (SitemapRetriever.java:172-176 — an
    # image:loc must not collapse into a phantom loc)
    assert "<image:loc>" in cleaned
    urls = [u for u, _ in urls_from_sitemap(xml)]
    assert urls == ["http://a.com/p"]


def test_urls_from_sitemap_priorities_and_normalize():
    got = urls_from_sitemap(LIST_XML)
    assert got == [("http://a.com/1.html", 0.8),
                   ("http://a.com/2.html", 0.5),
                   ("http://a.com/3.html?x=1&y=2", 0.3)]


def test_priority_all_or_nothing():
    # one entry lacks a priority tag -> counts differ -> NO priorities
    xml = ("<urlset><url><loc>http://a.com/1</loc>"
           "<priority>0.9</priority></url>"
           "<url><loc>http://a.com/2</loc></url></urlset>")
    assert urls_from_sitemap(xml) == [("http://a.com/1", None),
                                      ("http://a.com/2", None)]


def test_goal_pattern_include_exclude():
    xml = ("<urlset><url><loc>http://a.com/news/1</loc></url>"
           "<url><loc>http://a.com/shop/2</loc></url></urlset>")
    assert [u for u, _ in urls_from_sitemap(xml, "/news/")] \
        == ["http://a.com/news/1"]
    assert [u for u, _ in urls_from_sitemap(xml, "/news/",
                                            include=False)] \
        == ["http://a.com/shop/2"]
    # ".*" skips matching entirely (SitemapRetriever.java:242-245)
    assert len(urls_from_sitemap(xml, ".*")) == 2


def test_order_preserving_dedup():
    xml = ("<urlset><url><loc>http://a.com/x</loc></url>"
           "<url><loc>http://a.com/y</loc></url>"
           "<url><loc>http://a.com/x</loc></url></urlset>")
    assert [u for u, _ in urls_from_sitemap(xml)] \
        == ["http://a.com/x", "http://a.com/y"]


def test_normalize_url_entities():
    assert normalize_url(" <![CDATA[http://a.com/?a=1&amp;b=2]]> ") \
        == "http://a.com/?a=1&b=2"
    assert normalize_url("http://a.com/&apos;&quot;&gt;&lt;") \
        == "http://a.com/'\"><"


def test_index_members():
    assert index_members(INDEX_XML) == ["http://a.com/sitemap1.xml",
                                        "http://a.com/sitemap2.xml.gz"]


def test_decode_sitemap_bytes_gzip_and_liar():
    raw = LIST_XML.encode()
    assert decode_sitemap_bytes("http://a.com/s.xml.gz",
                                gzip.compress(raw)) == LIST_XML
    # ".gz" suffix but plain content: fall back to raw bytes
    # (SitemapRetriever.java:80-85)
    assert decode_sitemap_bytes("http://a.com/s.xml.gz", raw) \
        == LIST_XML
    # gzip magic without the suffix also decompresses
    assert decode_sitemap_bytes("http://a.com/s.xml",
                                gzip.compress(raw)) == LIST_XML


def test_sitemap_stage_and_index_join(spark):
    files = spark.createDataFrame(
        [("http://a.com/sitemap_index.xml", INDEX_XML.encode()),
         ("http://a.com/sitemap1.xml", LIST_XML.encode()),
         ("http://a.com/sitemap2.xml.gz",
          gzip.compress(LIST_XML.replace("a.com/1", "a.com/gz1")
                        .encode()))],
        "url string, content binary")
    rows = sitemap_rows_stage(files).persist()
    pages = {r.loc for r in rows.where(F.col("kind") == "page")
             .collect()}
    assert "http://a.com/1.html" in pages
    assert "http://a.com/gz1.html" in pages
    resolved = resolve_index_members(rows).collect()
    assert {(r.index_url, r.sitemap_url) for r in resolved} == {
        ("http://a.com/sitemap_index.xml", "http://a.com/sitemap1.xml"),
        ("http://a.com/sitemap_index.xml",
         "http://a.com/sitemap2.xml.gz")}
    # every resolved page row carries its member sitemap's pages
    assert {r.page_url for r in resolved
            if r.sitemap_url == "http://a.com/sitemap1.xml"} \
        == {"http://a.com/1.html", "http://a.com/2.html",
            "http://a.com/3.html?x=1&y=2"}


def test_sitemap_stage_no_shuffle(spark):
    files = spark.createDataFrame(
        [("http://a.com/s.xml", LIST_XML.encode())],
        "url string, content binary")
    plan = sitemap_rows_stage(files)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_sitemap_hostile_inputs(spark):
    files = spark.createDataFrame(
        [("http://a.com/empty.xml", b""),
         ("http://a.com/junk.xml", b"\xff\xfenot xml at all"),
         ("http://a.com/noloc.xml", b"<urlset><url></url></urlset>")],
        "url string, content binary")
    assert sitemap_rows_stage(files).count() == 0
