"""MediaWiki dump handler / links / disambiguation vs the reference
SAX semantics (MediaWikiPageContentHandler.java, WikiPage.java:262-293,
MediaWikiUtil.java:63)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgp.wikidump import (disambiguation_col, internal_links,
                          internal_links_df, is_disambiguation,
                          parse_dump_pages, wiki_dump_stage)

XML = """<mediawiki>
<page><title>A page</title><ns>0</ns><id>11</id>
<revision><id>999</id><text>See [[Other page|anchor]] and
[[Target#frag]] plus [[Category:Things]] and [[#self]].</text>
</revision></page>
<page><title>B (disambiguation)</title><ns>4</ns><id>12</id>
<revision><id>1000</id><text>{{Disambig}} [[C]]</text></revision>
</page>
</mediawiki>"""


def test_parse_dump_pages_revision_id_rule():
    pages = parse_dump_pages(XML)
    assert [(p.page_id, p.namespace_id, p.title) for p in pages] == \
        [(11, 0, "A page"), (12, 4, "B (disambiguation)")]
    # the revision's own <id> must NOT overwrite the page id
    assert pages[0].page_id == 11 and pages[1].page_id == 12


def test_internal_links_semantics():
    pages = parse_dump_pages(XML)
    # fragment stripped; category skipped; bare-fragment link -> ""
    assert internal_links(pages[0].text) == [
        ("Other page", "anchor"), ("Target", None), ("", None)]
    assert internal_links("[[a|b|c]]") == []  # two pipes never match
    assert internal_links("[[Category:X|shown]]") == []


def test_is_disambiguation():
    assert is_disambiguation("B (disambiguation)", "x")
    assert is_disambiguation("B", "foo {{Disambig}} bar")
    assert is_disambiguation("B", "{{geodis}}")
    assert not is_disambiguation("B", "{{infobox}}")


def test_stage_matches_twin(spark):
    df = spark.createDataFrame([(XML,)], "xml string")
    pages = wiki_dump_stage(df)
    rows = pages.orderBy("page_id").collect()
    twin = parse_dump_pages(XML)
    assert [(r["page_id"], r["namespace_id"], r["title"], r["text"])
            for r in rows] == [tuple(p) for p in twin]
    linked = internal_links_df(pages).orderBy("page_id").collect()
    jvm = [(s["target"], s["anchor"]) for s in linked[0]["links"]]
    # JVM convention: non-participating anchor group -> "" (vs None)
    py = [(t, a if a is not None else "")
          for t, a in internal_links(twin[0].text)]
    assert jvm == py
    # no Python in the link-extraction plan
    plan = internal_links_df(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # disambiguation flag
    d = internal_links_df(pages).select(
        "page_id", disambiguation_col("title", "text").alias("d")) \
        .orderBy("page_id").collect()
    assert [r["d"] for r in d] == [False, True]
