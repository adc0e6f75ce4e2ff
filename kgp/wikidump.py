"""MediaWiki XML dump processing: page stream, namespace filter,
internal links, disambiguation flag.

Reference semantics (palladian-core retrieval/wiki):

- ``MediaWikiPageContentHandler`` (MediaWikiPageContentHandler.java:
  30-106): SAX stream over the dump; buffers ``title``, ``ns``,
  ``text`` and -- only while NOT inside ``<revision>`` -- ``id`` (the
  revision's own <id> must not overwrite the page id); one WikiPage
  per ``</page>``.
- ``NamespaceFilter`` (NamespaceFilter.java:14-24): keep pages whose
  ``ns`` is in the accepted set (articles = 0).
- ``WikiPage.getLinks`` (WikiPage.java:275-293) over
  ``MediaWikiUtil.INTERNAL_LINK_PATTERN``
  (``\\[\\[([^|\\]]*)(?:\\|([^|\\]]*))?\\]\\]``, MediaWikiUtil.java:63):
  strip ``#fragment`` from the target, skip ``category:`` links.
- ``WikiPage.isDisambiguation`` (WikiPage.java:262-269): title ends
  with "(disambiguation)" or text contains {{disambig/{{hndis/
  {{geodis (lowercased).
- ``MultiStreamBZip2InputStream`` reads the multistream dump whose
  bz2 blocks each hold 100 pages -- that block structure is the
  natural split unit at scale; ``wiki_dump_stage`` takes one
  decompressed chunk per row, so a 100 TB dump parallelizes by
  multistream block with zero coordination.

Spark shape: the SAX parse is the only Python (one column-pruned
mapInPandas); link extraction is PURE JVM (two regexp_extract_all
passes zipped) so the downstream link graph never leaves codegen.
"""

from __future__ import annotations

import re
from typing import NamedTuple

INTERNAL_LINK_PATTERN = re.compile(
    r"\[\[([^|\]]*)(?:\|([^|\]]*))?\]\]")
_DUMP_FIELDS = ("page_id", "namespace_id", "title", "text")


class WikiDumpPage(NamedTuple):
    page_id: int
    namespace_id: int
    title: str
    text: str


def parse_dump_pages(xml_text: str) -> list[WikiDumpPage]:
    """MediaWikiPageContentHandler as an expat stream: one tuple per
    </page>, page id taken only OUTSIDE <revision>."""
    import xml.parsers.expat as expat

    pages: list[WikiDumpPage] = []
    state = {"buffer": [], "buffering": False, "in_revision": False,
             "title": "", "page_id": -1, "ns": -1, "text": ""}

    def start(name, attrs):
        if name in ("text", "title", "ns") or (
                name == "id" and not state["in_revision"]):
            state["buffering"] = True
        if name == "revision":
            state["in_revision"] = True

    def take() -> str:
        s = "".join(state["buffer"])
        state["buffer"] = []
        state["buffering"] = False
        return s

    def end(name):
        if name == "revision":
            state["in_revision"] = False
        elif name == "id" and not state["in_revision"]:
            state["page_id"] = int(take())
        elif name == "text":
            state["text"] = take()
        elif name == "title":
            state["title"] = take()
        elif name == "ns":
            state["ns"] = int(take())
        elif name == "page":
            pages.append(WikiDumpPage(state["page_id"], state["ns"],
                                      state["title"], state["text"]))

    def chars(data):
        if state["buffering"]:
            state["buffer"].append(data)

    p = expat.ParserCreate()
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chars
    p.Parse(xml_text, True)
    return pages


def internal_links(text: str) -> list[tuple[str, str | None]]:
    """WikiPage.getLinks (:275-293): (target sans fragment, anchor or
    None), category links skipped."""
    out = []
    for m in INTERNAL_LINK_PATTERN.finditer(text):
        target = m.group(1)
        idx = target.find("#")
        if idx >= 0:
            target = target[:idx]
        if target.lower().startswith("category:"):
            continue
        out.append((target, m.group(2)))
    return out


def is_disambiguation(title: str, text: str) -> bool:
    """WikiPage.isDisambiguation (:262-269)."""
    if title.endswith("(disambiguation)"):
        return True
    temp = text.lower()
    return ("{{disambig" in temp or "{{hndis" in temp
            or "{{geodis" in temp)


# ----------------------------------------------------------- Spark
def wiki_dump_stage(dumps, xml_col: str = "xml"):
    """Dump chunks -> page rows in ONE column-pruned Arrow pass:
    (page_id, namespace_id, title, text). Namespace filtering is a
    plain WHERE downstream (NamespaceFilter is predicate-pushdown
    territory, not an operator)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("page_id", T.LongType()),
        T.StructField("namespace_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for xml in pdf[xml_col]:
                if isinstance(xml, (bytes, bytearray)):
                    xml = xml.decode("utf-8", "replace")
                rows.extend(parse_dump_pages(xml))
            yield pd.DataFrame(rows, columns=list(_DUMP_FIELDS))

    return dumps.select(xml_col).mapInPandas(run, schema)


def internal_links_df(pages, text_col: str = "text"):
    """WikiPage.getLinks as PURE JVM column ops: two
    regexp_extract_all passes (target group, anchor group) zipped
    positionally, fragments stripped, category links dropped. Adds
    ``links array<struct<target,anchor>>`` -- explode downstream for
    the link graph; nothing leaves whole-stage codegen."""
    from pyspark.sql import functions as F

    pat = r"\[\[([^|\]]*)(?:\|([^|\]]*))?\]\]"
    targets = F.expr(
        f"regexp_extract_all({text_col}, '{pat}', 1)".replace(
            "\\", "\\\\"))
    anchors = F.expr(
        f"regexp_extract_all({text_col}, '{pat}', 2)".replace(
            "\\", "\\\\"))
    zipped = F.zip_with(
        targets, anchors,
        lambda t, a: F.struct(
            F.when(t.contains("#"),
                   F.substring_index(t, "#", 1)).otherwise(t)
            .alias("target"),
            a.alias("anchor")))
    links = F.filter(
        zipped, lambda s: ~F.lower(s["target"]).startswith("category:"))
    return pages.withColumn("links", links)


def disambiguation_col(title_col, text_col):
    """WikiPage.isDisambiguation (:262-269) as a pure JVM column."""
    from pyspark.sql import functions as F

    t = F.lower(F.col(text_col))
    return (F.col(title_col).endswith("(disambiguation)")
            | t.contains("{{disambig") | t.contains("{{hndis")
            | t.contains("{{geodis"))
