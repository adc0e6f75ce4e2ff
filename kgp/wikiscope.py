"""Wikipedia location-scope dataset reader — port of
WikipediaLocationScopeIterator (extraction/location/scope/evaluation/
WikipediaLocationScopeIterator.java:28-125): the reader for the scope
corpus its companion creator dumps (one ``*.mediawiki`` file per
article + the article's title-display coordinate; the creator itself
is a live-HTTP random-article fetcher, out of scope like the other
live retrievers).

Per file (:86-106): page = WikiPage(0, 0, "", markup); scope =
page.getCoordinate() (FIRST title-display coordinate across coord
tags then infoboxes — ported at kgp.wikilocations.page_coordinate),
kept as a bare (lat, lng) pair; text = page.getCleanText()
(MediaWikiUtil.stripMediaWikiMarkup, ported at kgp.wiki.strip_markup);
document name = the file name.  Pages without a title-display
coordinate yield a null scope (the reference builds a Location with a
null coordinate — they are NOT dropped).

The shuffle constructor flag is a presentation-order knob of the
single-JVM iterator (the reference itself notes it "degrades
reproducibility") — meaningless under distributed ordering, omitted.

Spark shape: one wholetext scan (file = split unit), ONE Arrow pass
for markup parsing (page-sized state), nothing else.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType([
    T.StructField("file_name", T.StringType()),
    T.StructField("clean_text", T.StringType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lon", T.DoubleType()),
])


def parse_scope_page(file_name: str, markup: str) -> dict:
    """One LocationDocument (:86-106)."""
    from kgp.wiki import strip_markup
    from kgp.wikilocations import page_coordinate
    coord = page_coordinate(markup)
    return dict(file_name=file_name,
                clean_text=strip_markup(markup),
                lat=None if coord is None else float(coord["lat"]),
                lon=None if coord is None else float(coord["lng"]))


# Gate markup bank (wiki_scope_docs gate), keyed by doc_id % 4:
# DMS title coord tag / decimal infobox title coordinate /
# inline-only display (null scope, document kept) / no coordinate.
# The oracle hand-derives the clean texts and mirrors the
# parseComponents arithmetic (d + m/60 + s/3600) term-for-term.
GATE_MARKUPS: tuple[str, ...] = (
    "Dresden is a city.\n"
    "{{Coord|51|3|N|13|44|E|display=title}}\n"
    "More text here.",
    "{{Infobox settlement\n| name = Paris\n"
    "| coordinates_display = inline,title\n"
    "| latd = 48.8566\n| longd = 2.3522\n}}\n"
    "Paris is the capital of [[France]].",
    "Plain article with [[links]] and no coordinate. "
    "{{Coord|1|2|display=inline}}",
    "Just [[some text]] about ''nothing''.",
)


def wikiscope_stage(files: DataFrame, name_col: str = "file_name",
                    markup_col: str = "markup") -> DataFrame:
    """files(file_name, markup) -> (file_name, clean_text, lat, lon);
    ONE Arrow pass."""

    def scan(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = [parse_scope_page(n, m)
                    for n, m in zip(pdf[name_col], pdf[markup_col])
                    if m is not None]
            if rows:
                yield pd.DataFrame(rows)

    return files.select(name_col, markup_col).mapInPandas(scan, _SCHEMA)


def read_wikipedia_scope(spark: SparkSession,
                         dataset_dir: str) -> DataFrame:
    """The directory shell: every ``*.mediawiki`` file becomes one
    (file_name, clean_text, lat, lon) row."""
    files = (spark.read.text(f"{dataset_dir}/*.mediawiki",
                             wholetext=True)
             .select(
                 F.element_at(F.split(F.input_file_name(), "/"), -1)
                 .alias("file_name"),
                 F.col("value").alias("markup")))
    return wikiscope_stage(files, "file_name", "markup")
