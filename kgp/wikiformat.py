"""MediaWikiFormattingParser port — bold/italic apostrophe parsing.

Reference:
/root/reference/palladian-core/src/main/java/ws/palladian/retrieval/wiki/MediaWikiFormattingParser.java:16-244
 — the MediaWiki inline-text BNF apostrophe disambiguator: a
   pre-parsed {index: run_length} apostrophe map, then a walk that
   decomposes each run into character/italic/bold/boldItalic events
   (case 3 consults balance state AND whether an earlier BOLD was
   emitted AND the two preceding characters; case 4 depends on
   would-balance parity; >5 spills apostrophe characters).  The map
   is MUTATED during the walk (parsedBold puts 3 back at the index,
   parsedItalic 2, ...), and boldCount()/italicCount() iterate the
   WHOLE map — decomposed past entries plus raw future runs — so the
   balance checks see half-processed state.  This port keeps that
   exact mutation order; the reference's own test goldens
   (MediaWikiFormattingParserTest.java:53-77, all 13) pin it.

The HTML rendering below is the reference test's TestingCallback
(:11-51) — the project's canonical realisation of the callback
interface (<i>/</i> toggles, the boldItalic close-reopen dance).

Spark shape: a stateful per-string parser is inherently row-local
Python — it runs as ONE Arrow batch pass (mapInPandas-compatible
pandas UDF), the same policy as the HTML5 parser; everything
downstream of the emitted (html, bold_terms, counts) columns stays
JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

APOSTROPHE = "'"
ITALIC_LENGTH = 2
BOLD_LENGTH = 3
BOLD_ITALIC_LENGTH = 5

# the reference's own test corpus (MediaWikiFormattingParserTest.
# java:53-77) — shared by the gate query and its oracle render
REFERENCE_MARKUPS = [
    "hello ' blah",
    "hello '' blah",
    "hello ''' blah",
    "hello l'''amour'' l'''ouest''' blah",
    "hello mon'''amour'' blah",
    "hello '''amour'' '''blah '''blah",
    "hello ''''amour''' now ''italics unbalanced, but that's ok",
    "hello ''''amour''' now, '''bold unbalanced, but that's ok",
    "hello ''''amour''' now '''''bold and italics unbalanced, "
    "so invoke this special case",
    "hello ''''' blah",
    "hello '''''''''' blah",
    "hello '''bold '''''''''' blah",
]


def _apostrophe_map(text: str) -> dict[int, int]:
    """createApostropheMap (:197-215): {start index: run length}."""
    amap: dict[int, int] = {}
    num = 0
    for i, ch in enumerate(text):
        if ch == APOSTROPHE:
            num += 1
        elif num > 0:
            amap[i - num] = num
            num = 0
    if num > 0:
        amap[len(text) - num] = num
    return amap


class _Parser:
    """The private constructor walk (:88-101) with exact state."""

    def __init__(self, text: str, callback) -> None:
        self.amap = _apostrophe_map(text)
        self.cb = callback
        self.chars = text
        self.idx = 0
        while self.idx < len(self.chars):
            count = self.amap.get(self.idx)
            if count is not None:
                self._process(count)
            elif self.chars[self.idx] != APOSTROPHE:
                self.cb.character(self.chars[self.idx])
                self.idx += 1

    # processApostrophes (:103-150)
    def _process(self, count: int) -> None:
        if count == 1:
            self._apostrophe()
        elif count == 2:
            self._italic()
        elif count == 3:
            if self._unbalanced() and self.idx >= 2:
                if self._earlier_bold(self.idx):
                    self._bold()
                elif (self.chars[self.idx - 1] != " "
                      and self.chars[self.idx - 2] == " ") \
                        or (self.chars[self.idx - 1] != " "
                            and self.chars[self.idx - 2] != " ") \
                        or self.chars[self.idx - 1] == " ":
                    self._apostrophe()
                    self._italic()
                else:
                    self._bold()
            else:
                self._bold()
        elif count == 4:
            would_balance = ((self._bold_count() + 1) % 2 == 0
                             or self._italic_count() % 2 == 0)
            if would_balance:
                self._apostrophe()
                self._bold()
            else:
                self._apostrophe()
                self._apostrophe()
                self._italic()
        elif count == 5:
            self._bold_italic()
        else:  # more than five
            for _ in range(count - 5):
                self._apostrophe()
            self._bold_italic()

    def _italic(self) -> None:
        self.cb.italic()
        self.amap[self.idx] = ITALIC_LENGTH
        self.idx += ITALIC_LENGTH

    def _bold(self) -> None:
        self.cb.bold()
        self.amap[self.idx] = BOLD_LENGTH
        self.idx += BOLD_LENGTH

    def _bold_italic(self) -> None:
        self.cb.boldItalic()
        self.amap[self.idx] = BOLD_ITALIC_LENGTH
        self.idx += BOLD_ITALIC_LENGTH

    def _apostrophe(self) -> None:
        self.cb.character(APOSTROPHE)
        self.amap[self.idx] = 1
        self.idx += 1

    def _earlier_bold(self, index: int) -> bool:
        return any(self.amap.get(k) == BOLD_LENGTH
                   for k in range(index))

    def _unbalanced(self) -> bool:
        return (self._italic_count() % 2 == 1
                and self._bold_count() % 2 == 1)

    def _bold_count(self) -> int:
        return sum(1 for v in self.amap.values()
                   if v in (BOLD_LENGTH, BOLD_ITALIC_LENGTH))

    def _italic_count(self) -> int:
        return sum(1 for v in self.amap.values()
                   if v in (ITALIC_LENGTH, BOLD_ITALIC_LENGTH))


def parse_formatting(text: str, callback) -> None:
    """MediaWikiFormattingParser.parse (:80-86)."""
    _Parser(text, callback)


class HtmlCallback:
    """TestingCallback (MediaWikiFormattingParserTest.java:11-51) —
    the canonical <b>/<i> rendering of the callback events."""

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.italic_on = False
        self.bold_on = False
        self.n_bold = 0
        self.n_italic = 0
        self.n_bold_italic = 0

    def character(self, ch: str) -> None:
        self.parts.append(ch)

    def italic(self) -> None:
        self.n_italic += 1
        self.italic_on ^= True
        self.parts.append("<i>" if self.italic_on else "</i>")

    def bold(self) -> None:
        self.n_bold += 1
        self.bold_on ^= True
        self.parts.append("<b>" if self.bold_on else "</b>")

    def boldItalic(self) -> None:
        self.n_bold_italic += 1
        self.italic_on ^= True
        self.bold_on ^= True
        if not self.italic_on:
            self.parts.append("</i>")
        if not self.bold_on:
            self.parts.append("</b>")
        if self.bold_on:
            self.parts.append("<b>")
        if self.italic_on:
            self.parts.append("<i>")

    def __str__(self) -> str:
        return "".join(self.parts)


def format_to_html(text: str) -> str:
    """Parse wiki apostrophe formatting and render as <b>/<i> HTML."""
    cb = HtmlCallback()
    parse_formatting(text, cb)
    return str(cb)


def parse_stats(text: str) -> tuple[str, int, int, int]:
    """(html, bold_events, italic_events, bold_italic_events)."""
    cb = HtmlCallback()
    parse_formatting(text, cb)
    return str(cb), cb.n_bold, cb.n_italic, cb.n_bold_italic


_SCHEMA = T.StructType([
    T.StructField("html", T.StringType()),
    T.StructField("n_bold", T.IntegerType()),
    T.StructField("n_italic", T.IntegerType()),
    T.StructField("n_bold_italic", T.IntegerType()),
])


@F.pandas_udf(_SCHEMA)
def _format_udf(texts: pd.Series) -> pd.DataFrame:
    rows = [parse_stats(t or "") for t in texts]
    return pd.DataFrame(rows, columns=["html", "n_bold", "n_italic",
                                       "n_bold_italic"])


def wiki_formatting_stage(pages: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """Adds (html, n_bold, n_italic, n_bold_italic) per page — one
    Arrow batch pass, no shuffle."""
    out = pages.withColumn("_fmt", _format_udf(F.col(text_col)))
    return out.select(
        *pages.columns,
        F.col("_fmt.html").alias("html"),
        F.col("_fmt.n_bold").alias("n_bold"),
        F.col("_fmt.n_italic").alias("n_italic"),
        F.col("_fmt.n_bold_italic").alias("n_bold_italic"))
