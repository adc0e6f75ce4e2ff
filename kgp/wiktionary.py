"""Wiktionary dump -> word table (semantics/WiktionaryParser.java:
41-330 + WordDB.java merge semantics).

Per page (title outside namespaces, i.e. no ':' and no 'Wiktionary'
in the title; the literal 'ewusersonly' page skipped), the reference
extracts:

- language: DE ' ({{Sprache|' .. '}}', EN first '==' .. '==' section
  header (:130-136).
- word type: the DE '=== {{Wortart|' template (with the '}}' retry)
  and the EN Etymology/Pronunciation/header cascade with its
  '===' .. '===' re-extraction (:138-160).
- plural (DE nouns only): the '{{Silbentrennung}}' line after
  '{{Pl.}}' / '{{Pl.1}}' with the comma cut, mid-dots and ''..''
  italics stripped, 30-char cap (WordDB.MAX_WORD_LENGTH) (:163-189).
- synonyms / hypernyms / hyponyms: the '{{Synonyme}}' /
  '{{Oberbegriffe}}' / '{{Unterbegriffe}}' (DE, ':[1]' line only) or
  '====Synonyms====' (EN) blocks, links grabbed with the reference's
  tag regex `(?<=(^ |  |, )\\[\\[)([^\\]]{1,30}?)(?=\\]\\]($|,|;))` —
  Python lookbehinds must be fixed-width, so the port consumes the
  same left context with a group instead (match set identical;
  documented).
- WordDB merge: the first page wins each field, later pages only fill
  EMPTY plural/type/language and UNION the relation lists (:227-260).

Spark shape: ONE Arrow pass extracts per-page records; the WordDB
merge is a groupBy with min_by-on-page-order for the
first-non-empty-wins fields and flatten+array_distinct for the
relation unions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.html_text import _substring_between as _between
from kgp.tokenize import _clean_trim

MAX_WORD_LENGTH = 30  # WordDB.java:48

_TAG_GRAB = re.compile(r"(?:^ |  |, )\[\[([^\]]{1,30}?)\]\](?=$|,|;)")
_ITALICS = re.compile(r"''.*?''")


def _grab_tags(s: str) -> list[str]:
    return [m.group(1) for m in _TAG_GRAB.finditer(s)]


def parse_wiktionary_page(title: str, text: str,
                          language: str = "en") -> dict | None:
    """postProcess (:114-266) for one page; None when the page is
    filtered (namespace/meta titles, 'ewusersonly')."""
    if title is None or text is None:
        return None
    if ":" in title or "Wiktionary" in title:
        return None
    if title.lower() == "ewusersonly":
        return None
    de = language == "de"

    if de:
        lang = _between(text, " ({{Sprache|", "}}")
    else:
        lang = _between(text, "==", "==")

    if de:
        word_type = _between(text, "=== {{Wortart|", "|")
        if "}}" in word_type:
            word_type = _between(text, "=== {{Wortart|", "}}")
    else:
        word_type = _between(text, "Etymology 1===", "# ")
        if not word_type:
            word_type = _between(text, "Pronunciation===", "# ")
        if not word_type:
            word_type = _between(text, lang + "==", "# ")
        if "Etymology==" in word_type:
            word_type = _between(text, "Etymology===", "# ")
        if "Pronunciation" in word_type:
            word_type = _between(text, "Pronunciation===", "# ")
        if word_type:
            word_type = _between(word_type, "===", "===")
            word_type = _clean_trim(word_type, keep="")

    plural = ""
    if de and word_type.lower() == "substantiv":
        plural = _between(text, "{{Silbentrennung}}\n", "\n")
        if not plural:
            plural = _between(text, "{{Silbentrennung}} \n", "\n")
        if "{{Pl.}}" in plural:
            plural = plural[plural.index("{{Pl.}}") + 7:]
        elif "{{Pl.1}}" in plural:
            plural = plural[plural.index("{{Pl.1}}") + 8:]
            if "," in plural:
                plural = plural[:plural.index(",")]
            else:
                plural = ""
        plural = _clean_trim(
            _ITALICS.sub("", plural.replace("\n", "").replace("·", "")),
            keep="")
    if len(plural) > MAX_WORD_LENGTH:
        plural = ""

    synonyms: list[str] = []
    hypernyms: list[str] = []
    hyponyms: list[str] = []
    if de:
        syn = _between(text, "{{Synonyme}}", "}}\n")
        syn = _between(syn, ":[1]", "\n")
        synonyms = _grab_tags(_ITALICS.sub("", syn))
        hyp = _between(text, "{{Oberbegriffe}}", "}}\n")
        hyp = _between(hyp, ":[1]", "\n")
        hypernyms = _grab_tags(_ITALICS.sub("", hyp))
        hypo = _between(text, "{{Unterbegriffe}}", "}}\n")
        hypo = _between(hypo, ":[1]", "\n")
        hyponyms = _grab_tags(_ITALICS.sub("", hypo))
    else:
        syn = _between(text, "====Synonyms====", "===")
        synonyms = _grab_tags(syn)

    return {"word": title, "plural": plural, "word_type": word_type,
            "language": lang, "synonyms": synonyms,
            "hypernyms": hypernyms, "hyponyms": hyponyms}


WORD_SCHEMA = ("ord long, word string, plural string, "
               "word_type string, language string, "
               "synonyms array<string>, hypernyms array<string>, "
               "hyponyms array<string>")


def wiktionary_words_stage(pages: DataFrame, language: str = "en",
                           title_col: str = "title",
                           text_col: str = "text",
                           order_col: str | None = None) -> DataFrame:
    """(word, plural, word_type, language, synonyms, hypernyms,
    hyponyms): ONE Arrow extraction pass, then the WordDB merge as a
    groupBy — first NON-EMPTY value in page order wins each scalar
    field, relation lists union distinct (order of first appearance
    is not part of the WordDB contract; sorted here for
    determinism)."""
    cols = [F.col(title_col).alias("title"),
            F.col(text_col).alias("text")]
    order = F.col(order_col) if order_col else \
        F.monotonically_increasing_id()
    src = pages.select(order.alias("ord"), *cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for o, ti, tx in zip(pdf["ord"], pdf["title"], pdf["text"]):
                rec = parse_wiktionary_page(ti, tx, language)
                if rec is not None:
                    rows.append((int(o), rec["word"], rec["plural"],
                                 rec["word_type"], rec["language"],
                                 rec["synonyms"], rec["hypernyms"],
                                 rec["hyponyms"]))
            yield pd.DataFrame(rows, columns=[
                "ord", "word", "plural", "word_type", "language",
                "synonyms", "hypernyms", "hyponyms"])

    recs = src.mapInPandas(run, WORD_SCHEMA)

    def first_non_empty(col: str):
        return F.coalesce(
            F.min_by(col, F.when(F.col(col) != "", F.col("ord"))),
            F.lit("")).alias(col)

    return recs.groupBy("word").agg(
        first_non_empty("plural"),
        first_non_empty("word_type"),
        first_non_empty("language"),
        F.array_sort(F.array_distinct(F.flatten(
            F.collect_list("synonyms")))).alias("synonyms"),
        F.array_sort(F.array_distinct(F.flatten(
            F.collect_list("hypernyms")))).alias("hypernyms"),
        F.array_sort(F.array_distinct(F.flatten(
            F.collect_list("hyponyms")))).alias("hyponyms"))
