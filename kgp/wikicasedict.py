"""Wikipedia case-dictionary mining (WikipediaCaseDictionaryCreator).

Reference: palladian-core .../location/experimental/
WikipediaCaseDictionaryCreator.java

* mineCaseDictionary (:42-80): stream dump pages, keep MAIN
  namespace (:53), stop after ``limit`` pages (:56), per page take
  ``getCleanText()`` (= MediaWikiUtil.stripMediaWikiMarkup,
  WikiPage.java:59-61), ``StringHelper.normalizeQuotes`` (:65),
  ``MediaWikiUtil.extractSentences`` (:66), then count (:82-94):
  for every real sentence (Tokenizer.getSentences(text, true)) and
  every token EXCEPT the sentence-initial one (``i = 1``!),
  increment the lowercased word's total count, and its uppercase
  count when the surface form startsUppercase.
* writeCaseDictionary (:96-110): rows of
  (word, totalCount, uppercaseCount).
* clean (:112-140): keep rows with count >= 10 whose word
  full-matches ``[A-Za-z\\-]+``.

Spark shape: counting is ONE column-pruned Arrow pass over the page
text that pre-aggregates per batch (each batch yields at most
|vocabulary-of-batch| rows, the map-side combine), followed by a
single hash aggregation on the word key. The memory-pressure /
page-limit early stop of the single-JVM reference (:56-62) is a
driver knob, not a semantic: callers bound work by filtering on a
page ordinal BEFORE the stage, which Catalyst pushes into the scan.
At corpus scale nothing but (word, cnt, upper) pairs ever shuffles
— the dump text never leaves the mapper.
"""

from __future__ import annotations

import re
from collections import Counter

_CLEAN_WORD = re.compile(r"[A-Za-z\-]+\Z")


# ----------------------------------------------------------- local twin
def page_case_counts(markup: str) -> tuple[Counter, Counter]:
    """addCounts (:82-94) for ONE page's raw markup, including the
    mineCaseDictionary preprocessing chain (:64-66). Returns
    (total_counts, uppercase_counts) keyed by lowercased word."""
    from kgp.entity_preprocess import normalize_quotes
    from kgp.tokenize import get_sentences, tokenize
    from kgp.wiki import extract_sentences, strip_markup

    text = strip_markup(markup)
    text = normalize_quotes(text)
    text = extract_sentences(text)
    total: Counter = Counter()
    upper: Counter = Counter()
    for sent in get_sentences(text, only_real=True):
        tokens = tokenize(sent.value)
        for token in tokens[1:]:  # i = 1: skip the sentence starter
            low = token.lower()
            total[low] += 1
            if token[:1].isupper():
                upper[low] += 1
    return total, upper


def mine_case_dictionary_local(pages) -> list[tuple[str, int, int]]:
    """mineCaseDictionary+writeCaseDictionary twin over in-memory
    (namespace_id, text) pairs; returns sorted (word, total, upper)."""
    total: Counter = Counter()
    upper: Counter = Counter()
    for namespace_id, markup in pages:
        if namespace_id != 0:  # WikiPage.MAIN_NAMESPACE (:53)
            continue
        t, u = page_case_counts(markup)
        total.update(t)
        upper.update(u)
    return [(w, total[w], upper[w]) for w in sorted(total)]


def clean_case_rows(rows) -> list[tuple[str, int, int]]:
    """clean (:112-140): count >= 10 and word =~ [A-Za-z\\-]+ ."""
    return [r for r in rows if r[1] >= 10 and _CLEAN_WORD.match(r[0])]


# ----------------------------------------------------------- Spark stage
def mine_case_dictionary(pages, text_col: str = "text",
                         namespace_col: str = "namespace_id"):
    """Distributed mineCaseDictionary: page rows (from
    kgp.wikidump.wiki_dump_stage or any (namespace_id, text) table)
    -> one (word, total, upper) row per distinct lowercased word.

    ONE Arrow pass emits per-batch partial counts (map-side
    combine), then a single hash aggregation sums them."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("word", T.StringType()),
        T.StructField("total", T.LongType()),
        T.StructField("upper", T.LongType()),
    ])

    def run(batches):
        for pdf in batches:
            total: Counter = Counter()
            upper: Counter = Counter()
            for markup in pdf[text_col]:
                t, u = page_case_counts(markup)
                total.update(t)
                upper.update(u)
            yield pd.DataFrame(
                [(w, total[w], upper[w]) for w in total],
                columns=["word", "total", "upper"])

    main = pages.where(F.col(namespace_col) == 0).select(text_col)
    partial = main.mapInPandas(run, schema)
    return (partial.groupBy("word")
            .agg(F.sum("total").alias("total"),
                 F.sum("upper").alias("upper")))


def clean_case_dictionary(counts, min_count: int = 10):
    """clean (:112-140) as a pure-JVM filter: count >= 10 and the
    word full-matches [A-Za-z-]+ (String.matches anchors both ends)."""
    from pyspark.sql import functions as F

    return counts.where(
        (F.col("total") >= min_count)
        & F.col("word").rlike(r"^[A-Za-z\-]+$"))
