"""Benchmark decontamination: n-gram overlap against a held-out
test set (the GPT-3 appendix-C / PaLM "data contamination" check).

A 100 TB training corpus must not contain the evaluation benchmarks.
The standard check (Brown et al. 2020, appendix C; Chowdhery et al.
2022 §6) marks a training document contaminated when it shares at
least one n-gram (n=8..13 over lowercased, punctuation-stripped word
tokens) with any test-set document.

Scale shape:
- Test sets are tiny next to the corpus (thousands of documents vs
  10^12), so the distinct test n-gram set is vocabulary-sized: it is
  built once and BROADCAST. The corpus side then needs no shuffle to
  probe it — each exploded (doc, ngram) row hits the broadcast hash
  table map-side, and only the MATCHED rows (a vanishing fraction)
  shuffle on doc_id for the per-document count.
- N-gram generation is pure JVM higher-order array functions
  (split → filter → transform(sequence, slice)) — zero Python, and
  the exploded n-grams are consumed by the broadcast join inside the
  same stage, never materialized.
- For truly huge test suites the join key can be md5-compressed
  (engine-portable, unlike xxhash64); the string key is kept here so
  the DuckDB oracle exercises the exact production expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GPT-3 used 13-gram overlap; PaLM 8-gram. Default to the stricter 13.
DEFAULT_N = 13


def norm_tokens(col: Column) -> Column:
    """Lowercased word tokens with punctuation stripped — the GPT-3
    decontamination normalization (lowercase, non-alphanumeric →
    space, whitespace split, empties dropped)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "), " "),
        lambda w: w != "")


def word_ngrams(col: Column, n: int = DEFAULT_N) -> Column:
    """Array of space-joined word n-grams of the normalized tokens
    (empty array when the text has fewer than n tokens)."""
    words = norm_tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    return F.when(F.size(words) >= n, grams) \
        .otherwise(F.array().cast("array<string>"))


def test_ngram_set(test_docs: DataFrame, text_col: str = "text",
                   n: int = DEFAULT_N) -> DataFrame:
    """Distinct n-grams of the test set — one column `ngram`. Small by
    construction (benchmarks, not corpora); the caller broadcasts it."""
    return (test_docs
            .select(F.explode(word_ngrams(F.col(text_col), n))
                    .alias("ngram"))
            .distinct())


def decontaminate(docs: DataFrame, test_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = DEFAULT_N) -> DataFrame:
    """docs -> (id, n_ngrams, n_matches, contaminated).

    n_ngrams   total n-grams in the training document,
    n_matches  how many of them appear anywhere in the test set,
    contaminated  n_matches > 0 (the GPT-3 removal criterion).

    The test n-gram set is broadcast; the corpus probe is map-side.
    Only matched (doc, ngram) rows — near zero on a clean corpus —
    shuffle for the per-document count, and the count table (again:
    contaminated docs only) is broadcast back onto the corpus, so the
    full corpus never shuffles at all.
    """
    grams = docs.select(
        F.col(id_col),
        word_ngrams(F.col(text_col), n).alias("_grams"))
    sizes = grams.select(id_col,
                         F.size("_grams").alias("n_ngrams"))
    test_set = F.broadcast(test_ngram_set(test_docs, text_col, n))
    matches = (grams
               .select(id_col, F.explode("_grams").alias("ngram"))
               .join(test_set, "ngram")
               .groupBy(id_col)
               .agg(F.count("*").cast("int").alias("n_matches")))
    return (sizes
            .join(F.broadcast(matches), id_col, "left")
            .select(id_col,
                    F.col("n_ngrams").cast("int").alias("n_ngrams"),
                    F.coalesce("n_matches", F.lit(0)).cast("int")
                    .alias("n_matches"),
                    (F.coalesce("n_matches", F.lit(0)) > 0)
                    .alias("contaminated")))
