"""Co-occurrence matrix + phrase probability — port of the
reference's bigram language model (palladian-experimental
retrieval/cooccurrence/CooccurrenceMatrix.java and
PhraseProbabilityCalculator.java):

- CooccurrenceMatrix holds unigram counts (`items` Bag) and bigram
  counts (`pairs` CountMatrix).  N = getNumItems() = the SUM of all
  unigram counts (Bag.size(), not the vocabulary size); V =
  getNumUniqueItems() = the vocabulary size.
- getProbability(item, smoothing=true)   (CooccurrenceMatrix.java:104)
      P(w) = (c(w) + 1) / (N + V)
- getConditionalProbability(a, b, smoothing=true)  (:123-131)
      P(a|b) = (c(b,a) + 1) / (c(b) + V)
  i.e. add-one-smoothed bigram probability of `a` following `b`.
- PhraseProbabilityCalculator.getProbability(phrase)  (:54-66):
  tokens = phrase.split("\\s") (Java semantics: trailing empty
  strings dropped, interior kept), each lowercased; score =
      log10 P(t0) + SUM_i log10 P(t_{i+1} | t_i).
  The reference optionally Snowball-stems each token; with
  language=null (a supported constructor path, :43-50) no stemming is
  applied.  This port supports BOTH: the default is the null path
  (raw lowercase tokens); pass language="en"/"de" for the stemmed
  lookup via kgp.stemmer (raw snowball, no exception maps — the
  reference calls Stemmer.stem directly).

The reference loads its matrix from pre-counted Wikipedia corpus
files (convert(), PhraseProbabilityCalculator.java:80-105: unigram +
adjacent-bigram counts).  Here the matrix is FIT from the input
corpus itself with the same counting rule: tokens = lowercase
\\s-split of the text, unigrams counted, bigrams = adjacent token
pairs within a document (no cross-document pairs — the file-driven
matrix had none either).

Scale shape (10^12 docs):
- Fit = ONE explode + groupBy for unigrams and ONE for bigrams, both
  with map-side partial aggregation; the outputs are vocabulary- and
  bigram-vocabulary-sized, tiny next to the corpus.
- N and V ride along as single-row aggregates (no driver collect of
  the vocabulary).
- Scoring joins phrase tokens against the count tables on their
  natural keys; the count tables are the SMALL side — Spark/AQE
  broadcasts them when they fit, hash-joins otherwise.  No Python
  anywhere (pure column expressions end-to-end).
- Cross-engine float determinism: each log10 term is rounded to 7
  decimals, scaled to integer 1e-7 units (exact long), summed in
  integer space (order-independent), and divided back once — no
  double-precision SUM anywhere, so the result is identical at any
  parallelism/partitioning (the r4 driver red was a summation-order
  flip of a 6-decimal knife-edge at local[32]).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java String.split("\\s") semantics: trailing empty strings dropped,
# interior ones kept (PhraseProbabilityCalculator.java:55).  Spark's
# split keeps trailing empties for every limit <= 0 (it maps both to
# -1), so the trailing-whitespace strip happens BEFORE the split —
# equivalent for every non-all-whitespace string, and the
# all-whitespace edge ("" -> [""]) matches Java's "".split too.
_WS = r"\s"


def _java_ws_split(col: Column) -> Column:
    return F.split(F.regexp_replace(F.lower(col), r"\s+$", ""), _WS, -1)


def fit_cooccurrence_stage(docs: DataFrame,
                           text_col: str = "text") -> dict:
    """Fit the CooccurrenceMatrix from a corpus.

    Returns {"unigrams": DF(tok, c), "bigrams": DF(tok_a, tok_b, c),
    "totals": DF(n_items, n_unique)} — the distributed twin of
    CooccurrenceMatrix's items Bag / pairs CountMatrix / N / V.
    """
    arr = _java_ws_split(F.col(text_col))
    toks = docs.select(F.explode(arr).alias("tok"))
    unigrams = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # adjacent pairs: zip arr[0..n-2] with arr[1..n-1] (JVM-side)
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            )).alias("pr"))
    bigrams = (pairs
               .select(F.col("pr.0").alias("tok_a"),
                       F.col("pr.1").alias("tok_b"))
               .groupBy("tok_a", "tok_b").agg(F.count("*").alias("c")))
    totals = unigrams.agg(
        F.sum("c").alias("n_items"),
        F.count("*").alias("n_unique"))
    return {"unigrams": unigrams, "bigrams": bigrams, "totals": totals}


def phrase_probability_stage(phrases: DataFrame, matrix: dict,
                             phrase_col: str = "phrase",
                             id_col: str = "phrase_id",
                             language: str | None = None) -> DataFrame:
    """PhraseProbabilityCalculator.getProbability for every row of
    `phrases` -> (id_col, phrase, log_prob).

    log_prob = log10 P(t0) + SUM log10 P(t_{i+1}|t_i), add-one
    smoothed exactly as the reference (see module docstring).  Empty
    phrases (no tokens after the Java split) score null.

    `language` mirrors the reference constructor's Language argument
    (PhraseProbabilityCalculator.java:43-50, stem() :69-74): None =
    no stemming (the default, zero-Python end-to-end); "en"/"de" =
    each lowercased query token is RAW-snowball-stemmed before
    lookup (kgp.stemmer, one Arrow pass over the phrase table —
    query-sized, never the corpus; the matrix keys stay raw, exactly
    as the reference stems only at lookup time).
    """
    uni = matrix["unigrams"]
    big = matrix["bigrams"]
    arr = _java_ws_split(F.col(phrase_col))
    base = phrases.select(id_col, phrase_col).withColumn("_arr", arr)
    if language is not None:
        from pyspark.sql.functions import pandas_udf

        from kgp.stemmer import snowball_de, snowball_en
        stem = snowball_en if language == "en" else snowball_de

        @pandas_udf("array<string>")
        def _stem_arr(arrs: pd.Series) -> pd.Series:
            return arrs.map(
                lambda a: None if a is None else [stem(t) for t in a])

        base = base.withColumn("_arr", _stem_arr(F.col("_arr")))

    # crossJoin with the single-row totals: a scalar broadcast, the
    # canonical "ride-along aggregate" (never a driver collect)
    base = base.crossJoin(F.broadcast(matrix["totals"]))

    # first-token term: log10((c(t0)+1) / (N+V))
    first = (base
             .select(id_col, F.col("_arr")[0].alias("tok"),
                     "n_items", "n_unique")
             .join(uni.withColumnRenamed("tok", "tok")
                   .withColumnRenamed("c", "c_tok"), "tok", "left")
             .select(
                 id_col,
                 F.round(F.log10(
                     (F.coalesce("c_tok", F.lit(0)) + F.lit(1.0))
                     / (F.col("n_items") + F.col("n_unique"))),
                     7).alias("term")))

    # bigram terms: log10((c(a,b)+1) / (c(a)+V)) for each adjacent pair
    pair_rows = (base
                 .select(
                     id_col, "n_unique",
                     F.explode(F.arrays_zip(
                         F.slice(F.col("_arr"), 1,
                                 F.greatest(F.size("_arr") - 1,
                                            F.lit(0))),
                         F.slice(F.col("_arr"), 2,
                                 F.greatest(F.size("_arr") - 1,
                                            F.lit(0))),
                     )).alias("pr"))
                 .select(id_col, "n_unique",
                         F.col("pr.0").alias("tok_a"),
                         F.col("pr.1").alias("tok_b")))
    big_terms = (pair_rows
                 .join(big.withColumnRenamed("c", "c_pair"),
                       ["tok_a", "tok_b"], "left")
                 .join(uni.withColumnRenamed("tok", "tok_a")
                       .withColumnRenamed("c", "c_a"), "tok_a", "left")
                 .select(
                     id_col,
                     F.round(F.log10(
                         (F.coalesce("c_pair", F.lit(0)) + F.lit(1.0))
                         / (F.coalesce("c_a", F.lit(0))
                            + F.col("n_unique"))),
                         7).alias("term")))

    terms = first.unionByName(big_terms)
    # Exact integer-space sum: each term is a 7-decimal-rounded double,
    # so scaling by 1e7 lands within ~1e-7 of an integer — the long
    # cast is exact and the SUM is order-independent.  (The old
    # round(SUM(double), 6) was a knife-edge: a sum of 7-decimal terms
    # is often an exact odd multiple of 1e-7, and partitioning-
    # dependent double-summation order decided which side of the
    # 6-decimal boundary the FP error fell — one row flipped by 1e-6
    # at local[32] vs local[8].)  The final /1e7 is a single
    # deterministic IEEE division; no second rounding.
    scored = terms.groupBy(id_col).agg(
        (F.sum(F.round(F.col("term") * 1e7).cast("long")) / F.lit(1e7))
        .alias("log_prob"))
    return (phrases.select(id_col, phrase_col)
            .join(scored, id_col, "left"))


class CooccurrenceMatrixLocal:
    """Scalar CooccurrenceMatrix twin (CooccurrenceMatrix.java:
    40-132): items Bag + (cooccurring, first) pair CountMatrix with
    add/set, getCount and the unsmoothed/add-one conditional
    probability P(a|b) = (count(b->a)+s1) / (count(b)+s2). The
    distributed fit (fit_cooccurrence_stage) produces the same
    tables; this twin backs direct-construction call sites and the
    harvested upstream test."""

    def __init__(self):
        self.items: dict[str, int] = {}
        self.pairs: dict[tuple[str, str], int] = {}

    def add(self, item_a: str, item_b: str,
            count: int = 1) -> "CooccurrenceMatrixLocal":
        key = (item_a, item_b)
        self.pairs[key] = self.pairs.get(key, 0) + count
        return self

    def set(self, item: str, count: int) -> "CooccurrenceMatrixLocal":
        self.items[item] = count
        return self

    def get_count(self, item_a: str, item_b: str | None = None) -> int:
        if item_b is None:
            return self.items.get(item_a, 0)
        return self.pairs.get((item_a, item_b), 0)

    def conditional_probability(self, item_a: str, item_b: str,
                                smoothing: bool = False) -> float:
        s1 = 1 if smoothing else 0
        s2 = len(self.items) if smoothing else 0
        return (self.get_count(item_b, item_a) + s1) / \
            (self.get_count(item_b) + s2)
