"""Unigram language-model quality scoring — the CCNet-style
"perplexity filter" stand-in (Wenzek et al. 2020 train a KenLM 5-gram
model and drop the worst-perplexity tail; with no KenLM in a pure
Spark stack, the unigram cross-entropy over a corpus-fitted vocabulary
gives the same keep/drop signal shape with exact, engine-reproducible
semantics).

Model: add-one-smoothed unigram over the top-V corpus vocabulary,

    p(w) = (count(w) + 1) / (T + V + 1)

with count(w)=0 for out-of-vocabulary tokens (the +1 makes OOV the
same formula, no special case), T = total corpus tokens, V = vocab
size. Score per document = mean token log-probability (natural log);
lower = less like the corpus = drop candidate.

Scale shape:
- Vocabulary build is the canonical word count: one shuffle of
  (word, partial-count) pairs with map-side combine, then a
  deterministic top-V cut (count DESC, word ASC) — ties never depend
  on partitioning.
- Scoring probes the BROADCAST vocabulary map-side; the only shuffle
  is (doc_id, logp) pairs — 16 bytes/token, smaller than the text
  itself — hash-keyed by doc_id (high cardinality, no skew).
- Cross-engine float determinism: Java's and DuckDB's ln() can differ
  in the last ulp, so the per-token logp is quantized to integer 1e-7
  units; the per-document mean is an exact long sum divided once —
  order-independent at any partitioning (a double SUM of pre-rounded
  terms lands systematically on rounding knife-edges: the r4
  phrase_probs driver red), and the oracle lands on the exact same
  doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.decontam import norm_tokens

DEFAULT_VOCAB = 50_000


def unigram_vocab(docs: DataFrame, text_col: str = "text",
                  max_vocab: int = DEFAULT_VOCAB) -> DataFrame:
    """(word, cnt) for the top max_vocab corpus words; deterministic
    cut by (cnt DESC, word ASC)."""
    return (docs
            .select(F.explode(norm_tokens(F.col(text_col)))
                    .alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("word").asc())
            .limit(max_vocab))


def unigram_logprob(docs: DataFrame, vocab: DataFrame,
                    total_tokens: int, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """docs -> (id, n_tokens, avg_logp) under the add-one unigram
    model defined by `vocab` (see module docstring). `total_tokens`
    is T, the full corpus token count (computable as one F.sum over
    norm_tokens sizes — passed in so callers can reuse a cached
    figure). Empty documents score null."""
    v = vocab.count()
    denom = float(total_tokens + v + 1)
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(norm_tokens(F.col(text_col))).alias("word"))
    logp_units = F.round(
        F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
              / F.lit(denom)) * 1e7).cast("long")
    return (toks
            .join(F.broadcast(vocab), "word", "left")
            .groupBy(id_col)
            .agg(F.count("word").cast("int").alias("n_tokens"),
                 F.sum(F.when(F.col("word").isNotNull(), logp_units))
                 .alias("_u"))
            .select(id_col, "n_tokens",
                    F.when(F.col("n_tokens") > 0,
                           F.col("_u") / (F.col("n_tokens")
                                          * F.lit(1e7)))
                    .alias("avg_logp")))


def corpus_token_count(docs: DataFrame, text_col: str = "text") -> int:
    """T for unigram_logprob: total normalized tokens in the corpus
    (single aggregate over token-array sizes — no explode)."""
    return docs.select(
        F.sum(F.size(norm_tokens(F.col(text_col)))).alias("t")
    ).collect()[0]["t"] or 0
