"""Token informativeness — port of the reference's corpus-frequency
informativeness scorer (extraction/feature/InformativenessAssigner
.java):

- initTokenFrequencyMap (:73-109): tokenize a text corpus with
  Tokenizer.tokenize, frequency = count / totalTokens.  (The
  reference's corpus is a handful of live random web pages; here the
  corpus is the input table — the fit is a distributed aggregation.)
- normalizeFrequencyMap (:52-71): normalize by the HIGHEST frequency,
  where the max is taken only over tokens LONGER THAN ONE CHARACTER
  (:62-64) but every token — including 1-char ones — is divided by it,
  so 1-char tokens can exceed 1.0.
- getInformativeness (:197-207): normalized frequency, defaulting to
  1 for unseen tokens.
- removeWordsWithLowInformativeness (:209-220): split on the \\s
  regex (java.lang.String.split: trailing empty strings dropped,
  leading/interior kept), keep tokens with informativeness STRICTLY
  greater than the limit, join with single spaces, trim.  Interior
  empty tokens are unseen -> informativeness 1 -> kept when limit < 1
  (they surface as doubled spaces); kept bug-for-bug.
- tagText (:157-195): wrap every token in
  <token style="color:hsl(H,100%, 35%)"> where H =
  Math.round(255 * informativeness) appended as a Java double
  ("229.0"); the per-text frequency map the loop builds (:162-180) is
  computed but never used for the hue — ported as written.

Spark shapes:
- the tokenizer column op hands the reference's EXACT Java pattern
  (Tokenizer.java:27) to the JVM regex engine (regexp_extract_all) —
  reference-identical by construction, zero Python;
- fit = explode + ONE groupBy(token) count; the freq/max-freq
  normalization windows run on the vocabulary-sized count table,
  never the raw rows;
- the filter stage is ONE mapInPandas pass with the broadcast
  vocabulary dict (frequency maps are vocabulary-sized), no shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.tokenize import tokenize

# Tokenizer.java:27 — the reference's Java literal, handed verbatim to
# Spark's (Java-regex) regexp_extract_all.
TOKEN_SPLIT_JAVA = (r"(?:[A-Z][a-z]?\.)+|[\p{L}\w+]+(?:[-\.,][\p{L}\w]+)*"
                    r"|\.[\p{L}\w]+|</?[\p{L}\w]+>|\$\d+\.\d+|[^\w\s<]+")


def tokenize_col(col: Column) -> Column:
    """Tokenizer.tokenize as a pure JVM column (same engine, same
    pattern string as the reference)."""
    return F.regexp_extract_all(col, F.lit(TOKEN_SPLIT_JAVA), 0)


# ------------------------------------------------------------ pure twins


def fit_frequencies(texts: list[str]) -> dict[str, float]:
    """initTokenFrequencyMap twin: token count / total token count
    over the corpus."""
    counts: dict[str, int] = {}
    total = 0
    for text in texts:
        for tok in tokenize(text):
            counts[tok] = counts.get(tok, 0) + 1
            total += 1
    return {t: c / total for t, c in counts.items()} if total else {}


def normalize_frequencies(freqs: dict[str, float]) -> dict[str, float]:
    """normalizeFrequencyMap twin: divide every frequency by the max
    frequency among tokens with length > 1."""
    highest = 0.0
    for tok, f in freqs.items():
        if len(tok) > 1 and f > highest:
            highest = f
    if highest == 0.0:
        return dict(freqs)
    return {t: f / highest for t, f in freqs.items()}


def get_informativeness(norm_freqs: dict[str, float],
                        token: str) -> float:
    """getInformativeness twin: normalized frequency, 1 if unseen."""
    score = norm_freqs.get(token)
    return 1.0 if score is None else score


def _java_split_ws(text: str) -> list[str]:
    """java.lang.String.split("\\\\s"): single-whitespace-char
    delimiter, trailing empty strings removed."""
    import re
    parts = re.split(r"\s", text)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def remove_low_informativeness(text: str,
                               norm_freqs: dict[str, float],
                               limit: float) -> str:
    """removeWordsWithLowInformativeness twin (exact append+trim
    semantics)."""
    filtered = ""
    for tok in _java_split_ws(text):
        if get_informativeness(norm_freqs, tok) > limit:
            filtered += tok + " "
    return filtered.strip()


def _java_double(x: float) -> str:
    """Java Double.toString for the integral hues tagText emits."""
    return str(int(x)) + ".0" if x == int(x) else repr(x)


def tag_text(text: str, norm_freqs: dict[str, float]) -> str:
    """tagText twin: every Tokenizer token wrapped in a color-coded
    <token> element, trailing space kept.  The reference also builds a
    per-text relative-frequency map here (:162-180) that the hue loop
    never reads — ported as written (no observable effect)."""
    tokens = tokenize(text)
    counts: dict[str, int] = {}
    for tok in tokens:
        counts[tok] = counts.get(tok, 0) + 1
    highest = max(counts.values(), default=1)
    _ = {t: c / highest for t, c in counts.items()}  # unused, as upstream
    out = []
    for tok in tokens:
        informativeness = get_informativeness(norm_freqs, tok)
        hue = float(math.floor(255 * informativeness + 0.5))  # Math.round
        out.append('<token style="color:hsl(%s,100%%, 35%%)">%s</token> '
                   % (_java_double(hue), tok))
    return "".join(out)


# ------------------------------------------------------------ Spark side


def fit_informativeness_stage(docs: DataFrame,
                              text_col: str = "text") -> DataFrame:
    """Distributed initTokenFrequencyMap + normalizeFrequencyMap:
    (token, count, frequency, informativeness).  One explode + one
    groupBy(token); the total/max windows run over the
    vocabulary-sized count table only."""
    counts = (docs
              .select(F.explode(tokenize_col(F.col(text_col)))
                      .alias("token"))
              .groupBy("token").agg(F.count("*").alias("count")))
    w = Window.partitionBy()
    freq = counts.withColumn(
        "frequency", F.col("count") / F.sum("count").over(w))
    highest = F.max(F.when(F.length("token") > 1,
                           F.col("frequency"))).over(w)
    return freq.withColumn(
        "informativeness",
        F.when(highest.isNull() | (highest == 0), F.col("frequency"))
        .otherwise(F.col("frequency") / highest))


def informativeness_model(docs: DataFrame,
                          text_col: str = "text") -> dict[str, float]:
    """Vocabulary-sized collect of the fitted normalized frequencies
    (the broadcastable model dict)."""
    rows = fit_informativeness_stage(docs, text_col).collect()
    return {r["token"]: r["informativeness"] for r in rows}


def filter_low_informativeness_stage(docs: DataFrame,
                                     norm_freqs: dict[str, float],
                                     limit: float,
                                     id_col: str = "doc_id",
                                     text_col: str = "text"
                                     ) -> DataFrame:
    """removeWordsWithLowInformativeness over a table: ONE mapInPandas
    pass with the broadcast vocabulary dict — no shuffle, no join."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(dict(norm_freqs))
    schema = T.StructType([
        T.StructField("_id", docs.schema[id_col].dataType),
        T.StructField("filtered_text", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        freqs = bc.value
        for pdf in batches:
            yield pd.DataFrame({
                "_id": pdf[id_col],
                "filtered_text": [
                    remove_low_informativeness(t or "", freqs, limit)
                    for t in pdf[text_col]]})

    return (docs.select(id_col, text_col)
            .mapInPandas(run, schema)
            .withColumnRenamed("_id", id_col))
