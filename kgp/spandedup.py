"""Cross-document duplicated-SPAN detection and scrubbing — the
ExactSubstr idea of "Deduplicating Training Data Makes Language
Models Better" (Lee et al., 2022, public) re-expressed with bounded
shuffles instead of a corpus-wide suffix array:

- every document emits md5-prefix hashes of its span_len-char
  shingles at a fixed stride — PURE column expressions (sequence ->
  explode -> substring -> md5), no Python;
- a hash aggregation finds spans occurring in more than one document
  (the copied-boilerplate / license-block / spam-template signal);
- scrubbing removes every duplicated span occurrence EXCEPT those in
  the span's canonical owner (the minimum doc_id), merging
  overlapping span intervals per document before cutting — one
  bounded join (only matched shingles shuffle) plus one Arrow pass
  over the affected documents; untouched documents never shuffle.

At 100 TB the shingle table is (len/stride) rows per document with an
8-byte key — the same shape as the fingerprint tables the exact-dedup
path already shuffles; the dup-span set is corpus-vocabulary sized
and the scrub join touches only documents that contain one.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_shingles(docs: DataFrame, span_len: int = 40,
                  stride: int = 10, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, span_hash) for every span_len-char shingle at
    stride offsets (0-based pos; docs shorter than span_len emit
    nothing). Pure JVM: sequence/explode/substring/md5."""
    n = (F.floor((F.length(text_col) - span_len) / stride)
         .cast("int"))
    return (docs
            .where(F.length(text_col) >= span_len)
            .select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("_t"),
                    F.explode(F.sequence(F.lit(0), n)).alias("_i"))
            .select("doc_id",
                    (F.col("_i") * stride).alias("pos"),
                    F.substring(F.md5(F.substring(
                        "_t", F.col("_i") * stride + 1, span_len)),
                        1, 16).alias("span_hash")))


def duplicated_spans(docs: DataFrame, span_len: int = 40,
                     stride: int = 10, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(span_hash, n_docs, n_occurrences) for spans seen in MORE than
    one document — one hash aggregation with map-side combine."""
    sh = span_shingles(docs, span_len, stride, text_col, id_col)
    return (sh.groupBy("span_hash")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occurrences"))
            .where(F.col("n_docs") > 1))


def scrub_duplicated_spans(docs: DataFrame, span_len: int = 40,
                           stride: int = 10, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Remove duplicated-span occurrences everywhere except in each
    span's canonical owner (minimum doc_id). Returns the docs with
    `text_col` rewritten (overlapping intervals merged, cuts applied
    right-to-left). Only matched shingles shuffle; the full corpus
    joins once against the affected-interval lists (left join — clean
    documents pass through untouched)."""
    sh = span_shingles(docs, span_len, stride, text_col, id_col)
    dup = (sh.groupBy("span_hash")
           .agg(F.countDistinct("doc_id").alias("nd"),
                F.min("doc_id").alias("owner"))
           .where(F.col("nd") > 1)
           .select("span_hash", "owner"))
    cuts = (sh.join(dup, "span_hash")
            .where(F.col("doc_id") != F.col("owner"))
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("pos")).alias("cut_pos")))
    joined = docs.join(cuts.withColumnRenamed("doc_id", id_col),
                       id_col, "left")
    fields = docs.schema.fieldNames()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for t, cp in zip(pdf[text_col], pdf["cut_pos"]):
                if cp is None or len(cp) == 0 or t is None:
                    texts.append(t)
                    continue
                # merge overlapping [pos, pos+span_len) intervals
                ivs: list[list[int]] = []
                for p in sorted(int(x) for x in cp):
                    if ivs and p <= ivs[-1][1]:
                        ivs[-1][1] = max(ivs[-1][1], p + span_len)
                    else:
                        ivs.append([p, p + span_len])
                out = []
                last = 0
                for a, b in ivs:
                    out.append(t[last:a])
                    last = b
                out.append(t[last:])
                texts.append("".join(out))
            pdf = pdf.copy()
            pdf[text_col] = texts
            yield pdf[fields]

    return joined.mapInPandas(run, docs.schema)
