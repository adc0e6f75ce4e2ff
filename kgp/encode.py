"""Feature encoders + the nominal co-occurrence classifier — ports of
palladian-core classification/encode/ and classification/nominal/.

  * LabelEncoder (LabelEncoder.java:44-70, sklearn-style): each
    nominal column gets a companion ``<col>_index`` in [0, n) assigned
    by SORTED value order (the reference sorts, so the mapping is
    deterministic by construction).
  * FrequencyEncoder (FrequencyEncoder.java:35-98): companion
    ``<col>_frequency`` = count(value in the reference dataset) /
    total rows; nulls either stay null (KEEP_NULL, default) or take
    the null-count frequency (ASSIGN_FREQUENCY).
  * NominalClassifier (NominalClassifier.java:24-66): training counts
    (value, category) co-occurrences into ONE matrix keyed by the raw
    value string — values colliding across feature columns SHARE a row
    (a reference quirk, kept: the matrix has no feature dimension);
    classification sums count/rowSum per category over the instance's
    nominal values and normalizes.

Scale shape: every encoder fit is one groupBy over value-cardinality
keys; application is a broadcast join per column (the fitted maps are
vocabulary-sized). The classifier's scoring melts the instance columns
once, probes the broadcast matrix, and aggregates (id, category)
partial scores — the same shape as kgp.mlzoo's Bayes scorer.

Cross-engine float identity: per-value scores are rounded to 9
decimals before summation, final probabilities to 6 (the repo ladder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_encode(df: DataFrame, cols: list[str]) -> DataFrame:
    """+ ``<col>_index`` per nominal column: sorted-distinct rank,
    0-based (LabelEncoder). Nulls stay null (they are not in the
    reference's value statistics)."""
    out = df
    for col in cols:
        vals = (df.select(F.col(col).alias("_v"))
                .where(F.col(col).isNotNull()).distinct())
        w = Window.orderBy("_v")   # vocabulary-sized: safe window
        mapping = vals.select(
            "_v", (F.row_number().over(w) - 1).alias(col + "_index"))
        out = (out.join(F.broadcast(mapping),
                        out[col] == mapping["_v"], "left")
               .drop("_v"))
    return out


def frequency_encode(df: DataFrame, cols: list[str],
                     null_strategy: str = "keep_null") -> DataFrame:
    """+ ``<col>_frequency`` per nominal column (FrequencyEncoder):
    value count / total rows as float. null_strategy 'keep_null'
    leaves nulls null; 'assign_frequency' gives them the null-count
    frequency."""
    total = df.count()
    out = df
    for col in cols:
        counts = df.groupBy(F.col(col).alias("_v")) \
            .agg((F.count("*") / F.lit(float(total))).cast("float")
                 .alias(col + "_frequency"))
        if null_strategy == "keep_null":
            counts = counts.where(F.col("_v").isNotNull())
        out = (out.join(F.broadcast(counts),
                        out[col].eqNullSafe(counts["_v"]), "left")
               .drop("_v"))
    return out


def nominal_train(instances: DataFrame, feature_cols: list[str],
                  category_col: str = "category") -> DataFrame:
    """(value, category, n, row_sum): the co-occurrence matrix — ONE
    row space for all feature columns (the reference quirk; see module
    docstring). Nulls are skipped (non-NominalValue in the vector)."""
    from kgp.featuresel import _long_form
    lf = _long_form(instances, feature_cols, category_col) \
        .where(F.col("value") != "null")
    cells = lf.groupBy("value", "category") \
        .agg(F.count("*").alias("n"))
    sums = cells.groupBy("value").agg(F.sum("n").alias("row_sum"))
    return cells.join(sums, "value")


def nominal_predict(df: DataFrame, model: DataFrame,
                    feature_cols: list[str], id_col: str) -> DataFrame:
    """(id, predicted, probability): per instance, sum count/rowSum
    over its nominal values for every category, normalize, take the
    most likely (ties by ascending category name — the reference's
    CategoryEntries order is map-iteration-dependent)."""
    structs = F.array(*[
        F.coalesce(F.col(c).cast("string"), F.lit("null")).alias(c)
        for c in feature_cols])
    melted = df.select(F.col(id_col),
                       F.explode(structs).alias("value"))
    scored = (melted
              .join(F.broadcast(model), "value")
              .groupBy(id_col, "category")
              .agg(F.sum(F.round(F.col("n") / F.col("row_sum"), 9))
                   .alias("score")))
    totals = scored.groupBy(id_col).agg(F.sum("score").alias("_t"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("category"))
    return (scored.join(totals, id_col)
            .withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") == 1)
            .select(id_col, F.col("category").alias("predicted"),
                    F.round(F.col("score") / F.col("_t"), 6)
                    .alias("probability")))
