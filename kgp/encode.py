"""Feature encoders, normalizers + the nominal co-occurrence
classifier — ports of palladian-core classification/encode/,
classification/nominal/ and classification/utils/.

  * LabelEncoder (LabelEncoder.java:44-70, sklearn-style): each
    nominal column gets a companion ``<col>_index`` in [0, n) assigned
    by SORTED value order (the reference sorts, so the mapping is
    deterministic by construction).
  * FrequencyEncoder (FrequencyEncoder.java:35-98): companion
    ``<col>_frequency`` = count(value in the reference dataset) /
    total rows; nulls either stay null (KEEP_NULL, default) or take
    the null-count frequency (ASSIGN_FREQUENCY).
  * MinMaxNormalizer / ZScoreNormalizer (MinMaxNormalizer.java:59-86,
    ZScoreNormalizer.java + SlimStats.java:109-117): per-column stats
    over the NON-NULL values; min==max degenerates to value-min, and
    stddev==0 (sample stddev, n-1 denominator) to value-mean — the
    reference's exact fallbacks.
  * DummyVariableCreator (DummyVariableCreator.java:59-127): one-hot
    companion columns named ``<col>:<value>``; a column with <= 2
    distinct values INCLUDING null collapses to a single indicator —
    for the {true,false} domain the "true" column, otherwise one
    arbitrary value (the reference takes HashSet iteration order,
    nondeterministic by construction; this port takes the SORTED-first
    value, a documented deterministic substitute). Unseen / null
    values map to all-zeros.
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
                     null_strategy: str = "keep_null",
                     fit_df: DataFrame | None = None) -> DataFrame:
    """+ ``<col>_frequency`` per nominal column (FrequencyEncoder.java:
    79-97): value count in the REFERENCE dataset / total reference
    rows as float.  ``fit_df`` is that reference dataset (defaults to
    ``df`` itself — the common encode-in-place case).  A value the
    reference never saw gets frequency 0.0, NOT null (the Java
    getCount returns 0); nulls either stay null ('keep_null',
    default) or take the null-count frequency — 0.0 when the
    reference has no nulls ('assign_frequency')."""
    ref = fit_df if fit_df is not None else df
    total = ref.count()
    out = df
    for col in cols:
        counts = ref.groupBy(F.col(col).alias("_v")) \
            .agg((F.count("*") / F.lit(float(total))).cast("float")
                 .alias(col + "_frequency"))
        if null_strategy == "keep_null":
            counts = counts.where(F.col("_v").isNotNull())
        out = (out.join(F.broadcast(counts),
                        out[col].eqNullSafe(counts["_v"]), "left")
               .drop("_v"))
        # unseen values (and, under assign_frequency, unseen nulls)
        # read count 0 in the reference -> frequency 0.0
        fcol = col + "_frequency"
        if null_strategy == "keep_null":
            out = out.withColumn(
                fcol, F.when(F.col(col).isNull(), F.lit(None)
                             .cast("float"))
                .otherwise(F.coalesce(F.col(fcol),
                                      F.lit(0.0).cast("float"))))
        else:
            out = out.withColumn(
                fcol, F.coalesce(F.col(fcol),
                                 F.lit(0.0).cast("float")))
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

# --------------------------------------------------------- normalizers


def fit_minmax(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """Per-column (min, max) over non-null values in ONE aggregation
    (MinMaxNormalizer + AbstractStatsNormalizer.calculate — nulls are
    skipped, AbstractStatsNormalizer.java:36-45). Columns with no
    non-null value get no entry (normalize passes them through)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(c + "_min"), F.max(c).alias(c + "_max")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[c + "_min"], row[c + "_max"]) for c in cols
            if row[c + "_min"] is not None}


def apply_minmax(df: DataFrame, stats: dict[str, tuple]) -> DataFrame:
    """MinMaxNormalization.normalize (MinMaxNormalizer.java:76-86):
    (v - min) / (max - min), degenerating to v - min when max == min.
    Pure column expressions — zero shuffle, zero Python."""
    out = df
    for c, (lo, hi) in stats.items():
        diff = hi - lo
        expr = ((F.col(c) - F.lit(lo)) / F.lit(diff) if diff != 0
                else F.col(c) - F.lit(lo))
        out = out.withColumn(c, expr)
    return out


def fit_zscore(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """Per-column (mean, sample stddev) over non-null values in ONE
    aggregation (ZScoreNormalizer + SlimStats.getStandardDeviation,
    SlimStats.java:109-117: n-1 denominator, 0 for a single value)."""
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(c + "_mean"),
                 F.stddev_samp(c).alias(c + "_std"),
                 F.count(c).alias(c + "_n")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        if row[c + "_n"] == 0:
            continue
        std = row[c + "_std"]
        out[c] = (row[c + "_mean"], 0.0 if std is None else std)
    return out


def apply_zscore(df: DataFrame, stats: dict[str, tuple]) -> DataFrame:
    """ZScoreNormalization.normalize: (v - mean) / std, degenerating
    to v - mean when std == 0. Pure column expressions."""
    out = df
    for c, (mean, std) in stats.items():
        expr = F.col(c) - F.lit(mean)
        if std != 0:
            expr = expr / F.lit(std)
        out = out.withColumn(c, expr)
    return out


# ------------------------------------------------------------ one-hot


def fit_one_hot(df: DataFrame, cols: list[str]) -> dict[str, list[str]]:
    """DummyVariableCreator fit: distinct values per nominal column
    (one distinct aggregation per column — value-cardinality keys).
    Applies the <= 2-uniques-including-null collapse rule
    (DummyVariableCreator.java:85-99); see module docstring for the
    deterministic tie substitute."""
    mapping: dict[str, list[str]] = {}
    for c in cols:
        rows = df.select(F.col(c).cast("string").alias("_v")) \
            .distinct().collect()
        vals = sorted(r["_v"] for r in rows if r["_v"] is not None)
        has_null = any(r["_v"] is None for r in rows)
        if len(vals) + int(has_null) <= 2:
            if set(vals) >= {"true", "false"}:
                vals = ["true"]
            elif vals:
                vals = [vals[0]]
        mapping[c] = vals
    return mapping


def apply_one_hot(df: DataFrame, mapping: dict[str, list[str]],
                  keep_original: bool = False) -> DataFrame:
    """DummyVariableCreator apply: ``<col>:<value>`` integer indicator
    columns; null / unseen values produce all-zeros
    (DummyVariableCreator.java:120-127 `missing` vector). Pure column
    expressions — zero shuffle, zero Python."""
    out = df
    for c, vals in mapping.items():
        for v in vals:
            out = out.withColumn(
                f"{c}:{v}",
                F.when(F.col(c).cast("string") == v, 1)
                .otherwise(0).cast("int"))
        if not keep_original:
            out = out.drop(c)
    return out
