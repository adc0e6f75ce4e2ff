"""Dataset statistics — port of the reference's per-column dataset
profiling (core/dataset/statistics/):

- DatasetStatistics.calculateStatistics (DatasetStatistics.java:
  85-125): walk every instance once, feeding one stats builder per
  feature; NOMINAL and NUMERIC features get builders, every other
  type is skipped (createValueStatsBuilder returns null, :57-65).
- AbstractValueStatisticsBuilder.add (AbstractValueStatisticsBuilder
  .java:48-58): NullValue increments numNullValues, otherwise the
  typed value is added.
- NumericValueStatistics (NumericValueStatistics.java:34-62): mean /
  standard deviation / min / max over the non-null values via
  SlimStats — sample standard deviation (n-1 denominator), the same
  SlimStats convention kgp.encode's ZScoreNormalizer port pins.
- NominalValueStatistics (NominalValueStatistics.java:46-70):
  distinct non-null value count, getNumUniqueValuesIncludingNull
  (+1 when nulls exist), per-value counts sorted count-DESCENDING
  (Bag.createSorted) and getProbability = count / total non-null.

Spark shape: the whole per-column profile is ONE global aggregation
(partial map-side combine, a single 1-row result) — the reference's
one-pass instance walk distributed; the 1-row collect is
column-count-bounded, never data-sized. Value counts are one
groupBy(col) on the requested column only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------ pure twins


def numeric_stats(values: list) -> dict:
    """NumericValueStatistics twin over a raw value list (None =
    NullValue): mean/std/min/max of non-null values, sample std."""
    nulls = sum(1 for v in values if v is None)
    xs = [float(v) for v in values if v is not None]
    n = len(xs)
    out = {"num_nulls": nulls, "mean": None, "std_dev": None,
           "min": None, "max": None}
    if n:
        mean = sum(xs) / n
        out["mean"] = mean
        out["min"] = min(xs)
        out["max"] = max(xs)
        if n > 1:
            var = sum((x - mean) ** 2 for x in xs) / (n - 1)
            out["std_dev"] = math.sqrt(var)
        else:
            out["std_dev"] = 0.0
    return out


def nominal_stats(values: list) -> dict:
    """NominalValueStatistics twin: unique counts, count-descending
    value map, probabilities (count / non-null total)."""
    nulls = sum(1 for v in values if v is None)
    xs = [v for v in values if v is not None]
    counts: dict = {}
    for v in xs:
        counts[v] = counts.get(v, 0) + 1
    # Bag.createSorted(DESCENDING); ties keep a deterministic
    # value-ascending order (the reference's Bag leaves tie order to
    # the underlying map walk — the repo's determinism policy).
    ordered = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])))
    total = len(xs)
    return {
        "num_nulls": nulls,
        "num_unique": len(ordered),
        "num_unique_including_null": len(ordered) + (1 if nulls else 0),
        "counts": ordered,
        "probabilities": {k: v / total for k, v in ordered.items()},
    }


# ------------------------------------------------------------ Spark side

_STATS_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("num_nulls", T.LongType(), True),
    T.StructField("num_unique", T.LongType(), True),
    T.StructField("mean", T.DoubleType(), True),
    T.StructField("std_dev", T.DoubleType(), True),
    T.StructField("min", T.DoubleType(), True),
    T.StructField("max", T.DoubleType(), True),
])

_NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                  T.FloatType, T.DoubleType, T.DecimalType)


def classify_columns(df: DataFrame,
                     columns: list[str] | None = None
                     ) -> list[tuple[str, str]]:
    """createValueStatsBuilder dispatch (DatasetStatistics.java:57-65):
    numeric and nominal (string) columns get stats, everything else —
    timestamps, arrays, structs — is skipped like the reference's
    unsupported Value types."""
    out = []
    for field in df.schema.fields:
        if columns is not None and field.name not in columns:
            continue
        if isinstance(field.dataType, _NUMERIC_TYPES):
            out.append((field.name, "numeric"))
        elif isinstance(field.dataType, T.StringType):
            out.append((field.name, "nominal"))
    return out


def dataset_statistics(df: DataFrame,
                       columns: list[str] | None = None) -> DataFrame:
    """Per-column profile as ONE aggregation: numeric columns get
    (num_nulls, mean, sample std, min, max), nominal columns get
    (num_nulls, num_unique).  Result rows are column-count-bounded;
    the full table is scanned exactly once."""
    cols = classify_columns(df, columns)
    if not cols:
        return df.sparkSession.createDataFrame([], _STATS_SCHEMA)
    aggs = []
    for name, kind in cols:
        c = F.col(name)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0))
                    .alias(f"{name}__nulls"))
        if kind == "numeric":
            aggs += [F.avg(c).alias(f"{name}__mean"),
                     F.stddev_samp(c).alias(f"{name}__std"),
                     F.min(c).cast("double").alias(f"{name}__min"),
                     F.max(c).cast("double").alias(f"{name}__max"),
                     F.count(c).alias(f"{name}__n")]
        else:
            aggs.append(F.count_distinct(c).alias(f"{name}__uniq"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for name, kind in cols:
        if kind == "numeric":
            n = row[f"{name}__n"]
            # SlimStats single-value std is 0, empty stats stay null
            std = row[f"{name}__std"]
            if n == 1:
                std = 0.0
            out.append((name, kind, row[f"{name}__nulls"], None,
                        row[f"{name}__mean"], std,
                        row[f"{name}__min"], row[f"{name}__max"]))
        else:
            out.append((name, kind, row[f"{name}__nulls"],
                        row[f"{name}__uniq"], None, None, None, None))
    return df.sparkSession.createDataFrame(out, _STATS_SCHEMA)


def nominal_value_counts(df: DataFrame, column: str) -> DataFrame:
    """NominalValueStatistics.getMap + getProbability as one
    groupBy(column): (value, count, probability), count-descending
    with value-ascending tie order.  The window that turns counts
    into probabilities runs on the vocabulary-sized count table,
    never the raw rows."""
    counts = (df.where(F.col(column).isNotNull())
              .groupBy(F.col(column).alias("value"))
              .agg(F.count("*").alias("count")))
    return (counts
            .withColumn("probability",
                        F.col("count") / F.sum("count").over(
                            Window.partitionBy()))
            .orderBy(F.col("count").desc(), F.col("value")))
