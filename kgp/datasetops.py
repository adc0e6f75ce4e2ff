"""Dataset composition utilities — ports of the reference's dataset
combinators (core/dataset/) plus the delimited-line splitter they are
built on (helper/io/DelimitedStringHelper.java):

- split_delimited_line (DelimitedStringHelper.java:32-52 splitLine):
  quote-aware split; the quote char toggles an in-quotes flag, parts
  are trimmed of one surrounding quote pair (trimQuotes :74-88), two
  consecutive quotes optionally unescape to one, and an UNCLOSED
  quote makes the whole line malformed -> None (the reference returns
  null for line breaks inside quotes).
- join_datasets (DatasetJoiner.java:41-105 join): inner equi-join of
  two datasets on a join column; the merged instance carries BOTH
  feature vectors and the SECOND dataset's category (the first
  dataset's category is explicitly ignored, :27-29). Multi-matches
  multiply (d1 rows are collected per key into a MultiMap, every d2
  row emits one joined instance per d1 match).
- concat_datasets (ConcatenatedDataset.java:14-76): row-concatenation
  of N datasets; the feature space is the UNION of all feature
  informations (getFeatureInformation :66-74 merges the builders), so
  instances from a dataset lacking a feature read null for it.

Spark shape: join_datasets is ONE equi-join — Catalyst broadcasts the
small side automatically (AQE) and both inputs keep column pruning;
no per-row Python. concat_datasets is unionByName with
allowMissingColumns=True (missing features -> null, exactly the
reference's FeatureVector.get miss -> NullValue). The pure splitter
twin runs driver-side for header probing and inside Arrow batches for
quote-aware importers (kgp.protectedplanet) where Spark's own csv
reader cannot express the reference's exact quirks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ splitter


def split_delimited_line(line: str, split_char: str, quote_char: str,
                         unescape_double_quotes: bool = False
                         ) -> list[str] | None:
    """DelimitedStringHelper.splitLine twin (:32-52): quote-aware
    split; returns None for a line with an unclosed quote."""
    parts: list[str] = []
    in_quotes = False
    previous = 0
    for idx, c in enumerate(line):
        if c == split_char and not in_quotes:
            parts.append(_trim_quotes(line[previous:idx], quote_char,
                                      unescape_double_quotes))
            previous = idx + 1
        elif c == quote_char:
            in_quotes = not in_quotes
    if in_quotes:
        return None
    parts.append(_trim_quotes(line[previous:], quote_char,
                              unescape_double_quotes))
    return parts


def _trim_quotes(part: str, quote_char: str,
                 unescape_double_quotes: bool) -> str:
    """trimQuotes (:74-88): strip ONE surrounding quote pair (only
    when both ends carry the quote char and len >= 2), then optionally
    collapse doubled quotes."""
    if len(part) >= 2 and part[0] == quote_char and part[-1] == quote_char:
        part = part[1:-1]
    if unescape_double_quotes:
        part = part.replace(quote_char + quote_char, quote_char)
    return part


# ------------------------------------------------------------ combinators


def join_datasets(d1: DataFrame, d2: DataFrame, join_column: str,
                  class_col: str = "category") -> DataFrame:
    """DatasetJoiner.join (:41-105): inner join on ``join_column``;
    result carries d1's features, d2's features, and d2's category
    (d1's category is dropped, :27-29).  ONE Spark equi-join — the
    reference's driver-side MultiMap build is the hash side of the
    join, so multi-matches multiply identically."""
    left = d1
    if class_col in d1.columns:
        left = d1.drop(class_col)
    overlap = [c for c in left.columns
               if c != join_column and c in d2.columns]
    if overlap:
        raise ValueError(f"feature collision: {overlap}")
    return left.join(d2, on=join_column, how="inner")


def concat_datasets(*datasets: DataFrame) -> DataFrame:
    """ConcatenatedDataset (:14-76): rows of every dataset in order;
    feature space = union of all feature informations, so a feature
    absent from one input reads null for its rows (FeatureVector miss
    -> NullValue).  unionByName(allowMissingColumns=True) folds, no
    shuffle — the union is a narrow plan node."""
    if not datasets:
        raise ValueError("at least one dataset required")
    out = datasets[0]
    for d in datasets[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


# ------------------------------------------------------------ gate stage


def join_gate_stage(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Driver-gate shape for join_datasets: d1 = order features keyed
    by custkey (category ignored per the reference), d2 = customer
    features whose market segment is the surviving category.  Output
    one row per (order x customer) match with both feature sets."""
    d1 = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderstatus").alias("category"))
    d2 = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("category"))
    return join_datasets(d1, d2, "custkey")


def with_feature_as_category(df: DataFrame, feature: str,
                             class_col: str = "category") -> DataFrame:
    """DatasetWithFeatureAsCategory port (core/dataset/
    DatasetWithFeatureAsCategory.java:20-36): the named feature
    becomes the instance category and leaves the feature vector; a
    previous category column is replaced.  Pure projection."""
    out = df
    if class_col in df.columns and feature != class_col:
        out = out.drop(class_col)
    return out.withColumn(class_col,
                          F.col(feature).cast("string")).drop(feature)
