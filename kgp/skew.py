"""Skew & partitioning helpers.

The synthetic corpus (like Common Crawl) is host-skewed: ~40% of pages
share one hostname, and crawl output files cluster by host. Left alone,
a parquet scan hands whole hot-host files to single tasks and the
extract stage straggles. Remedies here:

  * `spread(df, cols, n)` — explicit hash repartition to break input
    clustering before the expensive UDF stages (url is unique → perfect
    balance);
  * `salted_join(big, small, key, buckets)` — classic key-salting for
    shuffle joins on skewed keys (head entities): the big side gets a
    deterministic salt from xxhash64 of the whole row key-space, the
    small side is exploded `buckets` ways. Used when a dimension no
    longer fits broadcast; with AQE skew-join enabled
    (kgp.session) Spark splits skewed partitions at runtime anyway, so
    this is the belt to AQE's suspenders;
  * `hot_keys(df, col, min_count)` — cheap reconnaissance aggregation
    (count per key above threshold) to drive salting decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_of(url_col) -> F.Column:
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)/?", 1)


def hot_keys(df: DataFrame, col: str, min_count: int) -> DataFrame:
    """Keys whose row count exceeds min_count (skew reconnaissance)."""
    return (df.groupBy(col).count()
              .where(F.col("count") >= min_count)
              .orderBy(F.desc("count")))


def spread(df: DataFrame, cols: list[str], num_partitions: int) -> DataFrame:
    """Hash-repartition on cols to break storage-order clustering before
    a per-row-expensive stage. With a unique key (url) this yields
    near-perfectly balanced tasks regardless of how skewed the hosts
    are on disk."""
    return df.repartition(num_partitions,
                          F.xxhash64(*[F.col(c) for c in cols]))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                buckets: int = 8, how: str = "inner",
                salt_cols: list[str] | None = None) -> DataFrame:
    """Shuffle join with salting: big.key is augmented with a salt in
    [0, buckets); small is replicated once per salt value. Equivalent
    rows, buckets× smaller reduce partitions for hot keys.

    The salt is derived from ROW CONTENT — xxhash64 over salt_cols
    (default: every column of `big`) — so it is stable across runs,
    task retries, and partition-layout changes; rows of a hot key
    spread across buckets because their non-key columns differ. If a
    hot key's rows are fully identical across all columns they hash to
    one bucket — callers with such data should pass a discriminating
    salt_cols (e.g. a unique id)."""
    cols = salt_cols if salt_cols is not None else big.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]),
                  F.lit(buckets)).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")
