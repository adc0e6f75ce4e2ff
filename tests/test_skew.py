from __future__ import annotations

from pyspark.sql import functions as F

from kgp.skew import hot_keys, salted_join, spread


def test_salted_join_equivalent_and_deterministic(spark):
    big = spark.createDataFrame(
        [(i, "hot" if i % 3 else "cold", f"v{i}") for i in range(60)],
        "rid long, k string, v string")
    small = spark.createDataFrame([("hot", 1), ("cold", 2)],
                                  "k string, dim int")
    plain = set(map(tuple, big.join(small, "k").collect()))
    salted = set(map(tuple, salted_join(big, small, "k").collect()))
    assert salted == plain
    # content-derived salt: identical across runs and repartitionings
    s1 = sorted(map(tuple,
                    salted_join(big, small, "k")
                    .withColumn("_s", F.lit(1)).collect()))
    s2 = sorted(map(tuple,
                    salted_join(big.repartition(7), small, "k")
                    .withColumn("_s", F.lit(1)).collect()))
    assert s1 == s2


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame(
        [(i, "hot", f"v{i}") for i in range(200)],
        "rid long, k string, v string")
    salts = (big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                        F.lit(8)).cast("int"))
        .select("_salt").distinct().count())
    assert salts >= 6  # 200 distinct rows land in nearly all 8 buckets


def test_hot_keys_and_spread(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 90 else "b") for i in range(100)],
        "rid long, host string")
    hot = hot_keys(df, "host", 50).collect()
    assert [r.host for r in hot] == ["a"]
    assert spread(df, ["rid"], 8).rdd.getNumPartitions() == 8
