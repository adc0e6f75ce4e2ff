"""Schema-agnostic blocking + meta-blocking for entity resolution at
web scale — the SparkER / MinoanER recipe (SparkER: Scaling Entity
Resolution in Spark, EDBT 2019; Schema-Agnostic Progressive Entity
Resolution, ICDE 2018; both public), the candidate-generation stage
that feeds the repo's existing verify (kgp.strsim) and
connected-components canonicalization (kgp.canonicalize):

1. TOKEN BLOCKING: every lowercased token of an entity's name is a
   block key; oversized blocks (stop-word-like keys that would explode
   the pair count quadratically) are PURGED before any pairing — the
   block-size cap is the scale knob.
2. META-BLOCKING: the blocking graph's edges are scored instead of
   materializing all pairs per block:
   - CBS (common blocks scheme): weight = number of shared blocks;
   - JS (Jaccard scheme): shared / (|blocks(a)| + |blocks(b)| -
     shared);
   edge pruning by a global weight threshold (WEP) or per-node
   average (WNP — keep an edge iff its weight reaches the mean edge
   weight of EITHER endpoint).

Spark shape: blocking is one explode + one aggregation (block
purging); pair generation is a self-join ON THE BLOCK KEY ONLY
(quadratic only within a purged block, never across the corpus);
weights are one (a, b) hash aggregation; WNP adds one per-node
average aggregation joined back — no windows over raw pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_blocks(entities: DataFrame, name_col: str = "name",
                 id_col: str = "entity_id",
                 max_block_size: int | None = 1000) -> DataFrame:
    """(block, entity_id): lowercased whitespace tokens as block keys,
    distinct per entity; blocks larger than max_block_size purged
    (None disables purging)."""
    blocks = (entities
              .select(F.col(id_col).alias("entity_id"),
                      F.explode(F.split(F.lower(F.col(name_col)),
                                        r"\s+")).alias("block"))
              .where(F.col("block") != "")
              .distinct())
    if max_block_size is None:
        return blocks
    sizes = blocks.groupBy("block").agg(F.count("*").alias("_n")) \
        .where(F.col("_n") <= max_block_size).select("block")
    return blocks.join(sizes, "block")


def cbs_pairs(blocks: DataFrame) -> DataFrame:
    """(a, b, weight): common-blocks-scheme edge weights — one block
    self-join + one hash aggregation; a < b."""
    le, r = blocks.alias("l"), blocks.alias("r")
    return (le.join(r, (F.col("l.block") == F.col("r.block"))
                    & (F.col("l.entity_id") < F.col("r.entity_id")))
            .groupBy(F.col("l.entity_id").alias("a"),
                     F.col("r.entity_id").alias("b"))
            .agg(F.count("*").alias("weight")))


def js_pairs(blocks: DataFrame) -> DataFrame:
    """(a, b, weight): Jaccard-scheme weights — CBS plus each node's
    block count broadcast back in."""
    counts = blocks.groupBy("entity_id").agg(
        F.count("*").alias("nb"))
    cbs = cbs_pairs(blocks)
    return (cbs
            .join(counts.select(F.col("entity_id").alias("a"),
                                F.col("nb").alias("na")), "a")
            .join(counts.select(F.col("entity_id").alias("b"),
                                F.col("nb").alias("nbb")), "b")
            .select("a", "b",
                    (F.col("weight")
                     / (F.col("na") + F.col("nbb") - F.col("weight")))
                    .alias("weight")))


def prune_wep(pairs: DataFrame, threshold: float) -> DataFrame:
    """Weight-edge pruning: global threshold (weight >= t)."""
    return pairs.where(F.col("weight") >= threshold)


def prune_wnp(pairs: DataFrame) -> DataFrame:
    """Weighted-node pruning: keep an edge iff its weight reaches the
    MEAN edge weight of either endpoint — two node-average
    aggregations joined back (never a window over the raw pairs)."""
    ends = pairs.select(F.col("a").alias("node"), "weight") \
        .unionByName(pairs.select(F.col("b").alias("node"), "weight"))
    means = ends.groupBy("node").agg(F.avg("weight").alias("mean_w"))
    return (pairs
            .join(means.select(F.col("node").alias("a"),
                               F.col("mean_w").alias("ma")), "a")
            .join(means.select(F.col("node").alias("b"),
                               F.col("mean_w").alias("mb")), "b")
            .where((F.col("weight") >= F.col("ma"))
                   | (F.col("weight") >= F.col("mb")))
            .select("a", "b", "weight"))


def er_candidates(entities: DataFrame, name_col: str = "name",
                  id_col: str = "entity_id",
                  scheme: str = "CBS", threshold: float = 2.0,
                  max_block_size: int | None = 1000) -> DataFrame:
    """Blocking + meta-blocking end to end: (a, b, weight) candidate
    pairs ready for the similarity verify + connected components."""
    blocks = token_blocks(entities, name_col, id_col, max_block_size)
    pairs = cbs_pairs(blocks) if scheme == "CBS" else js_pairs(blocks)
    return prune_wep(pairs, threshold)


def arcs_pairs(blocks: DataFrame) -> DataFrame:
    """(a, b, weight): ARCS (aggregate reciprocal comparisons scheme)
    — each shared block contributes 1 / ||b|| where ||b|| is the
    block's comparison count n(n-1)/2, discounting stop-word-like
    blocks; one size aggregation + the block self-join."""
    sizes = blocks.groupBy("block").agg(F.count("*").alias("nb")) \
        .where(F.col("nb") > 1) \
        .withColumn("w", 2.0 / (F.col("nb") * (F.col("nb") - 1)))
    b = blocks.join(sizes, "block")
    le, r = b.alias("l"), b.alias("r")
    return (le.join(r, (F.col("l.block") == F.col("r.block"))
                    & (F.col("l.entity_id") < F.col("r.entity_id")))
            .groupBy(F.col("l.entity_id").alias("a"),
                     F.col("r.entity_id").alias("b"))
            .agg(F.sum(F.col("l.w")).alias("weight")))


def progressive_pairs(pairs: DataFrame) -> DataFrame:
    """Progressive ER (Schema-Agnostic Progressive Entity Resolution,
    ICDE 2018): emit candidates best-first so a budgeted verifier
    resolves the likeliest matches early — a weight-descending sort
    with deterministic (a, b) ties."""
    return pairs.orderBy(F.desc("weight"), "a", "b")
