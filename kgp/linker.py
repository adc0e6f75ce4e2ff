"""Stage 3 — entity linking & disambiguation.

Spark-first re-expression of the reference's location/linking stack
(/root/reference/palladian-core/src/main/java/ws/palladian/extraction/location/PalladianLocationExtractor.java:59-103):

  * the reference batches ONE gazetteer lookup per document
    (`fetchLocations`, :85-103, via `LocationSource.getLocations`,
    LocationSource.java:51-70) — here that becomes a single
    **broadcast hash join** of the whole mentions table against the
    exploded gazetteer (primary + alternative names), strictly better
    than per-document round trips;
  * name normalization mirrors `LocationExtractorUtils.normalizeName`
    (LocationExtractorUtils.java:24-32): strip trademark glyphs,
    collapse whitespace — expressed as Spark column functions so the
    join key stays JVM-side (whole-stage codegen, no Python);
  * disambiguation ports the anchor/population heuristics of
    `HeuristicDisambiguation.disambiguate`
    (disambiguation/HeuristicDisambiguation.java:114-386, constants
    :47-59) — VECTORIZED into windows + array columns (see
    link_mentions), zero Python;
  * the fuzzy candidate path for web-scale dirty surfaces is
    MinHash/LSH over character 3-gram sets (the reference's analog is
    its `CharacterNGramSimilarity`/`JaccardSimilarity` metrics,
    palladian-commons/.../nlp/CharacterNGramSimilarity.java) — built on
    `pyspark.ml.feature.{HashingTF,MinHashLSH}` so candidate generation
    is a similarity self-join Spark already knows how to distribute.

Scale notes (100 TB / 10^12 docs):
  * gazetteer is the SMALL side (≤ tens of millions of names) →
    broadcast; if it outgrows broadcast, the same code degrades to a
    shuffle hash join on `norm` — AQE picks it when the hint no longer
    fits, nothing else changes;
  * head entities ("Freedonia" in 30% of pages) skew the join OUTPUT,
    not the join itself (broadcast = map-side); the one shuffle here is
    groupBy(url), and urls are unique keys → no key skew, only batch
    size variance, which AQE coalescing evens out.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# HeuristicDisambiguation constants (HeuristicDisambiguation.java:47-59)
ANCHOR_POPULATION_THRESHOLD = 1_000_000
LOWER_POPULATION_THRESHOLD = 5_000
TOKEN_THRESHOLD = 2


def normalize_name(col: Column) -> Column:
    """LocationExtractorUtils.normalizeName port as column expressions
    (strip ©®™, collapse space runs, strip trailing abbreviation dots,
    trim, case-fold for the join key)."""
    c = F.regexp_replace(col, "[©®™]", "")
    c = F.regexp_replace(c, " {2,}", " ")
    c = F.regexp_replace(c, r"\.+$", "")
    return F.lower(F.trim(c))


def expand_gazetteer(gaz: DataFrame) -> DataFrame:
    """gazetteer → one row per (entity, surface): primary + alt names.

    Output: (entity_id, canon_name, norm, type, population, ancestor_ids,
    n_tokens, ambiguous). `ambiguous` marks surfaces claimed by >1 entity
    — precomputed on the SMALL side so the big mentions table never needs
    a global surface-count aggregation.
    """
    names = gaz.select(
        F.col("id").alias("entity_id"),
        F.col("name").alias("canon_name"),
        F.explode(
            F.array_union(F.array(F.col("name")),
                          F.coalesce(F.col("alt_names"),
                                     F.array().cast("array<string>")))
        ).alias("surface_form"),
        F.col("type").alias("etype"),
        F.coalesce(F.col("population"), F.lit(-1)).alias("population"),
        F.coalesce(F.col("ancestor_ids"),
                   F.array().cast("array<long>")).alias("ancestor_ids"),
    ).withColumn("norm", normalize_name(F.col("surface_form")))
    counts = names.groupBy("norm").agg(
        F.countDistinct("entity_id").alias("n_ids"))
    return (
        names.join(F.broadcast(counts), "norm")
        .withColumn("ambiguous", F.col("n_ids") > 1)
        .withColumn("n_tokens", F.size(F.split(F.col("surface_form"), " ")))
        .drop("n_ids")
    )


LINK_COLUMNS = ["url", "sent_idx", "start", "end", "surface", "tag",
                "sent_start", "sent_text", "entity_id", "canon_name",
                "link_score"]


def link_mentions(mentions: DataFrame, gaz: DataFrame,
                  num_buckets: int | None = None) -> DataFrame:
    """mentions ⋈ broadcast(expanded gazetteer) → disambiguated links.

    mentions must carry (url, sent_idx, start, end, surface, tag,
    sent_start, sent_text). Output columns = LINK_COLUMNS.

    The disambiguation is the anchor/population heuristic of
    HeuristicDisambiguation.disambiguate (HeuristicDisambiguation.java:
    114-386) VECTORIZED into relational operators — zero Python in this
    stage, everything whole-stage-codegen:

      1. candidate generation: broadcast hash join on normalized
         surface (map-side, no shuffle);
      2. per-document anchors (population ≥ 1M, or unambiguous
         multi-token surfaces): windowed collect_set over url — the
         document-local state the reference keeps in Java lists becomes
         two array columns;
      3. candidate scoring: type-match + anchor-hierarchy + population
         columns; winner per mention via row_number() over
         (url, sent_idx, start, end) ordered by (score, population,
         -entity_id).

    Cost at scale: one shuffle on url (the window); candidate fan-out
    is bounded by gazetteer ambiguity (head entities inflate rows, but
    AQE splits oversized partitions; url keys are unique so the window
    partitioning itself cannot skew).
    """
    expanded = expand_gazetteer(gaz)
    cand = mentions.withColumn("norm", normalize_name(F.col("surface"))).join(
        F.broadcast(expanded.select(
            "norm", "entity_id", "canon_name", "etype", "population",
            "ancestor_ids", "n_tokens", "ambiguous")),
        "norm", "left")

    anchor_cond = (F.col("entity_id").isNotNull() &
                   ((F.col("population") >= ANCHOR_POPULATION_THRESHOLD) |
                    ((~F.col("ambiguous")) &
                     (F.col("n_tokens") >= TOKEN_THRESHOLD))))
    doc_w = Window.partitionBy("url")
    cand = (cand
            .withColumn("_anchor_ids", F.collect_set(
                F.when(anchor_cond, F.col("entity_id"))).over(doc_w))
            .withColumn("_anchor_anc", F.array_distinct(F.flatten(
                F.collect_list(F.when(anchor_cond, F.col("ancestor_ids")))
                .over(doc_w)))))

    hierarchy = (F.arrays_overlap(
        F.coalesce(F.col("ancestor_ids"),
                   F.array().cast("array<long>")), F.col("_anchor_ids"))
        | F.array_contains(F.col("_anchor_anc"), F.col("entity_id")))
    score = (
        F.when(F.col("etype") == F.col("tag"), F.lit(2.0)).otherwise(0.0)
        + F.when(hierarchy, F.lit(1.0)).otherwise(0.0)
        + F.when(F.col("population") >= LOWER_POPULATION_THRESHOLD,
                 F.lit(0.5)).otherwise(0.0))
    cand = cand.withColumn("_score", score)

    mention_key = ["url", "sent_idx", "start", "end"]
    pick_w = Window.partitionBy(*mention_key).orderBy(
        F.desc("_score"), F.desc("population"), F.asc("entity_id"))
    cnt_w = Window.partitionBy(*mention_key)
    out = (cand
           .withColumn("_rn", F.row_number().over(pick_w))
           .withColumn("_n_cand", F.count("entity_id").over(cnt_w))
           .where(F.col("_rn") == 1))
    return out.select(
        "url", "sent_idx", "start", "end", "surface", "tag",
        "sent_start", "sent_text",
        "entity_id",
        F.coalesce("canon_name", "surface").alias("canon_name"),
        F.when(F.col("entity_id").isNull(), F.lit(0.0))
         .when(F.col("_n_cand") == 1, F.lit(1.0))
         .otherwise(F.col("_score") / (F.col("_score") + F.lit(1.0)))
         .alias("link_score"),
    )


# ------------------------------------------------- LSH candidate index


def lsh_candidates(surfaces: DataFrame, gaz: DataFrame,
                   jaccard_max_dist: float = 0.5,
                   num_hash_tables: int = 5) -> DataFrame:
    """Fuzzy (surface → entity) candidates via MinHash over char-3-gram
    sets — the web-scale path for dirty surfaces the exact join misses.

    surfaces: DataFrame with a `surface` column (pre-distinct'd: run this
    on `mentions.select("surface").distinct()`, which is tiny relative to
    the corpus — candidate generation cost scales with VOCABULARY, not
    corpus size).
    Returns (surface, entity_id, canon_name, jaccard_dist).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def grams3(s: pd.Series) -> pd.Series:
        def g(x):
            x = (x or "").lower()
            x = "##" + x + "##"
            return list({x[i:i + 3] for i in range(len(x) - 2)}) or ["###"]
        return s.map(g)

    left = surfaces.select("surface").distinct() \
        .withColumn("grams", grams3("surface"))
    right = expand_gazetteer(gaz).select(
        "entity_id", "canon_name", "surface_form") \
        .withColumn("grams", grams3("surface_form"))

    tf = HashingTF(inputCol="grams", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    lf, rf = tf.transform(left), tf.transform(right)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(rf)
    pairs = model.approxSimilarityJoin(lf, rf, jaccard_max_dist,
                                       distCol="jaccard_dist")
    return pairs.select(
        F.col("datasetA.surface").alias("surface"),
        F.col("datasetB.entity_id").alias("entity_id"),
        F.col("datasetB.canon_name").alias("canon_name"),
        F.col("jaccard_dist"),
    )
