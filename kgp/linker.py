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
    :47-59) as a per-document `applyInPandas` — document-local logic,
    one shuffle on url, AQE-coalesced;
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
from pyspark.sql import Column, DataFrame
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
        names.join(counts, "norm")
        .withColumn("ambiguous", F.col("n_ids") > 1)
        .withColumn("n_tokens", F.size(F.split(F.col("surface_form"), " ")))
        .drop("n_ids")
    )


LINK_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("surface", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("sent_start", T.IntegerType()),
    T.StructField("sent_text", T.StringType()),
    T.StructField("entity_id", T.LongType()),
    T.StructField("canon_name", T.StringType()),
    T.StructField("link_score", T.DoubleType()),
])


def _disambiguate_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """HeuristicDisambiguation.disambiguate port over ONE document's
    candidate rows (multiple gazetteer candidates per mention).

    Anchors (HeuristicDisambiguation.java:156-214): candidates with
    population ≥ 1M, or unambiguous multi-token surfaces. A candidate
    scores up when its type matches the NER tag, when it is
    hierarchy-related to an anchor (ancestor/descendant), and by
    population; ties break to the smaller id (deterministic).
    """
    anchors: list[tuple[int, frozenset]] = []
    for row in pdf.itertuples():
        if row.entity_id is None or pd.isna(row.entity_id):
            continue
        pop = row.population if row.population is not None else -1
        multi_unamb = (not row.ambiguous) and row.n_tokens >= TOKEN_THRESHOLD
        if pop >= ANCHOR_POPULATION_THRESHOLD or multi_unamb:
            anc = frozenset(row.ancestor_ids if row.ancestor_ids
                            is not None else [])
            anchors.append((int(row.entity_id), anc))
    anchor_ids = {a for a, _ in anchors}
    anchor_ancestors = set().union(*(anc for _, anc in anchors)) \
        if anchors else set()

    out = []
    for (_, _, _), grp in pdf.groupby(["sent_idx", "start", "end"],
                                      sort=False):
        first = grp.iloc[0]
        base = {
            "url": first["url"], "sent_idx": int(first["sent_idx"]),
            "start": int(first["start"]), "end": int(first["end"]),
            "surface": first["surface"], "tag": first["tag"],
            "sent_start": int(first["sent_start"]),
            "sent_text": first["sent_text"],
        }
        cands = grp[grp["entity_id"].notna()]
        if len(cands) == 0:  # NIL mention: keep, unlinked
            out.append({**base, "entity_id": None,
                        "canon_name": first["surface"], "link_score": 0.0})
            continue
        best, best_key = None, None
        for row in cands.itertuples():
            eid = int(row.entity_id)
            pop = int(row.population) if row.population is not None else -1
            anc = set(row.ancestor_ids if row.ancestor_ids
                      is not None else [])
            score = 0.0
            if row.etype == row.tag:
                score += 2.0
            if anc & anchor_ids or eid in anchor_ancestors:
                score += 1.0  # hierarchy-related to an anchor
            if pop >= LOWER_POPULATION_THRESHOLD:
                score += 0.5
            key = (score, pop, -eid)
            if best_key is None or key > best_key:
                best, best_key = row, key
        n = len(cands)
        out.append({**base, "entity_id": int(best.entity_id),
                    "canon_name": best.canon_name,
                    "link_score": 1.0 if n == 1 else float(best_key[0]) /
                    (best_key[0] + 1.0)})
    return pd.DataFrame(out, columns=[f.name for f in LINK_SCHEMA.fields])


def link_mentions(mentions: DataFrame, gaz: DataFrame) -> DataFrame:
    """mentions ⋈ broadcast(expanded gazetteer) → per-doc disambiguation.

    mentions must carry (url, sent_idx, start, end, surface, tag,
    sent_text). Output = LINK_SCHEMA.
    """
    expanded = expand_gazetteer(gaz)
    cand = mentions.withColumn("norm", normalize_name(F.col("surface"))).join(
        F.broadcast(expanded.select(
            "norm", "entity_id", "canon_name", "etype", "population",
            "ancestor_ids", "n_tokens", "ambiguous")),
        "norm", "left")
    return cand.groupBy("url").applyInPandas(
        lambda pdf: _disambiguate_doc(pdf), LINK_SCHEMA)


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
