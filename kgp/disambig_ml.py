"""Feature-based (ML) entity-linking disambiguation.

Spark-first re-expression of the reference's
FeatureBasedDisambiguation / FeatureBasedDisambiguationLearner /
ConfigurableFeatureExtractor
(/root/reference/palladian-core/src/main/java/ws/palladian/extraction/location/disambiguation/
FeatureBasedDisambiguation.java:31-101,
FeatureBasedDisambiguationLearner.java:43-140,
ConfigurableFeatureExtractor.java:70-190,
FeatureExtractorSetting.java:24-27 — DEFAULT: 50 km distance features,
100k population features):

  * the per-(mention, candidate) features are COLUMN EXPRESSIONS over
    the candidate join — document-local aggregates (name ambiguity,
    hierarchy overlap, locations-within-50km) become window functions
    over `url`, the same shape as the vectorized heuristic path in
    kgp.linker; no Python in feature extraction;
  * the QuickDt random forest becomes pyspark.ml
    RandomForestClassifier (distributed training, broadcastable
    model);
  * disambiguation = model.transform over the candidate rows, argmax
    P(true) per mention with the reference's 0.15 probability
    threshold (FeatureBasedDisambiguation.PROBABILITY_THRESHOLD).

The learner's gold supervision (TUD-Loc-2013 in the reference) is any
(url, start, end, entity_id) table — in tests, the heuristic
disambiguator's output on the synthetic corpus acts as the teacher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgp.linker import LINK_COLUMNS, expand_gazetteer, normalize_name

PROBABILITY_THRESHOLD = 0.15   # FeatureBasedDisambiguation.java:36
DISTANCE_KM = 50               # FeatureExtractorSetting.DEFAULT
POPULATION_VALUE = 100_000

_TYPE_CODES = ["CITY", "COUNTRY", "UNIT", "CONTINENT", "REGION", "POI",
               "LANDMARK", "UNDETERMINED"]

FEATURE_COLS = [
    "f_num_chars", "f_num_tokens", "f_acronym", "f_population",
    "f_log_population", "f_hierarchy_depth", "f_name_ambiguity",
    "f_name_diversity", "f_primary_name", "f_type_code",
    "f_has_ancestor_in_doc", "f_has_descendant_in_doc",
    "f_num_loc_in_50", "f_big_pop_in_doc", "f_mention_score",
]


def _haversine_expr(lat1, lon1, lat2, lon2):
    """Great-circle distance (km) as pure column arithmetic."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (F.sin(dlat) ** 2
         + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) ** 2)
    return F.lit(2 * 6371.0) * F.asin(F.sqrt(a))


def candidate_rows(mentions: DataFrame, gaz: DataFrame) -> DataFrame:
    """mentions ⋈ broadcast(expanded gazetteer + coordinates + name
    diversity) — the shared candidate-generation step (the reference's
    fetchLocations, PalladianLocationExtractor.java:85-103)."""
    expanded = expand_gazetteer(gaz)
    n_forms = (expanded.groupBy("entity_id")
               .agg(F.countDistinct("surface_form").alias("n_forms")))
    geo = gaz.select(F.col("id").alias("entity_id"), "lat", "lon")
    side = (expanded.select("norm", "entity_id", "canon_name", "etype",
                            "population", "ancestor_ids")
            .join(F.broadcast(n_forms), "entity_id")
            .join(F.broadcast(geo), "entity_id"))
    return (mentions
            .withColumn("norm", normalize_name(F.col("surface")))
            .join(F.broadcast(side), "norm", "left"))


def candidate_features(cand: DataFrame) -> DataFrame:
    """Add the FEATURE_COLS to candidate rows — every feature a column
    expression (ConfigurableFeatureExtractor.java:99-190 subset; index
    searchers and scope detectors are out of scope per SURVEY §2.7).

    Document-local context features use ONE window over url (the only
    shuffle), mirroring the reference's per-document LocationSet
    queries: ancestor/descendant containment, candidates within 50 km,
    and a 100k-population presence flag."""
    mention_w = Window.partitionBy("url", "sent_idx", "start", "end")
    doc_w = Window.partitionBy("url")

    linked = F.col("entity_id").isNotNull()
    cand = (cand
            .withColumn("f_num_chars", F.length("surface"))
            .withColumn("f_num_tokens", F.size(F.split("surface", " ")))
            .withColumn("f_acronym",
                        F.col("surface").rlike(r"^([A-Z]+|([A-Z]\.)+)$")
                        .cast("int"))
            .withColumn("f_population",
                        F.coalesce("population", F.lit(0)).cast("double"))
            .withColumn("f_log_population", F.log1p("f_population"))
            .withColumn("f_hierarchy_depth",
                        F.when(linked, F.size("ancestor_ids"))
                        .otherwise(0))
            .withColumn("f_name_ambiguity",
                        F.lit(1.0) / F.greatest(
                            F.count(F.col("entity_id")).over(mention_w),
                            F.lit(1)))
            .withColumn("f_name_diversity",
                        F.lit(1.0) / F.greatest(
                            F.coalesce("n_forms", F.lit(1)), F.lit(1)))
            .withColumn("f_primary_name",
                        (F.lower("surface") == F.lower("canon_name"))
                        .cast("int"))
            .withColumn("f_type_code", F.coalesce(
                *[F.when(F.col("etype") == t, F.lit(i))
                  for i, t in enumerate(_TYPE_CODES)], F.lit(-1))
                .cast("double"))
            .withColumn("f_mention_score",
                        F.coalesce("score", F.lit(0.0))))

    # document-local context (the reference's LocationSet over all
    # candidates of the document)
    doc_ids = F.collect_set(F.when(linked, F.col("entity_id"))) \
        .over(doc_w)
    doc_anc = F.array_distinct(F.flatten(
        F.collect_list(F.when(linked, F.col("ancestor_ids")))
        .over(doc_w)))
    doc_geo = F.collect_list(
        F.when(linked & F.col("lat").isNotNull(),
               F.struct(F.col("lat").alias("la"),
                        F.col("lon").alias("lo"),
                        F.col("entity_id").alias("eid"),
                        F.col("population").alias("pop")))).over(doc_w)
    cand = (cand
            .withColumn("_doc_ids", doc_ids)
            .withColumn("_doc_anc", doc_anc)
            .withColumn("_doc_geo", doc_geo))
    cand = (cand
            .withColumn("f_has_ancestor_in_doc",
                        F.arrays_overlap(
                            F.coalesce("ancestor_ids",
                                       F.array().cast("array<long>")),
                            F.coalesce("_doc_ids",
                                       F.array().cast("array<long>")))
                        .cast("int"))
            .withColumn("f_has_descendant_in_doc",
                        (linked & F.array_contains(
                            F.coalesce("_doc_anc",
                                       F.array().cast("array<long>")),
                            F.coalesce(F.col("entity_id"), F.lit(-1))))
                        .cast("int"))
            .withColumn(
                "f_num_loc_in_50",
                F.when(~linked | F.col("lat").isNull(), F.lit(0.0))
                .otherwise(F.aggregate(
                    "_doc_geo", F.lit(0.0),
                    lambda acc, x: acc + F.when(
                        (x["eid"] != F.col("entity_id"))
                        & (_haversine_expr(x["la"], x["lo"],
                                           F.col("lat"), F.col("lon"))
                           < DISTANCE_KM), F.lit(1.0)).otherwise(0.0))))
            .withColumn(
                "f_big_pop_in_doc",
                F.aggregate(
                    "_doc_geo", F.lit(0),
                    lambda acc, x: F.greatest(acc, F.when(
                        x["pop"] >= POPULATION_VALUE, F.lit(1))
                        .otherwise(0))).cast("int"))
            .drop("_doc_ids", "_doc_anc", "_doc_geo"))
    for c in FEATURE_COLS:
        cand = cand.withColumn(c, F.coalesce(F.col(c).cast("double"),
                                             F.lit(0.0)))
    return cand


def train_disambiguator(mentions: DataFrame, gaz: DataFrame,
                        gold: DataFrame, num_trees: int = 50,
                        seed: int = 42):
    """FeatureBasedDisambiguationLearner port: every candidate becomes
    a training instance, positive iff it is the gold entity for its
    mention (the reference uses a 50 km coordinate match against gold
    annotations, FeatureBasedDisambiguationLearner.java:49,130-140; our
    gold carries entity ids directly). Returns a fitted pyspark.ml
    RandomForest pipeline model."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    cand = candidate_features(candidate_rows(mentions, gaz)) \
        .where(F.col("entity_id").isNotNull())
    g = gold.select("url", "start", "end",
                    F.col("entity_id").alias("gold_id"))
    labeled = (cand.join(g, ["url", "start", "end"], "inner")
               .withColumn("label",
                           (F.col("entity_id") == F.col("gold_id"))
                           .cast("double")))
    assembler = VectorAssembler(inputCols=FEATURE_COLS,
                                outputCol="features")
    rf = RandomForestClassifier(numTrees=num_trees, seed=seed,
                                labelCol="label", featuresCol="features")
    return Pipeline(stages=[assembler, rf]).fit(labeled)


def link_mentions_ml(mentions: DataFrame, gaz: DataFrame, model,
                     threshold: float = PROBABILITY_THRESHOLD
                     ) -> DataFrame:
    """FeatureBasedDisambiguation.disambiguate port: score every
    candidate with the forest, keep the argmax P(true) per mention if
    it clears the probability threshold (:79-99); mentions whose best
    candidate misses the threshold (or that have no candidate) come
    out unlinked, mirroring the heuristic paths' NIL behavior. Output
    columns = LINK_COLUMNS."""
    from pyspark.ml.functions import vector_to_array

    cand = candidate_features(candidate_rows(mentions, gaz))
    scored = (model.transform(cand)
              .withColumn("p_true",
                          vector_to_array("probability").getItem(1)))
    mention_key = ["url", "sent_idx", "start", "end"]
    pick_w = Window.partitionBy(*mention_key).orderBy(
        F.desc("p_true"), F.asc("entity_id"))
    out = (scored
           .withColumn("_rn", F.row_number().over(pick_w))
           .where(F.col("_rn") == 1)
           .withColumn("_keep",
                       F.col("entity_id").isNotNull()
                       & (F.col("p_true") >= threshold)))
    return out.select(
        "url", "sent_idx", "start", "end", "surface", "tag",
        "sent_start", "sent_text",
        F.when(F.col("_keep"), F.col("entity_id")).alias("entity_id"),
        F.when(F.col("_keep"), F.col("canon_name"))
        .otherwise(F.col("surface")).alias("canon_name"),
        F.when(F.col("_keep"), F.round("p_true", 6))
        .otherwise(F.lit(0.0)).alias("link_score"),
    )


__all__ = ["PROBABILITY_THRESHOLD", "FEATURE_COLS", "candidate_rows",
           "candidate_features", "train_disambiguator",
           "link_mentions_ml", "LINK_COLUMNS"]
