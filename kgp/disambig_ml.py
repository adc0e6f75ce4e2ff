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


# ------------------------------------------------ quickdt forest path
#
# The reference's FeatureBasedDisambiguation actually ships a QuickDt
# random forest (FeatureBasedDisambiguation.java:31 `QuickDtModel`,
# FeatureBasedDisambiguationLearner.java:58 `QuickDtLearner.randomForest`)
# — the kgp.dtree port is therefore the faithful model family; the
# pyspark.ml path above stays as the distributed-training variant.
# tree_column compiles the forest into nested CASE WHEN columns, so
# scoring 10^12 candidate rows is whole-stage-codegen JVM work, and
# tree_sql renders the SAME forest for the DuckDB gate oracle.

# f_log_population is excluded from SPLIT features: ln() may differ by
# an ULP across engines, which could flip a `> threshold` comparison;
# f_population carries the same signal with exact integer arithmetic.
FOREST_SPLIT_FEATURES = [c for c in FEATURE_COLS
                         if c != "f_log_population"]


def synth_disambig_training(n: int = 800) -> list[tuple[dict, str]]:
    """Deterministic labeled candidate vectors spanning the value
    ranges candidate_features emits (closed-form, no RNG — the gate
    oracle regenerates the identical forest). The label rule rewards
    what HeuristicDisambiguation rewards: population, hierarchy
    agreement with the document, primary names, low ambiguity."""
    rows: list[tuple[dict, str]] = []
    pops = [-1.0, 0.0, 900.0, 30000.0, 50000.0, 70000.0, 120000.0,
            2000000.0]
    for i in range(n):
        pop = pops[i % 8]
        ambiguity = (1.0, 0.5, 1.0 / 3.0)[i % 3]
        diversity = (1.0, 0.5)[i % 2]
        primary = float(i % 4 != 0)
        type_code = (-1.0, 0.0, 1.0, 5.0)[i % 4]
        anc_in_doc = float(i % 5 < 2)
        desc_in_doc = float(i % 7 == 0)
        n50 = float((0, 0, 0, 1, 2)[i % 5])
        bigpop = float(i % 3 != 1)
        acr = float(i % 10 == 0)
        mscore = (0.3, 0.4, 0.5, 0.6, 0.7, 0.9)[i % 6]
        feats = {
            "f_num_chars": float(4 + (i * 3) % 12),
            "f_num_tokens": float(1 + i % 2),
            "f_acronym": acr,
            "f_population": pop,
            "f_hierarchy_depth": float(i % 3),
            "f_name_ambiguity": ambiguity,
            "f_name_diversity": diversity,
            "f_primary_name": primary,
            "f_type_code": type_code,
            "f_has_ancestor_in_doc": anc_in_doc,
            "f_has_descendant_in_doc": desc_in_doc,
            "f_num_loc_in_50": n50,
            "f_big_pop_in_doc": bigpop,
            "f_mention_score": mscore,
        }
        score = (2.0 * (pop >= 100000) + 1.5 * anc_in_doc + primary
                 + ambiguity + 0.5 * mscore + 0.3 * (n50 > 0)
                 - 0.5 * acr + 0.2 * desc_in_doc)
        rows.append((feats, "pos" if score > 2.4 else "neg"))
    return rows


_GATE_FOREST = None


def gate_disambig_forest():
    """Fixed gate forest (quickdt port, deterministic training set;
    cached per process)."""
    global _GATE_FOREST
    if _GATE_FOREST is None:
        from kgp.dtree import train_forest
        _GATE_FOREST = train_forest(synth_disambig_training(),
                                    num_trees=10, seed=29)
    return _GATE_FOREST


def gate_gazetteer_rows() -> list[dict]:
    """The corpus gazetteer plus rows that exercise the geo features:
    a POI within 50 km of a city (f_num_loc_in_50 > 0), a second
    big-population Rivertown (real cross-doc ambiguity), and an
    acronym org surface (f_acronym). Coordinates are chosen so no
    candidate pair sits near the 50 km haversine boundary (cross-
    engine trig is ULP-identical only away from thresholds)."""
    from kgp.constants import CITY_ID, COUNTRY_ID
    from kgp.corpus import gazetteer_rows
    rows = list(gazetteer_rows())
    rows.append(dict(id=5000, name="Rivertown Port", alt_names=[],
                     type="POI", population=50,
                     ancestor_ids=[CITY_ID + 1], lat=11.1, lon=-3.0))
    rows.append(dict(id=5001, name="ACME", alt_names=["Acme Corp"],
                     type="ORG", population=None, ancestor_ids=[],
                     lat=None, lon=None))
    rows.append(dict(id=5002, name="Rivertown", alt_names=[],
                     type="CITY", population=120_000,
                     ancestor_ids=[COUNTRY_ID + 1], lat=45.0, lon=20.0))
    return rows


def train_disambiguator_forest(mentions: DataFrame, gaz: DataFrame,
                               gold: DataFrame, num_trees: int = 10,
                               seed: int = 29):
    """FeatureBasedDisambiguationLearner with the quickdt family:
    label every candidate against gold, bounded-collect the instances
    (the reference API is an in-memory instance list) and train the
    forest driver-side. Splits exclude f_log_population (exact-
    arithmetic twin f_population carries the signal)."""
    from kgp.dtree import collect_instances, train_forest
    cand = candidate_features(candidate_rows(mentions, gaz)) \
        .where(F.col("entity_id").isNotNull())
    g = gold.select("url", "start", "end",
                    F.col("entity_id").alias("gold_id"))
    labeled = (cand.join(g, ["url", "start", "end"], "inner")
               .withColumn("_lbl",
                           F.when(F.col("entity_id") == F.col("gold_id"),
                                  "pos").otherwise("neg")))
    inst = collect_instances(labeled, "_lbl", FOREST_SPLIT_FEATURES)
    return train_forest(inst, num_trees=num_trees, seed=seed)


def link_mentions_forest(mentions: DataFrame, gaz: DataFrame,
                         forest=None,
                         threshold: float = PROBABILITY_THRESHOLD
                         ) -> DataFrame:
    """FeatureBasedDisambiguation.disambiguate with the compiled
    forest: p_true = P(pos) as one nested CASE WHEN column, argmax
    per mention, NIL below the probability threshold (:79-99).
    mentions: (url, sent_idx, start, end, surface, tag, score)."""
    from kgp.dtree import tree_column
    forest = forest or gate_disambig_forest()
    cand = candidate_features(candidate_rows(mentions, gaz))
    scored = cand.withColumn(
        "p_true", F.round(tree_column(forest, "pos"), 9) + F.lit(0.0))
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
        F.when(F.col("_keep"), F.col("entity_id")).alias("entity_id"),
        F.when(F.col("_keep"), F.col("canon_name"))
        .otherwise(F.col("surface")).alias("canon_name"),
        F.when(F.col("_keep"), F.col("p_true"))
        .otherwise(F.lit(0.0)).alias("link_score"),
    )


__all__ = ["PROBABILITY_THRESHOLD", "FEATURE_COLS",
           "FOREST_SPLIT_FEATURES", "candidate_rows",
           "candidate_features", "train_disambiguator",
           "link_mentions_ml", "LINK_COLUMNS",
           "synth_disambig_training", "gate_disambig_forest",
           "gate_gazetteer_rows", "train_disambiguator_forest",
           "link_mentions_forest"]
