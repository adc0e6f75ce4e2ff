"""Feature selection — distributed ports of the reference's feature
rankers (palladian-core classification/featureselection/):

  * ChiSquaredFeatureRanker.calculateChiSquareValues
    (ChiSquaredFeatureRanker.java:63-117): for every
    (feature###value, category) cell, chi² over the 2x2 contingency
    N11/N10/N01/N00 (Manning IR-book p. 275), then the
    AverageMergingStrategy (AverageMergingStrategy.java:21-29):
    average the cell scores across categories per feature VALUE, and
    SUM those averages per base feature. RoundRobinMergingStrategy
    (RoundRobinMergingStrategy.java:23-60) is ported too — although
    its merge loop walks a HashMap entrySet, the SCORES are
    deterministic: each per-category ranking sorts by
    RankedFeature.compareTo (score desc, name asc, :35-41) and a
    feature's score depends only on the smallest list position of any
    of its cells, not on category iteration order.
  * InformationGainFeatureRanker (InformationGainFeatureRanker.java:
    63-131, Yang & Pedersen 1997): G(t) = H(C) + H(F) - H(C,F) with
    log2 entropies (AbstractCategoryEntries.java:102-110) — the
    jointOccurrences/featureOccurrences decomposition the reference
    uses, verbatim.

Features are nominal string columns (the reference discretizes
numerics first via Fayyad/Irani MDL binning; callers bin upstream —
e.g. a width or quantile bucket column — which keeps the ranker itself
a pure aggregation). Nulls group as the literal 'null', matching
Value.toString() on a null value.

Scale shape: ONE explode of (instance, feature, value, category) rows
feeds every count — groupBy with map-side combine on feature-value
cardinality keys; the per-cell chi²/entropy math is a join over the
tiny aggregate tables. Nothing is per-row Python.

Cross-engine float identity: entropy and chi² terms are quantized to
integer 1e-9 units (Java vs C log() last-ulp) and summed EXACTLY
(long / decimal(38,0)), with one final division back to double — no
double-precision SUM anywhere, so scores are identical at any
partitioning (the same recipe as the unigram LM / phrase LM after
the r4 summation-order red).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOG2 = math.log(2.0)


def _long_form(instances: DataFrame, feature_cols: list[str],
               category_col: str,
               include_nulls: bool = True) -> DataFrame:
    """(category, feature, value) — one row per instance x feature.

    ``include_nulls`` mirrors the reference's two iteration styles: a
    present-but-NullValue vector entry stringifies to 'null' and IS
    counted (InformationGainFeatureRanker.countJointOccurrences calls
    vector.get(name) on every instance), while ChiSquaredFeatureRanker
    iterates only the PRESENT vector entries — sparse instances skip
    the feature entirely (ChiSquaredFeatureRanker.java:84-87). A
    DataFrame cannot distinguish absent from null, so the caller picks
    the semantic: True = nulls count as the literal 'null' (dense /
    null-present data), False = null rows are dropped (sparse data)."""
    structs = F.array(*[
        F.struct(F.lit(c).alias("feature"),
                 F.coalesce(F.col(c).cast("string"), F.lit("null"))
                 .alias("value"))
        for c in feature_cols])
    lf = instances.select(
        F.col(category_col).alias("category"),
        F.explode(structs).alias("fv")
    ).select("category", "fv.feature", "fv.value")
    if not include_nulls:
        lf = lf.where(F.col("value") != "null")
    return lf


def _chi_cells(instances: DataFrame, feature_cols: list[str],
               category_col: str, include_nulls: bool) -> DataFrame:
    """(feature, value, category, chi): every (feature-value row x
    category) cell of ChiSquaredFeatureRanker.calculateChiSquareValues
    (:64-117) — the full cross is materialized exactly as the
    categoryCounts.unique() loop does."""
    lf = _long_form(instances, feature_cols, category_col,
                    include_nulls)
    n_total = instances.count()

    cells = lf.groupBy("feature", "value", "category") \
        .agg(F.count("*").alias("n11"))
    fv_tot = cells.groupBy("feature", "value") \
        .agg(F.sum("n11").alias("fv_sum"))
    cat_tot = instances.groupBy(
        F.col(category_col).alias("category")).agg(
        F.count("*").alias("cat_n"))
    full = (fv_tot.crossJoin(F.broadcast(cat_tot))
            .join(cells, ["feature", "value", "category"], "left")
            .withColumn("n11", F.coalesce("n11", F.lit(0))))
    n11 = F.col("n11").cast("double")
    n10 = (F.col("fv_sum") - F.col("n11")).cast("double")
    n01 = (F.col("cat_n") - F.col("n11")).cast("double")
    n00 = F.lit(float(n_total)) - (n10 + n01 + n11)
    num = (n11 + n10 + n01 + n00) * F.pow(n11 * n00 - n10 * n01,
                                          F.lit(2.0))
    den = (n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00)
    return full.select("feature", "value", "category",
                       F.when(den != 0, num / den).alias("chi"))


def chi_squared_round_robin(instances: DataFrame,
                            feature_cols: list[str],
                            category_col: str = "category",
                            include_nulls: bool = True) -> DataFrame:
    """(feature, score): RoundRobinMergingStrategy
    (RoundRobinMergingStrategy.java:23-60) — per category, the
    feature-value cells sort by (chi desc, BASE feature name asc;
    RankedFeature.compareTo:35-41, fully deterministic), and a feature
    scores maxIndex - i for the smallest list position i at which any
    of its value cells appears in any category's ranking (the
    first-add-wins guard); maxIndex = number of feature-value rows
    (every category ranks all of them)."""
    cells = _chi_cells(instances, feature_cols, category_col,
                       include_nulls)
    n_rows = cells.select("feature", "value").distinct().count()
    # a zero-denominator cell (den==0 forces num==0, see _chi_cells)
    # is 0/0 = NaN in Java, and Double.compare sorts NaN ABOVE every
    # finite value — so such cells rank FIRST in the descending
    # order: nulls-first here (RankedFeature.compareTo:35-41)
    w = Window.partitionBy("category").orderBy(
        F.desc_nulls_first("chi"), F.asc("feature"))
    pos = cells.withColumn("_i", F.row_number().over(w) - 1)
    return (pos.groupBy("feature")
            .agg((F.lit(n_rows) - F.min("_i"))
                 .cast("double").alias("score")))


def chi_squared_ranking(instances: DataFrame, feature_cols: list[str],
                        category_col: str = "category",
                        include_nulls: bool = True) -> DataFrame:
    """(feature, score): chi² cells averaged across categories per
    feature value, summed per feature (AverageMergingStrategy) — via
    one exact integer-unit sum (see module docstring)."""
    lf = _long_form(instances, feature_cols, category_col,
                    include_nulls)
    n_total = instances.count()
    n_cats = lf.select("category").distinct().count()

    cells = lf.groupBy("feature", "value", "category") \
        .agg(F.count("*").alias("n11"))
    fv_tot = cells.groupBy("feature", "value") \
        .agg(F.sum("n11").alias("fv_sum"))
    cat_tot = instances.groupBy(
        F.col(category_col).alias("category")).agg(
        F.count("*").alias("cat_n"))

    # every (feature-value, category) cell — including zero-count
    # cells, which the reference materializes via categoryCounts
    full = (fv_tot.crossJoin(F.broadcast(cat_tot))
            .join(cells, ["feature", "value", "category"], "left")
            .withColumn("n11", F.coalesce("n11", F.lit(0))))
    n11 = F.col("n11").cast("double")
    n10 = (F.col("fv_sum") - F.col("n11")).cast("double")
    n01 = (F.col("cat_n") - F.col("n11")).cast("double")
    n00 = F.lit(float(n_total)) - (n10 + n01 + n11)
    num = (n11 + n10 + n01 + n00) * F.pow(n11 * n00 - n10 * n01,
                                          F.lit(2.0))
    den = (n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00)
    # zero denominator happens only for a CONSTANT feature (its value
    # is in every instance -> N01+N00 = 0); the reference's int->double
    # promotion then emits Infinity (ChiSquaredFeatureRanker.java:112),
    # which is the opposite of useful — here the cell is skipped, so a
    # constant feature scores 0 (documented deviation)
    chi = F.when(den != 0, num / den)
    # score = SUM over values of (SUM over cats of chi)/k — factored
    # to ONE exact sum: quantize each cell to integer 1e-9 units
    # (decimal(38,0): overflow-safe at any corpus size), sum exactly
    # (order-independent), divide once.  The old double SUM of
    # per-value averages was partitioning-order-dependent — the r4
    # phrase_probs hazard class.
    chi_units = F.round(chi * 1e9).cast("decimal(38,0)")
    return (full
            .groupBy("feature")
            .agg((F.coalesce(F.sum(chi_units),
                             F.lit(0).cast("decimal(38,0)"))
                  .cast("double") / F.lit(float(n_cats) * 1e9))
                 .alias("score")))


def _entropy_units(counts: DataFrame, total: int):
    """Entropy in exact integer 1e-9 units: each -p*log2(p) term is
    quantized to nano-units and summed as longs — order-independent
    (a double SUM of 9-decimal-rounded terms lands systematically on
    downstream rounding knife-edges; see the r4 phrase_probs red)."""
    p = F.col("n") / F.lit(float(total))
    term = F.round(-p * F.log(p) / F.lit(LOG2) * 1e9).cast("long")
    return counts.agg(F.sum(term).alias("h"))


def information_gain_ranking(instances: DataFrame,
                             feature_cols: list[str],
                             category_col: str = "category") \
        -> DataFrame:
    """(feature, score): information gain G = H(C) + H(F) - H(C,F)
    per feature, log2, computed in exact 1e-9 entropy units."""
    n_total = instances.count()
    cat_counts = instances.groupBy(F.col(category_col).alias("c")) \
        .agg(F.count("*").alias("n"))
    h_c = _entropy_units(cat_counts, n_total).collect()[0]["h"]

    lf = _long_form(instances, feature_cols, category_col)
    p = F.col("n") / F.lit(float(n_total))
    term = F.round(-p * F.log(p) / F.lit(LOG2) * 1e9).cast("long")
    h_f = (lf.groupBy("feature", "value")
           .agg(F.count("*").alias("n"))
           .groupBy("feature").agg(F.sum(term).alias("h_f")))
    h_cf = (lf.groupBy("feature", "value", "category")
            .agg(F.count("*").alias("n"))
            .groupBy("feature").agg(F.sum(term).alias("h_cf")))
    # all three entropies are exact longs in 1e-9 units; combine in
    # integer space and divide ONCE — no double sum, no final round
    return (h_f.join(h_cf, "feature")
            .select("feature",
                    ((F.lit(int(h_c)) + F.col("h_f") - F.col("h_cf"))
                     / F.lit(1e9)).alias("score")))


# ---------------------------------------------- MDL discretization
# Fayyad & Irani 1993 multi-interval discretization — the reference's
# Binner (classification/discretization/Binner.java:120-187), which
# Discretization.java applies to every numeric feature before the
# rankers above. The boundary search needs the SORTED (value,
# category) sequence, but gain candidates exist only at value changes
# and every entropy term is a function of cumulative per-category
# counts — so the dataset first collapses to (value, category, count)
# via ONE distributed aggregation (vocabulary-sized for any real
# feature), and the exact reference recursion runs driver-side over
# that compact form (the same bounded-driver pattern as the
# union-find). Bin assignment is a pure JVM expression: the boundary
# list is a literal array and bin(v) = #boundaries strictly below v,
# which equals Binner.bin's binarySearch contract incl. the
# exact-match-goes-to-the-lower-bin case (Binner.java:192-196).

def _entropy_counts(counts: dict[str, int]) -> float:
    total = sum(counts.values())
    if total == 0:
        return 0.0
    ent = 0.0
    for c in counts.values():
        if c > 0:
            p = c / total
            ent -= p * (math.log(p) / LOG2)   # MathHelper.log2 shape
    return ent


def _find_boundaries(groups: list[tuple[float, dict[str, int]]]) \
        -> list[float]:
    """Exact Binner.findBoundaries recursion over (value -> category
    counts) groups sorted by value. Returns boundary values."""
    priors: dict[str, int] = {}
    for _, cnts in groups:
        for cat, c in cnts.items():
            priors[cat] = priors.get(cat, 0) + c
    n = sum(priors.values())
    if n == 0:
        return []
    ent_s = _entropy_counts(priors)
    k = len(priors)

    max_gain = 0.0
    boundary = 0.0
    boundary_group = -1
    left: dict[str, int] = {}
    right = dict(priors)
    i = 0
    for g in range(len(groups) - 1):
        value, cnts = groups[g]
        for cat, c in cnts.items():
            left[cat] = left.get(cat, 0) + c
            right[cat] -= c
        i += sum(cnts.values())
        ent1 = _entropy_counts(left)
        ent2 = _entropy_counts(right)
        ent = i / n * ent1 + (n - i) / n * ent2
        gain = ent_s - ent
        k1 = sum(1 for v in left.values() if v > 0)
        k2 = sum(1 for v in right.values() if v > 0)
        delta = (math.log(pow(3, k) - 2) / LOG2
                 - (k * ent_s - k1 * ent1 - k2 * ent2))
        if (gain > (math.log(n - 1) / LOG2 + delta) / n
                and gain > max_gain):      # strict: first max wins
            max_gain = gain
            boundary = (value + groups[g + 1][0]) / 2
            boundary_group = g + 1
    if max_gain == 0:
        return []
    return (_find_boundaries(groups[:boundary_group])
            + [boundary]
            + _find_boundaries(groups[boundary_group:]))


def fit_mdl_bins(df: DataFrame, value_col: str,
                 category_col: str = "category") -> list[float]:
    """Distributed fit of the Fayyad/Irani boundaries for one numeric
    column (nulls skipped, Binner.java:110-115): one groupBy to the
    (value, category, count) aggregate, exact recursion driver-side."""
    rows = (df.where(F.col(value_col).isNotNull())
            .groupBy(F.col(value_col).cast("double").alias("v"),
                     F.col(category_col).alias("c"))
            .agg(F.count("*").alias("n"))
            .collect())
    by_value: dict[float, dict[str, int]] = {}
    for r in rows:
        by_value.setdefault(r.v, {})[r.c] = r.n
    groups = sorted(by_value.items())
    return _find_boundaries([(v, dict(c)) for v, c in groups])


def apply_mdl_bins(value, boundaries: list[float]):
    """Column: bin index per Binner.bin (0..len(boundaries)); a value
    equal to a boundary lands in the LOWER bin. Pure JVM filter over
    the literal boundary array; nulls stay null."""
    if not boundaries:
        return F.when(value.isNotNull(), F.lit(0))
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.when(value.isNotNull(),
                  F.size(F.filter(arr, lambda b: b < value)))


def discretize(df: DataFrame, numeric_cols: list[str],
               category_col: str = "category") -> DataFrame:
    """Discretization.java:44-79 — fit a Binner per numeric column and
    replace it with its MDL bin index (string, so the rankers above
    consume it as nominal); non-listed columns pass through. One
    aggregation per column to fit, zero extra shuffle to apply."""
    out = df
    for col in numeric_cols:
        bounds = fit_mdl_bins(df, col, category_col)
        out = out.withColumn(
            col, apply_mdl_bins(F.col(col), bounds).cast("string"))
    return out


def single_feature_classification(train: DataFrame,
                                  validation: DataFrame,
                                  label_col: str = "category",
                                  feature_cols: list[str] | None = None,
                                  id_col: str = "id",
                                  positive_class: str | None = None,
                                  laplace: float | None = None
                                  ) -> DataFrame:
    """SingleFeatureClassification port (SingleFeatureClassification.
    java:39-122): rank every feature by training a classifier on THAT
    feature alone and scoring it on the validation set — the
    reference's own main() wiring (:124-147) fixed as the semantic:
    NaiveBayesLearner/Classifier + ConfusionMatrixEvaluator, mapper =
    F1 of ``positive_class`` with NaN -> 0 (:137-140), or accuracy
    when ``positive_class`` is None.

    Spark-first: the reference loops features and retrains (:104-116);
    a single-nominal-feature Naive Bayes is fully determined by the
    (feature, value, category) count table, so ALL per-feature models
    train in ONE melt + aggregation and ALL validation rows score for
    every feature in one pass — prior + Laplace likelihood exactly as
    kgp.mlzoo.nb_classify (NaiveBayesModel.java:85-100), argmax by
    score with ascending-category tie-break (all-negative log space:
    score order == probability order). Confusion counts and the
    F1/accuracy mapper are category-sized aggregations per feature.
    Nominal (string) features only — the reference discretizes
    numerics upstream, same contract as the rankers above.
    """
    from pyspark.sql import Window

    from kgp.mlzoo import DEFAULT_LAPLACE, melt
    if laplace is None:
        laplace = DEFAULT_LAPLACE
    if feature_cols is None:
        feature_cols = [c for c, t in train.dtypes
                        if t == "string" and c != label_col]

    lab = F.col(label_col).alias("category")
    cats = train.groupBy(lab).agg(F.count("*").alias("cat_n"))
    k_tot = cats.agg(F.count("*").alias("k"),
                     F.sum("cat_n").alias("total_n"))
    cats = (cats.crossJoin(F.broadcast(k_tot))
            .withColumn("prior", F.col("cat_n") / F.col("total_n")))
    nom = (melt(train.select(label_col, *feature_cols), [label_col],
                feature_cols, "string")
           .groupBy(lab, "feature", "value")
           .agg(F.count("*").alias("n")))

    cells = melt(validation.select(id_col, *feature_cols), [id_col],
                 feature_cols, "string")
    scored = (cells.crossJoin(F.broadcast(cats))
              .join(F.broadcast(nom),
                    ["feature", "value", "category"], "left")
              .select(id_col, "feature", "category",
                      (F.log("prior")
                       + F.log((F.coalesce(F.col("n"), F.lit(0))
                                + laplace)
                               / (F.col("cat_n")
                                  + laplace * F.col("k"))))
                      .alias("score")))
    w = Window.partitionBy(id_col, "feature").orderBy(
        F.desc("score"), F.asc("category"))
    pred = (scored.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(id_col, "feature",
                    F.col("category").alias("predicted")))

    actual = validation.select(id_col, F.col(label_col).alias("actual"))
    cm = (pred.join(actual, id_col)
          .groupBy("feature", "actual", "predicted")
          .agg(F.count("*").alias("n")))
    if positive_class is None:
        out = (cm.groupBy("feature")
               .agg((F.sum(F.when(F.col("actual") == F.col("predicted"),
                                  F.col("n")).otherwise(0))
                     / F.sum("n")).alias("score")))
    else:
        pos = F.lit(positive_class)
        agg = cm.groupBy("feature").agg(
            F.sum(F.when(F.col("predicted") == pos, F.col("n"))
                  .otherwise(0)).alias("n_classified"),
            F.sum(F.when(F.col("actual") == pos, F.col("n"))
                  .otherwise(0)).alias("n_real"),
            F.sum(F.when((F.col("actual") == pos)
                         & (F.col("predicted") == pos), F.col("n"))
                  .otherwise(0)).alias("n_correct"))
        # ConfusionMatrix edge cases (ConfusionMatrix.java:204-248)
        # + the main() mapper's NaN -> 0 (:137-140)
        prec = F.when(F.col("n_classified") > 0,
                      F.col("n_correct") / F.col("n_classified"))
        rec = F.when(F.col("n_real") > 0,
                     F.col("n_correct") / F.col("n_real")) \
            .otherwise(F.lit(1.0))
        f1 = F.when(prec.isNotNull() & (prec + rec > 0),
                    2 * prec * rec / (prec + rec))
        out = agg.select("feature",
                         F.coalesce(f1, F.lit(0.0)).alias("score"))
    return out.select("feature", F.round("score", 6).alias("score"))


def feature_selection(train: DataFrame, validation: DataFrame, *,
                      label_col: str = "category",
                      feature_cols: list[str] | None = None,
                      id_col: str = "id",
                      positive_class: str | None = None,
                      backward: bool = False,
                      laplace: float | None = None) -> DataFrame:
    """FeatureSelector greedy wrapper selection (FeatureSelector.java:
    139-195): per round, every remaining candidate is evaluated --
    forward: train/score on selected+candidate; backward: on
    everything EXCEPT selected+candidate -- and the best (ties keep
    the LAST evaluated, ``score >= highestScore``) joins the selected
    list; ranks count down from N-1 (forward) / up from 1 (backward),
    higher = more important. The reference iterates a HashSet (order
    nondeterministic); this port fixes candidate order to ascending
    feature name, so a tie selects the lexicographically LAST --
    documented deterministic substitute.

    Learner/scorer = the reference main() wiring fixed as the
    semantic, same as single_feature_classification: NaiveBayes +
    accuracy (or F1 of ``positive_class``, NaN -> 0).

    Spark shape: Naive Bayes independence turns every per-candidate
    retrain into adding ONE per-feature log-likelihood term, so each
    greedy round is a single job over a cached (id, feature,
    category, term) cell table -- the base sum over the selected set
    joins against a feature-name literal list, candidates score in
    one aggregation. N features -> N jobs, never N^2/2 retrains.
    Returns (feature, rank, sel_order, score)."""
    from pyspark.sql import Window

    from kgp.mlzoo import DEFAULT_LAPLACE, melt
    if laplace is None:
        laplace = DEFAULT_LAPLACE
    if feature_cols is None:
        feature_cols = [c for c, t in train.dtypes
                        if t == "string" and c != label_col]
    n_features = len(feature_cols)

    lab = F.col(label_col).alias("category")
    cats = train.groupBy(lab).agg(F.count("*").alias("cat_n"))
    k_tot = cats.agg(F.count("*").alias("k"),
                     F.sum("cat_n").alias("total_n"))
    cats = (cats.crossJoin(F.broadcast(k_tot))
            .withColumn("prior", F.col("cat_n") / F.col("total_n")))
    nom = (melt(train.select(label_col, *feature_cols), [label_col],
                feature_cols, "string")
           .groupBy(lab, "feature", "value")
           .agg(F.count("*").alias("n")))
    cells = melt(validation.select(id_col, *feature_cols), [id_col],
                 feature_cols, "string")
    terms = (cells.crossJoin(F.broadcast(cats))
             .join(F.broadcast(nom),
                   ["feature", "value", "category"], "left")
             .select(id_col, "feature", "category", "prior",
                     F.log((F.coalesce(F.col("n"), F.lit(0)) + laplace)
                           / (F.col("cat_n") + laplace * F.col("k")))
                     .alias("term"))).persist()
    actual = validation.select(id_col, F.col(label_col).alias("actual"))

    selected: list[str] = []
    out_rows: list[tuple] = []
    rank = 0 if backward else n_features
    for _ in range(n_features):
        cands = sorted(set(feature_cols) - set(selected))
        # per-id/category sum over the fixed feature set of the round
        if backward:
            # score uses all features EXCEPT selected+candidate
            base_set = [f for f in feature_cols if f not in selected]
            base = (terms.where(F.col("feature").isin(base_set))
                    .groupBy(id_col, "category", "prior")
                    .agg(F.sum("term").alias("base")))
            cand_terms = terms.where(F.col("feature").isin(cands)) \
                .select(id_col, F.col("feature").alias("cand"),
                        "category", F.col("term").alias("cterm"))
            total = (base.join(cand_terms, [id_col, "category"])
                     .select(id_col, "cand", "category",
                             (F.log("prior") + F.col("base")
                              - F.col("cterm")).alias("score")))
        else:
            cand_terms = terms.where(F.col("feature").isin(cands)) \
                .select(id_col, F.col("feature").alias("cand"),
                        "category", "prior",
                        F.col("term").alias("cterm"))
            if selected:
                base = (terms.where(F.col("feature").isin(selected))
                        .groupBy(id_col, "category")
                        .agg(F.sum("term").alias("base")))
                total = (cand_terms.join(base, [id_col, "category"])
                         .select(id_col, "cand", "category",
                                 (F.log("prior") + F.col("base")
                                  + F.col("cterm")).alias("score")))
            else:
                total = cand_terms.select(
                    id_col, "cand", "category",
                    (F.log("prior") + F.col("cterm")).alias("score"))
        w = Window.partitionBy(id_col, "cand").orderBy(
            F.desc("score"), F.asc("category"))
        pred = (total.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") == 1)
                .select(id_col, "cand",
                        F.col("category").alias("predicted")))
        cm = (pred.join(actual, id_col)
              .groupBy("cand", "actual", "predicted")
              .agg(F.count("*").alias("n")))
        if positive_class is None:
            sc = (cm.groupBy("cand")
                  .agg((F.sum(F.when(F.col("actual")
                                     == F.col("predicted"),
                                     F.col("n")).otherwise(0))
                        / F.sum("n")).alias("score")))
        else:
            pos = F.lit(positive_class)
            agg = cm.groupBy("cand").agg(
                F.sum(F.when(F.col("predicted") == pos, F.col("n"))
                      .otherwise(0)).alias("n_classified"),
                F.sum(F.when(F.col("actual") == pos, F.col("n"))
                      .otherwise(0)).alias("n_real"),
                F.sum(F.when((F.col("actual") == pos)
                             & (F.col("predicted") == pos),
                             F.col("n")).otherwise(0))
                .alias("n_correct"))
            prec = F.when(F.col("n_classified") > 0,
                          F.col("n_correct") / F.col("n_classified"))
            rec = F.when(F.col("n_real") > 0,
                         F.col("n_correct") / F.col("n_real")) \
                .otherwise(F.lit(1.0))
            f1 = F.when(prec.isNotNull() & (prec + rec > 0),
                        2 * prec * rec / (prec + rec))
            sc = agg.select("cand",
                            F.coalesce(f1, F.lit(0.0)).alias("score"))
        # last tied candidate in ascending order wins (>= semantics)
        winner = sc.orderBy(F.desc("score"),
                            F.desc("cand")).limit(1).collect()[0]
        selected.append(winner["cand"])
        rank += 1 if backward else -1
        out_rows.append((winner["cand"], rank, len(selected),
                         float(winner["score"])))
    terms.unpersist()
    spark = train.sparkSession
    return spark.createDataFrame(
        out_rows, "feature string, rank long, sel_order long, "
                  "score double").select(
        "feature", "rank", "sel_order", F.round("score", 6)
        .alias("score"))
