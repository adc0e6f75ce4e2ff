"""Multi-classifier vote aggregation + multi-label evaluation
(palladian-image-processing kaggle/restaurants/aggregation/*.java,
utils/MultilabelEvaluator.java).

Aggregation strategies over per-(item, classifier) label probability
maps — relational shape (item_id, classifier_id, label, prob):

- majority (MajorityAggregationStrategy.java:17-45): a classifier
  votes for a label when prob > threshold (per-label thresholds
  supported); score = votes / #classifiers; only voted labels are
  emitted (the reference's Bag).
- unanimous (UnanimousAggregationStrategy.java:14-55): every label of
  the universe is emitted; score = mean prob of the above-threshold
  votes IFF every classifier voted, else 0.
- one_vote (OneVoteThresholdAggregationStrategy.java:14-44): the
  strongest above-threshold vote per label; only voted labels
  emitted.
- averaged (AveragedVotesAggregationStrategy.java:12-38): every
  universe label; score = sum of ALL probs / #classifiers (no
  threshold).

MultilabelEvaluator (:44-66, Godbole & Sarawagi example-based
metrics): per row precision = |true ∩ assigned| / |assigned| (1 when
nothing assigned), recall = |∩| / |true| (1 when no true labels);
the global result macro-averages both and takes F1 = 2PR/(P+R).

Spark shape: everything is hash aggregations on (item_id[, label]) —
two shuffles on the same key (AQE co-partitions the join); the
multi-label metrics are pure array-column expressions plus one final
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _n_classifiers(df: DataFrame) -> DataFrame:
    return df.groupBy("item_id").agg(
        F.countDistinct("classifier_id").alias("n"))


def _universe(df: DataFrame, labels: list[str]) -> DataFrame:
    return _n_classifiers(df).select(
        "item_id", "n",
        F.explode(F.array(*[F.lit(lb) for lb in labels]))
        .alias("label"))


def aggregate_majority(df: DataFrame, threshold: float = 0.5,
                       thresholds: dict[str, float] | None = None
                       ) -> DataFrame:
    """(item_id, label, score): votes/n over prob > threshold; only
    voted labels appear."""
    if thresholds:
        thr = F.coalesce(*([F.when(F.col("label") == lb, F.lit(v))
                            for lb, v in sorted(thresholds.items())]
                           + [F.lit(threshold)]))
    else:
        thr = F.lit(threshold)
    votes = df.where(F.col("prob") > thr) \
        .groupBy("item_id", "label").agg(F.count("*").alias("v"))
    return votes.join(_n_classifiers(df), "item_id").select(
        "item_id", "label", (F.col("v") / F.col("n")).alias("score"))


def aggregate_unanimous(df: DataFrame, labels: list[str],
                        threshold: float = 0.5) -> DataFrame:
    """(item_id, label, score) over the FULL label universe; mean of
    the above-threshold probs iff all classifiers voted, else 0."""
    votes = df.where(F.col("prob") > threshold) \
        .groupBy("item_id", "label").agg(
            F.count("*").alias("v"), F.sum("prob").alias("s"))
    return _universe(df, labels).join(votes, ["item_id", "label"],
                                      "left").select(
        "item_id", "label",
        F.when(F.col("v") == F.col("n"),
               F.col("s") / F.col("n")).otherwise(0.0).alias("score"))


def aggregate_one_vote(df: DataFrame,
                       threshold: float = 0.5) -> DataFrame:
    """(item_id, label, score): the strongest above-threshold vote."""
    return df.where(F.col("prob") > threshold) \
        .groupBy("item_id", "label") \
        .agg(F.max("prob").alias("score"))


def aggregate_averaged(df: DataFrame, labels: list[str]) -> DataFrame:
    """(item_id, label, score): sum of all probs / #classifiers over
    the full universe (unvoted labels 0)."""
    sums = df.groupBy("item_id", "label").agg(F.sum("prob").alias("s"))
    return _universe(df, labels).join(sums, ["item_id", "label"],
                                      "left").select(
        "item_id", "label",
        (F.coalesce(F.col("s"), F.lit(0.0)) / F.col("n"))
        .alias("score"))


# ------------------------------------------------- multi-label metrics

def multilabel_rows(df: DataFrame, true_col: str = "true_labels",
                    assigned_col: str = "assigned_labels") -> DataFrame:
    """Adds n_true / n_assigned / n_common / precision / recall as
    pure array-column expressions (MultilabelEvaluator.add:44-56,
    incl. both empty-set -> 1.0 rules)."""
    t, a = F.col(true_col), F.col(assigned_col)
    common = F.size(F.array_intersect(t, a)).cast("double")
    n_t = F.size(t).cast("double")
    n_a = F.size(a).cast("double")
    return df.withColumn("n_true", n_t.cast("int")) \
        .withColumn("n_assigned", n_a.cast("int")) \
        .withColumn("n_common", common.cast("int")) \
        .withColumn("precision",
                    F.when(n_a != 0, common / n_a).otherwise(1.0)) \
        .withColumn("recall",
                    F.when(n_t != 0, common / n_t).otherwise(1.0))


def multilabel_result(df: DataFrame, true_col: str = "true_labels",
                      assigned_col: str = "assigned_labels"
                      ) -> tuple[float, float, float]:
    """getResult (:58-63): macro-averaged (precision, recall, f1);
    raises on an empty input like the reference."""
    rows = multilabel_rows(df, true_col, assigned_col).agg(
        F.avg("precision").alias("p"), F.avg("recall").alias("r"),
        F.count("*").alias("n")).collect()[0]
    if rows["n"] == 0:
        raise ValueError("no values were added")
    p, r = rows["p"], rows["r"]
    f1 = 2 * p * r / (p + r) if (p + r) != 0 else float("nan")
    return p, r, f1


# ------------------------------------------------- label dependencies

def dependency_matrix(df: DataFrame, labels_col: str = "labels",
                      header_in_total: bool = True
                      ) -> tuple[dict, dict]:
    """DependencyMatrixBuilder.buildMatrix
    (utils/DependencyMatrixBuilder.java:21-64): label priors
    count(i)/#lines and conditional dependencies dep(i, j) =
    co_count(i, j) / count(j) rounded to 4. The reference divides the
    priors by the CSV line count INCLUDING the header row —
    header_in_total=True keeps that off-by-one (documented).
    Distributed: one explode for counts, one pair explode for
    co-counts. Returns (priors, deps[(i, j)])."""
    n_rows = df.count() + (1 if header_in_total else 0)
    counts = {r["l"]: r["c"] for r in
              df.select(F.explode(labels_col).alias("l"))
              .groupBy("l").agg(F.count("*").alias("c")).collect()}
    pairs = df.select(F.explode(labels_col).alias("i"),
                      F.col(labels_col).alias("ls")) \
        .select("i", F.explode("ls").alias("j")) \
        .where(F.col("i") != F.col("j")) \
        .groupBy("i", "j").agg(F.count("*").alias("c")).collect()
    priors = {lb: c / n_rows for lb, c in counts.items()}
    deps = {(r["i"], r["j"]): round(r["c"] / counts[r["j"]], 4)
            for r in pairs}
    return priors, deps


def aggregate_dependency(df: DataFrame, priors: dict, deps: dict,
                         labels: list[str]) -> DataFrame:
    """DependencyConsultationAggregationStrategy.aggregate (:24-63):
    per classifier map, score(label) = prior*prob + sum over OTHER
    labels of prior(other) * dep(other -> label) * prob(other);
    summed over classifiers, normalized by max(1, max accumulated
    score) * #classifiers. Relational: a per-(item, classifier)
    self-join plus two hash aggregations; priors/deps ride along as
    broadcast map literals."""
    def lit_map(d: dict):
        items = []
        for k, v in sorted(d.items()):
            items += [F.lit(k if isinstance(k, str) else "|".join(k)),
                      F.lit(float(v))]
        return F.create_map(*items) if items else \
            F.create_map(F.lit("_"), F.lit(0.0))

    pri = lit_map(priors)
    dep = lit_map({(f"{i}|{j}"): v for (i, j), v in deps.items()})
    le, r = df.alias("l"), df.alias("r")
    joined = le.join(
        r, (F.col("l.item_id") == F.col("r.item_id"))
        & (F.col("l.classifier_id") == F.col("r.classifier_id"))
        & (F.col("l.label") != F.col("r.label")))
    others = joined.groupBy(
        F.col("l.item_id").alias("item_id"),
        F.col("l.classifier_id").alias("classifier_id"),
        F.col("l.label").alias("label")).agg(
        F.sum(F.coalesce(pri[F.col("r.label")], F.lit(0.0))
              * F.coalesce(dep[F.concat_ws("|", F.col("r.label"),
                                           F.col("l.label"))],
                           F.lit(0.0))
              * F.col("r.prob")).alias("other"))
    per_vote = df.join(others, ["item_id", "classifier_id", "label"],
                       "left").select(
        "item_id", "label",
        (F.coalesce(pri[F.col("label")], F.lit(0.0)) * F.col("prob")
         + F.coalesce(F.col("other"), F.lit(0.0))).alias("score"))
    sums = per_vote.groupBy("item_id", "label").agg(
        F.sum("score").alias("s"))
    stats = df.groupBy("item_id").agg(
        F.countDistinct("classifier_id").alias("n"))
    maxes = sums.groupBy("item_id").agg(
        F.greatest(F.lit(1.0), F.max("s")).alias("mx"))
    return _universe(df, labels).drop("n") \
        .join(sums, ["item_id", "label"], "left") \
        .join(stats, "item_id").join(maxes, "item_id") \
        .select("item_id", "label",
                (F.coalesce(F.col("s"), F.lit(0.0))
                 / (F.col("mx") * F.col("n"))).alias("score"))
