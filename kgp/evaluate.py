"""Distributed model evaluation — the reference's classification
evaluation stack as dataframe aggregations.

Ports (cited for parity):
  * ConfusionMatrix (palladian-commons ws/palladian/helper/math/
    ConfusionMatrix.java:56-260): accuracy, per-category
    precision/recall/F1 with the reference's exact edge cases —
    precision is NaN (here: null) when nothing was classified into the
    category (:204-211), recall is **1.0** when the category has no
    real documents (:221-228), F is null when precision is (:240-248).
  * RocCurves (palladian-core classification/evaluation/roc/
    RocCurves.java:165-262): AUC by trapezoidal integration over the
    confidence-sorted results. The reference emits one ROC point per
    ENTRY, so equal confidences contribute order-dependent area
    (Collections.sort is stable -> insertion order); this port groups
    TIES into one point per distinct score — the tie-averaged
    (Mann-Whitney) value, deterministic under any partitioning. The
    reference also skips the virtual (sens 0, spec 1) start point,
    which contributes zero area — equivalence holds.
  * LogLossEvaluator (LogLossEvaluator.java:11-36) — including the
    reference's quirk that the (1-y)*ln(1-p) term is DROPPED
    (:32-36): negatives contribute zero loss. Ported verbatim;
    epsilon clamp 1e-14 identical.
  * RandomCrossValidator (RandomCrossValidator.java) — fold
    assignment re-expressed as the md5 sample key (kgp.curation)
    mod k: deterministic, engine-portable, partitioning-independent
    (a java.util.Random shuffle is none of those on a cluster).

Scale shape: confusion matrix is one groupBy over (actual,
predicted) — category-count-sized output; metrics are joins over that
tiny table. AUC aggregates per distinct score FIRST (map-side
combine), then runs one window over the distinct-score table —
vocabulary-sized, not row-sized (scores are model outputs with
bounded distinct values; never a window over raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgp.curation import sample_key

LOG_LOSS_EPS = 1e-14   # LogLossEvaluator.java:11 (10e-15)


def confusion_matrix(results: DataFrame, actual_col: str = "actual",
                     predicted_col: str = "predicted") -> DataFrame:
    """(actual, predicted, n) counts — ConfusionMatrix.add."""
    return (results
            .groupBy(F.col(actual_col).alias("actual"),
                     F.col(predicted_col).alias("predicted"))
            .agg(F.count("*").alias("n")))


def category_metrics(results: DataFrame, actual_col: str = "actual",
                     predicted_col: str = "predicted") -> DataFrame:
    """Per-category evaluation over the confusion counts:

    (category, n_real, n_classified, n_correct, prior, precision,
    recall, f1) with the reference edge cases (module docstring).
    Fractions rounded to 6 decimals for engine-portable comparison."""
    cm = confusion_matrix(results, actual_col, predicted_col)
    total = cm.agg(F.sum("n").alias("_total"))
    cats = (cm.select(F.col("actual").alias("category"))
            .union(cm.select("predicted")).distinct())
    real = cm.groupBy(F.col("actual").alias("category")) \
        .agg(F.sum("n").alias("n_real"))
    classified = cm.groupBy(F.col("predicted").alias("category")) \
        .agg(F.sum("n").alias("n_classified"))
    correct = (cm.where(F.col("actual") == F.col("predicted"))
               .select(F.col("actual").alias("category"),
                       F.col("n").alias("n_correct")))
    j = (cats.join(real, "category", "left")
         .join(classified, "category", "left")
         .join(correct, "category", "left")
         .crossJoin(F.broadcast(total))
         .select("category",
                 F.coalesce("n_real", F.lit(0)).alias("n_real"),
                 F.coalesce("n_classified", F.lit(0))
                 .alias("n_classified"),
                 F.coalesce("n_correct", F.lit(0)).alias("n_correct"),
                 F.col("_total")))
    prec = F.when(F.col("n_classified") > 0,
                  F.col("n_correct") / F.col("n_classified"))
    rec = F.when(F.col("n_real") > 0,
                 F.col("n_correct") / F.col("n_real")) \
        .otherwise(F.lit(1.0))                 # ConfusionMatrix.java:226
    f1 = F.when(prec.isNotNull() & (prec + rec > 0),
                2 * prec * rec / (prec + rec))
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return j.select(
        "category", "n_real", "n_classified", "n_correct",
        r6(F.col("n_real") / F.col("_total")).alias("prior"),
        r6(prec).alias("precision"), r6(rec).alias("recall"),
        r6(f1).alias("f1"))


def accuracy(results: DataFrame, actual_col: str = "actual",
             predicted_col: str = "predicted") -> float:
    """ConfusionMatrix.getAccuracy — correct / total."""
    row = results.agg(
        F.avg((F.col(actual_col) == F.col(predicted_col))
              .cast("double")).alias("acc")).collect()[0]
    return row["acc"]


def roc_auc(results: DataFrame, label_col: str = "label",
            score_col: str = "score") -> DataFrame:
    """One-row (n_pos, n_neg, auc): area under the ROC curve of the
    boolean `label_col` ranked by `score_col` descending, trapezoidal
    over one point per DISTINCT score (tie-averaged; see module
    docstring for the reference-iteration difference). auc rounded to
    6 decimals. Null when either class is empty (the curve is
    degenerate — the reference would divide by zero)."""
    per_score = (results
                 .groupBy(F.col(score_col).alias("score"))
                 .agg(F.sum(F.col(label_col).cast("int")).alias("tp"),
                      F.sum((~F.col(label_col)).cast("int"))
                      .alias("fp")))
    w = Window.orderBy(F.col("score").desc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_score.select(
        "score",
        F.sum("tp").over(w).alias("ctp"),
        F.sum("fp").over(w).alias("cfp"),
        (F.sum("tp").over(w) - F.col("tp")).alias("ptp"),
        (F.sum("fp").over(w) - F.col("fp")).alias("pfp"))
    agg = cum.agg(
        F.max("ctp").alias("p"), F.max("cfp").alias("n"),
        F.sum((F.col("cfp") - F.col("pfp"))
              * (F.col("ctp") + F.col("ptp"))).alias("area2"))
    return agg.select(
        F.col("p").cast("int").alias("n_pos"),
        F.col("n").cast("int").alias("n_neg"),
        F.when((F.col("p") > 0) & (F.col("n") > 0),
               F.round(F.col("area2")
                       / (2.0 * F.col("p") * F.col("n")), 6))
        .alias("auc"))


def log_loss(results: DataFrame, label_col: str = "label",
             prob_col: str = "prob") -> float:
    """Mean of LogLossEvaluator.logLoss — WITH the reference quirk
    that only the positive term -y*ln(clamp(p)) is charged
    (LogLossEvaluator.java:32-36); negatives contribute 0."""
    p = F.least(F.greatest(F.col(prob_col), F.lit(LOG_LOSS_EPS)),
                F.lit(1 - LOG_LOSS_EPS))
    loss = F.when(F.col(label_col), -F.log(p)).otherwise(F.lit(0.0))
    return results.agg(F.avg(loss).alias("ll")).collect()[0]["ll"]


def assign_folds(df: DataFrame, k: int, id_col: str) -> DataFrame:
    """+ `fold` column in [0, k): deterministic md5-keyed assignment
    (RandomCrossValidator's role; reproducible in any engine and
    independent of partitioning, unlike a seeded shuffle)."""
    return df.withColumn("fold",
                         (sample_key(F.col(id_col)) % k).cast("int"))


def cross_validate(df: DataFrame, k: int, id_col: str):
    """Yield (fold_index, train_df, test_df) — CrossValidator.Fold's
    train/test filters over the deterministic assignment."""
    folded = assign_folds(df, k, id_col)
    for i in range(k):
        yield (i, folded.where(F.col("fold") != i).drop("fold"),
               folded.where(F.col("fold") == i).drop("fold"))
