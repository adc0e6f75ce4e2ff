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


def assign_folds_by_id(df: DataFrame, k: int,
                       id_col: str) -> DataFrame:
    """IdBasedCrossValidator port (IdBasedCrossValidator.java:25-103):
    fold = Integer.parseInt(id) %% numFolds — the reference's exact
    parse-the-id-string rule (k >= 2 enforced there too), already
    partition-independent by construction."""
    if k < 2:
        raise ValueError("numFolds must be at least 2")
    return df.withColumn(
        "fold", (F.col(id_col).cast("string").cast("long") % k)
        .cast("int"))


def cross_validate_by_id(df: DataFrame, k: int, id_col: str):
    """Yield (fold, train, test) over the id-modulo assignment."""
    folded = assign_folds_by_id(df, k, id_col)
    for i in range(k):
        yield (i, folded.where(F.col("fold") != i).drop("fold"),
               folded.where(F.col("fold") == i).drop("fold"))


# ------------------------------------------------- threshold analysis


class ThresholdAnalyzerLocal:
    """ThresholdAnalyzer twin (helper/math/ThresholdAnalyzer.java:
    66-200): (relevant, confidence) pairs bucket into
    round(confidence * num_bins) bins; per threshold t = bin/num_bins,
    precision/recall/accuracy come from cumulative counts at-or-above
    the bin (and irrelevant strictly below, for accuracy)."""

    def __init__(self, num_bins: int = 5):
        if num_bins < 2:
            raise ValueError("numBins must be least two")
        self.num_bins = num_bins
        self.retrieved: dict[int, int] = {}
        self.relevant: dict[int, int] = {}

    def get_bin(self, threshold: float) -> int:
        if not 0 <= threshold <= 1:
            raise ValueError("threshold must be in [0,1]")
        # Java Math.round = floor(x + 0.5)
        import math
        return int(math.floor(threshold * self.num_bins + 0.5))

    def add(self, relevant: bool, confidence: float) -> None:
        b = self.get_bin(confidence)
        self.retrieved[b] = self.retrieved.get(b, 0) + 1
        if relevant:
            self.relevant[b] = self.relevant.get(b, 0) + 1

    def entry(self, threshold: float) -> dict:
        b = self.get_bin(threshold)
        num_rel_ret = sum(n for i, n in self.relevant.items() if i >= b)
        num_irr_below = sum(
            self.retrieved.get(i, 0) - self.relevant.get(i, 0)
            for i in range(0, b))
        num_ret = sum(n for i, n in self.retrieved.items() if i >= b)
        num_relevant = sum(self.relevant.values())
        num_total = sum(self.retrieved.values())
        pr = num_rel_ret / num_ret if num_ret else float("nan")
        rc = num_rel_ret / num_relevant if num_relevant else float("nan")
        acc = (num_rel_ret + num_irr_below) / num_total
        f1 = 2 * pr * rc / (pr + rc) if pr + rc else float("nan")
        return {"threshold": threshold, "precision": pr, "recall": rc,
                "f1": f1, "accuracy": acc}

    def entries(self) -> list[dict]:
        """Iterator port: one entry per bin from the min to the max
        OCCUPIED bin (empty bins in between included), thresholds
        above 1 cut off."""
        if not self.retrieved:
            return []
        out = []
        for b in range(min(self.retrieved), max(self.retrieved) + 1):
            t = b / self.num_bins
            if t > 1:
                break
            out.append(self.entry(t))
        return out

    def max_f1_entry(self) -> dict | None:
        best = None
        for e in self.entries():
            if best is None or (e["f1"] == e["f1"]
                                and best["f1"] < e["f1"]):
                best = e
        return best


def threshold_analysis(results: DataFrame, label_col: str = "label",
                       score_col: str = "score",
                       num_bins: int = 5) -> DataFrame:
    """Distributed ThresholdAnalyzer: ONE groupBy over <= num_bins + 1
    bin keys (map-side combine), then windowed cumulative sums over
    the bin-sized table — the raw rows never hit a window. Output: one
    row per bin from the min to the max occupied bin (threshold,
    precision, recall, f1, accuracy), all rounded to 6."""
    spark = results.sparkSession
    binned = results.select(
        F.round(F.col(score_col).cast("double") * num_bins)
        .cast("int").alias("bin"),
        F.col(label_col).cast("boolean").cast("int").alias("rel"))
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("retrieved"),
        F.sum("rel").alias("relevant"))
    # fill EMPTY bins between min and max occupied (the reference's
    # iterator emits those too)
    bounds = per_bin.agg(F.min("bin").alias("lo"),
                         F.max("bin").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("bin"))
    filled = grid.join(per_bin, "bin", "left").fillna(
        0, subset=["retrieved", "relevant"])
    w_at = Window.orderBy("bin").rowsBetween(
        Window.currentRow, Window.unboundedFollowing)
    w_below = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    cum = filled.select(
        "bin",
        F.sum("retrieved").over(w_at).alias("ret_at"),
        F.sum("relevant").over(w_at).alias("rel_at"),
        F.coalesce(F.sum(F.col("retrieved") - F.col("relevant"))
                   .over(w_below), F.lit(0)).alias("irr_below"),
        F.sum("relevant").over(tot).alias("n_rel"),
        F.sum("retrieved").over(tot).alias("n_tot"))
    pr = F.col("rel_at").cast("double") / F.col("ret_at")
    rc = F.col("rel_at").cast("double") / F.col("n_rel")
    # pr = rc = 0 makes the reference's f1 a float NaN (0/0); emit
    # NULL instead — ANSI mode refuses the division, and NULL survives
    # the oracle compare where NaN-vs-NaN string canon would too
    f1 = F.when(pr + rc > 0, F.round(2 * pr * rc / (pr + rc), 6))
    return (cum.where(F.col("bin") <= num_bins)
            .select(F.round(F.col("bin").cast("double") / num_bins, 6)
                    .alias("threshold"),
                    F.round(pr, 6).alias("precision"),
                    F.round(rc, 6).alias("recall"),
                    f1.alias("f1"),
                    F.round((F.col("rel_at") + F.col("irr_below"))
                            / F.col("n_tot"), 6).alias("accuracy"))
            .orderBy("threshold"))


# ------------------------------------------------- reliability diagram

def reliability_bins(results: DataFrame, true_class: str,
                     num_bins: int = 10,
                     actual_col: str = "actual",
                     prob_col: str = "prob") -> DataFrame:
    """ReliabilityDiagramEvaluator.evaluate (reliability/
    ReliabilityDiagramEvaluator.java:62-100): bin = Math.round(
    numBins * prediction) (floor(x + 0.5), matched exactly on both
    engines), per bin the mean prediction (rounded to 9 for
    cross-engine identity), item count, positive count and the
    positive fraction. The reference's output loop runs 0..numBins-1,
    so the TOP bin (prediction == 1 rounds to numBins) is silently
    DROPPED — kept bug-for-bug. Empty bins are skipped. ONE hash
    aggregation over <= numBins+1 keys."""
    bin_col = F.floor(num_bins * F.col(prob_col) + 0.5).cast("int")
    pos = (F.col(actual_col) == true_class).cast("int")
    return (results
            .select(bin_col.alias("bin"), F.col(prob_col).alias("p"),
                    pos.alias("pos"))
            .where(F.col("bin") < num_bins)   # the dropped top bin
            .groupBy("bin")
            .agg(F.round(F.avg("p"), 9).alias("mean_prediction"),
                 F.count("*").alias("num_items"),
                 F.sum("pos").alias("num_positive"))
            .withColumn("positive_fraction",
                        F.col("num_positive") / F.col("num_items"))
            .orderBy("bin"))


def reliability_diagram(results: DataFrame, true_class: str,
                        num_bins: int = 10,
                        actual_col: str = "actual",
                        prob_col: str = "prob"):
    """(bins DataFrame, mean log loss) — the full evaluator output;
    log loss via the ported LogLossEvaluator (incl. its dropped
    (1-y) term quirk)."""
    bins = reliability_bins(results, true_class, num_bins,
                            actual_col, prob_col)
    ll = log_loss(
        results.select(
            (F.col(actual_col) == true_class).alias("label"),
            F.col(prob_col).alias("prob")),
        label_col="label", prob_col="prob")
    return bins, ll


def train_test_split(df: DataFrame, train_fraction: float,
                     id_col: str) -> tuple[DataFrame, DataFrame]:
    """RandomSplit port (core/dataset/split/RandomSplit.java:36-53 —
    trainPercentage in (0,1], shuffled index assignment) re-expressed
    through the deterministic md5 sample key like assign_folds
    (RandomCrossValidator treatment): a java.util.Random shuffle is
    neither partition-stable nor engine-portable on a cluster, the
    keyed threshold is both.  Returns (train, test) filters over the
    same scan — no shuffle, no materialization."""
    if not 0 < train_fraction <= 1:
        raise ValueError("trainPercentage must be in range (0,1]")
    from kgp.curation import sample_key
    cut = int(round(train_fraction * 10000))
    key = sample_key(F.col(id_col))
    return df.where(key < cut), df.where(key >= cut)
