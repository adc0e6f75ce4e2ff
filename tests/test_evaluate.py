"""Evaluation stack (kgp.evaluate) and DBSCAN (kgp.clustering)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgp.clustering import dbscan
from kgp.evaluate import (accuracy, assign_folds, category_metrics,
                          confusion_matrix, cross_validate, log_loss,
                          roc_auc)


def _results(spark, rows):
    return spark.createDataFrame(rows, "actual string, predicted string")


# ------------------------------------------------- confusion matrix

def test_confusion_counts_and_accuracy(spark):
    # ConfusionMatrixTest-style fixture: 3 cats, known counts
    rows = ([("a", "a")] * 3 + [("a", "b")] * 2 + [("b", "b")] * 4
            + [("b", "c")] + [("c", "c")] * 2)
    r = _results(spark, rows)
    cm = {(x.actual, x.predicted): x.n
          for x in confusion_matrix(r).collect()}
    assert cm == {("a", "a"): 3, ("a", "b"): 2, ("b", "b"): 4,
                  ("b", "c"): 1, ("c", "c"): 2}
    assert accuracy(r) == pytest.approx(9 / 12)


def test_category_metrics_reference_edge_cases(spark):
    """precision null when never classified; recall 1.0 when the
    category has no real docs (ConfusionMatrix.java:204-228)."""
    rows = [("a", "a"), ("a", "ghost"), ("b", "a"), ("b", "b")]
    m = {x.category: x for x in category_metrics(_results(spark, rows))
         .collect()}
    # 'a': real 2, classified 2, correct 1
    assert m["a"].precision == 0.5 and m["a"].recall == 0.5
    assert m["a"].f1 == 0.5
    # 'b': real 2, classified 1, correct 1
    assert m["b"].precision == 1.0 and m["b"].recall == 0.5
    assert m["b"].f1 == pytest.approx(2 * 1 * .5 / 1.5, abs=1e-6)
    # 'ghost': predicted once, never real -> recall quirk = 1.0
    assert m["ghost"].n_real == 0 and m["ghost"].recall == 1.0
    assert m["ghost"].precision == 0.0
    # a category that is real but never predicted -> precision null
    rows2 = rows + [("never_predicted", "a")]
    m2 = {x.category: x for x in
          category_metrics(_results(spark, rows2)).collect()}
    assert m2["never_predicted"].precision is None
    assert m2["never_predicted"].f1 is None


# --------------------------------------------------------- ROC / AUC

def _auc(spark, labeled):
    df = spark.createDataFrame(labeled, "label boolean, score double")
    return roc_auc(df).collect()[0]


def test_roc_auc_perfect_and_inverted(spark):
    perfect = [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)]
    r = _auc(spark, perfect)
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    inverted = [(not y, s) for y, s in perfect]
    assert _auc(spark, inverted).auc == 0.0


def test_roc_auc_known_value_and_ties(spark):
    # hand-computed: scores .9(+) .8(-) .7(+) .6(-): AUC = 3/4
    r = _auc(spark, [(True, .9), (False, .8), (True, .7), (False, .6)])
    assert r.auc == pytest.approx(0.75)
    # all-tied scores -> diagonal -> 0.5 exactly (tie-averaged point)
    r = _auc(spark, [(True, .5), (False, .5), (True, .5), (False, .5)])
    assert r.auc == pytest.approx(0.5)
    # degenerate: single class -> null
    assert _auc(spark, [(True, .5), (True, .2)]).auc is None


def test_roc_auc_matches_mann_whitney(spark):
    """Tie-averaged trapezoid == Mann-Whitney rank statistic."""
    rows = [(i % 3 == 0, float(i % 7)) for i in range(60)]
    got = _auc(spark, rows).auc
    pos = sorted(s for y, s in rows if y)
    neg = sorted(s for y, s in rows if not y)
    wins = sum((s > t) + 0.5 * (s == t) for s in pos for t in neg)
    assert got == pytest.approx(wins / (len(pos) * len(neg)), abs=1e-6)


def test_log_loss_reference_quirk(spark):
    """Negatives contribute ZERO (LogLossEvaluator.java:32-36)."""
    df = spark.createDataFrame(
        [(True, 0.5), (False, 0.5), (True, 1.0), (False, 0.0)],
        "label boolean, prob double")
    # only the positives: -ln(.5) and -ln(1-1e-14)~0
    want = (-math.log(0.5) + -math.log(1 - 1e-14) + 0 + 0) / 4
    assert log_loss(df) == pytest.approx(want, abs=1e-9)


# ------------------------------------------------- cross-validation

def test_assign_folds_deterministic_partition(spark):
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    f1 = {r.doc_id: r.fold for r in assign_folds(df, 5, "doc_id")
          .collect()}
    f2 = {r.doc_id: r.fold for r in
          assign_folds(df.repartition(7), 5, "doc_id").collect()}
    assert f1 == f2                      # partitioning-independent
    assert set(f1.values()) == set(range(5))
    folds = list(cross_validate(df, 3, "doc_id"))
    assert len(folds) == 3
    i, train, test = folds[0]
    assert train.count() + test.count() == 300
    assert train.join(test, "doc_id").count() == 0   # disjoint


# ------------------------------------------------------------ DBSCAN

def _cluster(spark, n_points, edge_list, min_pts):
    pts = spark.createDataFrame([(i,) for i in range(n_points)],
                                "vec_id long")
    edges = spark.createDataFrame(edge_list or [(0, 0)], "a long, b long")
    if not edge_list:
        edges = edges.where("a <> a")    # empty
    return {r.vec_id: (r.cluster_id, r.role)
            for r in dbscan(pts, edges, min_pts).collect()}


def test_dbscan_core_border_noise(spark):
    # chain 0-1-2 (1 is dense), 3 isolated; minPts=3:
    #   deg+1: 0->2, 1->3, 2->2, 3->1  => core={1}, border={0,2}, noise={3}
    got = _cluster(spark, 4, [(0, 1), (1, 2)], 3)
    assert got[1] == (1, "core")
    assert got[0] == (1, "border") and got[2] == (1, "border")
    assert got[3] == (3, "noise")


def test_dbscan_two_clusters_and_transitivity(spark):
    # two triangles joined by nothing; minPts=3 -> all 6 core
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    got = _cluster(spark, 6, tri1 + tri2, 3)
    assert all(got[i] == (0, "core") for i in (0, 1, 2))
    assert all(got[i] == (3, "core") for i in (3, 4, 5))
    # core chain merges transitively: path 0-1-2-3 all deg>=2 at minPts=3
    chain = [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]
    got = _cluster(spark, 4, chain, 3)
    assert {got[i][0] for i in range(4)} == {0}


def test_dbscan_border_min_cluster_tiebreak(spark):
    """A border point reachable from two clusters joins the MIN
    cluster id (deterministic substitute for the reference's
    iteration-order assignment, DBSCAN.java:81-98)."""
    # K4 clusters {0..3} and {10..13}; point 5 (degree 2 < minPts-1)
    # borders a core of each
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    got = _cluster(spark, 14, k4a + k4b + [(3, 5), (10, 5)], 4)
    assert got[5] == (0, "border")
    assert got[3] == (0, "core") and got[10] == (10, "core")


def test_dbscan_noise_are_singletons(spark):
    got = _cluster(spark, 3, [], 2)
    assert got == {0: (0, "noise"), 1: (1, "noise"), 2: (2, "noise")}


def test_dbscan_embedding_pairs_end_to_end(spark, sf_dir):
    """Compose with the deterministic IVF-blocked pair generator over
    the embeddings table (the production shape)."""
    from kgp.similarity import embedding_near_dups
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_dups(emb, threshold=0.45, nlist=8,
                                quantizer="seed")
    out = dbscan(emb, pairs, min_pts=3)
    assert out.count() == emb.count()
    roles = {r.role for r in out.select("role").distinct().collect()}
    assert roles <= {"core", "border", "noise"}
    # every cluster id is a member id; cores own their component min
    bad = out.where("cluster_id > vec_id").join(
        out.select(F.col("vec_id").alias("cluster_id")).distinct(),
        "cluster_id", "anti").count()
    assert bad == 0


# ------------------------------------------------- threshold analysis


def test_threshold_analyzer_reference_goldens():
    """ThresholdAnalyzerTest.testThresholdStats, verbatim."""
    from kgp.evaluate import ThresholdAnalyzerLocal
    s = ThresholdAnalyzerLocal(5)
    assert s.get_bin(0.0) == 0 and s.get_bin(0.1) == 1
    assert s.get_bin(0.2) == 1 and s.get_bin(0.8) == 4
    assert s.get_bin(0.9) == 5 and s.get_bin(1.0) == 5
    data = [(True, 1), (False, .895), (False, .894), (True, .856),
            (True, .833), (True, .723), (True, .703), (False, .674),
            (True, .651), (True, .589), (True, .548), (False, .37),
            (False, .363), (False, .338), (True, 0)]
    for r, c in data:
        s.add(r, c)
    assert s.entry(0)["precision"] == pytest.approx(9 / 15)
    assert s.entry(0.548)["precision"] == pytest.approx(8 / 11)
    assert s.entry(1)["precision"] == pytest.approx(1.0)
    assert s.entry(0)["recall"] == pytest.approx(1.0)
    assert s.entry(0.548)["recall"] == pytest.approx(8 / 9)
    assert s.entry(1)["recall"] == pytest.approx(1 / 9)
    assert s.entry(0)["accuracy"] == pytest.approx(9 / 15)
    assert s.entry(0.548)["accuracy"] == pytest.approx(11 / 15)
    assert s.entry(1)["accuracy"] == pytest.approx(7 / 15)
    assert s.max_f1_entry()["f1"] == pytest.approx(0.8)


def test_threshold_analysis_stage_matches_twin(spark):
    from kgp.evaluate import ThresholdAnalyzerLocal, threshold_analysis
    data = [(True, 1.0), (False, .895), (False, .894), (True, .856),
            (True, .833), (True, .723), (True, .703), (False, .674),
            (True, .651), (True, .589), (True, .548), (False, .37),
            (False, .363), (False, .338), (True, 0.0)]
    df = spark.createDataFrame(data, "label boolean, score double")
    got = threshold_analysis(df).collect()
    twin = ThresholdAnalyzerLocal(5)
    for r, c in data:
        twin.add(r, c)
    want = twin.entries()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.threshold == pytest.approx(w["threshold"], abs=1e-6)
        assert g.precision == pytest.approx(w["precision"], abs=1e-6)
        assert g.recall == pytest.approx(w["recall"], abs=1e-6)
        assert g.accuracy == pytest.approx(w["accuracy"], abs=1e-6)


def test_threshold_analysis_fills_empty_bins(spark):
    """An unoccupied bin between min and max occupied still yields a
    row (the reference iterator walks every bin in the range)."""
    from kgp.evaluate import threshold_analysis
    df = spark.createDataFrame(
        [(True, 0.0), (False, 1.0)], "label boolean, score double")
    got = threshold_analysis(df).collect()
    assert len(got) == 6          # bins 0..5 inclusive


# ------------------------------------------------- reliability diagram

def test_reliability_bins_hand_golden(spark):
    from kgp.evaluate import reliability_bins
    rows = [("pos", 0.9), ("neg", 0.9), ("pos", 0.88),   # bin 9
            ("pos", 0.12), ("neg", 0.08),                # bin 1
            ("neg", 0.52),                               # bin 5
            ("pos", 1.0)]                                # bin 10 -> DROPPED
    df = spark.createDataFrame(rows, "actual string, prob double")
    out = {r["bin"]: r.asDict()
           for r in reliability_bins(df, "pos", 10).collect()}
    assert set(out) == {1, 5, 9}          # top bin dropped, empties skipped
    assert out[9]["num_items"] == 3 and out[9]["num_positive"] == 2
    assert out[9]["positive_fraction"] == pytest.approx(2 / 3)
    assert out[9]["mean_prediction"] == pytest.approx(
        round((0.9 + 0.9 + 0.88) / 3, 9))
    assert out[1]["num_items"] == 2 and out[1]["num_positive"] == 1
    assert out[5]["num_positive"] == 0


def test_reliability_diagram_log_loss(spark):
    import math

    from kgp.evaluate import reliability_diagram
    df = spark.createDataFrame(
        [("pos", 0.8), ("neg", 0.4)], "actual string, prob double")
    bins, ll = reliability_diagram(df, "pos", 10)
    # reference quirk: only positives charged -> (-ln 0.8 + 0) / 2
    assert ll == pytest.approx(-math.log(0.8) / 2)


def test_reservoir_sample_deterministic(spark):
    from kgp.curation import reservoir_sample
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sorted(r["doc_id"] for r in reservoir_sample(df, 20).collect())
    b = sorted(r["doc_id"] for r in
               reservoir_sample(df.repartition(7), 20).collect())
    assert len(a) == 20 and a == b   # partition-independent
    plan = reservoir_sample(df, 20)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan   # top-k, not a full sort


def test_id_based_folds(spark):
    from kgp.evaluate import assign_folds_by_id, cross_validate_by_id
    df = spark.createDataFrame([(str(i), i * 2) for i in range(20)],
                               "rid string, v int")
    folded = assign_folds_by_id(df, 5, "rid")
    got = {r.rid: r.fold for r in folded.collect()}
    assert got == {str(i): i % 5 for i in range(20)}
    splits = list(cross_validate_by_id(df, 5, "rid"))
    assert len(splits) == 5
    i, train, test = splits[2]
    assert test.count() == 4 and train.count() == 16
    assert all(int(r.rid) % 5 == 2 for r in test.collect())
    import pytest as _pt
    with _pt.raises(ValueError):
        assign_folds_by_id(df, 1, "rid")
