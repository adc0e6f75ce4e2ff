"""Feature rankers (kgp.featuresel)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgp.featuresel import chi_squared_ranking, information_gain_ranking


def _data(spark):
    # f_good perfectly separates the category, f_noise is independent,
    # f_const is constant
    rows = []
    for i in range(40):
        cat = "a" if i % 2 == 0 else "b"
        rows.append((cat, "va" if cat == "a" else "vb",
                     f"n{i % 2 ^ (i // 2) % 2}", "k"))
    return spark.createDataFrame(
        rows, "category string, f_good string, f_noise string,"
              " f_const string")


def test_chi_squared_separating_feature_wins(spark):
    df = _data(spark)
    got = {r.feature: r.score for r in chi_squared_ranking(
        df, ["f_good", "f_noise", "f_const"]).collect()}
    # perfect 2x2 separation: chi2 = N for each cell -> avg N,
    # summed over both values -> 2N
    assert got["f_good"] == pytest.approx(2 * 40, abs=1e-6)
    assert got["f_noise"] < 1e-6
    assert got["f_const"] == 0.0         # documented deviation


def test_chi_squared_hand_computed_cell(spark):
    # Manning IR-book contingency semantics on an asymmetric corpus
    rows = ([("pos", "x")] * 3 + [("pos", "y")] * 1
            + [("neg", "x")] * 1 + [("neg", "y")] * 5)
    df = spark.createDataFrame(rows, "category string, f string")
    n = 10
    def chi(n11, n10, n01, n00):
        num = (n11 + n10 + n01 + n00) * (n11 * n00 - n10 * n01) ** 2
        den = (n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00)
        return num / den
    # value x: pos cell (3,1,1,5), neg cell (1,3,5,1); value y mirrors
    want_x = (chi(3, 1, 1, 5) + chi(1, 3, 5, 1)) / 2
    want_y = (chi(1, 5, 3, 1) + chi(5, 1, 1, 3)) / 2
    got = {r.feature: r.score
           for r in chi_squared_ranking(df, ["f"]).collect()}
    assert got["f"] == pytest.approx(round(want_x + want_y, 6))


def test_information_gain_closed_form(spark):
    df = _data(spark)
    got = {r.feature: r.score for r in information_gain_ranking(
        df, ["f_good", "f_noise", "f_const"]).collect()}
    # H(C)=1 bit; perfect feature: G = 1; constant: G = 0
    assert got["f_good"] == pytest.approx(1.0, abs=1e-5)
    assert got["f_const"] == pytest.approx(0.0, abs=1e-6)
    assert got["f_noise"] == pytest.approx(0.0, abs=1e-5)


def test_information_gain_matches_formula(spark):
    rows = ([("pos", "x")] * 3 + [("pos", "y")] * 1
            + [("neg", "x")] * 1 + [("neg", "y")] * 5)
    df = spark.createDataFrame(rows, "category string, f string")
    def h_units(*counts):
        # the stage's exact integer 1e-9-unit entropy sum
        t = sum(counts)
        return sum(round(-c / t * math.log2(c / t) * 1e9)
                   for c in counts if c)
    want = (h_units(4, 6) + h_units(4, 6)
            - h_units(3, 1, 1, 5)) / 1e9
    got = information_gain_ranking(df, ["f"]).collect()[0]
    assert got.score == pytest.approx(want, abs=1e-12)


def test_null_values_group_as_literal(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", None), ("b", "x")],
        "category string, f string")
    # nulls become the 'null' value -> f has 2 values, no crash
    assert chi_squared_ranking(df, ["f"]).count() == 1
    assert information_gain_ranking(df, ["f"]).count() == 1


# ------------------------------------------- MDL discretization

def _direct_find_boundaries(data):
    """Row-by-row transliteration of Binner.findBoundaries
    (Binner.java:130-187) for parity testing."""
    import math
    LOG2 = math.log(2.0)

    def ent(counts):
        t = sum(counts.values())
        return -sum(c / t * (math.log(c / t) / LOG2)
                    for c in counts.values() if c > 0) if t else 0.0

    data = sorted(data, key=lambda vc: vc[0])
    priors = {}
    for _, c in data:
        priors[c] = priors.get(c, 0) + 1
    n = len(data)
    if n == 0:
        return []
    ent_s, k = ent(priors), len(priors)
    max_gain, boundary, idx = 0.0, 0.0, -1
    left, right = {}, dict(priors)
    for i in range(1, n):
        pv, pc = data[i - 1]
        left[pc] = left.get(pc, 0) + 1
        right[pc] -= 1
        if pv < data[i][0]:
            e1, e2 = ent(left), ent(right)
            gain = ent_s - (i / n * e1 + (n - i) / n * e2)
            k1 = sum(1 for v in left.values() if v > 0)
            k2 = sum(1 for v in right.values() if v > 0)
            delta = (math.log(3 ** k - 2) / LOG2
                     - (k * ent_s - k1 * e1 - k2 * e2))
            if gain > (math.log(n - 1) / LOG2 + delta) / n \
                    and gain > max_gain:
                max_gain, idx = gain, i
                boundary = (pv + data[i][0]) / 2
    if max_gain == 0:
        return []
    return (_direct_find_boundaries(data[:idx]) + [boundary]
            + _direct_find_boundaries(data[idx:]))


def test_mdl_bins_separable_and_uninformative(spark):
    from kgp.featuresel import fit_mdl_bins
    rows = [(float(i), "lo" if i < 50 else "hi") for i in range(100)]
    df = spark.createDataFrame(rows, "v double, category string")
    assert fit_mdl_bins(df, "v") == [49.5]
    # category independent of value -> MDL rejects every cut
    rows = [(float(i % 10), "a" if (i // 10) % 2 == 0 else "b")
            for i in range(100)]
    df = spark.createDataFrame(rows, "v double, category string")
    assert fit_mdl_bins(df, "v") == []


def test_mdl_bins_matches_direct_port(spark):
    """Distributed fit over (value, category) counts == the exact
    row-by-row reference recursion, on awkward data (ties, repeats,
    three classes, a null)."""
    import random
    from kgp.featuresel import fit_mdl_bins
    rng = random.Random(7)
    data = []
    for _ in range(400):
        v = rng.choice([1.0, 2.0, 2.5, 3.0, 7.0, 7.5, 9.0])
        cat = ("a" if v < 3 and rng.random() < 0.9
               else "b" if v < 8 and rng.random() < 0.8 else "c")
        data.append((v, cat))
    df = spark.createDataFrame(
        data + [(None, "a")], "v double, category string")
    assert fit_mdl_bins(df, "v") == _direct_find_boundaries(data)


def test_apply_mdl_bins_binarysearch_contract(spark):
    from pyspark.sql import functions as F
    from kgp.featuresel import apply_mdl_bins
    df = spark.createDataFrame(
        [(0.5,), (1.0,), (1.5,), (2.0,), (99.0,), (None,)], "v double")
    got = [r.b for r in df.select(
        apply_mdl_bins(F.col("v"), [1.0, 2.0]).alias("b")).collect()]
    # exact boundary match lands in the LOWER bin (Binner.java:192-196)
    assert got == [0, 0, 1, 1, 2, None]
    # no boundaries -> single bin 0
    got = [r.b for r in df.select(
        apply_mdl_bins(F.col("v"), []).alias("b")).collect()]
    assert got == [0, 0, 0, 0, 0, None]


def test_discretize_end_to_end_with_rankers(spark):
    """Discretization.java wrapper: numeric columns become MDL-binned
    nominals the rankers consume directly."""
    from kgp.featuresel import discretize, information_gain_ranking
    rows = [(float(i), "x" if i % 2 else "y",
             "lo" if i < 50 else "hi") for i in range(100)]
    df = spark.createDataFrame(rows,
                               "v double, nom string, category string")
    binned = discretize(df, ["v"])
    vals = {r.v for r in binned.select("v").distinct().collect()}
    assert vals == {"0", "1"}            # one boundary at 49.5
    ig = {r.feature: r.score for r in information_gain_ranking(
        binned, ["v", "nom"]).collect()}
    assert ig["v"] == 1.0 and abs(ig["nom"]) < 1e-6


# ------------------------------------ SingleFeatureClassification
def _sfc_data(spark):
    # 40 train + 20 validation rows; f_good mirrors the label, f_flip
    # mirrors it with every 5th row flipped, f_junk is id % 3
    def rows(ids):
        out = []
        for i in ids:
            label = "true" if i % 2 == 0 else "false"
            good = label
            flip = ("false" if label == "true" else "true") \
                if i % 5 == 0 else label
            out.append((i, good, flip, str(i % 3), label))
        return out
    train = spark.createDataFrame(
        rows(range(40)),
        "id int, f_good string, f_flip string, f_junk string, "
        "category string")
    val = spark.createDataFrame(
        rows(range(40, 60)),
        "id int, f_good string, f_flip string, f_junk string, "
        "category string")
    return train, val


def test_sfc_ranking_order(spark):
    from kgp.featuresel import single_feature_classification
    train, val = _sfc_data(spark)
    scores = {r.feature: r.score for r in single_feature_classification(
        train, val, positive_class="true").collect()}
    assert set(scores) == {"f_good", "f_flip", "f_junk"}
    assert scores["f_good"] == 1.0
    assert scores["f_good"] > scores["f_flip"] > scores["f_junk"]


def test_sfc_matches_per_feature_loop(spark):
    """One-pass result == the reference's literal loop (retrain a
    fresh NB per feature via kgp.mlzoo) on every feature."""
    from kgp.evaluate import category_metrics
    from kgp.featuresel import single_feature_classification
    from kgp.mlzoo import nb_predict, nb_train
    train, val = _sfc_data(spark)
    got = {r.feature: r.score for r in single_feature_classification(
        train, val, positive_class="true").collect()}
    for feat in ["f_good", "f_flip", "f_junk"]:
        model = nb_train(train.select("category", feat),
                         nominal_cols=[feat], numeric_cols=[])
        pred = nb_predict(val.select("id", feat), model, "id")
        res = pred.join(val.select("id", "category"), "id").select(
            F.col("category").alias("actual"), "predicted")
        m = {r.category: r.f1 for r in category_metrics(res).collect()}
        expected = m.get("true") or 0.0      # the NaN -> 0 mapper
        assert got[feat] == round(expected, 6), feat


def test_sfc_accuracy_metric(spark):
    from kgp.featuresel import single_feature_classification
    train, val = _sfc_data(spark)
    scores = {r.feature: r.score for r in single_feature_classification(
        train, val).collect()}
    assert scores["f_good"] == 1.0
    n_val = val.count()
    # accuracy of f_flip: flipped validation rows (id % 5 == 0) err
    flipped = val.where("id % 5 = 0").count()
    assert scores["f_flip"] == round(1 - flipped / n_val, 6)


def test_sfc_never_predicted_positive_scores_zero(spark):
    # all-one-class training -> 'true' never predicted -> precision
    # null -> F null -> mapper 0 (ConfusionMatrix.java:204-248 +
    # SingleFeatureClassification.java:137-140)
    from kgp.featuresel import single_feature_classification
    train = spark.createDataFrame(
        [(i, str(i % 2), "false") for i in range(10)],
        "id int, f string, category string")
    val = spark.createDataFrame(
        [(i, str(i % 2), "true" if i % 2 == 0 else "false")
         for i in range(10, 20)],
        "id int, f string, category string")
    scores = {r.feature: r.score for r in single_feature_classification(
        train, val, positive_class="true").collect()}
    assert scores["f"] == 0.0


# ---------------------------------------------------- FeatureSelector
def _nb_predict(train_rows, feats, row, laplace=0.00001):
    """Literal NB over a feature subset (NaiveBayesModel.java:85-100
    semantics as in kgp.mlzoo.nb_classify)."""
    import math
    from collections import Counter, defaultdict
    cat_n = Counter(r["category"] for r in train_rows)
    total = sum(cat_n.values())
    k = len(cat_n)
    counts = defaultdict(int)
    for r in train_rows:
        for f in feats:
            counts[(f, r[f], r["category"])] += 1
    best, best_score = None, None
    for cat in sorted(cat_n):
        score = math.log(cat_n[cat] / total)
        for f in feats:
            n = counts[(f, row[f], cat)]
            score += math.log((n + laplace)
                              / (cat_n[cat] + laplace * k))
        if best_score is None or score > best_score:
            best, best_score = cat, score
    return best


def _selector_twin(train_rows, val_rows, features, backward=False):
    selected, order = [], []
    for _ in range(len(features)):
        cands = sorted(set(features) - set(selected))
        best_c, best_s = None, 0.0
        for c in cands:
            if backward:
                feats = [f for f in features
                         if f not in selected and f != c]
            else:
                feats = selected + [c]
            ok = sum(1 for r in val_rows
                     if _nb_predict(train_rows, feats, r)
                     == r["category"])
            s = ok / len(val_rows)
            if best_c is None or s >= best_s:
                best_c, best_s = c, s
        selected.append(best_c)
        order.append((best_c, best_s))
    return order


def _selector_fixture():
    import random
    rng = random.Random(7)
    cats = ["x", "y", "z"]
    rows = []
    for i in range(240):
        cat = cats[i % 3]
        rows.append({
            "id": i, "category": cat,
            # f_good strongly predictive, f_mid partially, f_junk not
            "f_good": cat + ("" if rng.random() < 0.9
                             else rng.choice(cats)),
            "f_mid": cat if rng.random() < 0.55 else rng.choice(cats),
            "f_junk": rng.choice(["a", "b"]),
            "f_anti": rng.choice(cats),
        })
    return rows[:160], rows[160:]


def test_feature_selection_matches_twin(spark):
    from kgp.featuresel import feature_selection
    train_rows, val_rows = _selector_fixture()
    feats = ["f_anti", "f_good", "f_junk", "f_mid"]
    tr = spark.createDataFrame(train_rows)
    va = spark.createDataFrame(val_rows)
    for backward in (False, True):
        got = {r["sel_order"]: (r["feature"], r["score"], r["rank"])
               for r in feature_selection(
                   tr, va, feature_cols=feats,
                   backward=backward).collect()}
        twin = _selector_twin(train_rows, val_rows, feats,
                              backward=backward)
        for i, (c, s) in enumerate(twin, start=1):
            assert got[i][0] == c, (backward, i, got, twin)
            assert abs(got[i][1] - s) < 1e-9
        # rank direction: higher = more important (selected earlier
        # forward / eliminated later backward)
        if not backward:
            assert got[1][2] == len(feats) - 1
            assert got[len(feats)][2] == 0
        else:
            assert got[1][2] == 1
            assert got[len(feats)][2] == len(feats)
    # forward must find the informative feature first
    assert _selector_twin(train_rows, val_rows, feats)[0][0] == "f_good"
