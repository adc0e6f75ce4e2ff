"""quickdt decision-tree port tests: the reference's own
QuickDtTest.testDecisionTreeClassifier golden, accuracy floors on the
reference CSV datasets, and scalar-vs-JVM-compiled parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kgp import dtree

REF = "/root/reference/palladian-core/src/test/resources/classifier"

FIVE = [
    ({"height": 55.0, "weight": 168.0, "gender": "male"}, "overweight"),
    ({"height": 75.0, "weight": 168.0, "gender": "female"}, "healthy"),
    ({"height": 74.0, "weight": 143.0, "gender": "male"}, "underweight"),
    ({"height": 49.0, "weight": 144.0, "gender": "female"}, "underweight"),
    ({"height": 83.0, "weight": 223.0, "gender": "male"}, "healthy"),
]


def test_reference_five_instance_golden():
    """QuickDtTest.testDecisionTreeClassifier: with <= 10 instances
    and minNominalAttributeValueOccurances=5 every split is ignored,
    so the tree is a single prior leaf: 0.4/0.4/0.2."""
    model = dtree.train_tree(FIVE)
    probe = {"height": 62.0, "weight": 201.0, "gender": "female"}
    assert model.probability(probe, "healthy") == 0.4
    assert model.probability(probe, "underweight") == 0.4
    assert model.probability(probe, "overweight") == 0.2
    assert model.classify(probe) == "healthy"


def _read_csv(name):
    rows = []
    with open(os.path.join(REF, name)) as f:
        for line in f:
            parts = line.strip().split(";")
            if len(parts) < 2:
                continue
            attrs = {}
            for i, p in enumerate(parts[:-1]):
                try:
                    attrs[f"a{i}"] = float(p)
                except ValueError:
                    attrs[f"a{i}"] = p
            rows.append((attrs, parts[-1]))
    return rows


def _holdout_accuracy(rows, model_fn):
    train = [r for i, r in enumerate(rows) if i % 2 == 0]
    test = [r for i, r in enumerate(rows) if i % 2 == 1]
    model = model_fn(train)
    ok = sum(1 for attrs, label in test if model.classify(attrs) == label)
    return ok / len(test)


def test_diabetes_accuracy_floor():
    # reference floor: 0.72 (QuickDtTest.testWithDiabetesData)
    rows = _read_csv("diabetesData.txt")
    acc = _holdout_accuracy(
        rows, lambda t: dtree.train_forest(t, num_trees=10, seed=7))
    assert acc > 0.72, acc


def test_adult_accuracy_floor():
    # reference floor: 0.75 (QuickDtTest.testWithAdultIncomeData)
    rows = _read_csv("adultData.txt")
    acc = _holdout_accuracy(
        rows, lambda t: dtree.train_forest(t, num_trees=10, seed=7))
    assert acc > 0.75, acc


def test_single_tree_splits_cleanly():
    # 30 instances, clearly separable on the numeric attribute
    rows = [({"x": float(i), "c": "a" if i % 2 else "b"},
             "lo" if i < 15 else "hi") for i in range(30)]
    model = dtree.train_tree(rows)
    assert model.classify({"x": 3.0, "c": "a"}) == "lo"
    assert model.classify({"x": 27.0, "c": "b"}) == "hi"
    assert isinstance(model.root, dtree.OrdinalBranch)


def test_nominal_min_occurances_gate():
    # every value occurs >= 5 times per class side -> nominal split ok
    rows = []
    for i in range(40):
        val = "red" if i < 20 else "blue"
        rows.append(({"color": val}, "warm" if val == "red" else "cold"))
    model = dtree.train_tree(rows)
    assert model.classify({"color": "red"}) == "warm"
    assert model.classify({"color": "blue"}) == "cold"


def test_forest_determinism():
    rows = _read_csv("diabetesData.txt")[:200]
    a = dtree.train_forest(rows, num_trees=3, seed=5)
    b = dtree.train_forest(rows, num_trees=3, seed=5)
    probe = rows[0][0]
    for cls in a.classes:
        assert a.probability(probe, cls) == b.probability(probe, cls)


def test_column_compile_matches_scalar(spark):
    rows = _read_csv("diabetesData.txt")[:300]
    model = dtree.train_tree(rows, max_depth=6, min_probability=0.95)
    cols = sorted(rows[0][0])
    df = spark.createDataFrame(
        [tuple(attrs[c] for c in cols) + (label,)
         for attrs, label in rows],
        ", ".join(f"{c} double" for c in cols) + ", label string")
    got = dtree.classify_stage(df, model).collect()
    for r, (attrs, _) in zip(got, rows):
        for cls in model.classes:
            assert r[f"p_{cls}"] == pytest.approx(
                model.probability(attrs, cls)), attrs
        assert r["predicted"] == model.classify(attrs)


def test_sql_twin_matches_scalar():
    import duckdb
    rows = _read_csv("diabetesData.txt")[:300]
    model = dtree.train_tree(rows, max_depth=5, min_probability=0.95)
    cols = sorted(rows[0][0])
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({', '.join(c + ' DOUBLE' for c in cols)})")
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' for _ in cols)})",
        [[attrs[c] for c in cols] for attrs, _ in rows])
    for cls in model.classes:
        vals = [r[0] for r in con.execute(
            f"SELECT {dtree.tree_sql(model, cls)} FROM t").fetchall()]
        for v, (attrs, _) in zip(vals, rows):
            assert v == pytest.approx(model.probability(attrs, cls))
