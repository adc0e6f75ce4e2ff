from __future__ import annotations

from pyspark.sql import functions as F

from kgp.scope import (detect_scopes, scope_first, scope_frequency,
                       scope_midpoint, scope_population)

GAZ = ("id long, name string, type string, population long, "
       "lat double, lon double")
LNK = "url string, sent_idx int, start int, entity_id long"


def _gaz(spark):
    rows = [
        (1, "Smallville", "CITY", 900, 40.0, -75.0),
        (2, "Metropolis", "CITY", 5_000_000, 40.5, -74.0),
        (3, "Oz", "COUNTRY", 9_000_000, 41.0, -74.5),
        (4, "Nowhere", "CITY", None, None, None),     # no pop, no coord
        (5, "John Smith", "PER", None, None, None),   # not a location
    ]
    return spark.createDataFrame(rows, GAZ)


def test_scope_frequency(spark):
    links = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 0, 10, 1), ("u", 1, 0, 2),
         ("u", 1, 5, 5),                   # PER ignored
         ("v", 0, 0, 1), ("v", 0, 5, 2)],  # tie -> smaller entity_id
        LNK)
    got = {r.url: r.entity_id for r in
           scope_frequency(links, _gaz(spark)).collect()}
    assert got == {"u": 1, "v": 1}


def test_scope_population(spark):
    gaz = _gaz(spark)
    # no country present -> highest population wins
    links = spark.createDataFrame([("u", 0, 0, 1), ("u", 0, 9, 2)], LNK)
    assert scope_population(links, gaz).collect()[0].entity_id == 2
    # a COUNTRY beats even larger-population cities
    links2 = spark.createDataFrame([("u", 0, 0, 2), ("u", 0, 9, 3)], LNK)
    assert scope_population(links2, gaz).collect()[0].entity_id == 3
    # only population-less locations -> no row (reference returns null)
    links3 = spark.createDataFrame([("u", 0, 0, 4)], LNK)
    assert scope_population(links3, gaz).count() == 0


def test_scope_midpoint(spark):
    # two mentions near (40, -75), one outlier: midpoint sits between
    # the cluster members; entity 2 at (40.5, -74) is closest to the
    # midpoint of {1, 1, 3}? cluster around entity 1 dominates
    links = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 1, 0, 1), ("u", 2, 0, 3)], LNK)
    got = scope_midpoint(links, _gaz(spark)).collect()[0]
    assert got.entity_id == 1         # midpoint pulled to the cluster
    # coordinate-less locations never rank
    links2 = spark.createDataFrame([("u", 0, 0, 4)], LNK)
    assert scope_midpoint(links2, _gaz(spark)).count() == 0


def test_scope_first(spark):
    links = spark.createDataFrame(
        [("u", 1, 0, 2), ("u", 0, 3, 4),   # first has no coordinate
         ("u", 0, 7, 3)], LNK)
    # (0, 3) is earliest but entity 4 lacks coordinates -> (0, 7) wins
    assert scope_first(links, _gaz(spark)).collect()[0].entity_id == 3


def test_detect_scopes_union(spark):
    links = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 0, 9, 2), ("u", 1, 0, 2)], LNK)
    got = {(r.method): r.entity_id for r in
           detect_scopes(links, _gaz(spark)).collect()}
    assert got == {"frequency": 2, "population": 2,
                   "midpoint": 2, "first": 1}


def test_no_python_in_plan(spark):
    links = spark.createDataFrame([("u", 0, 0, 1)], LNK)
    plan = detect_scopes(links, _gaz(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan


# ---- round-3 additions: least-distance / trust / dictionary scope

LNK_T = ("url string, sent_idx int, start int, entity_id long, "
         "link_score double")


def test_center_of_minimum_distance_goldens():
    # GeoUtilsTest.testCenterOfMinimumDistance
    from kgp.geo import center_of_minimum_distance
    c1 = [(52.52437, 13.41053), (51.50853, -0.12574),
          (47.66033, 9.17582), (45.74846, 4.84671)]
    la, lo = center_of_minimum_distance(c1)
    assert abs(la - 48.337076) < 0.01 and abs(lo - 7.758056) < 0.01
    assert center_of_minimum_distance(
        [(52.52437, 13.41053)]) == (52.52437, 13.41053)
    c4 = [(39.00027, -105.50083), (52.16045, -0.70312), (-33.0, -56.0),
          (39.5, -8.0), (54.75844, -2.69531), (39.76, -98.5),
          (51.297, 1.069), (52.5, -3.5), (38.89511, -77.03637)]
    la, lo = center_of_minimum_distance(c4)
    assert abs(la - 52.52425) < 0.01 and abs(lo - (-5.220439)) < 0.01


def test_grid_cell_goldens(spark):
    # GridCreatorTest.testGetCellIdentifier (gridSize=90)
    from kgp.scope import cell_center, grid_cell_col
    pts = [(-35.3, 149.116667, "(3|0)"), (35.683889, 139.774444, "(3|1)"),
           (43.7, -79.4, "(1|1)"), (-22.908333, -43.196389, "(1|0)"),
           (21.311389, -157.796389, "(0|1)"), (90.0, 180.0, "(3|1)"),
           (-90.0, -180.0, "(0|0)")]
    df = spark.createDataFrame([(la, lo) for la, lo, _ in pts],
                               "lat double, lon double")
    got = [r[0] for r in
           df.select(grid_cell_col("lat", "lon", 90.0)).collect()]
    assert got == [p[2] for p in pts]
    # GridCreatorTest.testGetCoordinate
    assert cell_center("(3|0)", 90.0) == (-45.0, 135.0)
    assert cell_center("(0|1)", 90.0) == (45.0, -135.0)
    assert cell_center("garbage", 90.0) is None


def test_scope_least_distance(spark):
    from kgp.scope import scope_least_distance
    # entity 2 (40.5,-74) sits between 1 (40,-75) and 3 (41,-74.5):
    # its summed distance to all three annotations is smallest
    links = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 1, 0, 2), ("u", 2, 0, 3)], LNK)
    assert scope_least_distance(
        links, _gaz(spark)).collect()[0].entity_id == 2
    # duplicated mention of 1 pulls the optimum onto 1 itself
    links2 = spark.createDataFrame(
        [("u", 0, 0, 1), ("u", 1, 0, 1), ("u", 2, 0, 1),
         ("u", 3, 0, 3)], LNK)
    assert scope_least_distance(
        links2, _gaz(spark)).collect()[0].entity_id == 1
    # coordinate-less entities drop out entirely
    links3 = spark.createDataFrame([("u", 0, 0, 4)], LNK)
    assert scope_least_distance(links3, _gaz(spark)).count() == 0


def test_scope_trust(spark):
    from kgp.scope import scope_trust
    links = spark.createDataFrame(
        [("u", 0, 0, 1, 0.9), ("u", 0, 5, 2, 0.4),
         ("v", 0, 0, 1, 0.5), ("v", 0, 5, 2, 0.5)],  # tie -> larger pop
        LNK_T)
    got = {r.url: r.entity_id
           for r in scope_trust(links, _gaz(spark)).collect()}
    assert got == {"u": 1, "v": 2}


def test_dictionary_scope_end_to_end(spark):
    from kgp.scope import (COARSE_GRID_SIZE, dictionary_scope,
                           train_dictionary_scope)
    # two training regions with distinctive char 6..9-gram vocabulary
    rows = [
        ("t1", "brandenburger strasse quartier", 52.52, 13.40),
        ("t2", "brandenburger allee quartier", 52.60, 13.50),
        ("t3", "manhattan broadway borough", 40.71, -74.00),
        ("t4", "manhattan harlem borough", 40.80, -73.95),
    ]
    docs = spark.createDataFrame(
        rows, "url string, text string, lat double, lon double")
    model = train_dictionary_scope(docs, grid_size=COARSE_GRID_SIZE)
    # cell -> center-of-minimum-distance of its training coordinates
    assert len(model.cell_coord) == 2
    q = spark.createDataFrame(
        [("q1", "brandenburger quartier", None, None),
         ("q2", "manhattan borough", None, None)],
        "url string, text string, lat double, lon double")
    got = {r.url: r for r in dictionary_scope(q, model).collect()}
    # berlin-side query answers the berlin cell's coordinate
    assert abs(got["q1"].lat - 52.52) < 0.2
    assert abs(got["q1"].lon - 13.40) < 0.2
    assert abs(got["q2"].lat - 40.71) < 0.2
    assert abs(got["q2"].lon - (-74.00)) < 0.2


def test_dictionary_scope_unseen_cell_falls_back_to_center():
    from kgp.scope import ScopeModel, cell_center
    from kgp.textclassifier import DictModel
    m = DictModel()
    m.entries = {"xxxxxx": {"(1|1)": 1}}
    m.doc_counts["(1|1)"] = 1
    from kgp.scope import SCOPE_FEATURE_SETTING
    model = ScopeModel(90.0, SCOPE_FEATURE_SETTING, m, {})
    assert cell_center("(1|1)", 90.0) == (45.0, -45.0)


# ---- multi-step dictionary scope (coarse -> fine ladder)


def test_cells_within_goldens():
    from kgp.scope import cell_id, cells_within
    # 90-degree coarse cell (0|0) over a 45-degree fine grid: 2x2 cells
    got = cells_within("(0|0)", 90.0, 45.0)
    assert sorted(set(got)) == ["(0|0)", "(0|1)", "(1|0)", "(1|1)"]
    # the IT configuration: 5.63-degree coarse over 0.7-degree fine
    got = cells_within("(30|20)", 5.63, 0.7)
    assert len(set(got)) == 81  # ceil(5.63/0.7)^2 = 9^2
    # the sampled coordinate of every enumerated fine cell lies inside
    # the coarse cell (edge fine cells can straddle the boundary when
    # the sizes don't divide — reference getCells behaves the same)
    from kgp.scope import cell_center
    centers_in = sum(1 for cid in set(got)
                     if cell_id(*cell_center(cid, 0.7), 5.63) == "(30|20)")
    assert centers_in >= 64  # interior 8x8 at minimum


def test_coarsen_model_preserves_totals():
    from kgp.scope import coarsen_model
    from kgp.textclassifier import DictModel
    m = DictModel()
    m.entries = {"abc": {"(0|0)": 2, "(1|0)": 1, "(3|3)": 4},
                 "def": {"(3|3)": 1}}
    m.doc_counts.update({"(0|0)": 2, "(1|0)": 1, "(3|3)": 3})
    c = coarsen_model(m, 45.0, 90.0)  # fine 45 -> coarse 90
    # fine (0|0) and (1|0) centers share coarse cell (0|0)
    assert c.entries["abc"] == {"(0|0)": 3, "(1|1)": 4}
    assert c.entries["def"] == {"(1|1)": 1}
    assert c.num_docs == m.num_docs
    assert c.num_uniq_terms == m.num_uniq_terms
    assert c.num_terms == m.num_terms


def test_multi_step_validation():
    import pytest as _pytest
    from kgp.scope import (SCOPE_FEATURE_SETTING, ScopeModel,
                           _validate_multi_step)
    from kgp.textclassifier import DictModel
    model = ScopeModel(0.7, SCOPE_FEATURE_SETTING, DictModel(), {})
    _validate_multi_step(model, (5.63, 1.4))
    with _pytest.raises(ValueError):
        _validate_multi_step(model, (2.0, 1.5))  # not halving
    with _pytest.raises(ValueError):
        _validate_multi_step(model, (5.63, 1.0))  # < 2x fine grid


def test_multi_step_scope_end_to_end(spark):
    from kgp.scope import (FINE_GRID_SIZE, dictionary_scope,
                           multi_step_dictionary_scope,
                           train_dictionary_scope)
    rows = [
        ("t1", "brandenburger strasse quartier", 52.52, 13.40),
        ("t2", "brandenburger allee quartier", 52.60, 13.50),
        ("t3", "manhattan broadway borough", 40.71, -74.00),
        ("t4", "manhattan harlem borough", 40.80, -73.95),
    ]
    docs = spark.createDataFrame(
        rows, "url string, text string, lat double, lon double")
    model = train_dictionary_scope(docs, grid_size=FINE_GRID_SIZE)
    q = spark.createDataFrame(
        [("q1", "brandenburger quartier", None, None),
         ("q2", "manhattan borough", None, None)],
        "url string, text string, lat double, lon double")
    got = {r.url: r for r in
           multi_step_dictionary_scope(q, model).collect()}
    assert abs(got["q1"].lat - 52.52) < 0.5
    assert abs(got["q1"].lon - 13.40) < 0.5
    assert abs(got["q2"].lat - 40.71) < 0.5
    assert abs(got["q2"].lon - (-74.00)) < 0.5
    # with well-separated regions the ladder agrees with the flat
    # fine-grid classification
    flat = {r.url: r for r in dictionary_scope(q, model).collect()}
    assert {k: v.cell for k, v in got.items()} == \
        {k: v.cell for k, v in flat.items()}


# ---- feature-based (ML) scope detector


def test_scope_features(spark):
    from kgp.scope import scope_features
    links = spark.createDataFrame(
        [("u", 0, 0, 1, 0.9), ("u", 0, 10, 1, 0.5), ("u", 1, 0, 2, 0.7),
         ("u", 2, 0, 3, 0.2)], LNK_T)
    got = {r.entity_id: r for r in
           scope_features(links, _gaz(spark)).collect()}
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    assert abs(r1.occurrence_frequency - 0.5) < 1e-9   # 2 of 4
    assert abs(r1.disambiguation_trust - 0.9) < 1e-9   # max of the two
    assert r1.offset_first == 0.0
    assert r1.min_distance_to_others > 0
    # entity 2 is geographically between 1 and 3 -> smaller midpoint
    # distance than at least one endpoint
    assert got[2].midpoint_distance <= max(got[1].midpoint_distance,
                                           got[3].midpoint_distance)


def test_feature_based_scope_end_to_end(spark):
    from kgp.scope import (scope_feature_based,
                           train_feature_based_scope)
    # training documents whose scope is the frequent city (entity 1)
    rows = []
    for i in range(8):
        u = f"t{i}"
        rows += [(u, 0, 0, 1, 0.9), (u, 1, 0, 1, 0.8),
                 (u, 2, 0, 3, 0.3)]
    links = spark.createDataFrame(rows, LNK_T)
    gaz = _gaz(spark)
    g = {r["id"]: r for r in gaz.collect()}
    gold = spark.createDataFrame(
        [(f"t{i}", g[1]["lat"], g[1]["lon"]) for i in range(8)],
        "url string, lat double, lon double")
    model = train_feature_based_scope(links, gaz, gold, num_trees=10)
    # held-out doc with the same shape resolves to entity 1
    test = spark.createDataFrame(
        [("q", 0, 0, 1, 0.9), ("q", 1, 0, 1, 0.8), ("q", 2, 0, 3, 0.3)],
        LNK_T)
    got = scope_feature_based(test, gaz, model).collect()
    assert got[0].url == "q" and got[0].entity_id == 1


# ---- k-nearest-neighbor scope detector


def test_knn_scope_end_to_end(spark):
    from kgp.scope import knn_scope, train_knn_scope
    rows = [
        ("t1", "brandenburger strasse quartier", 52.52, 13.40),
        ("t2", "brandenburger allee quartier", 52.60, 13.50),
        ("t3", "manhattan broadway borough", 40.71, -74.00),
        ("t4", "manhattan harlem borough", 40.80, -73.95),
    ]
    docs = spark.createDataFrame(
        rows, "url string, text string, lat double, lon double")
    model = train_knn_scope(docs)
    q = spark.createDataFrame(
        [("q1", "brandenburger quartier", None, None),
         ("q2", "manhattan borough", None, None),
         ("q3", "zzz completely unrelated gibberish qqq", None, None)],
        "url string, text string, lat double, lon double")
    got = {r.url: r for r in knn_scope(q, model, k=2).collect()}
    # the two berlin training docs dominate -> center between them
    assert abs(got["q1"].lat - 52.56) < 0.3
    assert abs(got["q1"].lon - 13.45) < 0.3
    assert abs(got["q2"].lat - 40.75) < 0.3
    assert abs(got["q2"].lon - (-73.97)) < 0.3
    # no positive similarity -> no scope (reference returns null)
    assert got["q3"].lat is None


def test_knn_scope_zero_hit_semantics(spark):
    # a query sharing no term with the index gets NO scope — exact
    # term matching (inverted index), not hashed similarity
    from kgp.scope import train_knn_scope
    docs = spark.createDataFrame(
        [("t", "brandenburger strasse quartier", 52.5, 13.4)],
        "url string, text string, lat double, lon double")
    model = train_knn_scope(docs)
    assert "quartie" in model.postings or any(
        "brandenburger"[:7] in t for t in model.postings)
    assert all(len(p) == 1 for p in model.postings.values())


# ---- hostile inputs across the new detectors


def test_scope_hostile_inputs(spark):
    from kgp.scope import (SCOPE_FEATURE_SETTING, ScopeModel,
                           dictionary_scope, detect_scopes,
                           scope_features)
    from kgp.textclassifier import DictModel
    gaz = _gaz(spark)
    # empty links: every detector yields zero rows, no crash
    empty = spark.createDataFrame([], LNK_T)
    assert detect_scopes(empty, gaz).count() == 0
    assert scope_features(empty, gaz).count() == 0
    # links referencing only coordinate-less entities
    nocoord = spark.createDataFrame([("u", 0, 0, 4, 0.5)], LNK_T)
    assert scope_features(nocoord, gaz).count() == 0
    # dictionary scope with an empty model: classify returns {} ->
    # null cells, no crash
    m = ScopeModel(90.0, SCOPE_FEATURE_SETTING, DictModel(), {})
    docs = spark.createDataFrame([("u", "", None, None)],
                                 "url string, text string, "
                                 "lat double, lon double")
    row = dictionary_scope(docs, m).collect()[0]
    assert row.cell is None and row.lat is None


def test_knn_scope_upstream_vectors(spark):
    """KNearestNeighborScopeDetectorTest.java:33-51 (the Chinese/
    Tokyo corpus): k=1 and k=3 both answer Tokyo — the k=3 case
    needs the per-occurrence boolean clauses + ClassicSimilarity
    score ratios (Tokyo's 10 replicas outweigh the others' rounded
    factors, so the center of minimum distance IS Tokyo)."""
    from kgp.scope import knn_scope, train_knn_scope
    from kgp.textclassifier import FeatureSetting
    rows = [("Chinese Beijing Chinese", 39.928887, 116.388338),
            ("Chinese Chinese Shanghai", 31.233333, 121.466667),
            ("Chinese Macao", 22.198611, 113.544722),
            ("Tokyo Japan Chinese", 35.683889, 139.774444)]
    train = spark.createDataFrame(
        rows, "text string, lat double, lon double")
    fs = FeatureSetting(mode="word", min_ngram=1, max_ngram=1)
    model = train_knn_scope(train, fs)
    test = spark.createDataFrame(
        [("d1", "Chinese Chinese Chinese Tokyo Japan")],
        "url string, text string")
    for k in (1, 3):
        out = knn_scope(test, model, k=k).collect()[0]
        assert abs(out["lat"] - 35.684) < 0.001, k
        assert abs(out["lon"] - 139.774) < 0.001, k
