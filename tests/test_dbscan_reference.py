"""Upstream DBSCANTest vectors, transcribed mechanically against
kgp.clustering.dbscan (the edges input carries the within-eps pairs,
exactly the regionQuery relation the reference computes inline).

Sources (assertions copied 1:1):
- DBSCANTest.java:24-54 (Euclidean points, eps 1.5 minPts 3 -> 3
  clusters; Jaro-Winkler strings via the AbstractStringMetric
  getDistance = 1 - similarity contract, eps 0.1 minPts 2 -> 4
  clusters)
"""

import math

from kgp.clustering import dbscan
from kgp.strsim import jaro_winkler_similarity


def _clusters(rows):
    groups = {}
    for r in rows:
        groups.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    return {frozenset(v) for v in groups.values()}


def _run(spark, items, dist_fn, eps, min_pts):
    ids = list(range(len(items)))
    points = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    edges = [(a, b) for a in ids for b in ids
             if a < b and dist_fn(items[a], items[b]) < eps]
    edges_df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    rows = dbscan(points, edges_df, min_pts).collect()
    return {frozenset(items[i] for i in grp)
            for grp in _clusters(rows)}


def test_dbscan_points(spark):
    points = [(1, 1), (2, 1), (2, 2), (4, 3), (5, 3), (4, 4), (1, 5)]

    def euclid(p, q):
        return math.hypot(p[0] - q[0], p[1] - q[1])

    clusters = _run(spark, points, euclid, 1.5, 3)
    assert len(clusters) == 3
    assert frozenset({(1, 1), (2, 1), (2, 2)}) in clusters
    assert frozenset({(4, 3), (5, 3), (4, 4)}) in clusters
    assert frozenset({(1, 5)}) in clusters


def test_dbscan_strings(spark):
    strings = ["apple", "aple", "aapple", "apples", "banana", "pea",
               "peas", "peanut"]

    def jw_distance(a, b):
        return 1 - jaro_winkler_similarity(a, b)

    clusters = _run(spark, strings, jw_distance, 0.1, 2)
    assert len(clusters) == 4
