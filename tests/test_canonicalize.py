from __future__ import annotations

from pyspark.sql import functions as F

from kgp import constants as C
from kgp.canonicalize import (canonical_mapping, connected_components,
                              same_entity_edges)
from kgp.corpus import expected_canon, gazetteer


def test_same_entity_edges(spark):
    edges = {(r.src, r.dst) for r in
             same_entity_edges(gazetteer(spark)).collect()}
    # alias entities point at their primaries; chain member at the alias
    assert (C.ORG_ALIAS_ID, C.ORG_ID) in edges
    assert (C.ORG_CHAIN_ID, C.ORG_ALIAS_ID) in edges
    # no self loops, no surface-coincidence edges (Springfield dup)
    assert all(s != d for s, d in edges)
    assert not any(C.CITY_DUP_ID in e for e in edges)


def test_connected_components_golden_mapping(spark):
    mapping = canonical_mapping(gazetteer(spark))
    got = {r.entity_id: r.canon_id for r in mapping.collect()}
    assert got == expected_canon()
    # canon names resolve through the component minimum
    names = {r.entity_id: r.canon_name for r in mapping.collect()}
    assert names[C.ORG_CHAIN_ID] == "Acme Corp"
    assert names[C.ORG_ALIAS_ID + 1] == "Globex Systems"


def test_cc_long_chain_converges_logarithmically(spark):
    # DISTRIBUTED path (small_threshold=0): a 64-node path needs ~64
    # rounds of plain min-propagation; pointer doubling must finish
    # well inside max_iter=10
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long")
    cc = connected_components(edges, max_iter=10, small_threshold=0)
    labels = {r.canon_id for r in cc.collect()}
    assert labels == {0}


def test_cc_multiple_components_both_paths(spark):
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)],
        "src long, dst long")
    want = {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}
    small = {r.entity_id: r.canon_id for r in
             connected_components(edges).collect()}
    dist = {r.entity_id: r.canon_id for r in
            connected_components(edges, small_threshold=0).collect()}
    assert small == want and dist == want
