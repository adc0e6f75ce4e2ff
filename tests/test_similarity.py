from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgp.similarity import brute_force_topk, embedding_near_dups, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _numpy_topk(emb_rows, query_ids, k=5):
    ids = np.array([r.vec_id for r in emb_rows])
    m = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    want = {}
    for q in query_ids:
        qi = int(np.where(ids == q)[0][0])
        sims = m @ m[qi]
        order = sorted(range(len(ids)),
                       key=lambda i: (-sims[i], ids[i]))
        want[q] = [int(ids[i]) for i in order if ids[i] != q][:k]
    return want


def test_brute_force_topk_matches_numpy(spark, emb):
    queries = emb.where(F.col("vec_id") < 5)
    got_rows = brute_force_topk(emb, queries, k=5).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    want = _numpy_topk(emb.collect(), list(range(5)), k=5)
    assert got == want


def test_brute_force_self_excluded_and_sorted(spark, emb):
    queries = emb.where(F.col("vec_id") == 0)
    rows = brute_force_topk(emb, queries, k=10).collect()
    assert len(rows) == 10
    assert all(r.neighbor_id != 0 for r in rows)
    sims = [r.cos_sim for r in sorted(rows, key=lambda r: r.rank)]
    assert sims == sorted(sims, reverse=True)


def test_ivf_topk_recall_against_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    exact_rows = brute_force_topk(emb, queries, k=5).collect()
    approx_rows = ivf_topk(emb, queries, k=5, nlist=8, nprobe=4).collect()
    exact = {}
    for r in exact_rows:
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in approx_rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    assert sum(recalls) / len(recalls) >= 0.7  # nprobe=4 of nlist=8

    # probing EVERY cell must recover the exact answer — the invariant
    # that pins IVF's correctness independent of clustering quality
    full_rows = ivf_topk(emb, queries, k=5, nlist=8, nprobe=8).collect()
    full = {}
    for r in full_rows:
        full.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert full == exact


def test_embedding_near_dups_finds_planted_pair(spark, emb):
    # plant an exact duplicate of vec 7 with a new id
    dup = emb.where(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding", "label")
    aug = emb.unionByName(dup)
    got = {(r.a, r.b): r.cos_sim
           for r in embedding_near_dups(aug, threshold=0.999).collect()}
    assert (7, 100007) in got
    assert got[(7, 100007)] == pytest.approx(1.0, abs=1e-6)


def test_ivf_seed_quantizer_deterministic_and_recall(spark, emb):
    # the 'seed' quantizer (centroids = nlist smallest vec_ids) is the
    # oracle-checkable index: identical output across runs, full-probe
    # equals exact, and recall stays useful at nprobe=4/8
    queries = emb.where(F.col("vec_id") < 10)
    a = sorted(map(tuple, ivf_topk(emb, queries, k=5, nlist=8, nprobe=4,
                                   quantizer="seed").collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, k=5, nlist=8, nprobe=4,
                                   quantizer="seed").collect()))
    assert a == b

    exact = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    full = {}
    for r in ivf_topk(emb, queries, k=5, nlist=8, nprobe=8,
                      quantizer="seed").collect():
        full.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert full == exact

    approx = {}
    for qid, nid, *_ in a:
        approx.setdefault(qid, set()).add(nid)
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5   # seed cells are rougher
