"""Similarity search over embedding columns (array<float>).

Two paths:

  * brute-force cosine top-k — the exact baseline. One numpy matmul
    per Arrow batch against a broadcast query matrix (vectorized, no
    per-row Python), then a per-query top-k aggregation JVM-side.
    Cost: O(N·Q·d) FLOPs fully parallel over partitions — correct
    answer, linear scan, the thing you calibrate the ANN path against.

  * IVF (inverted-file) — the scale path: KMeans (pyspark.ml) learns
    nlist centroids on a sample; every vector is assigned to its
    nearest centroid (one numpy matmul per batch); a query probes only
    the nprobe nearest cells. Recall < 1 by design; the bench compares
    it against brute force for recall/latency.

Embedding near-duplicates (cosine ≥ τ over the corpus itself) reuse
the IVF assignment as the blocking key: pairs are generated only
WITHIN a cell (equality join on cell id) — same banding idea as
kgp.dedup, vectors version.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(embeddings: DataFrame, queries: DataFrame,
                     k: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     query_id_col: str = "vec_id",
                     query_vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, rank, cos_sim).

    queries are collected + broadcast (Q is small — a probe set); the
    corpus side streams once through mapInPandas which keeps a running
    per-query top-k WITHIN each partition (numpy matmul per Arrow
    batch, partial-topk merge — the map-side-combine shape); only
    partitions*Q*k candidate rows reach the final rank window.
    Self-matches excluded. Exact at any scale: a global top-k is the
    top-k of per-partition top-ks."""
    spark = embeddings.sparkSession
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = _norm_rows(np.array([r[1] for r in q_rows],
                                dtype=np.float64))
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def partial_topk(batches):
        # Per-PARTITION partial top-k: accumulate a (Q, k) best-heap
        # across all Arrow batches of the partition, emit only Q*k rows
        # per partition. The downstream global window therefore ranks
        # ≤ partitions*Q*k rows — not N*Q — which is what survives a
        # 100× corpus scale-up (the reduction happens map-side, like a
        # partial aggregation).
        ids, qm = bc.value
        nq = len(ids)
        best_sim = np.full((nq, 0), 0.0)
        best_ids = np.full((nq, 0), 0, dtype=np.int64)
        for pdf in batches:
            m = _norm_rows(np.array(pdf["_vec"].tolist(),
                                    dtype=np.float64))
            nid = pdf["_id"].to_numpy(dtype=np.int64)
            s = qm @ m.T  # (Q, batch)
            s[ids[:, None] == nid[None, :]] = -np.inf  # self-match
            cat_sim = np.concatenate([best_sim, s], axis=1)
            cat_ids = np.concatenate(
                [best_ids, np.broadcast_to(nid, (nq, len(nid)))], axis=1)
            if cat_sim.shape[1] > k:
                # top-k per query with the SAME tie-order as the final
                # rank window (desc sim, asc id): stable argsort by id,
                # then stable argsort by -sim — exact-tie boundary rows
                # are kept/dropped identically to a global sort
                o1 = np.argsort(cat_ids, axis=1, kind="stable")
                s1 = np.take_along_axis(cat_sim, o1, axis=1)
                o2 = np.argsort(-s1, axis=1, kind="stable")[:, :k]
                idx = np.take_along_axis(o1, o2, axis=1)
                cat_sim = np.take_along_axis(cat_sim, idx, axis=1)
                cat_ids = np.take_along_axis(cat_ids, idx, axis=1)
            best_sim, best_ids = cat_sim, cat_ids
        if best_sim.shape[1]:
            keep = best_sim > -np.inf
            qcol = np.broadcast_to(ids[:, None], best_sim.shape)
            yield pd.DataFrame({
                "query_id": qcol[keep],
                "neighbor_id": best_ids[keep],
                "cos_sim": best_sim[keep]})

    partials = (embeddings
                .select(F.col(id_col).alias("_id"),
                        F.col(vec_col).alias("_vec"))
                .mapInPandas(partial_topk, out_schema))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cos_sim", 6).alias("cos_sim")))


# ----------------------------------------------------------- IVF path


def ivf_build(embeddings: DataFrame, nlist: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding",
              seed: int = 42, quantizer: str = "kmeans"):
    """Coarse-quantize every vector into one of nlist cells. Returns
    (assignments DataFrame (vec_id, cell), centroids ndarray
    (nlist, d), cell_ids list).

    quantizer='kmeans': pyspark.ml KMeans centroids (better cells,
    but the learned centroids are not reproducible outside Spark).

    quantizer='seed': the centroids are the NORMALIZED VECTORS OF THE
    nlist SMALLEST vec_ids — fully deterministic and re-computable by
    any engine from the table itself (the DuckDB oracle derives the
    identical cells; see kgp.oracle.ivf_topk_sql). Cell id = the
    centroid's vec_id; assignment = highest cosine, ties to the
    smallest cell id (numpy argmax first-occurrence ==
    row_number ORDER BY cos DESC, cell ASC)."""
    if quantizer == "seed":
        cent_rows = sorted(
            embeddings.where(F.col(id_col) < nlist)
            .select(id_col, vec_col).collect(), key=lambda r: r[0])
        cell_ids = [int(r[0]) for r in cent_rows]
        centroids = _norm_rows(np.array([r[1] for r in cent_rows],
                                        dtype=np.float64))
        spark = embeddings.sparkSession
        bc = spark.sparkContext.broadcast((cell_ids, centroids))

        @F.pandas_udf(T.IntegerType())
        def cell_udf(vec: pd.Series) -> pd.Series:
            ids, cents = bc.value
            m = _norm_rows(np.array(vec.tolist(), dtype=np.float64))
            best = np.argmax(m @ cents.T, axis=1)
            return pd.Series([ids[i] for i in best], dtype="int32")

        assignments = embeddings.select(
            F.col(id_col).alias("vec_id"),
            cell_udf(vec_col).alias("cell"))
        return assignments, centroids, cell_ids

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.select(
        F.col(id_col).alias("vec_id"),
        array_to_vector(
            F.transform(F.col(vec_col),
                        lambda x: x.cast("double"))).alias("features"))
    km = KMeans(k=nlist, seed=seed, featuresCol="features")
    model = km.fit(feat)
    centroids = _norm_rows(np.array(
        [np.asarray(c) for c in model.clusterCenters()]))
    assignments = model.transform(feat).select(
        "vec_id", F.col("prediction").alias("cell"))
    return assignments, centroids, list(range(len(centroids)))


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             nlist: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             quantizer: str = "kmeans") -> DataFrame:
    """Approximate top-k: probe only the nprobe cells whose centroids
    are closest to each query. Returns same shape as brute_force_topk.
    At corpus scale the assignments table is partitioned by cell →
    a probe reads nprobe/nlist of the data (partition pruning does the
    work once the table is written partitionedBy('cell')).
    quantizer='seed' makes the whole index deterministic and
    SQL-recomputable (exact oracle in kgp.oracle.ivf_topk_sql)."""
    spark = embeddings.sparkSession
    assignments, centroids, cell_ids = ivf_build(
        embeddings, nlist, id_col, vec_col, quantizer=quantizer)

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = _norm_rows(np.array([r[1] for r in q_rows], dtype=np.float64))
    # stable tie-break: highest cosine first, then smallest cell id
    # (argsort on (-cos, cell) pairs; cell_ids is ascending already)
    probe = np.argsort(-(q_mat @ centroids.T), axis=1,
                       kind="stable")[:, :nprobe]
    probe_rows = [(int(q_ids[i]), [int(cell_ids[c]) for c in probe[i]])
                  for i in range(len(q_ids))]
    probe_df = spark.createDataFrame(probe_rows,
                                     "query_id long, cells array<int>")
    probe_exp = probe_df.select("query_id",
                                F.explode("cells").alias("cell"))

    cand = (assignments.join(F.broadcast(probe_exp), "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id")))

    # score candidates: join back the vectors, cosine in numpy batches
    vecs = embeddings.select(F.col(id_col).alias("neighbor_id"),
                             F.col(vec_col).alias("vec"))
    bc = spark.sparkContext.broadcast(
        {int(q): q_mat[i] for i, q in enumerate(q_ids)})

    @F.pandas_udf(T.DoubleType())
    def cos(qid: pd.Series, vec: pd.Series) -> pd.Series:
        qm = bc.value
        m = _norm_rows(np.array(vec.tolist(), dtype=np.float64))
        qs = np.array([qm[int(x)] for x in qid])
        return pd.Series(np.einsum("ij,ij->i", m, qs))

    scored = (cand.join(vecs, "neighbor_id")
              .withColumn("cos_sim", cos("query_id", "vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cos_sim", 6).alias("cos_sim")))


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        nlist: int = 16, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        quantizer: str = "kmeans") -> DataFrame:
    """Corpus self-near-dup pairs (cos ≥ threshold), blocked by IVF
    cell: pairs are generated within a cell only (plus each vector's
    second-closest cell, to catch boundary pairs). Returns (a, b,
    cos_sim). quantizer='seed' makes the blocking deterministic and
    SQL-recomputable (exact oracle in
    kgp.oracle.embedding_near_dups_sql)."""
    spark = embeddings.sparkSession
    _, centroids, cell_ids = ivf_build(embeddings, nlist, id_col,
                                       vec_col, quantizer=quantizer)
    bc_c = spark.sparkContext.broadcast((centroids, cell_ids))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells2(vec: pd.Series) -> pd.Series:
        c, ids = bc_c.value
        m = _norm_rows(np.array(vec.tolist(), dtype=np.float64))
        top2 = np.argsort(-(m @ c.T), axis=1, kind="stable")[:, :2]
        return pd.Series([[int(ids[a]), int(ids[b])] for a, b in top2])

    blocked = (embeddings
               .select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("vec"),
                       F.explode(cells2(F.col(vec_col))).alias("cell")))
    lft, rgt = blocked.alias("l"), blocked.alias("r")
    pairs = (lft.join(rgt, (F.col("l.cell") == F.col("r.cell")) &
                      (F.col("l.vec_id") < F.col("r.vec_id")))
             .select(F.col("l.vec_id").alias("a"),
                     F.col("r.vec_id").alias("b"),
                     F.col("l.vec").alias("va"),
                     F.col("r.vec").alias("vb"))
             .dropDuplicates(["a", "b"]))

    @F.pandas_udf(T.DoubleType())
    def pcos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = _norm_rows(np.array(va.tolist(), dtype=np.float64))
        b = _norm_rows(np.array(vb.tolist(), dtype=np.float64))
        return pd.Series(np.einsum("ij,ij->i", a, b))

    return (pairs.withColumn("cos_sim", pcos("va", "vb"))
            .where(F.col("cos_sim") >= threshold)
            .select("a", "b", F.round("cos_sim", 6).alias("cos_sim")))
