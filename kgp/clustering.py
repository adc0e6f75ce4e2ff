"""DBSCAN clustering, distributed.

Port of the reference's density-based clusterer
(palladian-core ws/palladian/clustering/DBSCAN.java:56-108, itself
Ester et al. 1996) re-expressed as dataframe algebra:

  * the epsilon-neighborhood graph is an INPUT (an edges DataFrame of
    within-eps pairs) — neighbor search is decoupled from clustering,
    so the same operator runs over exact pairs (tests/oracles) or the
    IVF-cell-blocked pair generator (kgp.similarity
    embedding_near_dups — the 100 TB path, never all-pairs);
  * core points = degree + 1 >= minPts (DBSCAN.java:102-106 counts the
    point itself: distance 0 < eps);
  * clusters = connected components over CORE-CORE edges
    (kgp.canonicalize — driver union-find for small edge sets,
    distributed min-label propagation above), cluster id = min core id
    in the component;
  * border points (non-core with a core neighbor) join the MINIMUM
    cluster id among their core neighbors. The reference assigns a
    border point to whichever cluster's expansion visits it first —
    HashSet iteration order (DBSCAN.java:81-98) — which is
    nondeterministic; min-id is the deterministic substitute, the same
    policy used everywhere else in this repo for HashSet-order ties.
    The reference can also emit a spurious singleton for a border
    point visited before any of its cluster's cores (the noise ->
    border relabel is skipped by the `visited` check at :63-66); the
    port assigns every point exactly one cluster.
  * noise = everything else, kept as singleton clusters
    (DBSCAN.java:69-71's deliberate modification of the original
    algorithm).

Output: (id, cluster_id, role in {'core','border','noise'}) — one row
per input point.

Scale shape: one groupBy for degrees, the CC machinery's bounded
iterations, two broadcast-size joins (core set and border assignment
are both component-bounded). Nothing here touches vectors — the heavy
geometry lives in the pair generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.canonicalize import connected_components


def dbscan(points: DataFrame, edges: DataFrame, min_pts: int,
           id_col: str = "vec_id") -> DataFrame:
    """points(id_col, ...), edges(a, b) = distinct within-eps pairs
    (either orientation; self-pairs ignored) -> (id_col, cluster_id,
    role). See module docstring for the exact reference semantics."""
    e = (edges.select(F.col("a").cast("long").alias("a"),
                      F.col("b").cast("long").alias("b"))
         .where(F.col("a") != F.col("b")))
    sym = e.union(e.select(F.col("b").alias("a"),
                           F.col("a").alias("b"))).distinct()

    # degree + self >= minPts  (regionQuery includes the point itself)
    degrees = sym.groupBy("a").agg(F.count("*").alias("deg"))
    core = degrees.where(F.col("deg") + 1 >= min_pts) \
        .select(F.col("a").alias("id"))

    # clusters over the core-core subgraph; singleton cores (no core
    # neighbor but dense through border points) keep their own id
    core_edges = (sym
                  .join(core.withColumnRenamed("id", "a"), "a", "semi")
                  .join(core.withColumnRenamed("id", "b"), "b", "semi")
                  .select(F.col("a").alias("src"),
                          F.col("b").alias("dst")))
    cc = connected_components(core_edges) \
        .withColumnRenamed("entity_id", "id") \
        .withColumnRenamed("canon_id", "cluster_id")
    core_clusters = (core.join(cc, "id", "left")
                     .select("id", F.coalesce("cluster_id", "id")
                             .alias("cluster_id")))

    # border: non-core neighbor of a core -> min neighboring cluster
    border = (sym
              .join(core_clusters.withColumnRenamed("id", "b"), "b")
              .join(core_clusters.select(F.col("id").alias("a")),
                    "a", "anti")
              .groupBy("a")
              .agg(F.min("cluster_id").alias("cluster_id"))
              .select(F.col("a").alias("id"), "cluster_id"))

    ids = points.select(F.col(id_col).cast("long").alias("id"))
    out = (ids
           .join(core_clusters.withColumn("role", F.lit("core")),
                 "id", "left")
           .join(border.withColumnRenamed("cluster_id", "_bc")
                 .withColumn("_brole", F.lit("border")), "id", "left")
           .select(
               F.col("id").alias(id_col),
               F.coalesce("cluster_id", "_bc", "id").alias("cluster_id"),
               F.coalesce("role", "_brole", F.lit("noise"))
               .alias("role")))
    return out
