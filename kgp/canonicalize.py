"""Stage 5 — entity canonicalization via connected components.

The reference has no coreference/canonicalization (nearest analog:
exact dictionary surface match + conceptLikelihoodOrder,
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/entity/tagger/PalladianNer.java:522-530).
Our design (SURVEY.md §2.7): build same-entity edges, run iterative
min-label propagation (GraphFrames-style hash-join propagation — no
GraphFrames dependency, plain DataFrame ops), take `canon_id =
min(entity_id)` per component.

Scale notes:
  * each iteration = one shuffle (join) + one hash agg; labels are
    `localCheckpoint`-ed every iteration to cut lineage so the loop
    doesn't grow the plan (a 20-iteration plan would otherwise OOM the
    optimizer long before the data hurts);
  * a pointer-doubling contraction (label ← label-of-label) runs after
    every neighbor-min step, so convergence is O(log diameter) joins,
    not O(diameter) — on 10^12-doc alias graphs diameter is small but
    head entities create high-degree stars, which hash joins + AQE skew
    splitting handle (the star center's label is a single row on the
    build side);
  * convergence is an exact changed-row count with an iteration cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def same_entity_edges(gaz: DataFrame) -> DataFrame:
    """(src, dst) edges: entity A lists an alt name that IS entity B's
    primary name → same real-world entity (how the synthetic gazetteer
    encodes aliases; with a real KB this is the `sameAs`/redirect set).
    """
    alt = gaz.select(F.col("id").alias("src"),
                     F.explode("alt_names").alias("alt"))
    prim = gaz.select(F.col("id").alias("dst"), F.col("name"))
    return (alt.join(prim, alt.alt == prim.name)
               .where(F.col("src") != F.col("dst"))
               .select("src", "dst").distinct())


SMALL_GRAPH_EDGES = 100_000


def connected_components(edges: DataFrame, max_iter: int = 25,
                         small_threshold: int = SMALL_GRAPH_EDGES
                         ) -> DataFrame:
    """edges(src, dst) → mapping(entity_id, canon_id=min id in component).

    Two regimes, picked by a cheap count:
      * small edge sets (≤ small_threshold) — collect + driver-side
        union-find, ONE job instead of ~5 jobs × O(log d) iterations.
        Alias graphs from a gazetteer are tiny even when the corpus is
        100 TB; burning 20+ s of serial join latency on 50 edges is
        wrong on any cluster;
      * large edge sets — distributed min-label propagation over the
        undirected edge set with pointer doubling, driver loop with
        exact convergence check, localCheckpoint per round.
    """
    # ids may be integral (entity ids) or strings (e.g. synonym
    # surfaces) — min-label semantics work for any ordered type.
    id_type = edges.schema.fields[0].dataType
    out_schema = T.StructType([
        T.StructField("entity_id", id_type, False),
        T.StructField("canon_id", id_type, False)])
    # ONE evaluation decides the regime AND feeds the small path: a
    # limit(k+1) collect. The input is often an expensive unpersisted
    # DAG (e.g. the minhash near-dup pair pipeline) — a separate
    # count() would re-run all of it just to pick the branch.
    probe = edges.limit(small_threshold + 1).collect()
    if len(probe) <= small_threshold:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in probe:
            a, b = r[0], r[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:  # union by min id
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = [(x, find(x)) for x in sorted(parent)]
        return edges.sparkSession.createDataFrame(rows, out_schema)
    return (_cc_distributed(edges, max_iter)
            .select(F.col("entity_id").cast(id_type).alias("entity_id"),
                    F.col("canon_id").cast(id_type).alias("canon_id")))


def _cc_distributed(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))).distinct()
    sym = sym.localCheckpoint()
    labels = (sym.select(F.col("src").alias("id"))
                 .distinct()
                 .withColumn("label", F.col("id")))
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        # neighbor-min: label(v) = min(label(v), min over u~v of label(u))
        msgs = (sym.join(labels, sym.src == labels.id)
                   .select(F.col("dst").alias("id"), "label"))
        new = (labels.unionByName(msgs)
                     .groupBy("id").agg(F.min("label").alias("label")))
        # pointer doubling: label(v) = label(label(v))
        l2 = new.select(F.col("id").alias("lid"),
                        F.col("label").alias("llabel"))
        new = (new.join(l2, new.label == l2.lid, "left")
                  .select("id", F.coalesce("llabel", "label").alias("label")))
        new = new.localCheckpoint()
        changed = (new.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("id").alias("entity_id"),
                         F.col("label").alias("canon_id"))


def canonical_mapping(gaz: DataFrame) -> DataFrame:
    """gazetteer → (entity_id, canon_id, canon_name) covering ALL
    entities (identity for singletons)."""
    cc = connected_components(same_entity_edges(gaz))
    all_ids = gaz.select(F.col("id").alias("entity_id"))
    mapping = (all_ids.join(cc, "entity_id", "left")
               .select("entity_id",
                       F.coalesce("canon_id", "entity_id").alias("canon_id")))
    names = gaz.select(F.col("id").alias("canon_id"),
                       F.col("name").alias("canon_name"))
    return mapping.join(F.broadcast(names), "canon_id") \
                  .select("entity_id", "canon_id", "canon_name")


def canonicalize_links(links: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite links' (entity_id, canon_name) to component canonicals.
    mapping is broadcast (it is gazetteer-sized, small side)."""
    m = F.broadcast(mapping.select(
        "entity_id",
        F.col("canon_id").alias("_cid"),
        F.col("canon_name").alias("_cname")))
    return (links.join(m, "entity_id", "left")
            .withColumn("entity_id", F.coalesce("_cid", "entity_id"))
            .withColumn("canon_name", F.coalesce("_cname", "canon_name"))
            .drop("_cid", "_cname"))
