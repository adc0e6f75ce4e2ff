"""Document scope detection: the geographic scope of a page from its
linked location mentions.

Ports the reference's ranking scope-detector family
(palladian-core/.../location/scope/):

  * FrequencyScopeDetector.java:36-48       -> scope_frequency
  * HighestPopulationScopeDetector.java:33-47 -> scope_population
  * MidpointScopeDetector.java:36-60        -> scope_midpoint
  * FirstScopeDetector.java:29-38           -> scope_first

The reference ranks a per-document Java collection; here each detector
is ONE windowed ranking over the links table joined to the broadcast
gazetteer — per-document state becomes window aggregates partitioned
by url, so all documents rank in parallel and the only shuffle is the
url hash the downstream stages already use.

Determinism note: the reference iterates HashSets, so its tie-breaks
are JVM-iteration-order (FrequencyScopeDetector picks `count >=
maxCount` over a HashSet; HighestPopulationScopeDetector returns the
first COUNTRY/CONTINENT the set iterator yields). This port makes the
same rankings deterministic with an explicit final tie-break on
entity_id ascending — a documented deviation, required for
reproducible output on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# LocationType values that constitute a geographic location (the scope
# detectors filter their input to location annotations; COORDINATE
# rows are explicitly removed in every reference detector)
LOCATION_TYPES = ["CITY", "COUNTRY", "CONTINENT", "REGION", "UNIT",
                  "LANDMARK", "POI", "ZIP", "STREET"]


def _located(links: DataFrame, gaz: DataFrame) -> DataFrame:
    geo = (gaz.where(F.col("type").isin(LOCATION_TYPES))
           .select(F.col("id").alias("entity_id"),
                   F.col("type").alias("etype"),
                   "population", "lat", "lon"))
    return links.join(F.broadcast(geo), "entity_id")


def _pick_top(df: DataFrame, order) -> DataFrame:
    w = Window.partitionBy("url").orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("url", "entity_id"))


def scope_frequency(links: DataFrame, gaz: DataFrame) -> DataFrame:
    """Most frequently mentioned location (occurrence count over the
    document's location annotations)."""
    counts = (_located(links, gaz)
              .groupBy("url", "entity_id")
              .agg(F.count("*").alias("_n")))
    return _pick_top(counts, [F.desc("_n"), F.asc("entity_id")])


def scope_population(links: DataFrame, gaz: DataFrame) -> DataFrame:
    """Any COUNTRY/CONTINENT wins outright; otherwise the location
    with the highest (non-null, positive) population. Documents whose
    locations all lack population and contain no country produce no
    row (the reference returns null)."""
    locs = (_located(links, gaz)
            .select("url", "entity_id", "etype", "population").distinct()
            .withColumn("_cc",
                        F.col("etype").isin("COUNTRY", "CONTINENT")
                        .cast("int")))
    locs = locs.where((F.col("_cc") == 1)
                      | (F.coalesce("population", F.lit(0)) > 0))
    return _pick_top(locs, [F.desc("_cc"), F.desc("population"),
                            F.asc("entity_id")])


def scope_midpoint(links: DataFrame, gaz: DataFrame) -> DataFrame:
    """Location closest to the geographic midpoint of all coordinates
    (GeoUtils.getMidpoint: mean of unit cartesian vectors). Closest-to
    -midpoint == argmax of the dot product with the mean vector, so no
    atan2/haversine round trip is needed — the ranking is identical."""
    pts = (_located(links, gaz)
           .where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
           .withColumn("_la", F.radians("lat"))
           .withColumn("_lo", F.radians("lon"))
           .withColumn("_x", F.cos("_la") * F.cos("_lo"))
           .withColumn("_y", F.cos("_la") * F.sin("_lo"))
           .withColumn("_z", F.sin("_la")))
    w = Window.partitionBy("url")
    # rounded to 12 decimals: float summation order varies with
    # partitioning, so mathematically tied candidates (symmetric
    # two-cluster documents) would otherwise rank nondeterministically
    # across runs/engines; 1e-12 is far below any real geographic
    # separation and far above accumulated rounding error
    scored = (pts
              .withColumn("_dot", F.round(
                  F.avg("_x").over(w) * F.col("_x")
                  + F.avg("_y").over(w) * F.col("_y")
                  + F.avg("_z").over(w) * F.col("_z"), 12)))
    return _pick_top(scored, [F.desc("_dot"), F.asc("entity_id")])


def scope_first(links: DataFrame, gaz: DataFrame) -> DataFrame:
    """First location annotation (document order) with a coordinate."""
    pts = _located(links, gaz).where(
        F.col("lat").isNotNull() & F.col("lon").isNotNull())
    return _pick_top(pts, [F.asc("sent_idx"), F.asc("start"),
                           F.asc("entity_id")])


DETECTORS = {
    "frequency": scope_frequency,
    "population": scope_population,
    "midpoint": scope_midpoint,
    "first": scope_first,
}


def detect_scopes(links: DataFrame, gaz: DataFrame,
                  methods: tuple[str, ...] = ("frequency", "population",
                                              "midpoint", "first")
                  ) -> DataFrame:
    """(url, method, entity_id): one scope row per document per
    detector. Each detector is one window ranking; the union keeps
    them independent jobs under AQE."""
    out = None
    for m in methods:
        part = DETECTORS[m](links, gaz) \
            .select("url", F.lit(m).alias("method"), "entity_id")
        out = part if out is None else out.unionByName(part)
    return out
