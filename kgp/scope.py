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


def scope_least_distance(links: DataFrame, gaz: DataFrame) -> DataFrame:
    """Annotation whose summed haversine distance to every OTHER
    location annotation in the document is minimal
    (LeastDistanceScopeDetector.java:40-62). The reference's O(n²)
    Java loop over the per-document annotation list becomes a per-url
    self-join + one aggregation — all documents in parallel, distances
    as pure column arithmetic. Duplicated mentions weight the sum
    exactly as the reference's per-annotation list does; ties resolve
    to the earliest annotation (the strict `<` in the Java loop),
    with the float sum quantized to 1e-6 km for cross-run and
    cross-engine determinism (libm trig differs near 1e-12 relative,
    which on thousand-km sums is ~1e-9 — a 6-decimal grid keeps both
    engines on the same side of every rounding boundary)."""
    pts = (_located(links, gaz)
           .where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
           .select("url", "sent_idx", "start", "entity_id",
                   F.radians("lat").alias("_la"),
                   F.radians("lon").alias("_lo")))
    other = pts.select(F.col("url").alias("url2"),
                       F.col("_la").alias("_la2"),
                       F.col("_lo").alias("_lo2"))
    a = (F.sin((F.col("_la2") - F.col("_la")) / 2) ** 2
         + F.cos("_la") * F.cos("_la2")
         * F.sin((F.col("_lo2") - F.col("_lo")) / 2) ** 2)
    hav = 2 * 6371.0 * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
    summed = (pts.join(other, pts["url"] == other["url2"])
              .groupBy("url", "sent_idx", "start", "entity_id")
              .agg(F.round(F.sum(hav), 6).alias("_dsum")))
    return _pick_top(summed, [F.asc("_dsum"), F.asc("sent_idx"),
                              F.asc("start"), F.asc("entity_id")])


def scope_trust(links: DataFrame, gaz: DataFrame) -> DataFrame:
    """Highest-trust annotation (HighestTrustScopeDetector.java:33-62):
    sort by annotation trust — our link_score — descending, then
    population descending (null counts as 0), then document order
    (the reference's stable sort keeps annotation order on full ties)."""
    locs = _located(links, gaz)
    return _pick_top(locs, [F.desc("link_score"),
                            F.desc(F.coalesce("population", F.lit(0))),
                            F.asc("sent_idx"), F.asc("start"),
                            F.asc("entity_id")])


DETECTORS = {
    "frequency": scope_frequency,
    "population": scope_population,
    "midpoint": scope_midpoint,
    "first": scope_first,
    "least_distance": scope_least_distance,
    "trust": scope_trust,
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


# -------------------------------------- trainable dictionary scope
# DictionaryScopeDetector.java:40-220 — a text classifier over grid
# cells: training documents with a known main coordinate map to a
# "(x|y)" cell identifier (GridCreator.java:27-43), a char-gram
# dictionary is trained with the cell as the category, and a document
# classifies to the most likely cell, answered as that cell's
# center-of-minimum-distance over its training coordinates
# (GridConverter.getMapping, CoordinateStats.java:23-25) or the plain
# cell center when unseen.

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import types as T

from kgp.geo import (center_of_minimum_distance, normalize_latitude,
                     normalize_longitude)
from kgp.textclassifier import (BayesScorer, DictModel, FeatureSetting,
                                classify, most_likely, preprocess)

# DictionaryScopeDetectorIT.java:27-29,53 — the reference's evaluated
# configuration: char 6..9-grams, fine 0.7° / coarse 5.63° grids
SCOPE_FEATURE_SETTING = FeatureSetting(mode="char", min_ngram=6,
                                       max_ngram=9)
FINE_GRID_SIZE = 0.7
COARSE_GRID_SIZE = 5.63


def grid_cell_col(lat, lon, grid_size: float):
    """GridCreator.getCell (:27-43) as a column expression: truncating
    division into the (x|y) identifier, clamped to the cell range."""
    nx = int(math.ceil(360 / grid_size))
    ny = int(math.ceil(180 / grid_size))
    x = F.least(F.floor((F.col(lon) + 180) / grid_size),
                F.lit(nx - 1)).cast("int")
    y = F.least(F.floor((F.col(lat) + 90) / grid_size),
                F.lit(ny - 1)).cast("int")
    return F.concat(F.lit("("), x, F.lit("|"), y, F.lit(")"))


def cell_center(identifier: str, grid_size: float
                ) -> tuple[float, float] | None:
    """GridCell.getCenter (:68-72) from a "(x|y)" identifier."""
    if (not identifier.startswith("(") or not identifier.endswith(")")
            or "|" not in identifier):
        return None
    xs, ys = identifier[1:-1].split("|", 1)
    try:
        x, y = int(xs), int(ys)
    except ValueError:
        return None
    lat1 = y * grid_size - 90
    lng1 = x * grid_size - 180
    return (normalize_latitude(lat1 + 0.5 * grid_size),
            normalize_longitude(lng1 + 0.5 * grid_size))


@dataclass
class ScopeModel:
    """DictionaryScopeModel (DictionaryScopeDetector.java:50-68):
    grid size + term dictionary + cell→coordinate mapping."""
    grid_size: float
    fs: FeatureSetting
    dict_model: DictModel
    cell_coord: dict[str, tuple[float, float]]


def train_dictionary_scope(docs: DataFrame, grid_size: float = FINE_GRID_SIZE,
                           fs: FeatureSetting = SCOPE_FEATURE_SETTING,
                           text_col: str = "text", lat_col: str = "lat",
                           lon_col: str = "lon") -> ScopeModel:
    """DictionaryScopeDetectorLearner.train (:183-198) distributed:
    documents without a coordinate are filtered (CoordinateFilter),
    the per-document DISTINCT term set (first-appearance order, capped
    at fs.max_terms — PalladianTextClassifier.train semantics) explodes
    into ONE (term, cell) hash aggregation, and each cell's coordinate
    becomes the center-of-minimum-distance of its training coordinates
    via applyInPandas. The collected model is vocabulary-sized and
    broadcast for classification."""
    pts = docs.where(F.col(lat_col).isNotNull()
                     & F.col(lon_col).isNotNull())
    cells = pts.withColumn(
        "_cell", grid_cell_col(lat_col, lon_col, grid_size))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def terms_udf(texts: pd.Series) -> pd.Series:
        def doc_terms(t):
            seen: list[str] = []
            have = set()
            for term in preprocess(t or "", fs):
                if len(have) >= fs.max_terms:
                    break
                if term not in have:
                    have.add(term)
                    seen.append(term)
            return seen
        return texts.map(doc_terms)

    entries = (cells
               .select("_cell", F.explode(terms_udf(text_col)).alias("_t"))
               .groupBy("_t", "_cell").agg(F.count("*").alias("_n")))
    doc_counts = cells.groupBy("_cell").agg(F.count("*").alias("_n"))

    def centers(pdf: pd.DataFrame) -> pd.DataFrame:
        coords = list(zip(pdf[lat_col], pdf[lon_col]))
        la, lo = center_of_minimum_distance(coords)
        return pd.DataFrame([{"cell": pdf["_cell"].iloc[0],
                              "lat": la, "lon": lo}])

    mapping = (cells.select("_cell", lat_col, lon_col)
               .groupBy("_cell")
               .applyInPandas(centers, "cell string, lat double, "
                                       "lon double"))

    model = DictModel()
    for r in entries.collect():
        model.entries.setdefault(r["_t"], {})[r["_cell"]] = r["_n"]
    for r in doc_counts.collect():
        model.doc_counts[r["_cell"]] = r["_n"]
    coord = {r["cell"]: (r["lat"], r["lon"]) for r in mapping.collect()}
    return ScopeModel(grid_size, fs, model, coord)


def dictionary_scope(docs: DataFrame, model: ScopeModel,
                     text_col: str = "text",
                     key_col: str = "url") -> DataFrame:
    """DictionaryScopeDetector.getScope (:201-214): classify each
    document's text to its most likely grid cell with the BayesScorer
    (DEFAULT_SCORER, all options), answer the cell's mapped coordinate
    or its geometric center. One Arrow pass over (key, text) with the
    broadcast model; exact-tie argmax breaks by ascending cell id
    (documented determinism deviation from CategoryEntries' HashMap)."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(model)
    out_type = T.StructType([
        T.StructField("cell", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ])

    @F.pandas_udf(out_type)
    def scope_udf(texts: pd.Series) -> pd.DataFrame:
        m = bc.value
        scorer = BayesScorer()

        def one(t):
            scores = classify(t or "", m.dict_model, m.fs, scorer)
            if not scores:
                return None, None, None
            cell = most_likely(scores)
            hit = m.cell_coord.get(cell)
            if hit is None:
                hit = cell_center(cell, m.grid_size)
            if hit is None:
                return cell, None, None
            return cell, hit[0], hit[1]

        rows = [one(t) for t in texts]
        return pd.DataFrame(rows, columns=["cell", "lat", "lon"])

    res = docs.select(key_col, scope_udf(text_col).alias("_s"))
    return res.select(key_col, F.col("_s.cell").alias("cell"),
                      F.col("_s.lat").alias("lat"),
                      F.col("_s.lon").alias("lon"))


# ------------------------------------- multi-step dictionary scope
# MultiStepDictionaryScopeDetector.java:37-170 — classify on simulated
# coarser grids first, then restrict each finer classification to the
# cells inside the winning coarse cell. The coarse dictionaries are
# views of the ONE fine model (CoarseDictionaryDecorator), so only the
# fine model is ever trained; the focus step is FocusDictionaryDecorator
# semantics (kgp.textclassifier.classify(allowed=...)).


def cell_id(lat: float, lon: float, grid_size: float) -> str:
    """GridCreator.getCell(GeoCoordinate) identifier (:64-78):
    truncating division on the (-180,-90)-anchored grid, clamped."""
    nx = int(math.ceil(360 / grid_size))
    ny = int(math.ceil(180 / grid_size))
    x = min(int((lon + 180) / grid_size), nx - 1)
    y = min(int((lat + 90) / grid_size), ny - 1)
    return f"({x}|{y})"


def cells_within(coarse_id: str, coarse_size: float,
                 fine_size: float) -> list[str]:
    """GridCreator.getCells (:88-103): fine-grid cells covering an
    identifier-parsed coarse cell (getCell(int,int) bounds, anchored
    at (-180,-90)); coordinates normalized like the reference before
    the fine lookup."""
    xs, ys = coarse_id[1:-1].split("|", 1)
    x, y = int(xs), int(ys)
    lat1 = y * coarse_size - 90
    lat2 = lat1 + coarse_size
    lng1 = x * coarse_size - 180
    lng2 = lng1 + coarse_size
    out: list[str] = []
    lat = lat1
    while lat < lat2:
        la = normalize_latitude(lat)
        lng = lng1
        while lng < lng2:
            out.append(cell_id(la, normalize_longitude(lng), fine_size))
            lng += fine_size
        lat += fine_size
    return out


def coarsen_model(model: DictModel, fine_size: float,
                  coarse_size: float) -> DictModel:
    """CoarseDictionaryDecorator.java:33-249, materialized eagerly:
    every fine cell category is re-keyed to the coarse cell containing
    the fine cell's CENTER (mapToCoarse :214-222), counts summed. The
    aggregate statistics the scorer reads (num_docs, num_uniq_terms,
    num_terms) are preserved by construction, so scores match the
    reference's lazy decorator exactly."""
    memo: dict[str, str] = {}

    def to_coarse(fine_id: str) -> str:
        hit = memo.get(fine_id)
        if hit is None:
            c = cell_center(fine_id, fine_size)
            hit = cell_id(c[0], c[1], coarse_size)
            memo[fine_id] = hit
        return hit

    out = DictModel()
    for term, cats in model.entries.items():
        agg = out.entries.setdefault(term, {})
        for cat, n in cats.items():
            cc = to_coarse(cat)
            agg[cc] = agg.get(cc, 0) + n
    for cat, n in model.doc_counts.items():
        out.doc_counts[to_coarse(cat)] += n
    return out


def _validate_multi_step(model: ScopeModel,
                         coarser_grid_sizes: tuple[float, ...]) -> None:
    """MultiStepDictionaryScopeDetector.validateParameters (:105-121):
    descending, each size at least twice its successor, smallest coarse
    at least twice the fine grid."""
    sizes = list(coarser_grid_sizes)
    for i in range(1, len(sizes)):
        if sizes[i - 1] < 2 * sizes[i]:
            raise ValueError("coarser grid sizes must descend, each at "
                             "least twice its successor")
    if sizes and model.grid_size * 2 > sizes[-1]:
        raise ValueError("smallest coarse grid must be at least twice "
                         "the fine grid size")


def multi_step_scope_text(text: str, model: ScopeModel,
                          coarser_grid_sizes: tuple[float, ...],
                          steps: list | None = None
                          ) -> tuple[str, float, float] | None:
    """MultiStepDictionaryScopeDetector.getScope (:123-168) for one
    text. ``steps`` lets callers pass pre-coarsened models (built once,
    broadcast). Returns (cell, lat, lon) at whatever grid level the
    walk reached; the reference looks the final identifier up in the
    fine cell→coordinate map REGARDLESS of which grid produced it (a
    coarse "(x|y)" string can collide with a fine one — quirk kept),
    falling back to the answering grid's cell center."""
    if steps is None:
        steps = [(s, coarsen_model(model.dict_model, model.grid_size, s))
                 for s in coarser_grid_sizes]
        steps.append((model.grid_size, model.dict_model))
    scorer = BayesScorer()
    cell, cur_size = None, None
    for size, m in steps:
        if cell is None:
            scores = classify(text or "", m, model.fs, scorer)
            if not scores:
                return None
        else:
            allowed = set(cells_within(cell, cur_size, size))
            scores = classify(text or "", m, model.fs, scorer,
                              allowed=allowed)
            if not scores:
                break
        cell, cur_size = most_likely(scores), size
    if cell is None:
        return None
    hit = model.cell_coord.get(cell)
    if hit is None:
        hit = cell_center(cell, cur_size)
    if hit is None:
        return cell, None, None
    return cell, hit[0], hit[1]


def multi_step_dictionary_scope(docs: DataFrame, model: ScopeModel,
                                coarser_grid_sizes: tuple[float, ...] = (
                                    COARSE_GRID_SIZE,),
                                text_col: str = "text",
                                key_col: str = "url") -> DataFrame:
    """Distributed MultiStepDictionaryScopeDetector: the coarse models
    are materialized ONCE on the driver from the fine model and the
    whole step ladder is broadcast; each document is one pure-Python
    walk inside an Arrow batch — no shuffle, no join."""
    _validate_multi_step(model, coarser_grid_sizes)
    steps = [(s, coarsen_model(model.dict_model, model.grid_size, s))
             for s in coarser_grid_sizes]
    steps.append((model.grid_size, model.dict_model))
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast((model, steps))
    out_type = T.StructType([
        T.StructField("cell", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ])

    @F.pandas_udf(out_type)
    def scope_udf(texts: pd.Series) -> pd.DataFrame:
        m, stps = bc.value
        rows = [multi_step_scope_text(t, m, (), steps=stps) or
                (None, None, None) for t in texts]
        return pd.DataFrame(rows, columns=["cell", "lat", "lon"])

    res = docs.select(key_col, scope_udf(text_col).alias("_s"))
    return res.select(key_col, F.col("_s.cell").alias("cell"),
                      F.col("_s.lat").alias("lat"),
                      F.col("_s.lon").alias("lon"))


# ------------------------------------- feature-based (ML) detector
# FeatureBasedScopeDetector.java:63-244 — 16 features per DISTINCT
# location of a document (distance-to-midpoint/center, occurrence
# frequency, ancestor/descendant percentages, hierarchy depth,
# population, type, max disambiguation trust, offset statistics,
# distance stats to the other distinct coordinates), scored by a
# random forest; the highest-probability location is the scope.
# The reference trains QuickDtLearner.randomForest(100) on documents
# whose closest candidate lies within 50 km of the gold scope.

import numpy as np

from kgp.geo import distance_km, midpoint

# LocationType → numeric index for the forest (the reference feeds
# the type as a QuickDt nominal; pyspark.ml needs a stable encoding)
_TYPE_INDEX = {t: i for i, t in enumerate(LOCATION_TYPES)}

SCOPE_FEATURES = [
    "midpoint_distance", "centerpoint_distance", "occurrence_frequency",
    "descendant_percentage", "ancestor_percentage", "hierarchy_depth",
    "population", "location_type", "disambiguation_trust",
    "offset_first", "offset_last", "offset_spread",
    "min_distance_to_others", "max_distance_to_others",
    "mean_distance_to_others", "median_distance_to_others",
]

_FEAT_SCHEMA = ("url string, entity_id long, "
                + ", ".join(f"{f} double" for f in SCOPE_FEATURES))


def scope_features(links: DataFrame, gaz: DataFrame) -> DataFrame:
    """(url, entity_id) + the 16 FeatureBasedScopeDetector features —
    ONE applyInPandas over url groups (a document's annotation list is
    tiny; the heavy part is the url shuffle all scope detectors share).
    The document offset is the (sent_idx, start) surrogate
    sent_idx*10000+start — offsets only appear RELATIVE to maxOffset.
    Coordinate-less locations take GeoCoordinate.NULL = (0, 0) exactly
    like the reference's coalesce."""
    anc = (F.coalesce("ancestor_ids", F.array())
           if "ancestor_ids" in gaz.columns
           else F.array().cast("array<long>"))
    geo = (gaz.where(F.col("type").isin(LOCATION_TYPES))
           .select(F.col("id").alias("entity_id"),
                   F.col("type").alias("etype"),
                   "population", "lat", "lon",
                   anc.alias("_anc")))
    ann = (links.join(F.broadcast(geo), "entity_id")
           .select("url", "sent_idx", "start", "entity_id",
                   F.coalesce("link_score", F.lit(0.0)).alias("_trust"),
                   "etype", "population", "lat", "lon", "_anc"))

    def per_url(pdf: pd.DataFrame) -> pd.DataFrame:
        n_ann = len(pdf)
        offs = (pdf["sent_idx"].fillna(0).astype(np.int64) * 10_000
                + pdf["start"].fillna(0).astype(np.int64))
        max_offset = max(1, int(offs.max()))
        # distinct locations, first-appearance deterministic order
        pdf = pdf.assign(_off=offs)
        groups = pdf.groupby("entity_id", sort=True)
        # distinct COORDINATES of the document (Set<GeoCoordinate>)
        coord_rows = pdf.dropna(subset=["lat", "lon"])
        coords = sorted({(la, lo) for la, lo in
                         zip(coord_rows["lat"], coord_rows["lon"])})
        if not coords:
            return pd.DataFrame(columns=["url", "entity_id",
                                         *SCOPE_FEATURES])
        mid = midpoint(coords)
        center = center_of_minimum_distance(coords)
        # per-distinct-location coordinate (locations are gazetteer
        # rows: one coordinate per entity_id)
        loc_coord = {}
        loc_rows = {}
        for eid, g in groups:
            loc_rows[eid] = g
            la, lo = g["lat"].iloc[0], g["lon"].iloc[0]
            loc_coord[eid] = ((la, lo)
                              if la == la and lo == lo else (0.0, 0.0))
        all_ids = set(loc_rows)
        anc_of = {eid: set(loc_rows[eid]["_anc"].iloc[0] or [])
                  for eid in loc_rows}
        out = []
        for eid, g in loc_rows.items():
            la, lo = loc_coord[eid]
            # distances to the OTHER distinct coordinate locations
            others = [distance_km(la, lo, c[0], c[1])
                      for oid, c in loc_coord.items()
                      if oid != eid and not (
                          loc_rows[oid]["lat"].isna().iloc[0])]
            dists = np.array(others) if others else None
            n_desc = sum(1 for oid in all_ids if eid in anc_of[oid])
            n_anc = sum(1 for oid in all_ids if oid in anc_of[eid])
            pop = g["population"].iloc[0]
            out.append({
                "url": g["url"].iloc[0], "entity_id": eid,
                "midpoint_distance": distance_km(mid[0], mid[1], la, lo),
                "centerpoint_distance": distance_km(center[0], center[1],
                                                    la, lo),
                "occurrence_frequency": len(g) / n_ann,
                "descendant_percentage": n_desc / n_ann,
                "ancestor_percentage": n_anc / n_ann,
                "hierarchy_depth": float(len(anc_of[eid])),
                "population": float(pop) if pop == pop and
                pop is not None else 0.0,
                "location_type": float(_TYPE_INDEX.get(
                    g["etype"].iloc[0], len(_TYPE_INDEX))),
                "disambiguation_trust": float(g["_trust"].max()),
                "offset_first": float(g["_off"].min()) / max_offset,
                "offset_last": float(g["_off"].max()) / max_offset,
                "offset_spread": float(g["_off"].max()
                                       - g["_off"].min()) / max_offset,
                "min_distance_to_others":
                    float(dists.min()) if dists is not None else 0.0,
                "max_distance_to_others":
                    float(dists.max()) if dists is not None else 0.0,
                "mean_distance_to_others":
                    float(dists.mean()) if dists is not None else 0.0,
                "median_distance_to_others":
                    float(np.median(dists)) if dists is not None
                    else 0.0,
            })
        return pd.DataFrame(out)

    return ann.groupBy("url").applyInPandas(per_url, _FEAT_SCHEMA)


def train_feature_based_scope(links: DataFrame, gaz: DataFrame,
                              gold: DataFrame, positive_km: float = 50.0,
                              num_trees: int = 100, seed: int = 13):
    """FeatureBasedScopeDetector.train (:176-244): the candidate
    closest to the document's gold coordinate becomes the positive
    instance when within 50 km; every other candidate is negative.
    gold: (url, lat, lon). Returns a fitted pyspark.ml pipeline."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    feats = scope_features(links, gaz)
    geo = gaz.select(F.col("id").alias("entity_id"),
                     F.col("lat").alias("_gla"),
                     F.col("lon").alias("_glo"))
    g = gold.select("url", F.col("lat").alias("_la"),
                    F.col("lon").alias("_lo"))
    a = (F.sin((F.radians("_gla") - F.radians("_la")) / 2) ** 2
         + F.cos(F.radians("_la")) * F.cos(F.radians("_gla"))
         * F.sin((F.radians("_glo") - F.radians("_lo")) / 2) ** 2)
    dist = 2 * 6371.0 * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
    cand = (feats.join(F.broadcast(geo), "entity_id")
            .join(F.broadcast(g), "url")
            .withColumn("_dist", dist))
    w = Window.partitionBy("url").orderBy(F.asc("_dist"),
                                          F.asc("entity_id"))
    labeled = (cand.withColumn("_rn", F.row_number().over(w))
               .withColumn("label",
                           ((F.col("_rn") == 1)
                            & (F.col("_dist") <= positive_km))
                           .cast("double")))
    asm = VectorAssembler(inputCols=SCOPE_FEATURES, outputCol="_fv",
                          handleInvalid="keep")
    rf = RandomForestClassifier(featuresCol="_fv", labelCol="label",
                                numTrees=num_trees, seed=seed)
    return Pipeline(stages=[asm, rf]).fit(labeled)


def scope_feature_based(links: DataFrame, gaz: DataFrame,
                        model) -> DataFrame:
    """Highest P(true) candidate per document (getScope :85-106); the
    reference's HashSet iteration tie-break becomes entity_id asc."""
    from pyspark.ml.functions import vector_to_array

    feats = scope_features(links, gaz)
    scored = model.transform(feats).withColumn(
        "_p", F.element_at(vector_to_array("probability"), 2))
    return _pick_top(scored, [F.desc("_p"), F.asc("entity_id")])


# ------------------------------------ k-nearest-neighbor detector
# KNearestNeighborScopeDetector.java:56-334 (palladian-experimental):
# index training texts with their coordinate; a query's scope is the
# center-of-minimum-distance of the top-k most similar training docs'
# coordinates, each replicated round(10 * score / maxScore) times.
# The reference scores with a Lucene index; the port builds the same
# thing Spark-side — an inverted index of TF-IDF postings over the
# char-gram terms, broadcast to the workers — so queries sharing NO
# term with a training document score 0 exactly like a Lucene boolean
# query with no hits (cosine is the documented stand-in for Lucene's
# TF-IDF-family practical scoring).

from collections import Counter as _Counter
from dataclasses import dataclass as _dataclass


@_dataclass
class KnnScopeModel:
    fs: FeatureSetting
    postings: dict          # term -> list[(doc_idx, tf)]
    coords: list            # [(lat, lon)] per doc
    idf: dict               # term -> Lucene classic idf
    lengths: list = None    # per-doc token counts (length norm)


def train_knn_scope(docs: DataFrame, fs: FeatureSetting | None = None,
                    text_col: str = "text", lat_col: str = "lat",
                    lon_col: str = "lon") -> KnnScopeModel:
    """NearestNeighborScopeDetectorLearner.train (:174-208): every
    coordinate-bearing training document becomes one indexed vector.
    Term extraction runs distributed (one Arrow pass); the inverted
    index is built driver-side and broadcast — scope training corpora
    are vocabulary-sized next to the crawl, the same broadcast-model
    assumption the dictionary scope detector makes. idf follows the
    Lucene-4 ClassicSimilarity the reference's RAMDirectory index
    scores with: 1 + ln(N / (df + 1))."""
    fs = fs or SCOPE_FEATURE_SETTING
    pts = docs.where(F.col(lat_col).isNotNull()
                     & F.col(lon_col).isNotNull())

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def terms_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: preprocess(t or "", fs))

    rows = (pts.select(terms_udf(text_col).alias("_t"), lat_col, lon_col)
            .collect())
    if not rows:
        raise ValueError("no coordinate-bearing training documents")
    n = len(rows)
    tfs = [_Counter(r["_t"]) for r in rows]
    df_counts: _Counter = _Counter()
    for tf in tfs:
        df_counts.update(tf.keys())
    idf = {t: math.log(n / (c + 1.0)) + 1.0
           for t, c in df_counts.items()}
    postings: dict = {}
    lengths: list[int] = []
    for i, tf in enumerate(tfs):
        lengths.append(sum(tf.values()))
        for t, cnt in tf.items():
            postings.setdefault(t, []).append((i, cnt))
    coords = [(r[lat_col], r[lon_col]) for r in rows]
    return KnnScopeModel(fs, postings, coords, idf, lengths)


def _float_to_byte315(f: float) -> int:
    """Lucene SmallFloat.floatToByte315 (3 mantissa bits, zero
    exponent 15) — the single-byte norm encoding DefaultSimilarity
    writes into a Lucene 4 index."""
    import struct
    bits = struct.unpack(">i", struct.pack(">f", f))[0]
    smallfloat = bits >> 21
    if smallfloat <= ((63 - 15) << 3):
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 255
    return (smallfloat - ((63 - 15) << 3)) & 0xFF


def _byte315_to_float(b: int) -> float:
    """Lucene SmallFloat.byte315ToFloat — the decode half (what
    ClassicSimilarity's NORM_TABLE holds at search time)."""
    import struct
    if b == 0:
        return 0.0
    bits = ((b & 0xFF) << 21) + ((63 - 15) << 24)
    return struct.unpack(">f", struct.pack(">i", bits))[0]


def _decoded_norm(num_terms: int) -> float:
    """DefaultSimilarity.lengthNorm -> encodeNormValue ->
    decodeNormValue round trip: (float)(1/sqrt(numTerms)) stored as
    one byte (±12% quantization steps), decoded back at scoring
    time.  The struct float32 pack IS the Java (float) cast."""
    return _byte315_to_float(_float_to_byte315(
        1.0 / math.sqrt(num_terms)))


def knn_scope(docs: DataFrame, model: KnnScopeModel, k: int = 3,
              text_col: str = "text", key_col: str = "url") -> DataFrame:
    """KNearestNeighborScopeDetector.getScope (:210-246): the
    BOOLEAN_QUERY_CREATOR adds one SHOULD TermQuery PER TOKEN
    OCCURRENCE (:251-271 — duplicates included, so query-term
    frequency multiplies), scored with Lucene-4 ClassicSimilarity
    (sqrt(tf) * idf^2 per clause, 1/sqrt(dl) length norm QUANTIZED
    through the index's single-byte norm encoding — SmallFloat
    .floatToByte315/byte315ToFloat, ~±12% steps, exactly what a real
    Lucene 4 index stores — and the matched-clauses/total-clauses
    coord factor; queryNorm is constant across documents and
    therefore skipped — score RATIOS, which the replication factor
    consumes, are unchanged). Top-k coordinates
    replicate round(10*score/maxScore) times and answer as their
    center-of-minimum-distance; zero hits -> no row values (the
    reference returns null). One Arrow pass, no shuffle."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(model)
    out_type = T.StructType([T.StructField("lat", T.DoubleType()),
                             T.StructField("lon", T.DoubleType())])

    @F.pandas_udf(out_type)
    def scope_udf(texts: pd.Series) -> pd.DataFrame:
        m = bc.value

        def one(t):
            clauses = preprocess(t or "", m.fs)
            if not clauses:
                return None, None
            q = _Counter(clauses)
            total_clauses = len(clauses)
            scores: dict[int, float] = {}
            matched: dict[int, int] = {}
            for term, q_cnt in q.items():
                w = m.idf.get(term, 0.0) ** 2 * q_cnt
                for i, tf in m.postings.get(term, ()):
                    scores[i] = scores.get(i, 0.0) \
                        + math.sqrt(tf) * w
                    matched[i] = matched.get(i, 0) + q_cnt
            if not scores:
                return None, None
            for i in scores:
                scores[i] *= (matched[i] / total_clauses) \
                    * _decoded_norm(m.lengths[i] or 1)
            top = sorted(scores.items(),
                         key=lambda kv: (-kv[1], kv[0]))[:k]
            max_score = top[0][1]
            if max_score <= 0:
                return None, None
            pts = []
            for i, s in top:
                factor = int(round(10 * s / max_score))
                pts.extend([m.coords[i]] * max(0, factor))
            if not pts:
                return None, None
            return center_of_minimum_distance(pts)

        rows = [one(t) for t in texts]
        return pd.DataFrame(rows, columns=["lat", "lon"])

    res = docs.select(key_col, scope_udf(text_col).alias("_s"))
    return res.select(key_col, F.col("_s.lat").alias("lat"),
                      F.col("_s.lon").alias("lon"))
