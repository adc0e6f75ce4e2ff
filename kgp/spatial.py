"""Spatial box / nearest-neighbour lookup — the distributed twin of
the reference's Spatial2dIdMap (palladian-commons helper/geo/
Spatial2dIdMap.java: two sorted coordinate arrays + binary-search
range scan, an "alternative to R-Trees") and its geo primitives:

- GeoCoordinate.getBoundingBox (AbstractGeoCoordinate.java:60-68):
  lat +- d/111.2, lng +- d/|cos(lat)*111.2| — ported verbatim,
  including the fixed 111.2 km/degree constant.
- GeoUtils.approximateDistance (GeoUtils.java): equirectangular
  approximation sqrt(x²+y²)*R with x scaled by cos of the MEAN
  latitude — ported verbatim (EARTH_RADIUS_KM = 6371).
- findInBox: points inside [lat1,lat2] x [lng1,lng2].  The reference
  slices its sorted arrays with findIndexBefore, whose boundary
  behavior is an artifact of binary-search landing inside an
  in-memory layout (the element just below lat1 can leak in); the
  distributed twin implements the evident INCLUSIVE-box semantics —
  documented deviation.
- closestTo (Spatial2dIdMap.java:78-98): bounding box -> box lookup
  -> sort by approximateDistance.  The reference passes
  boundingBox[2] for BOTH lat2 and lng2 (the lng upper bound is the
  LATITUDE upper bound — an as-written bug); the local twin keeps it
  behind `reference_bug=True` and the distributed stage uses the
  evident intent (boundingBox[3]).
- put() normalizes coordinates via GeoUtils.normalizeLatitude/
  normalizeLongitude — reused from kgp.geo.

Scale shape (10^12 points):
- Points are bucketed ONCE onto a fixed-degree grid (floor(lat/c),
  floor(lng/c)); each query box explodes to the cells it covers and
  the candidate lookup is a pure EQUI-join on the cell key — never a
  theta-join, never a cross product.  Cell fan-out is bounded by
  box_size/cell_size; the exact box filter runs on the joined rows.
- Skew: a hot query cell only duplicates the QUERY row per cell, not
  the point table; cell keys are high-cardinality, AQE handles
  residual imbalance.
- All math is JVM column expressions; no Python row path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgp.geo import normalize_latitude, normalize_longitude

EARTH_RADIUS_KM = 6371.0
KM_PER_DEGREE = 111.2          # AbstractGeoCoordinate.java:63
DEFAULT_CELL_DEG = 1.0


# ------------------------------------------------ pure-python twins


def bounding_box(lat: float, lng: float,
                 distance_km: float) -> tuple[float, float, float, float]:
    """AbstractGeoCoordinate.getBoundingBox port -> (lat1, lng1,
    lat2, lng2)."""
    lat1 = lat - distance_km / KM_PER_DEGREE
    lat2 = lat + distance_km / KM_PER_DEGREE
    span = distance_km / abs(math.cos(math.radians(lat)) * KM_PER_DEGREE)
    return lat1, lng - span, lat2, lng + span


def approximate_distance(lat1: float, lng1: float,
                         lat2: float, lng2: float) -> float:
    """GeoUtils.approximateDistance port (km)."""
    r1, r2 = math.radians(lat1), math.radians(lat2)
    x = (math.radians(lng2) - math.radians(lng1)) * \
        math.cos((r1 + r2) / 2)
    y = r2 - r1
    return math.sqrt(x * x + y * y) * EARTH_RADIUS_KM


class Spatial2dIdMap:
    """Local twin of the reference structure (put/sort/findInBox/
    closestTo) with inclusive box semantics; used as the oracle in
    tests and for driver-side probe sets."""

    def __init__(self) -> None:
        self._rows: list[tuple[int, float, float]] = []

    def put(self, lat: float, lng: float, id_: int) -> None:
        self._rows.append((id_, normalize_latitude(lat),
                           normalize_longitude(lng)))

    def find_in_box(self, lat1: float, lng1: float, lat2: float,
                    lng2: float) -> set[int]:
        return {i for i, la, lo in self._rows
                if lat1 <= la <= lat2 and lng1 <= lo <= lng2}

    def closest_to(self, lat: float, lng: float, distance_m: int,
                   reference_bug: bool = True) -> list[int]:
        """Spatial2dIdMap.closestTo: ids in the bounding box sorted
        by approximateDistance.  reference_bug=True reproduces the
        as-written lng2 := lat2 argument swap
        (Spatial2dIdMap.java:84)."""
        box = bounding_box(lat, lng, distance_m / 1000.0)
        lng2 = box[2] if reference_bug else box[3]
        ids = self.find_in_box(box[0], box[1], box[2], lng2)
        rows = [(i, la, lo) for i, la, lo in self._rows if i in ids]
        rows.sort(key=lambda r: approximate_distance(r[1], r[2],
                                                     lat, lng))
        return [i for i, _, _ in rows]


# ---------------------------------------------------- Spark stages


def approximate_distance_col(lat1: Column, lng1: Column,
                             lat2: Column, lng2: Column) -> Column:
    r1, r2 = F.radians(lat1), F.radians(lat2)
    x = (F.radians(lng2) - F.radians(lng1)) * F.cos((r1 + r2) / 2)
    y = r2 - r1
    return F.sqrt(x * x + y * y) * F.lit(EARTH_RADIUS_KM)


def _cells(lat1: Column, lng1: Column, lat2: Column, lng2: Column,
           cell_deg: float) -> Column:
    """Array of (clat, clng) struct cells covering the box."""
    c = F.lit(cell_deg)
    lats = F.sequence(F.floor(lat1 / c), F.floor(lat2 / c))
    lngs = F.sequence(F.floor(lng1 / c), F.floor(lng2 / c))
    return F.flatten(F.transform(
        lats, lambda la: F.transform(
            lngs, lambda lo: F.struct(la.alias("clat"),
                                      lo.alias("clng")))))


def find_in_box_stage(points: DataFrame, queries: DataFrame,
                      cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """Distributed findInBox: `points`(id, lat, lng) x
    `queries`(qid, lat1, lng1, lat2, lng2) -> (qid, id, lat, lng).
    Grid-cell equi-join + exact inclusive box filter."""
    c = F.lit(cell_deg)
    pts = points.select(
        "id", "lat", "lng",
        F.floor(F.col("lat") / c).alias("clat"),
        F.floor(F.col("lng") / c).alias("clng"))
    q = queries.select(
        "qid", "lat1", "lng1", "lat2", "lng2",
        F.explode(_cells(F.col("lat1"), F.col("lng1"),
                         F.col("lat2"), F.col("lng2"),
                         cell_deg)).alias("cell"))
    q = q.select("qid", "lat1", "lng1", "lat2", "lng2",
                 F.col("cell.clat").alias("clat"),
                 F.col("cell.clng").alias("clng"))
    return (q.join(pts, ["clat", "clng"])
            .where(F.col("lat").between(F.col("lat1"), F.col("lat2"))
                   & F.col("lng").between(F.col("lng1"),
                                          F.col("lng2")))
            .select("qid", "id", "lat", "lng"))


def closest_to_stage(points: DataFrame, queries: DataFrame,
                     distance_km: float,
                     cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """Distributed closestTo (evident-intent box, see module doc):
    `queries`(qid, lat, lng) -> (qid, id, dist_km, rank) within the
    getBoundingBox of each query, ranked by approximateDistance with
    an id tiebreak."""
    from pyspark.sql import Window
    d = F.lit(distance_km)
    span = d / F.abs(F.cos(F.radians("lat")) * F.lit(KM_PER_DEGREE))
    q = queries.select(
        "qid", F.col("lat").alias("qlat"), F.col("lng").alias("qlng"),
        (F.col("lat") - d / F.lit(KM_PER_DEGREE)).alias("lat1"),
        (F.col("lat") + d / F.lit(KM_PER_DEGREE)).alias("lat2"),
        (F.col("lng") - span).alias("lng1"),
        (F.col("lng") + span).alias("lng2"))
    hits = find_in_box_stage(
        points, q.select("qid", "lat1", "lng1", "lat2", "lng2"),
        cell_deg)
    w = Window.partitionBy("qid").orderBy("dist_km", "id")
    return (hits
            .join(q.select("qid", "qlat", "qlng"), "qid")
            .withColumn("dist_km", F.round(approximate_distance_col(
                F.col("lat"), F.col("lng"),
                F.col("qlat"), F.col("qlng")), 9))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .select("qid", "id", "dist_km", "rank"))
