"""Protected Planet (WDPA) gazetteer importer — port of
extraction/location/sources/importers/ProtectedPlanetImporter.java:

- importLocations (:60-105): quote-aware CSV split (',' split char,
  '"' quote char via DelimitedStringHelper.splitLine); the header
  line (lineNumber == 0) and any line that does not split into
  EXACTLY 26 parts are skipped; id = int(parts[0]), primaryName =
  parts[5], parts[6] becomes an alternative name only when it differs
  from the primary; every location gets type LANDMARK; coordinate =
  extractSingleCoordinate(parts[25]).
- extractSingleCoordinate (:108-127): strip every ``<...>`` tag to a
  space, split on spaces, each non-empty token is "lng,lat"; the
  pairs are collected into a HashSet (exact-double dedup) and reduced
  with GeoUtils.getMidpoint; ANY parse error -> null coordinate.

Parity note: GeoUtils.getMidpoint (GeoUtils.java:61-87) snaps to
(0,0) when ANY averaged cartesian axis is < 1e-9 (``||``, a reference
quirk); kgp.geo.midpoint uses the all-axes test (the evident intent).
The quirk only fires for midpoints sitting exactly on a coordinate
plane, which real protected areas never do; the gate's synthetic
areas are generated away from the degenerate planes so both
definitions agree bit-for-bit there.

Spark shape: the importer is ONE mapInPandas pass over the raw line
table (the quote-aware split + KML walk are per-row string work — the
honest Arrow-batch case), emitting the typed gazetteer row; no
shuffle, no collect.  The driver gate synthesizes deterministic
WDPA-style CSV lines JVM-side (pure column expressions over the
orders table), so the whole round trip
``generate -> parse -> midpoint`` is provable closed-form in the
DuckDB oracle.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.datasetops import split_delimited_line
from kgp.geo import midpoint

WDPA_COLUMNS = 26


# ------------------------------------------------------------ pure twins


def extract_single_coordinate(kml: str) -> tuple[float, float] | None:
    """extractSingleCoordinate twin (:108-127): tags -> spaces, split,
    "lng,lat" pairs deduped exactly, geographic midpoint; any error
    (missing lat part, non-numeric, out-of-range coordinate, zero
    pairs) -> None like the reference's catch-all."""
    try:
        removed = _strip_tags(kml)
        pairs = set()
        for token in removed.split(" "):
            if token:
                lng_s, lat_s = token.split(",")[0], token.split(",")[1]
                lat, lng = float(lat_s), float(lng_s)
                if math.isnan(lat) or math.isnan(lng):
                    raise ValueError("NaN coordinate")
                if not (-90.0 <= lat <= 90.0 and -180.0 <= lng <= 180.0):
                    # GeoUtils.validateCoordinateRange throws
                    raise ValueError("out of range")
                pairs.add((lat, lng))
        if not pairs:
            raise ValueError("empty")
        return midpoint(sorted(pairs))
    except (ValueError, IndexError):
        return None


def _strip_tags(kml: str) -> str:
    """replaceAll("<[^>]*>", " ") — each tag becomes ONE space."""
    out = []
    i = 0
    while i < len(kml):
        if kml[i] == "<":
            j = kml.find(">", i + 1)
            if j == -1:
                out.append(kml[i:])
                break
            out.append(" ")
            i = j + 1
        else:
            out.append(kml[i])
            i += 1
    return "".join(out)


def parse_wdpa_line(line: str, line_number: int) -> dict | None:
    """importLocations per-line twin (:68-92): header + malformed
    (!= 26 parts after quote-aware split) lines skipped."""
    parts = split_delimited_line(line, ",", '"')
    if line_number == 0 or parts is None or len(parts) != WDPA_COLUMNS:
        return None
    try:
        area_id = int(parts[0])
    except ValueError:
        # the reference lets NumberFormatException kill the import; a
        # poison line must not kill a web-scale job -> skip instead
        return None
    name, orig_name = parts[5], parts[6]
    coord = extract_single_coordinate(parts[25])
    return {
        "id": area_id,
        "primary_name": name,
        "alt_names": [orig_name] if orig_name != name else [],
        "type": "LANDMARK",
        "lat": coord[0] if coord else None,
        "lng": coord[1] if coord else None,
    }


# ------------------------------------------------------------ Spark stage

_WDPA_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("primary_name", T.StringType()),
    T.StructField("alt_names", T.ArrayType(T.StringType())),
    T.StructField("type", T.StringType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lng", T.DoubleType()),
])


def import_protected_planet(lines: DataFrame,
                            line_col: str = "line",
                            line_number_col: str = "line_number"
                            ) -> DataFrame:
    """Distributed importer: one mapInPandas pass over (line,
    line_number) rows -> gazetteer rows.  Only the two input columns
    are read (column pruning holds); rows that the reference skips
    simply do not emit."""
    pruned = lines.select(F.col(line_col).alias("line"),
                          F.col(line_number_col).alias("line_number"))

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line, num in zip(pdf["line"], pdf["line_number"]):
                rec = parse_wdpa_line(line, int(num))
                if rec is not None:
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WDPA_SCHEMA.fields])

    return pruned.mapInPandas(parse, schema=_WDPA_SCHEMA)


def read_protected_planet(spark: SparkSession, path: str) -> DataFrame:
    """File entry point: spark.read.text (splittable) + a line-number
    stamp.  The reference keys the header skip on lineNumber == 0
    only; data files put the header in the first line of the file, so
    the stamp only needs to be 0 exactly there — we mark the line
    equal to the file's header text instead of a global sort, keeping
    the scan shuffle-free."""
    raw = spark.read.text(path)
    first = raw.limit(1).collect()
    header = first[0][0] if first else None
    lines = raw.select(
        F.col("value").alias("line"),
        F.when(F.col("value") == F.lit(header), F.lit(0))
         .otherwise(F.lit(1)).alias("line_number"))
    return import_protected_planet(lines)


# ------------------------------------------------------------ gate stage


def synthesize_wdpa_lines(orders: DataFrame, areas: int = 400,
                          points: int = 8) -> DataFrame:
    """Deterministic WDPA-style CSV lines from the orders table (no
    external data): area k (k = o_orderkey % areas) gets `points`
    polygon vertices at lat = ((k*7 + j*13) % 120)/2.0 - 30 + j/100,
    lng = ((k*11 + j*17) % 300)/2.0 - 75 + j/100 (away from the
    degenerate midpoint planes), with vertex j == points-1 repeating
    vertex 0 (closing the ring) so the HashSet dedup is exercised.
    Names embed a quoted comma ("Area k, Reserve") so the quote-aware
    split is on the oracle-checked path.  Pure column expressions —
    the generator itself is JVM-side."""
    ks = (orders.select((F.col("o_orderkey") % areas).alias("k"))
                .distinct())
    j = F.sequence(F.lit(0), F.lit(points - 1))
    pair = (
        "concat("
        "  cast(((k*11 + jj*17) % 300)/2.0 - 75 + jj/100.0 as string),"
        "  ',',"
        "  cast(((k*7 + jj*13) % 120)/2.0 - 30 + jj/100.0 as string))")
    coords = F.expr(
        "array_join(transform(sequence(0, {p} - 1), jj -> "
        "CASE WHEN jj = {p} - 1 THEN {first} ELSE {pair} END), ' ')"
        .format(p=points, pair=pair,
                first=pair.replace("jj", "0")))
    # the geometry field carries commas, so the WDPA CSV quotes it
    kml = F.concat(
        F.lit('"<Polygon><outerBoundaryIs><LinearRing><coordinates>'),
        coords,
        F.lit('</coordinates></LinearRing></outerBoundaryIs></Polygon>"'))
    # parts so far: id(1) + 4 filler + name + orig = 7; the KML is
    # part 25 (the 26th), so exactly 18 filler parts sit between
    filler = F.array_join(
        F.transform(F.sequence(F.lit(7), F.lit(WDPA_COLUMNS - 2)),
                    lambda i: F.concat(F.lit("f"), i.cast("string"))),
        ",")
    line = F.concat(
        F.col("k").cast("string"), F.lit(","),
        F.lit("f1,f2,f3,f4,"),
        F.concat(F.lit('"Area '), F.col("k").cast("string"),
                 F.lit(', Reserve"')), F.lit(","),
        # orig name differs from primary for every 3rd area
        F.when(F.col("k") % 3 == 0,
               F.concat(F.lit('"Reserva '), F.col("k").cast("string"),
                        F.lit('"')))
         .otherwise(F.concat(F.lit('"Area '), F.col("k").cast("string"),
                             F.lit(', Reserve"'))), F.lit(","),
        filler, F.lit(","), kml)
    return ks.select(line.alias("line"),
                     F.lit(1).alias("line_number"),
                     F.col("k"))


def protected_areas_stage(orders: DataFrame, areas: int = 400,
                          points: int = 8) -> DataFrame:
    """Gate: synthesize -> parse -> midpoint, arrays serialized for
    the driver's pandas-sort hasher, floats rounded with the signed-
    zero normalization house rule."""
    lines = synthesize_wdpa_lines(orders, areas=areas, points=points)
    parsed = import_protected_planet(lines)
    return (parsed
            .select("id", "primary_name",
                    F.array_join("alt_names", "|").alias("alt_names"),
                    "type",
                    (F.round("lat", 6) + 0.0).alias("lat"),
                    (F.round("lng", 6) + 0.0).alias("lng"))
            .orderBy("id"))
