"""Geo primitives — GeoUtils port.

Semantics re-derived from
/root/reference/palladian-commons/src/main/java/ws/palladian/helper/geo/GeoUtils.java:34-81
and AbstractGeoCoordinate.distance (haversine, R = 6371 km).
Pure functions (math only) — used inside the linker's Arrow batches
and unit tests.
"""

from __future__ import annotations

import math

EARTH_RADIUS_KM = 6371.0


def distance_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Great-circle (haversine) distance in km."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(a)))


def midpoint(coords: list[tuple[float, float]]) -> tuple[float, float]:
    """Geographic midpoint (GeoUtils.getMidpoint, :61-87): average of
    the unit cartesian vectors, converted back to lat/lon."""
    if not coords:
        raise ValueError("coords must not be empty")
    if len(coords) == 1:
        return coords[0]
    x = y = z = 0.0
    for lat, lon in coords:
        la, lo = math.radians(lat), math.radians(lon)
        x += math.cos(la) * math.cos(lo)
        y += math.cos(la) * math.sin(lo)
        z += math.sin(la)
    n = len(coords)
    x, y, z = x / n, y / n, z / n
    if abs(x) < 1e-9 and abs(y) < 1e-9 and abs(z) < 1e-9:
        return 0.0, 0.0
    lon = math.atan2(y, x)
    hyp = math.sqrt(x * x + y * y)
    lat = math.atan2(z, hyp)
    return math.degrees(lat), math.degrees(lon)


def normalize_longitude(lon: float) -> float:
    """GeoUtils.normalizeLongitude: wrap into [-180, 180]."""
    return (lon + 180.0) % 360.0 - 180.0 if lon != 180.0 else 180.0


def normalize_latitude(lat: float) -> float:
    """GeoUtils.normalizeLatitude: clamp into [-90, 90]."""
    return max(-90.0, min(90.0, lat))


def destination(lat: float, lon: float, dist_km: float,
                bearing_deg: float) -> tuple[float, float]:
    """Destination point at distance/bearing
    (AbstractGeoCoordinate.getCoordinate, :114-127)."""
    la = math.radians(lat)
    lo = math.radians(lon)
    b = math.radians(bearing_deg)
    d = dist_km / EARTH_RADIUS_KM
    la2 = math.asin(math.sin(la) * math.cos(d)
                    + math.cos(la) * math.sin(d) * math.cos(b))
    lo2 = lo + math.atan2(math.sin(b) * math.sin(d) * math.cos(la),
                          math.cos(d) - math.sin(la) * math.sin(la2))
    return math.degrees(la2), normalize_longitude(math.degrees(lo2))


def center_of_minimum_distance(coords: list[tuple[float, float]]
                               ) -> tuple[float, float]:
    """GeoUtils.getCenterOfMinimumDistance (:104-159), the geomidpoint
    .com hill-descent: start from the geographic midpoint, try every
    input point, then walk 8 compass test points with a halving step
    until the step falls under 2e-8 earth radii."""
    if not coords:
        raise ValueError("coords must not be empty")
    if len(coords) == 1:
        return coords[0]

    def dist_sum(p: tuple[float, float]) -> float:
        return sum(distance_km(p[0], p[1], la, lo) for la, lo in coords)

    current = midpoint(coords)
    minimum = dist_sum(current)
    for cand in coords:
        d = dist_sum(cand)
        if d < minimum:
            minimum = d
            current = cand
    test = EARTH_RADIUS_KM * math.pi / 2
    found, iterations = False, 0
    while iterations < 5000 and (found or test >= 2.0e-8 * EARTH_RADIUS_KM):
        iterations += 1
        best_d, best_p = math.inf, None
        for i in range(8):
            p = destination(current[0], current[1], test, i * 45)
            d = dist_sum(p)
            if d < best_d:
                best_d, best_p = d, p
        if best_d < minimum:
            current, minimum, found = best_p, best_d, True
        else:
            test /= 2
            found = False
    return current


def largest_distance(coords: list[tuple[float, float]]) -> float:
    """Max pairwise distance (LocationSet.largestDistance semantics);
    0 for fewer than two coordinates."""
    best = 0.0
    for i in range(len(coords)):
        for j in range(i + 1, len(coords)):
            d = distance_km(*coords[i], *coords[j])
            if d > best:
                best = d
    return best


# ---------------------------------------------- DMS / coordinate tagging
# CoordinateTagger + GeoUtils.parseDms port
# (/root/reference/palladian-core/src/main/java/ws/palladian/extraction/location/CoordinateTagger.java:30-90,
#  /root/reference/palladian-commons/src/main/java/ws/palladian/helper/geo/GeoUtils.java:28-31,186-203)

import re as _re
from typing import NamedTuple as _NamedTuple

DMS = (r"([-+]?\d{1,3}(?:\.\d{1,10})?)[°ºd:]"
       r"(?:\s?(\d{1,2}(?:\.\d{1,10})?))?['′:]?"
       r"(?:\s?(\d{1,2}(?:\.\d{1,10})?))?(?:\"|″|'')?"
       r"(?:\s?(N|S|W|E|North|South|West|East))?")
_LEFT, _RIGHT = r"(?<!\w)", r"(?!\w)"
_DEG = r"([-+]?\d{1,3}\.\d{1,10})([NSWE])?"
_SEP = r"(?:,\s?|\s)"
_PATTERN_DEG = _re.compile(_LEFT + "(" + _DEG + ")" + _SEP
                           + "(" + _DEG + ")" + _RIGHT)
_PATTERN_DMS = _re.compile(_LEFT + "(" + DMS + ")" + _SEP
                           + "(" + DMS + ")" + _RIGHT)
_PARSE_DMS = _re.compile(DMS)


def parse_dms(dms: str) -> float:
    """GeoUtils.parseDms port: degrees[°ºd:] minutes seconds with an
    optional hemisphere word deciding the sign."""
    m = _PARSE_DMS.fullmatch(dms.strip())
    if not m:
        raise ValueError(f"not a DMS expression: {dms!r}")
    degrees = float(m.group(1))
    ws = m.group(4)
    if ws is not None:
        sign = -1 if ws in ("W", "S", "West", "South") else 1
    else:
        sign = -1 if m.group(1).startswith("-") else 1
    minutes = float(m.group(2)) if m.group(2) else 0.0
    seconds = float(m.group(3)) if m.group(3) else 0.0
    return sign * (abs(degrees) + minutes / 60.0 + seconds / 3600.0)


def is_valid_coordinate(lat: float, lon: float) -> bool:
    return -90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0


class CoordinateAnnotation(_NamedTuple):
    start: int
    value: str
    lat: float
    lon: float


def tag_coordinates(text: str) -> list[CoordinateAnnotation]:
    """CoordinateTagger.getAnnotations port: decimal-degree pairs
    (optionally hemisphere-suffixed) and DMS pairs."""
    out: list[CoordinateAnnotation] = []
    for m in _PATTERN_DEG.finditer(text):
        lat, lon = float(m.group(2)), float(m.group(5))
        if m.group(3) == "S":
            lat = -lat
        if m.group(6) == "W":
            lon = -lon
        if is_valid_coordinate(lat, lon):
            out.append(CoordinateAnnotation(m.start(), m.group(),
                                            lat, lon))
    for m in _PATTERN_DMS.finditer(text):
        try:
            lat, lon = parse_dms(m.group(1)), parse_dms(m.group(6))
        except ValueError:
            continue
        if is_valid_coordinate(lat, lon):
            out.append(CoordinateAnnotation(m.start(), m.group(),
                                            lat, lon))
    return out


def _dms_parts(decimal: float) -> tuple[int, int, int]:
    """AbstractGeoCoordinate.getParts (:86-100): truncating int casts
    per stage."""
    temp = abs(decimal)
    deg = int(temp)
    temp = (temp % 1) * 60
    minutes = int(temp)
    temp = (temp % 1) * 60
    seconds = int(temp)
    return deg, minutes, seconds


def _format_dms(parts: tuple[int, int, int], suffix: str) -> str:
    """AbstractGeoCoordinate.formatDms (:73-84) — kept as-written:
    the minute part prints only when minutes AND seconds are both
    non-zero (the outer condition tests both, making the inner
    seconds check redundant)."""
    out = f"{parts[0]}°"
    if parts[1] != 0 and parts[2] != 0:
        out += f"{parts[1]}′"
        if parts[2] != 0:
            out += f"{parts[2]}″"
    return out + suffix


def to_dms_string(lat: float, lng: float) -> str:
    """AbstractGeoCoordinate.toDmsString (:43-64):
    '51°1′59″N,13°43′59″E'; zero stays bare ('0°'), sign picks the
    hemisphere suffix."""
    lat_suffix = "N" if lat > 0 else ("S" if lat < 0 else "")
    lng_suffix = "E" if lng > 0 else ("W" if lng < 0 else "")
    return (_format_dms(_dms_parts(lat), lat_suffix) + ","
            + _format_dms(_dms_parts(lng), lng_suffix))
