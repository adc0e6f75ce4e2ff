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
