"""Location / LocationSet scalar twins + LocationFilters — ports of
the reference's location collection surface used by the heuristic and
feature-based disambiguators (palladian-core extraction/location/):

- AbstractLocation.java:25-115 — descendantOf (id in ancestor list),
  childOf (FIRST ancestor id), commonName (normalized-name set
  intersection), collectAlternativeNames (normalizeName over primary +
  alternatives), hasName (accent-stripped case-insensitive equality;
  an alternative name matches when its language is null or in the
  allowed set).
- LocationExtractorUtils.normalizeName (:24-33) — dotted-acronym
  de-dotting, trademark-symbol scrub, whitespace collapse, the
  'US' -> 'U.S.' special case.
- LocationSet.java:22-235 — where/whereConditionally filtering,
  midpoint/center, largestDistance (ANY member lacking a coordinate
  in a multi-element set -> EARTH_MAX_DISTANCE_KM), min/max distance,
  maxHierarchyDepth, first() = smallest id.
- LocationFilters.java:17-214 — childOf/descendantOf/ancestorOf/
  siblingOf/parentOf/radius (bounding-box prefilter then STRICT <
  distance)/population/type/coordinate filters.

These twins back the driver-side steps of kgp.linker / kgp.scope /
kgp.disambig_ml, which carry the same semantics as column
expressions; the distributed paths are pinned by the gate queries,
this module by the harvested LocationSetTest/AbstractLocationTest.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

from kgp.geo import distance_km, largest_distance
from kgp.spatial import bounding_box

EARTH_MAX_DISTANCE_KM = 40075.16 * 0.5     # GeoUtils.java:37-40


def normalize_name(value: str) -> str:
    """LocationExtractorUtils.normalizeName (:24-33)."""
    if re.fullmatch(r"(?:[A-Z]\.)+", value):
        value = value.replace(".", "")
    value = re.sub(r"[©®™]", "", value)
    value = re.sub(r"\s+", " ", value)
    if value == "US":
        value = "U.S."
    return value


def _strip_accents(s: str) -> str:
    """StringUtils.stripAccents: NFD decompose, drop combining marks."""
    return "".join(c for c in unicodedata.normalize("NFD", s)
                   if not unicodedata.combining(c))


def _equal_name(name1: str, name2: str) -> bool:
    return (_strip_accents(name1).lower()
            == _strip_accents(name2).lower())


@dataclass(frozen=True)
class Loc:
    """ImmutableLocation twin: identity (hashCode/equals) is the id."""
    id: int
    name: str
    type: str = "UNDETERMINED"
    coordinate: tuple[float, float] | None = None      # (lat, lng)
    population: int | None = None
    ancestor_ids: tuple[int, ...] = ()
    alt_names: tuple[tuple[str, str | None], ...] = ()  # (name, lang)

    def __hash__(self):
        return self.id

    def __eq__(self, other):
        return isinstance(other, Loc) and other.id == self.id

    def descendant_of(self, other: "Loc") -> bool:
        return other.id in self.ancestor_ids

    def child_of(self, other: "Loc") -> bool:
        return bool(self.ancestor_ids) \
            and self.ancestor_ids[0] == other.id

    def collect_alternative_names(self) -> set[str]:
        names = {normalize_name(self.name)}
        names.update(normalize_name(n) for n, _ in self.alt_names)
        return names

    def common_name(self, other: "Loc") -> bool:
        return bool(self.collect_alternative_names()
                    & other.collect_alternative_names())

    def has_name(self, name: str, languages: set[str]) -> bool:
        if _equal_name(self.name, name):
            return True
        for alt, lang in self.alt_names:
            if _equal_name(alt, name) and (lang is None
                                           or lang in languages):
                return True
        return False


# ------------------------------------------------- LocationFilters


def child_of(location: Loc):
    return lambda item: item.child_of(location)


def descendant_of(location: Loc):
    return lambda item: item.descendant_of(location)


def ancestor_of(location: Loc):
    return lambda item: location.descendant_of(item)


def sibling_of(location: Loc):
    return lambda item: item.ancestor_ids == location.ancestor_ids


def parent_of(location: Loc):
    return lambda item: location.child_of(item)


def radius(center: tuple[float, float], distance: float):
    """Bounding-box prefilter, then STRICT < on the exact distance
    (LocationFilters.java:183-213)."""
    lat_min, lng_min, lat_max, lng_max = bounding_box(
        center[0], center[1], distance)

    def test(item: Loc) -> bool:
        if item.coordinate is None:
            return False
        lat, lng = item.coordinate
        if lng < lng_min or lng > lng_max:
            return False
        if lat < lat_min or lat > lat_max:
            return False
        return distance_km(lat, lng, center[0], center[1]) < distance

    return test


def population(min_population: int):
    return lambda item: (item.population is not None
                         and item.population >= min_population)


def of_type(*types: str):
    allowed = set(types)
    return lambda item: item.type in allowed


def has_coordinate():
    return lambda item: item.coordinate is not None


def not_equal(*locations: Loc):
    excluded = set(locations)
    return lambda item: item not in excluded


# ---------------------------------------------------- LocationSet


class LocationSet:
    """LocationSet.java twin — a SET of locations keyed by id."""

    def __init__(self, locations):
        by_id = {loc.id: loc for loc in locations}
        self._locations = set(by_id.values())

    def where(self, predicate) -> "LocationSet":
        return LocationSet(
            loc for loc in self._locations if predicate(loc))

    def where_conditionally(self, predicate) -> "LocationSet":
        temp = self.where(predicate)
        return temp if temp.size() > 0 else self

    def coordinates(self) -> set[tuple[float, float]]:
        return {loc.coordinate for loc in self._locations
                if loc.coordinate is not None}

    def largest_distance(self) -> float:
        coords = self.coordinates()
        if self.size() > 1 and self.size() - len(coords) > 0:
            return EARTH_MAX_DISTANCE_KM
        return largest_distance(sorted(coords))

    def min_distance(self, coordinate: tuple[float, float]) -> float:
        best = EARTH_MAX_DISTANCE_KM
        for lat, lng in self.coordinates():
            best = min(best, distance_km(lat, lng, *coordinate))
        return best

    def max_distance(self, coordinate: tuple[float, float]) -> float:
        best = 0.0
        for lat, lng in self.coordinates():
            best = max(best, distance_km(lat, lng, *coordinate))
        return best

    def max_hierarchy_depth(self) -> int:
        depth = 1
        for loc in self._locations:
            depth = max(depth, len(loc.ancestor_ids))
        return depth

    def contains(self, location: Loc) -> bool:
        return location in self._locations

    def size(self) -> int:
        return len(self._locations)

    def __iter__(self):
        return iter(self._locations)

    def first(self) -> Loc | None:
        first = None
        for loc in self._locations:
            if first is None or first.id > loc.id:
                first = loc
        return first
