from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgp import constants as C
from kgp.corpus import gazetteer
from kgp.linker import expand_gazetteer, link_mentions, lsh_candidates

MENTION_COLS = ("url string, sent_idx int, start int, end int, "
                "surface string, tag string, score double, "
                "sent_start int, sent_text string")


def _mentions(spark, rows):
    return spark.createDataFrame(rows, MENTION_COLS)


def test_expand_gazetteer_alt_names_and_ambiguity(spark):
    g = expand_gazetteer(gazetteer(spark))
    acme = {r.entity_id for r in
            g.where(F.col("norm") == "acme corp").collect()}
    # primary of 2000 AND alt name of alias entity 2100 -> ambiguous
    assert acme == {C.ORG_ID, C.ORG_ALIAS_ID}
    assert all(r.ambiguous for r in
               g.where(F.col("norm") == "acme corp").collect())
    spring = g.where(F.col("norm") == "springfield")
    assert {r.entity_id for r in spring.collect()} == {C.CITY_ID,
                                                       C.CITY_DUP_ID}


def test_link_unambiguous_and_nil(spark):
    rows = [
        ("u1", 0, 0, 10, "John Smith", "PER", 1.0, 0, "John Smith visited."),
        ("u1", 0, 20, 27, "Zzyzzyx", "ORG", 0.7, 0, "John Smith visited."),
    ]
    links = link_mentions(_mentions(spark, rows), gazetteer(spark)).collect()
    by_surface = {r.surface: r for r in links}
    assert by_surface["John Smith"].entity_id == C.PER_ID
    assert by_surface["John Smith"].link_score == 1.0
    assert by_surface["John Smith"].canon_name == "John Smith"
    nil = by_surface["Zzyzzyx"]
    assert nil.entity_id is None and nil.canon_name == "Zzyzzyx"
    assert nil.link_score == 0.0


def test_disambiguation_population_wins(spark):
    # "Springfield" surface is claimed by big (pop 30000) and tiny
    # (pop 900) cities; population heuristic picks the big one
    # (HeuristicDisambiguation population prior).
    rows = [("u1", 0, 5, 16, "Springfield", "CITY", 0.9, 0,
             "[...] Springfield [...]")]
    links = link_mentions(_mentions(spark, rows), gazetteer(spark)).collect()
    assert len(links) == 1
    assert links[0].entity_id == C.CITY_ID
    assert 0.0 < links[0].link_score < 1.0


def test_disambiguation_type_match_beats_population(spark, tmp_path):
    # synthetic gazetteer where one surface is a huge CITY and an ORG;
    # a mention tagged ORG must link to the ORG candidate.
    g = spark.createDataFrame(
        [(1, "Orinoco", [], "CITY", 99_000_000, [], None, None),
         (2, "Orinoco", [], "ORG", None, [], None, None)],
        "id long, name string, alt_names array<string>, type string, "
        "population long, ancestor_ids array<long>, lat double, lon double")
    rows = [("u1", 0, 0, 7, "Orinoco", "ORG", 0.9, 0, "Orinoco ships.")]
    links = link_mentions(_mentions(spark, rows), g).collect()
    assert links[0].entity_id == 2


def test_lsh_candidates_finds_fuzzy_surface(spark):
    surfaces = spark.createDataFrame(
        [("Acme Corpo",), ("Globex Systems",)], "surface string")
    cands = lsh_candidates(surfaces, gazetteer(spark),
                           jaccard_max_dist=0.6).collect()
    got = {(r.surface, r.canon_name) for r in cands}
    assert ("Acme Corpo", "Acme Corp") in got
    assert ("Globex Systems", "Globex Systems") in got


# --------------- faithful coordinate-aware disambiguation (geo port)


def _loc(eid, typ, pop=None, anc=(), lat=None, lon=None, name=None):
    return {"entity_id": eid, "type": typ, "population": pop,
            "ancestor_ids": list(anc), "lat": lat, "lon": lon,
            "canon_name": name or f"loc{eid}"}


def _key(surface, tag="CITY", i=0):
    return (0, i, i + len(surface), surface, tag)


def test_geo_primitives():
    from kgp.geo import distance_km, largest_distance, midpoint
    # Dresden -> Berlin ~165 km
    d = distance_km(51.05, 13.74, 52.52, 13.40)
    assert 160 < d < 172
    assert distance_km(0, 0, 0, 0) == 0.0
    mid = midpoint([(0.0, 0.0), (0.0, 10.0)])
    assert abs(mid[0]) < 1e-6 and abs(mid[1] - 5.0) < 1e-6
    assert largest_distance([(0, 0)]) == 0.0


def test_anchor_distance_beats_population():
    # HeuristicDisambiguation.java:114-150: the candidate within 100 km
    # of an anchor wins over a bigger same-name candidate elsewhere
    from kgp.linker import heuristic_disambiguate
    anchor = _loc(1, "CITY", pop=2_000_000, lat=50.0, lon=8.0)
    near = _loc(2, "CITY", pop=20_000, lat=50.3, lon=8.2)   # ~45 km
    far = _loc(3, "CITY", pop=600_000, lat=10.0, lon=60.0)
    groups = {
        _key("Metropolis"): ("CITY", [anchor]),
        _key("Springfield", i=20): ("CITY", [near, far]),
    }
    got = heuristic_disambiguate(groups)
    assert got[_key("Springfield", i=20)]["entity_id"] == 2


def test_same_distance_cluster_becomes_anchor():
    # :270-295 — two same-name rows 10 km apart form one cluster; its
    # biggest member anchors the document
    from kgp.linker import get_anchors
    a = _loc(1, "CITY", pop=8_000, lat=50.0, lon=8.0)
    b = _loc(2, "CITY", pop=6_000, lat=50.08, lon=8.05)
    groups = {_key("Twinville"): ("CITY", [a, b])}
    anchors = get_anchors(groups)
    assert [x["entity_id"] for x in anchors] == [1]


def test_lasso_removes_outlier():
    # :312-341 — with no prominent/unambiguous anchors the lasso trims
    # locations far from the midpoint
    from kgp.linker import get_lasso_locations
    cluster = [_loc(i, "CITY", pop=1000, lat=50.0 + i * 0.1, lon=8.0)
               for i in range(3)]
    outlier = _loc(9, "CITY", pop=1000, lat=-30.0, lon=140.0)
    got = get_lasso_locations(cluster + [outlier])
    assert {x["entity_id"] for x in got} == {0, 1, 2}


def test_unlikely_person_group_dropped():
    # :171-188 — PER-tagged group, no country, small population
    from kgp.linker import get_unlikely_locations
    groups = {
        _key("John Hiatt", tag="PER"): ("PER", [_loc(1, "CITY", pop=500)]),
        _key("Freedonia", tag="COUNTRY", i=30):
            ("COUNTRY", [_loc(2, "COUNTRY", pop=5_000_000)]),
    }
    assert get_unlikely_locations(groups) == {_key("John Hiatt",
                                                   tag="PER")}


def test_select_location_city_boost_and_depth():
    from kgp.linker import select_location
    city = _loc(1, "CITY", pop=400_000)
    unit = _loc(2, "UNIT", pop=700_000)
    assert select_location([city, unit])["entity_id"] == 1  # 400k*2>700k
    parent = _loc(3, "COUNTRY", pop=80_000_000)
    child = _loc(4, "CITY", pop=1_000, anc=[3])
    assert select_location([parent, child])["entity_id"] == 4  # deeper


def test_link_mentions_reference_spark(spark):
    # the applyInPandas wrapper reproduces the pure-python choice and
    # keeps unmatched mentions unlinked
    from kgp.linker import link_mentions_reference
    from kgp.corpus import gazetteer
    mentions = spark.createDataFrame(
        [("u1", 0, 0, 11, "Springfield", "CITY", 1.0, 0,
          "Springfield is in Freedonia."),
         ("u1", 0, 18, 27, "Freedonia", "COUNTRY", 1.0, 0,
          "Springfield is in Freedonia."),
         ("u1", 0, 30, 38, "Nonsense", "ORG", 1.0, 0,
          "Springfield is in Freedonia.")],
        "url string, sent_idx int, start int, end int, surface string, "
        "tag string, score double, sent_start int, sent_text string")
    out = {r.surface: r for r in
           link_mentions_reference(mentions, gazetteer(spark)).collect()}
    assert out["Springfield"].entity_id is not None
    # the country anchor's descendant (pop 30k Springfield, child of
    # Freedonia) wins over the tiny duplicate in another country
    assert out["Springfield"].entity_id == 3000
    assert out["Freedonia"].entity_id == 4000
    assert out["Nonsense"].entity_id is None
    assert out["Nonsense"].canon_name == "Nonsense"


def test_coordinate_tagger_reference_goldens():
    # CoordinateTaggerTest goldens: decimal pairs, hemisphere suffixes,
    # DMS variants; plain numbers must not tag
    from kgp.geo import tag_coordinates
    approx = pytest.approx

    def one(text):
        got = tag_coordinates(text)
        assert len(got) == 1, (text, got)
        return got[0]

    a = one("40.446195, -79.948862")
    assert (a.lat, a.lon) == approx((40.446195, -79.948862))
    a = one("40.446195 -79.948862")
    assert (a.lat, a.lon) == approx((40.446195, -79.948862))
    a = one("40.446195N 79.948862W")
    assert (a.lat, a.lon) == approx((40.446195, -79.948862))
    a = one("40°26′47″N 079°58′36″W")
    assert (a.lat, a.lon) == approx((40.446195, -79.948862), abs=0.05)
    a = one("40d 26′ 47″ N 079d 58′ 36″ W")
    assert (a.lat, a.lon) == approx((40.446195, -79.948862), abs=0.05)
    a = one("40:26:46.302N 079:56:55.903W")
    assert (a.lat, a.lon) == approx((40.446195, -79.948862), abs=0.05)
    a = one("40° 26.7717, -79° 56.93172")
    assert (a.lat, a.lon) == approx((40.446195, -79.948862), abs=0.05)
    a = one("Mast Hill (68°11′S 67°0′W) is a hill 14 metres (46 ft) "
            "high at the western end of Stonington Island.")
    assert (a.lat, a.lon) == approx((-68.183333, -67.0), abs=0.05)
    assert tag_coordinates("The cost of living index was listed as "
                           "121.4, 21.4 points above the U.S. "
                           "average.") == []


_GEO_CSV = [
    # id name ascii alts lat lon fclass fcode cc cc2 a1 a2 a3 a4 pop
    "100\tAtlantis\tAtlantis\t\t10.0\t10.0\tA\tPCLI\tAT\t\t00\t\t\t\t90000000",
    "150\tAtland Region\tAtland Region\t\t12.0\t12.0\tA\tADM1\tAT\t\t01\t\t\t\t0",
    "300\tOldtown\tOldtown\t\t15.0\t15.0\tP\tPPL\tAT\t\t01\t\t\t\t6000",
    "200\tBorduria\tBorduria\t\t-40.0\t-40.0\tA\tPCLI\tBO\t\t00\t\t\t\t50000000",
    "400\tOldtown\tOldtown\t\t-40.5\t-40.5\tP\tPPL\tBO\t\t01\t\t\t\t5500",
]


def _geo_gaz(spark, tmp_path, hierarchy=None):
    from kgp.corpus import gazetteer_from_csv
    p = tmp_path / "geonames.txt"
    p.write_text("\n".join(_GEO_CSV))
    hp = None
    if hierarchy is not None:
        hp = tmp_path / "hierarchy.txt"
        hp.write_text("\n".join(hierarchy))
    return gazetteer_from_csv(spark, str(p),
                              hierarchy_path=str(hp) if hp else None)


def test_geonames_csv_ancestor_hierarchy(spark, tmp_path):
    gaz = {r.id: r for r in _geo_gaz(spark, tmp_path).collect()}
    # admin-code walk (GeonamesImporter.getParent): city -> ADM1 ->
    # country, nearest ancestor first
    assert gaz[300].ancestor_ids == [150, 100]
    assert gaz[150].ancestor_ids == [100]     # admin unit drops own code
    assert gaz[100].ancestor_ids == []        # country is the root
    assert gaz[400].ancestor_ids == [200]     # no BO ADM1 row: skip level


def test_geonames_explicit_hierarchy_precedence(spark, tmp_path):
    # hierarchy.txt relations win over admin-code derivation
    # (GeonamesImporter.java:225-230); ambiguous children are dropped
    gaz = {r.id: r for r in
           _geo_gaz(spark, tmp_path,
                    hierarchy=["100\t300\tADM",
                               "100\t400\tADM", "200\t400\tADM"]).collect()}
    assert gaz[300].ancestor_ids == [100]     # explicit parent
    assert gaz[400].ancestor_ids == [200]     # ambiguous -> admin walk


def test_csv_gazetteer_hierarchy_links_fast_path(spark, tmp_path):
    # the hierarchy term in the vectorized disambiguator fires for a
    # CSV-loaded gazetteer: the in-country Oldtown (descendant of the
    # Atlantis anchor, 780 km away so distance cannot explain it) beats
    # the decoy in Borduria
    rows = [("u1", 0, 0, 8, "Atlantis", "COUNTRY", 1.0, 0,
             "Atlantis taxes Oldtown."),
            ("u1", 0, 15, 22, "Oldtown", "CITY", 1.0, 0,
             "Atlantis taxes Oldtown.")]
    out = {r.surface: r for r in
           link_mentions(_mentions(spark, rows),
                         _geo_gaz(spark, tmp_path)).collect()}
    assert out["Atlantis"].entity_id == 100
    assert out["Oldtown"].entity_id == 300


def test_csv_gazetteer_hierarchy_links_reference_path(spark, tmp_path):
    from kgp.linker import link_mentions_reference
    rows = [("u1", 0, 0, 8, "Atlantis", "COUNTRY", 1.0, 0,
             "Atlantis taxes Oldtown."),
            ("u1", 0, 15, 22, "Oldtown", "CITY", 1.0, 0,
             "Atlantis taxes Oldtown.")]
    out = {r.surface: r for r in
           link_mentions_reference(_mentions(spark, rows),
                                   _geo_gaz(spark, tmp_path)).collect()}
    assert out["Atlantis"].entity_id == 100
    assert out["Oldtown"].entity_id == 300


def _baseline_gaz(spark):
    from kgp.corpus import GAZETTEER_SCHEMA
    rows = [
        # one surface claimed by a continent, a country and a huge city
        (1, "Atlantis", [], "CONTINENT", None, [], None, None),
        (2, "Atlantis", [], "COUNTRY", 900, [], None, None),
        (3, "Atlantis", [], "CITY", 9_000_000, [], None, None),
        # population ties: >= keeps the LAST qualifying candidate
        (10, "Twinville", [], "CITY", 500, [], None, None),
        (11, "Twinville", [], "CITY", 500, [], None, None),
        # all-null populations, no CC -> dropped
        (20, "Ghosttown", [], "POI", None, [], None, None),
        (21, "Ghosttown", [], "POI", None, [], None, None),
        # zero population qualifies (0 >= starting max 0)
        (30, "Zeroville", [], "CITY", 0, [], None, None),
    ]
    return spark.createDataFrame(rows, GAZETTEER_SCHEMA)


def test_baseline_disambiguation(spark):
    """BaselineDisambiguation.java:29-47: first CONTINENT/COUNTRY
    short-circuits; else max population with last-wins >= ties; null
    populations never qualify; no winner -> no annotation."""
    from kgp.linker import link_mentions_baseline
    rows = [
        ("u1", 0, 0, 8, "Atlantis", "LOC", 1.0, 0, "s"),
        ("u1", 1, 0, 9, "Twinville", "LOC", 1.0, 0, "s"),
        ("u1", 2, 0, 9, "Ghosttown", "LOC", 1.0, 0, "s"),
        ("u1", 3, 0, 9, "Zeroville", "LOC", 1.0, 0, "s"),
        ("u1", 4, 0, 7, "Nowhere", "LOC", 1.0, 0, "s"),
    ]
    out = {r.surface: r for r in link_mentions_baseline(
        _mentions(spark, rows), _baseline_gaz(spark)).collect()}
    # continent (entity 1) wins over pop-9M city: the loop breaks
    assert out["Atlantis"].entity_id == 1
    # >= update: the later candidate keeps the tie
    assert out["Twinville"].entity_id == 11
    # all-null populations and no CC -> dropped entirely
    assert "Ghosttown" not in out
    assert out["Zeroville"].entity_id == 30
    assert "Nowhere" not in out
    assert len(out) == 3


def test_no_disambiguation_keeps_all(spark):
    """NoDisambiguation.java:22-36: every candidate annotates."""
    from kgp.linker import link_mentions_none
    rows = [("u1", 0, 0, 8, "Atlantis", "LOC", 1.0, 0, "s"),
            ("u1", 1, 0, 7, "Nowhere", "LOC", 1.0, 0, "s")]
    out = link_mentions_none(
        _mentions(spark, rows), _baseline_gaz(spark)).collect()
    assert sorted(r.entity_id for r in out) == [1, 2, 3]


def test_baseline_plan_zero_python(spark):
    from kgp.linker import link_mentions_baseline
    rows = [("u1", 0, 0, 8, "Atlantis", "LOC", 1.0, 0, "s")]
    plan = (link_mentions_baseline(_mentions(spark, rows),
                                   _baseline_gaz(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
