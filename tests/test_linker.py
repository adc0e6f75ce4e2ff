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
