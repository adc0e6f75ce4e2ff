"""Feature-based (ML) disambiguation — FeatureBasedDisambiguation port
(kgp.disambig_ml): feature extraction as column expressions, pyspark.ml
random forest, 0.15 probability threshold."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgp import constants as C
from kgp.corpus import gazetteer
from kgp.disambig_ml import (candidate_features, candidate_rows,
                             link_mentions_ml, train_disambiguator)
from kgp.linker import link_mentions

MENTION_COLS = ("url string, sent_idx int, start int, end int, "
                "surface string, tag string, score double, "
                "sent_start int, sent_text string")


def _mentions(spark, rows):
    return spark.createDataFrame(rows, MENTION_COLS)


def _train_rows():
    # a small synthetic supervision set over the built-in gazetteer:
    # distinct docs mention a person, a country anchor and a city
    rows = []
    for i in range(24):
        per = C.PERSONS[i % 17]
        city = C.CITIES[i % 11]
        country = C.COUNTRIES[i % 7]
        sent = f"{per} visited {city} in {country}."
        rows.append((f"t{i}", 0, 0, len(per), per, "PER", 1.0, 0, sent))
        c0 = sent.index(city)
        rows.append((f"t{i}", 0, c0, c0 + len(city), city, "CITY", 1.0,
                     0, sent))
        k0 = sent.index(country)
        rows.append((f"t{i}", 0, k0, k0 + len(country), country,
                     "COUNTRY", 1.0, 0, sent))
    return rows


def test_features_are_columns_no_python(spark):
    # the feature extractor must stay JVM-side: no Python eval nodes
    cand = candidate_features(
        candidate_rows(_mentions(spark, _train_rows()), gazetteer(spark)))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_feature_values(spark):
    rows = [("u1", 0, 0, 11, "Springfield", "CITY", 0.9, 0,
             "Springfield is in Freedonia."),
            ("u1", 0, 18, 27, "Freedonia", "COUNTRY", 1.0, 0,
             "Springfield is in Freedonia.")]
    cand = candidate_features(
        candidate_rows(_mentions(spark, rows), gazetteer(spark)))
    spring = {r.entity_id: r for r in
              cand.where(F.col("surface") == "Springfield").collect()}
    # two Springfield candidates -> ambiguity 0.5 each
    assert set(spring) == {C.CITY_ID, C.CITY_DUP_ID}
    assert abs(spring[C.CITY_ID].f_name_ambiguity - 0.5) < 1e-9
    # the big Springfield is the child of the in-document Freedonia
    assert spring[C.CITY_ID].f_has_ancestor_in_doc == 1.0
    assert spring[C.CITY_DUP_ID].f_has_ancestor_in_doc == 0.0
    free = cand.where(F.col("surface") == "Freedonia").first()
    # Freedonia has a descendant (big Springfield) in the document
    assert free.f_has_descendant_in_doc == 1.0
    assert free.f_type_code == 1.0  # COUNTRY


def test_ml_linker_learns_from_heuristic_teacher(spark):
    gaz = gazetteer(spark)
    train = _mentions(spark, _train_rows())
    # teacher: the heuristic fast path labels the training mentions
    gold = link_mentions(train, gaz).where(
        F.col("entity_id").isNotNull()).select(
        "url", "start", "end", "entity_id")
    model = train_disambiguator(train, gaz, gold, num_trees=20)

    held_out = _mentions(spark, [
        ("h1", 0, 0, 11, "Springfield", "CITY", 0.9, 0,
         "Springfield is in Freedonia."),
        ("h1", 0, 18, 27, "Freedonia", "COUNTRY", 1.0, 0,
         "Springfield is in Freedonia."),
        ("h1", 0, 30, 38, "Zzyzzyx", "ORG", 0.7, 0,
         "Springfield is in Freedonia."),
    ])
    out = {r.surface: r for r in
           link_mentions_ml(held_out, gaz, model).collect()}
    # ambiguous Springfield resolves to the in-country big city
    assert out["Springfield"].entity_id == C.CITY_ID
    assert out["Freedonia"].entity_id == C.COUNTRY_ID
    # no candidate -> NIL with surface as canon (threshold behavior)
    assert out["Zzyzzyx"].entity_id is None
    assert out["Zzyzzyx"].canon_name == "Zzyzzyx"
    assert out["Zzyzzyx"].link_score == 0.0
