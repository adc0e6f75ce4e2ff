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


def test_forest_linker_matches_scalar_twin(spark):
    """tree_column scoring inside link_mentions_forest == the scalar
    ForestModel.probability on the gate mention/gazetteer synthesis:
    the argmax winner per mention recomputed in pure Python from the
    collected candidate features must equal the stage output."""
    from pyspark.sql import functions as F

    from kgp import constants as C
    from kgp import disambig_ml as dml
    from kgp.corpus import GAZETTEER_SCHEMA

    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")

    def pick(vals, idx):
        return F.element_at(F.array(*[F.lit(v) for v in vals]),
                            idx.cast("int") + 1)

    def mrow(df, sent, start, surface, tag, score):
        return df.select(
            d.cast("string").alias("url"),
            F.lit(sent).cast("long").alias("sent_idx"),
            F.lit(start).cast("long").alias("start"),
            surface.alias("surface"), F.lit(tag).alias("tag"),
            F.lit(score).alias("score"))

    mentions = (
        mrow(docs, 0, 5, pick(C.CITIES, d % 11), "CITY", 0.9)
        .union(mrow(docs, 1, 40, pick(C.COUNTRIES, d % 7),
                    "COUNTRY", 0.7))
        .union(mrow(docs.where(d % 4 == 1), 3, 120,
                    F.lit("Rivertown Port"), "POI", 0.6))
        .union(mrow(docs.where(d % 9 == 3), 5, 200,
                    F.lit("Zanzitown"), "CITY", 0.3))
    ).withColumn("end",
                 (F.col("start") + F.length("surface")).cast("long"))
    gaz = spark.createDataFrame(dml.gate_gazetteer_rows(),
                                GAZETTEER_SCHEMA)
    forest = dml.gate_disambig_forest()

    feats = dml.candidate_features(
        dml.candidate_rows(mentions, gaz)).collect()
    # python twin: score every candidate, argmax per mention
    best: dict = {}
    for r in feats:
        fv = {k: r[k] for k in dml.FEATURE_COLS}
        p = round(forest.probability(fv, "pos"), 9)
        key = (r["url"], r["sent_idx"], r["start"], r["end"])
        cur = best.get(key)
        cand = (p, -(r["entity_id"] if r["entity_id"] is not None
                     else float("inf")), r)
        if cur is None or cand[:2] > cur[:2]:
            best[key] = cand
    got = dml.link_mentions_forest(mentions, gaz, forest).collect()
    assert len(got) == len(best)
    linked = 0
    for r in got:
        key = (r["url"], r["sent_idx"], r["start"], r["end"])
        p, _, winner = best[key]
        keep = (winner["entity_id"] is not None
                and p >= dml.PROBABILITY_THRESHOLD)
        if keep:
            linked += 1
            assert r["entity_id"] == winner["entity_id"], (key, r)
            assert abs(r["link_score"] - p) < 1e-12
        else:
            assert r["entity_id"] is None
            assert r["link_score"] == 0.0
            assert r["canon_name"] == r["surface"]
    assert linked > 0          # the gate actually links things
    # and the NIL path fires (Zanzitown has no gazetteer row)
    assert any(r["entity_id"] is None for r in got)


def test_gate_geo_probes_exercise_features(spark):
    """The gate gazetteer's POI sits within 50 km of Rivertown, so
    docs carrying both mentions must produce f_num_loc_in_50 > 0; the
    ACME surface must set f_acronym."""
    from pyspark.sql import functions as F

    from kgp import disambig_ml as dml
    from kgp.corpus import GAZETTEER_SCHEMA

    mentions = spark.createDataFrame(
        [("u1", 0, 5, 14, "Rivertown", "CITY", 0.9),
         ("u1", 1, 40, 54, "Rivertown Port", "POI", 0.6),
         ("u2", 0, 5, 9, "ACME", "ORG", 0.4)],
        "url string, sent_idx long, start long, end long, "
        "surface string, tag string, score double")
    gaz = spark.createDataFrame(dml.gate_gazetteer_rows(),
                                GAZETTEER_SCHEMA)
    rows = dml.candidate_features(
        dml.candidate_rows(mentions, gaz)).collect()
    near = [r for r in rows if r["surface"] == "Rivertown Port"]
    assert near and all(r["f_num_loc_in_50"] > 0 for r in near)
    # the 120k-pop far Rivertown (5002) must NOT count as nearby
    far = [r for r in rows if r["surface"] == "Rivertown"
           and r["entity_id"] == 5002]
    assert far and all(r["f_num_loc_in_50"] == 0 for r in far)
    acme = [r for r in rows if r["surface"] == "ACME"]
    assert acme and all(r["f_acronym"] == 1.0 for r in acme)
