"""Geo-coordinate evaluation of location extraction —
GeoEvaluationResult port (extraction/location/evaluation/
GeoEvaluationResult.java:1-250): the geo-P/R metric the reference
reports for its location extractors (Palladian's TUD-Loc evaluation
protocol).

Semantics kept exactly:
- Per document, each tagged annotation walks the gold list in order
  (GeoEvaluationResult.java:108-146): a congruent span (same
  start/end, AbstractToken.java:29-34) is CORRECT and stops the walk;
  an overlapping span is ERROR4 and the walk CONTINUES (several golds
  can be claimed by one tagged span); once the walk passes the gold
  (tagged.start < gold.end) or exhausts the list, the tagged span is
  ERROR1 unless it already overlapped something. Unclaimed golds are
  ERROR2.
- Aggregation (GeoEvaluationResult.java:78-100) considers only CITY
  and POI tags WITH a gold coordinate: correct = distance(gold,
  tagged) < 100 km; retrieved = CORRECT + ERROR4 + ERROR1; relevant =
  CORRECT + ERROR4 + ERROR2. precision = correct/retrieved, recall =
  correct/relevant, F1 harmonic.

Spark shape: documents are independent — ONE applyInPandas pass over
url groups runs the exact per-document walk, then a single global
aggregation sums the three counters. Annotation lists per document
are page-sized; nothing quadratic in the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.geo import distance_km

CONSIDERED_TYPES = ("CITY", "POI")
GEO_CORRECT_KM = 100.0

# result types (shared vocabulary with kgp.conll's MUC evaluation)
CORRECT, ERROR1, ERROR2, ERROR4 = "CORRECT", "ERROR1", "ERROR2", "ERROR4"


def _overlaps(a_start, a_end, b_start, b_end) -> bool:
    # AbstractToken.overlaps (AbstractToken.java:21-27), both clauses
    return (a_start <= b_start <= a_end) or \
        (a_start <= b_end and a_end >= b_start)


def geo_evaluate_document(gold: list[tuple], tagged: list[tuple]
                          ) -> list[dict]:
    """The per-document walk. gold/tagged rows: (start, end, tag,
    lat, lng) with lat/lng possibly None. Returns evaluation items
    (tag, result_type, gold lat/lng, tagged lat/lng)."""
    items: list[dict] = []
    claimed: set[int] = set()
    for t_start, t_end, t_tag, t_lat, t_lng in tagged:
        tagged_overlap = False
        for gi, (g_start, g_end, g_tag, g_lat, g_lng) in enumerate(gold):
            if t_start == g_start and t_end == g_end:
                claimed.add(gi)
                items.append(dict(tag=g_tag, result=CORRECT,
                                  g_lat=g_lat, g_lng=g_lng,
                                  t_lat=t_lat, t_lng=t_lng))
                break
            elif _overlaps(t_start, t_end, g_start, g_end):
                tagged_overlap = True
                claimed.add(gi)
                items.append(dict(tag=g_tag, result=ERROR4,
                                  g_lat=g_lat, g_lng=g_lng,
                                  t_lat=t_lat, t_lng=t_lng))
            elif t_start < g_end or gi == len(gold) - 1:
                if not tagged_overlap:
                    items.append(dict(tag=t_tag, result=ERROR1,
                                      g_lat=None, g_lng=None,
                                      t_lat=t_lat, t_lng=t_lng))
                break
    for gi, (g_start, g_end, g_tag, g_lat, g_lng) in enumerate(gold):
        if gi not in claimed:
            items.append(dict(tag=g_tag, result=ERROR2,
                              g_lat=g_lat, g_lng=g_lng,
                              t_lat=None, t_lng=None))
    return items


def geo_counters(items: list[dict]) -> tuple[int, int, int]:
    """(correct, retrieved, relevant) over CITY/POI items with a gold
    coordinate (GeoEvaluationResult.add:78-100)."""
    correct = retrieved = relevant = 0
    for it in items:
        if it["tag"] not in CONSIDERED_TYPES or it["g_lat"] is None:
            continue
        if it["t_lat"] is not None:
            d = distance_km(it["g_lat"], it["g_lng"],
                            it["t_lat"], it["t_lng"])
            if d < GEO_CORRECT_KM:
                correct += 1
        if it["result"] in (CORRECT, ERROR4, ERROR1):
            retrieved += 1
        if it["result"] in (CORRECT, ERROR4, ERROR2):
            relevant += 1
    return correct, retrieved, relevant


def geo_evaluation(gold: DataFrame, tagged: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """Distributed geo evaluation. Both inputs: (url, start, end, tag,
    lat, lng). Returns ONE row (correct, retrieved, relevant,
    precision, recall, f1) — per-document walks in one applyInPandas
    pass, counters in one aggregation."""
    g = gold.select(F.col(url_col).alias("url"), "start", "end", "tag",
                    "lat", "lng", F.lit(1).alias("_is_gold"))
    t = tagged.select(F.col(url_col).alias("url"), "start", "end",
                      "tag", "lat", "lng", F.lit(0).alias("_is_gold"))
    both = g.unionByName(t)

    def per_url(pdf: pd.DataFrame) -> pd.DataFrame:
        def rows(flag):
            sub = pdf[pdf["_is_gold"] == flag].sort_values("start")
            return [(int(r.start), int(r.end), r.tag,
                     None if pd.isna(r.lat) else float(r.lat),
                     None if pd.isna(r.lng) else float(r.lng))
                    for r in sub.itertuples()]
        items = geo_evaluate_document(rows(1), rows(0))
        c, rt, rl = geo_counters(items)
        return pd.DataFrame([(c, rt, rl)],
                            columns=["correct", "retrieved",
                                     "relevant"])

    per_doc = both.groupBy("url").applyInPandas(
        per_url, "correct long, retrieved long, relevant long")
    agg = per_doc.agg(F.sum("correct").alias("correct"),
                      F.sum("retrieved").alias("retrieved"),
                      F.sum("relevant").alias("relevant"))
    p = F.col("correct") / F.col("retrieved")
    r = F.col("correct") / F.col("relevant")
    return agg.select(
        "correct", "retrieved", "relevant",
        F.round(p, 6).alias("precision"), F.round(r, 6).alias("recall"),
        F.round(2 * p * r / (p + r), 6).alias("f1"))
