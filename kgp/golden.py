"""Golden (expected) values, computed INDEPENDENTLY of the pipeline.

The synthetic corpus is a pure function of doc_id (kgp.constants), so
the exact triple set the pipeline must emit is known by construction.
This module computes it with plain Python integer arithmetic — no
Spark, no regexes, no shared code with the extraction path — and is the
ground truth for the P/R ≥ 0.95 gate (BASELINE.json) and the DuckDB
oracle SQL (kgp.oracle mirrors these rules in ANSI SQL).
"""

from __future__ import annotations

from kgp import constants as C


def canonical_org(doc_id: int) -> str:
    """The org mentioned in S3 resolves to this canonical name: alias
    surfaces (ORG_ALIASES) canonicalize back to the primary org via
    connected components."""
    return C.ORGS[doc_id % 13]


def golden_triples_for_doc(doc_id: int) -> set[tuple[str, str, str]]:
    per = C.PERSONS[doc_id % 17]
    per2 = C.PERSONS[(doc_id + 5) % 17]
    org = C.ORGS[doc_id % 13]
    city = C.CITIES[doc_id % 11]
    city2 = C.CITIES[(doc_id + 3) % 11]
    country = C.COUNTRIES[doc_id % 7]
    t = {
        (per, "ceo_of", org),                       # S1
        (per, "born_in", city2),                    # S2
        (canonical_org(doc_id), "headquartered_in", city),  # S3
    }
    if doc_id % 3 == 0:
        t.add((city, "capital_of", country))        # S4
    if doc_id % 4 == 1:
        t.add((per2, "works_for", org))             # S5
    if doc_id % 5 == 2:
        t.add((per, "founded", org))                # S6
    if doc_id % C.HOLDOUT_MOD == C.HOLDOUT_VAL:
        t.add((C.NOVEL_ORG, "headquartered_in", city2))  # S7 (context)
    if doc_id % C.S9_MOD == C.S9_VAL:
        # S9: "based in" phrasing, normalized to the canonical pred
        org2 = C.ORGS[(doc_id + 4) % 13]
        city3 = C.CITIES[(doc_id + 5) % 11]
        t.add((org2, "headquartered_in", city3))
    return t


def golden_triples(doc_ids) -> set[tuple[str, str, str]]:
    out: set[tuple[str, str, str]] = set()
    for d in doc_ids:
        out |= golden_triples_for_doc(int(d))
    return out


def precision_recall(predicted: set, golden: set) -> tuple[float, float]:
    if not predicted or not golden:
        return 0.0, 0.0
    tp = len(predicted & golden)
    return tp / len(predicted), tp / len(golden)
