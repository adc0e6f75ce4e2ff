"""ANSI-SQL (DuckDB) oracles for the driver's correctness gate.

The synthetic corpus is a pure function of `documents.doc_id`
(kgp.constants), so every pipeline output has a closed-form SQL
derivation over the `documents` parquet view. These generators build
that SQL from the SAME constants module the Spark corpus generator
uses — goldens on both sides are derived, never hand-copied.

Everything here is plain string assembly; no Spark, no DuckDB imports
(the driver runs the SQL).
"""

from __future__ import annotations

import re

from kgp import constants as C


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _pick(values: list[str], idx_expr: str) -> str:
    """DuckDB list literal indexed 1-based."""
    return ("[" + ", ".join(_lit(v) for v in values) + "]"
            f"[(({idx_expr}) + 1)]")


# slot SQL expressions over a `documents` row (doc_id column in scope)
def slots() -> dict[str, str]:
    org = _pick(C.ORGS, "doc_id % 13")
    alias_pool = C.ORG_ALIASES + C.ORGS[3:]
    return {
        "per": _pick(C.PERSONS, "doc_id % 17"),
        "per2": _pick(C.PERSONS, "(doc_id + 5) % 17"),
        "org": org,
        "org_s3": (f"CASE WHEN {C.ALIAS_COND} THEN "
                   + _pick(alias_pool, "doc_id % 13")
                   + f" ELSE {org} END"),
        "city": _pick(C.CITIES, "doc_id % 11"),
        "city2": _pick(C.CITIES, "(doc_id + 3) % 11"),
        "country": _pick(C.COUNTRIES, "doc_id % 7"),
        "doc_id": "CAST(doc_id AS VARCHAR)",
    }


def _tfmt_sql(template: str, sl: dict[str, str]) -> str:
    """'{name}' template → SQL || concatenation."""
    parts = [p for p in re.split(r"(\{\w+\})", template) if p]
    out = []
    for p in parts:
        if p.startswith("{") and p.endswith("}"):
            out.append(sl[p[1:-1]])
        else:
            out.append(_lit(p))
    return "(" + " || ".join(out) + ")"


def url_sql() -> str:
    host = ("CASE WHEN doc_id % 10 < 4 THEN 'news.example.com' "
            "WHEN doc_id % 10 < 6 THEN 'blog.example.org' "
            "ELSE 'site' || CAST(doc_id % 14 AS VARCHAR) || '.example.net' "
            "END")
    return ("('https://' || " + host +
            " || '/articles/' || CAST(doc_id AS VARCHAR) || '.html')")


def text_sql() -> str:
    """The golden extracted text as one SQL expression (mirrors
    kgp.corpus._page_columns exactly)."""
    sl = slots()
    h1 = _tfmt_sql(C.H1, sl)
    s = {k: _tfmt_sql(getattr(C, k.upper()), sl)
         for k in ("s1", "s2", "s3", "s4", "s5", "s6")}
    p1 = f"({s['s1']} || ' ' || {s['s2']} || ' ' || {s['s3']})"
    p2 = ("concat_ws(' ', "
          f"CASE WHEN doc_id % 3 = 0 THEN {s['s4']} END, "
          f"CASE WHEN doc_id % 4 = 1 THEN {s['s5']} END, "
          f"CASE WHEN doc_id % 5 = 2 THEN {s['s6']} END)")
    p3 = "(text || '.')"
    p4 = _lit(C.D1)
    nn = "'\n\n'"
    return (f"({h1} || {nn} || {p1} || {nn} || "
            f"CASE WHEN {p2} <> '' THEN {p2} || {nn} ELSE '' END || "
            f"{p3} || {nn} || {p4} || {nn})")


def extract_text_sql() -> str:
    return (f"SELECT {url_sql()} AS url, {text_sql()} AS text "
            "FROM documents ORDER BY url")


def triples_sql() -> str:
    """Golden (subj, pred, obj) — mirrors kgp.golden.golden_triples."""
    sl = slots()
    org_canon = sl["org"]  # aliases canonicalize to the primary org
    selects = [
        f"SELECT DISTINCT {sl['per']} AS subj, 'ceo_of' AS pred, "
        f"{sl['org']} AS obj FROM documents",
        f"SELECT DISTINCT {sl['per']}, 'born_in', {sl['city2']} "
        "FROM documents",
        f"SELECT DISTINCT {org_canon}, 'headquartered_in', {sl['city']} "
        "FROM documents",
        f"SELECT DISTINCT {sl['city']}, 'capital_of', {sl['country']} "
        "FROM documents WHERE doc_id % 3 = 0",
        f"SELECT DISTINCT {sl['per2']}, 'works_for', {sl['org']} "
        "FROM documents WHERE doc_id % 4 = 1",
        f"SELECT DISTINCT {sl['per']}, 'founded', {sl['org']} "
        "FROM documents WHERE doc_id % 5 = 2",
    ]
    return ("SELECT DISTINCT subj, pred, obj FROM ("
            + " UNION ALL ".join(selects)
            + ") ORDER BY subj, pred, obj")


def mentions_sql() -> str:
    """Golden DISTINCT (url, surface, tag) mention surfaces."""
    sl = slots()
    url = url_sql()
    dotted_orgs = [o + "." for o in C.ORGS]
    suffix_cond = ("(" + " OR ".join(
        f"{sl['org']} LIKE '%{suf}'" for suf in ("Inc", "Corp", "Co", "Ave"))
        + ")")
    selects = [
        f"SELECT {url} AS url, {sl['per']} AS surface, 'PER' AS tag "
        "FROM documents",
        f"SELECT {url}, {sl['org']}, 'ORG' FROM documents",
        f"SELECT {url}, {sl['org_s3']}, 'ORG' FROM documents",
        f"SELECT {url}, {sl['city']}, 'CITY' FROM documents",
        f"SELECT {url}, {sl['city2']}, 'CITY' FROM documents",
        f"SELECT {url}, {sl['country']}, 'COUNTRY' FROM documents "
        "WHERE doc_id % 3 = 0",
        f"SELECT {url}, {sl['per2']}, 'PER' FROM documents "
        "WHERE doc_id % 4 = 1",
        # S5 sentence-final org keeps its dot after Inc/Corp/Co/Ave
        f"SELECT {url}, {_pick(dotted_orgs, 'doc_id % 13')}, 'ORG' "
        f"FROM documents WHERE doc_id % 4 = 1 AND {suffix_cond}",
        f"SELECT {url}, {sl['org']}, 'ORG' FROM documents "
        "WHERE doc_id % 5 = 2",
    ]
    return ("SELECT DISTINCT url, surface, tag FROM ("
            + " UNION ALL ".join(selects)
            + ") ORDER BY url, surface, tag")


def canon_sql() -> str:
    """Golden connected-components mapping as a VALUES table (the
    gazetteer is code-defined, so the expected mapping is static)."""
    from kgp.corpus import expected_canon
    rows = ", ".join(f"({eid}, {cid})"
                     for eid, cid in sorted(expected_canon().items()))
    return ("SELECT CAST(col0 AS BIGINT) AS entity_id, "
            "CAST(col1 AS BIGINT) AS canon_id FROM "
            f"(VALUES {rows}) ORDER BY entity_id")
