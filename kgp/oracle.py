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
        "org2": _pick(C.ORGS, "(doc_id + 4) % 13"),
        "city": _pick(C.CITIES, "doc_id % 11"),
        "city2": _pick(C.CITIES, "(doc_id + 3) % 11"),
        "city3": _pick(C.CITIES, "(doc_id + 5) % 11"),
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


def host_sql(idx: str = "doc_id") -> str:
    """Host of doc `idx`'s canonical url (kgp.corpus._host_for)."""
    return (f"CASE WHEN ({idx}) % 10 < 4 THEN 'news.example.com' "
            f"WHEN ({idx}) % 10 < 6 THEN 'blog.example.org' "
            f"ELSE 'site' || CAST(({idx}) % 14 AS VARCHAR) || "
            "'.example.net' END")


def url_sql() -> str:
    return ("('https://' || " + host_sql() +
            " || '/articles/' || CAST(doc_id AS VARCHAR) || '.html')")


def text_sql() -> str:
    """The golden extracted text as one SQL expression (mirrors
    kgp.corpus._page_columns exactly)."""
    sl = slots()
    h1 = _tfmt_sql(C.H1, sl)
    s = {k: _tfmt_sql(getattr(C, k.upper()), sl)
         for k in ("s1", "s2", "s3", "s4", "s5", "s6", "s9")}
    p1 = f"({s['s1']} || ' ' || {s['s2']} || ' ' || {s['s3']})"
    p2 = ("concat_ws(' ', "
          f"CASE WHEN doc_id % 3 = 0 THEN {s['s4']} END, "
          f"CASE WHEN doc_id % 4 = 1 THEN {s['s5']} END, "
          f"CASE WHEN doc_id % 5 = 2 THEN {s['s6']} END, "
          f"CASE WHEN doc_id % {C.S9_MOD} = {C.S9_VAL} THEN {s['s9']} "
          "END)")
    p3 = "(text || '.')"
    p4 = _lit(C.D1)
    s7 = _tfmt_sql(C.S7, sl)
    s7_cond = f"doc_id % {C.HOLDOUT_MOD} = {C.HOLDOUT_VAL}"
    s8 = _tfmt_sql(C.S8, sl)
    s8_cond = f"doc_id % {C.S8_MOD} = {C.S8_VAL}"
    nn = "'\n\n'"
    return (f"({h1} || {nn} || {p1} || {nn} || "
            f"CASE WHEN {p2} <> '' THEN {p2} || {nn} ELSE '' END || "
            f"{p3} || {nn} || "
            f"CASE WHEN {s7_cond} THEN {s7} || {nn} ELSE '' END || "
            f"CASE WHEN {s8_cond} THEN {s8} || {nn} ELSE '' END || "
            f"{p4} || {nn})")


def extract_text_sql() -> str:
    return (f"SELECT {url_sql()} AS url, {text_sql()} AS text "
            "FROM documents ORDER BY url")


def readability_text_sql() -> str:
    """Closed-form Arc90 Readability output over the synth corpus
    (kgp.readability; ReadabilityContentExtractor.java:229-693).

    Derivation, traced through the ported algorithm:

    * normal pages: the comments div is stripped as an unlikely
      candidate, the article div wins top-candidate (only scored
      container), prepArticle removes the <h1>, and the readable-text
      cleanup turns the surviving <p> children into
      '\\n\\n'-separated paragraphs — so text == the paragraph texts
      joined by blank lines, WITHOUT the headline.
    * adversarial pages (doc_id % 17 == 13): no scored candidates, so
      the body itself becomes the article; prepArticle deletes the
      EMPTY <p> separator pairs, merging the bare text nodes — h1/s1
      and the p2/p3/s7/s8/p4 tail concatenate with NO separator, and
      the space runs around the empty <span> collapse to one space.
    * title: every org name is <= 2 words, so getArticleTitle's
      '<= 4 words -> keep original' rule (:333-335) always returns the
      full '<h1> | Example News' title.

    The retry-flag cascade (:249-273) is output-invariant on this
    corpus (comment paragraphs are < 25 chars and never scored), so
    the SQL needs no result-length branch.
    """
    sl = slots()
    h1 = _tfmt_sql(C.H1, sl)
    s = {k: _tfmt_sql(getattr(C, k.upper()), sl)
         for k in ("s1", "s2", "s3", "s4", "s5", "s6", "s9")}
    p1 = f"({s['s1']} || ' ' || {s['s2']} || ' ' || {s['s3']})"
    p2 = ("concat_ws(' ', "
          f"CASE WHEN doc_id % 3 = 0 THEN {s['s4']} END, "
          f"CASE WHEN doc_id % 4 = 1 THEN {s['s5']} END, "
          f"CASE WHEN doc_id % 5 = 2 THEN {s['s6']} END, "
          f"CASE WHEN doc_id % {C.S9_MOD} = {C.S9_VAL} THEN {s['s9']} "
          "END)")
    p3 = "(text || '.')"
    p4 = _lit(C.D1)
    s7 = _tfmt_sql(C.S7, sl)
    s7_cond = f"doc_id % {C.HOLDOUT_MOD} = {C.HOLDOUT_VAL}"
    s8 = _tfmt_sql(C.S8, sl)
    s8_cond = f"doc_id % {C.S8_MOD} = {C.S8_VAL}"
    normal = ("concat_ws('\n\n', "
              f"{p1}, nullif({p2}, ''), {p3}, "
              f"CASE WHEN {s7_cond} THEN {s7} END, "
              f"CASE WHEN {s8_cond} THEN {s8} END, {p4})")
    adv = (f"({h1} || {s['s1']} || ' ' || {s['s2']} || ' ' || "
           f"{s['s3']} || ' ' || "
           f"CASE WHEN {p2} <> '' THEN {p2} ELSE '' END || {p3} || "
           f"CASE WHEN {s7_cond} THEN {s7} ELSE '' END || "
           f"CASE WHEN {s8_cond} THEN {s8} ELSE '' END || {p4})")
    return (f"SELECT {url_sql()} AS url, "
            f"({h1} || ' | Example News') AS title, "
            f"CASE WHEN doc_id % 17 = 13 THEN {adv} ELSE {normal} END "
            "AS text FROM documents ORDER BY url")


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
        # S9: the "based in" variant phrasing, canonicalized to
        # headquartered_in by kgp.predicates.normalize_predicates
        f"SELECT DISTINCT {sl['org2']}, 'headquartered_in', "
        f"{sl['city3']} FROM documents "
        f"WHERE doc_id % {C.S9_MOD} = {C.S9_VAL}",
        # S7: the novel org is typed ORG by CONTEXT (it is in no seed
        # dictionary), so its headquartered_in triple only appears if
        # the context classifier stack works end-to-end
        f"SELECT DISTINCT {_lit(C.NOVEL_ORG)}, 'headquartered_in', "
        f"{sl['city2']} FROM documents "
        f"WHERE doc_id % {C.HOLDOUT_MOD} = {C.HOLDOUT_VAL}",
    ]
    return ("SELECT DISTINCT subj, pred, obj FROM ("
            + " UNION ALL ".join(selects)
            + ") ORDER BY subj, pred, obj")


def _mention_rows_sql() -> str:
    """The UNION ALL body of golden (url, surface, tag) mention rows —
    shared by mentions_sql and the LSH-candidate oracle."""
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
        # S9 predicate-variant sentence mentions
        f"SELECT {url}, {sl['org2']}, 'ORG' FROM documents "
        f"WHERE doc_id % {C.S9_MOD} = {C.S9_VAL}",
        f"SELECT {url}, {sl['city3']}, 'CITY' FROM documents "
        f"WHERE doc_id % {C.S9_MOD} = {C.S9_VAL}",
        # S7 novel org — context-typed (not in the entity dictionary)
        f"SELECT {url}, {_lit(C.NOVEL_ORG)}, 'ORG' FROM documents "
        f"WHERE doc_id % {C.HOLDOUT_MOD} = {C.HOLDOUT_VAL}",
        # S8 date — DATETIME add-back (DateAndTimeTagger port)
        f"SELECT {url}, {_lit(C.DATE_SURFACE)}, 'DATETIME' "
        f"FROM documents WHERE doc_id % {C.S8_MOD} = {C.S8_VAL}",
    ]
    return " UNION ALL ".join(selects)


def mentions_sql() -> str:
    """Golden DISTINCT (url, surface, tag) mention surfaces."""
    return ("SELECT DISTINCT url, surface, tag FROM ("
            + _mention_rows_sql()
            + ") ORDER BY url, surface, tag")


def lsh_entity_candidates_sql(max_dist: float = 0.4) -> str:
    """EXACT padded-3-gram Jaccard candidate pairs between the corpus's
    distinct mention surfaces and every gazetteer surface form. The
    Spark side is MinHashLSH-then-exact-distance; with 15 hash tables
    the per-pair miss probability at the 0.4 boundary is ≤ 0.4^15
    (~1e-6), so candidates+filter equals the exact cross product."""
    from kgp.corpus import gazetteer_rows
    gaz_vals = []
    for r in gazetteer_rows():
        for form in [r["name"], *r["alt_names"]]:
            gaz_vals.append(f"({r['id']}, {_lit(r['name'])}, "
                            f"{_lit(form)})")
    grams = ("list_transform(range(1, length(p) - 1), "
             "i -> substring(p, CAST(i AS INT), 3))")
    return f"""
WITH surfaces AS (
  SELECT DISTINCT surface FROM ({_mention_rows_sql()})
), sg AS (
  SELECT surface, unnest(list_distinct({grams})) AS g
  FROM (SELECT surface, '##' || lower(surface) || '##' AS p
        FROM surfaces)
), gaz(entity_id, canon_name, form) AS (
  VALUES {", ".join(gaz_vals)}
), gg AS (
  SELECT entity_id, canon_name, form,
         unnest(list_distinct({grams})) AS g
  FROM (SELECT entity_id, canon_name, form,
               '##' || lower(form) || '##' AS p FROM gaz)
), ssz AS (SELECT surface, count(*) AS ns FROM sg GROUP BY surface),
gsz AS (SELECT entity_id, form, count(*) AS ng
        FROM gg GROUP BY entity_id, form),
inter AS (
  SELECT sg.surface, gg.entity_id, gg.canon_name, gg.form,
         count(*) AS i
  FROM sg JOIN gg ON sg.g = gg.g
  GROUP BY 1, 2, 3, 4
)
SELECT DISTINCT inter.surface AS surface, inter.entity_id AS entity_id,
       inter.canon_name AS canon_name
FROM inter
JOIN ssz ON ssz.surface = inter.surface
JOIN gsz ON gsz.entity_id = inter.entity_id AND gsz.form = inter.form
WHERE 1.0 - i * 1.0 / (ns + ng - i) <= {max_dist}
ORDER BY surface, entity_id"""


def text_stats_sql() -> str:
    """DuckDB mirror of kgp.textstats.text_stats (minus the xxhash64
    fingerprint, which DuckDB cannot reproduce)."""
    from kgp.textstats import LANG_MARKERS, STOPWORDS_EN, WORDPIECE_RE

    def rxcount(expr: str, pat: str) -> str:
        return f"len(regexp_extract_all({expr}, '{pat}'))"

    n_tokens = ("CASE WHEN trim(text) = '' THEN 0 ELSE "
                "len(regexp_split_to_array(trim(text), '\\s+')) END")
    n_alpha = rxcount("text", "[A-Za-z]")
    n_upper = rxcount("text", "[A-Z]")
    n_digit = rxcount("text", "[0-9]")
    n_punct = rxcount("text", "[^\\sA-Za-z0-9]")
    stop_pat = r"\b(" + "|".join(STOPWORDS_EN) + r")\b"
    n_stop = rxcount("lower(text)", stop_pat)
    nz = "CASE WHEN {x} > 0 THEN {x} ELSE 1 END"
    nzt, nzc, nza = (nz.format(x="nt"), nz.format(x="nc"),
                     nz.format(x="na"))
    lang_counts = {
        lang: rxcount("lower(text)", r"\b(" + "|".join(ws) + r")\b")
        for lang, ws in LANG_MARKERS.items()}
    lc_cols = ", ".join(f"{e} AS c_{lang}"
                        for lang, e in lang_counts.items())
    greatest = "greatest(" + ", ".join(f"c_{k}" for k in LANG_MARKERS) + ")"
    lang_case = ("CASE " + " ".join(
        f"WHEN c_{k} > 0 AND c_{k} = {greatest} THEN '{k}'"
        for k in LANG_MARKERS) + " ELSE 'und' END")
    return f"""
WITH base AS (
  SELECT doc_id, text, length(text) AS nc, {n_tokens} AS nt,
         {n_alpha} AS na, {n_upper} AS nu, {n_digit} AS nd,
         {n_punct} AS np, {n_stop} AS ns,
         {rxcount('text', WORDPIECE_RE)} AS nbpe, {lc_cols}
  FROM documents
), derived AS (
  SELECT doc_id, nc AS n_chars, nt AS n_tokens_ws, nbpe AS n_tokens_bpe,
         round(na / CAST({nzt} AS DOUBLE), 4) AS mean_word_len,
         round(ns / CAST({nzt} AS DOUBLE), 4) AS stopword_ratio,
         round(np / CAST({nzc} AS DOUBLE), 4) AS punct_ratio,
         round(nu / CAST({nza} AS DOUBLE), 4) AS upper_ratio,
         round(nd / CAST({nzc} AS DOUBLE), 4) AS digit_ratio,
         {lang_case} AS lang_pred,
         nt, nc, na, ns, np
  FROM base
)
SELECT doc_id, n_chars, n_tokens_ws, n_tokens_bpe, mean_word_len,
       stopword_ratio, punct_ratio, upper_ratio, digit_ratio,
       round((CAST(n_tokens_ws >= 10 AND n_chars >= 50 AS INT) +
              CAST(mean_word_len >= 2.0 AND mean_word_len <= 12.0 AS INT) +
              CAST(stopword_ratio >= 0.01 AS INT) +
              CAST(punct_ratio <= 0.3 AS INT)) / 4.0, 4) AS quality,
       lang_pred
FROM derived ORDER BY doc_id"""


def dedup_exact_sql() -> str:
    return """
WITH n AS (
  SELECT doc_id,
         lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY norm) AS group_id,
       doc_id = min(doc_id) OVER (PARTITION BY norm) AS is_canonical,
       count(*) OVER (PARTITION BY norm) AS group_size
FROM n ORDER BY doc_id"""


def ann_topk_sql(k: int = 5, n_queries: int = 20) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {n_queries}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(
             CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
             e.vec_id ASC) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM scored
WHERE rank <= {k} ORDER BY query_id, rank"""


def ivf_topk_sql(k: int = 5, n_queries: int = 10, nlist: int = 8,
                 nprobe: int = 4) -> str:
    """Exact recomputation of the 'seed'-quantizer IVF index
    (kgp.similarity.ivf_build quantizer='seed'): centroids are the
    nlist smallest vec_ids, cell = argmax cosine (ties: smallest cell
    id), queries probe their nprobe closest cells, candidates in
    probed cells re-rank exactly by (cosine DESC, neighbor_id ASC)."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {nlist}
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]), c.ce) DESC,
               c.cell ASC) AS rn
    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {n_queries}
), probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qe, c.ce) DESC,
               c.cell ASC) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= {nprobe}
), scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY p.query_id
           ORDER BY list_cosine_similarity(
             q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
             a.vec_id ASC) AS rank
  FROM probe p
  JOIN assign a USING (cell)
  JOIN q ON q.query_id = p.query_id
  JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM scored
WHERE rank <= {k} ORDER BY query_id, rank"""


def embedding_near_dups_sql(threshold: float = 0.45, nlist: int = 8,
                            n_probe_cells: int = 2) -> str:
    """Exact recomputation of embedding_near_dups with the 'seed'
    quantizer: centroids = nlist smallest vec_ids; every vector joins
    its 2 closest cells (ties: smaller cell id); pairs sharing any
    cell verify with exact cosine >= threshold. Only (a, b) are
    compared — the cosine VALUE is float-rounding-sensitive across
    engines and is pytest-asserted instead (tests/test_similarity)."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {nlist}
), blocked AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]), c.ce) DESC,
               c.cell ASC) AS rn
    FROM embeddings e CROSS JOIN cent c) WHERE rn <= {n_probe_cells}
), pairs AS (
  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
  FROM blocked l JOIN blocked r
    ON l.cell = r.cell AND l.vec_id < r.vec_id
)
SELECT p.a, p.b
FROM pairs p
JOIN embeddings ea ON ea.vec_id = p.a
JOIN embeddings eb ON eb.vec_id = p.b
WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[]))
      >= {threshold}
ORDER BY a, b"""


def media_stats_sql() -> str:
    """Mirrors kgp.multimodal.synth_media payload sizes in closed form:
    BMP = 54-byte headers + 4-byte-padded BGR rows; WAV = 44-byte
    header + 2 bytes/sample; video = the raw text bytes."""
    kind = ("CASE WHEN doc_id % 3 = 0 THEN 'image' "
            "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END")
    nbytes = ("CASE WHEN doc_id % 3 = 0 THEN "
              "54 + ((3*(doc_id%13+4) + 3) // 4 * 4) * (doc_id%7+4) "
              "WHEN doc_id % 3 = 1 THEN 44 + 2*(doc_id%400+100) "
              "ELSE octet_length(encode(text)) END")
    width = ("CASE WHEN doc_id % 3 = 0 THEN doc_id%13+4 "
             "ELSE doc_id%640+16 END")
    return f"""
WITH m AS (
  SELECT {kind} AS kind, {nbytes} AS nbytes, {width} AS width
  FROM documents)
SELECT kind, count(*) AS n,
       CAST(sum(nbytes) AS BIGINT) AS total_bytes,
       round(avg(nbytes), 4) AS avg_bytes,
       CAST(max(width) AS INT) AS max_width
FROM m GROUP BY kind ORDER BY kind"""


def media_features_sql(resize_to: int = 4) -> str:
    """Exact integer pixel-sum of the nearest-neighbor-resized BMP —
    the pixel pattern is closed-form (synth_pixel_array: (id*7 + r*5 +
    c*3 + ch*11) % 256) and the linspace index floor is reproduced
    with integer division, so this verifies the REAL decode path."""
    k = resize_to - 1
    return f"""
WITH m AS (
  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
  FROM documents WHERE doc_id % 3 = 0
), px AS (
  SELECT doc_id,
    ((doc_id*7 + ((ri*(h-1))//{k})*5 + ((ci*(w-1))//{k})*3 + ch*11)
     % 256) AS v
  FROM m, range(0,{resize_to}) t1(ri), range(0,{resize_to}) t2(ci),
       range(0,3) t3(ch)
)
SELECT doc_id AS media_id, CAST(sum(v) AS BIGINT) AS sum_rgb,
       {resize_to} AS out_width, {resize_to} AS out_height
FROM px GROUP BY doc_id ORDER BY media_id"""


def minhash_pairs_sql(k: int = 5, threshold: float = 0.8) -> str:
    """EXACT k-shingle Jaccard pair set at ≥ threshold. The Spark side
    is LSH-then-exact-verify; with 32 bands of 4 rows the LSH miss
    probability at jaccard 0.8 is ~5e-8, so candidates+verify equals
    the exact all-pairs answer and can be oracle-checked. Mirrors
    kgp.dedup._shingle_set normalization (lower, ws-collapse)."""
    return f"""
WITH n AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, greatest(length(t) - {k - 1}, 1) + 1),
           i -> substring(t, CAST(i AS INT), {k}))) AS g
  FROM n WHERE t <> ''
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT inter.a AS a, inter.b AS b
FROM inter
JOIN sizes sa ON sa.doc_id = inter.a
JOIN sizes sb ON sb.doc_id = inter.b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {threshold}
ORDER BY a, b"""


def near_dup_groups_sql(k: int = 5, threshold: float = 0.8) -> str:
    """Connected components over the EXACT Jaccard pair set (the same
    edges minhash_pairs_sql verifies) via a recursive reachability CTE:
    group_id = min doc_id reachable in the similarity graph."""
    pairs = minhash_pairs_sql(k, threshold)
    # strip the trailing ORDER BY of the pair query for embedding
    pairs_body = pairs[:pairs.rindex("ORDER BY")]
    return f"""
WITH RECURSIVE pair_set AS ({pairs_body}),
edges AS (
  SELECT a AS src, b AS dst FROM pair_set
  UNION ALL SELECT b, a FROM pair_set
),
walk(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, walk.comp FROM walk JOIN edges e ON e.src = walk.id
)
SELECT id AS doc_id, MIN(comp) AS group_id,
       MIN(comp) = id AS is_canonical
FROM walk GROUP BY id ORDER BY doc_id"""


def simhash_pairs_sql(k: int = 5, max_hamming: int = 3) -> str:
    """EXACT SimHash pair set: the sketch hash is the first 8 md5
    bytes (kgp.dedup._stable_hash64), so DuckDB recomputes the
    identical 64-bit signature — per-bit votes over distinct
    k-shingles, exact two's-complement assembly from 32-bit halves —
    and the ≤ max_hamming pair set bit-for-bit."""
    two64 = "CAST(18446744073709551616 AS HUGEINT)"
    return f"""
WITH n AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, greatest(length(t) - {k - 1}, 1) + 1),
           i -> substring(t, CAST(i AS INT), {k}))) AS g
  FROM n WHERE t <> ''
), hv AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT) AS h
  FROM sh
), votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1
             THEN 1 ELSE -1 END) AS v
  FROM hv, range(0, 64) t(b) GROUP BY doc_id, b
), sim AS (
  SELECT doc_id, CAST(
    CAST(SUM(CASE WHEN b < 32 AND v > 0
             THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END)
         AS HUGEINT)
    + CAST(SUM(CASE WHEN b >= 32 AND v > 0
               THEN CAST(1 AS BIGINT) << CAST(b - 32 AS INT) ELSE 0 END)
           AS HUGEINT) * 4294967296
    - CASE WHEN MAX(CASE WHEN b = 63 AND v > 0 THEN 1 ELSE 0 END) = 1
           THEN {two64} ELSE 0 END
    AS BIGINT) AS s
  FROM votes GROUP BY doc_id
)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.s, y.s)) AS INT) AS hamming
FROM sim x JOIN sim y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.s, y.s)) <= {max_hamming}
ORDER BY a, b"""


def canon_sql() -> str:
    """Golden connected-components mapping as a VALUES table (the
    gazetteer is code-defined, so the expected mapping is static)."""
    from kgp.corpus import expected_canon
    rows = ", ".join(f"({eid}, {cid})"
                     for eid, cid in sorted(expected_canon().items()))
    return ("SELECT CAST(col0 AS BIGINT) AS entity_id, "
            "CAST(col1 AS BIGINT) AS canon_id FROM "
            f"(VALUES {rows}) ORDER BY entity_id")


def repetition_signals_sql(dup_slice_mod: int = 7) -> str:
    """DuckDB mirror of kgp.repetition.repetition_signals — the exact
    definitions from that module's docstring: duplicate-segment
    fractions via per-segment counts ((cnt-1)*len == chars after each
    first occurrence), top-n-gram by (cnt, gram)-largest pair, and
    duplicated-n-gram char mass, all over the same word regex.

    dup_slice_mod: the adversarial corpus slice (doc_id % mod == 0 has
    its text doubled around a newline) that keeps the duplicate-line /
    duplicate-n-gram families non-degenerate on the single-line
    documents table — mirrored by the queries() wrapper."""
    from kgp.repetition import DUP_NS, TOP_NS

    ns = ", ".join(str(n) for n in TOP_NS + DUP_NS)
    src = ("(SELECT doc_id, CASE WHEN doc_id % {m} = 0 THEN "
           "text || chr(10) || text ELSE text END AS text "
           "FROM documents)").format(m=dup_slice_mod) \
        if dup_slice_mod else "documents"

    def seg_cte(name: str, col: str) -> str:
        return f"""{name} AS (
  SELECT doc_id,
         sum(cnt) AS n_segs, count(*) AS n_distinct,
         sum(cnt * len) AS total_chars,
         sum((cnt - 1) * len) AS dup_chars
  FROM (SELECT doc_id, seg, count(*) AS cnt, length(seg) AS len
        FROM (SELECT doc_id, unnest({col}) AS seg FROM base)
        GROUP BY doc_id, seg)
  GROUP BY doc_id
)"""

    top_cols = ",\n       ".join(
        f"round(coalesce(t{n}.top_chars / nullif(b.nc, 0), 0), 4) "
        f"AS top_{n}gram_char_frac" for n in TOP_NS)
    dup_cols = ",\n       ".join(
        f"round(least(1.0, coalesce(d{n}.dup_chars / nullif(b.nc, 0), "
        f"0)), 4) AS dup_{n}gram_char_frac" for n in DUP_NS)
    top_joins = "\n".join(
        f"LEFT JOIN top t{n} ON t{n}.doc_id = b.doc_id AND t{n}.n = {n}"
        for n in TOP_NS)
    dup_joins = "\n".join(
        f"LEFT JOIN dup d{n} ON d{n}.doc_id = b.doc_id AND d{n}.n = {n}"
        for n in DUP_NS)
    return f"""
WITH base AS (
  SELECT doc_id, length(text) AS nc,
         list_filter(list_transform(string_split(text, chr(10)),
                     x -> trim(x)), x -> x <> '') AS lines,
         list_filter(list_transform(
                     regexp_split_to_array(text, '\\n\\s*\\n'),
                     x -> trim(x)), x -> x <> '') AS paras,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS words
  FROM {src}
), {seg_cte('seg_line', 'lines')}, {seg_cte('seg_para', 'paras')},
gram_counts AS (
  SELECT doc_id, n, gram, count(*) AS cnt
  FROM (SELECT b.doc_id, ns.n,
               unnest(list_transform(
                   range(1, greatest(len(b.words) - ns.n + 2, 1)),
                   i -> array_to_string(b.words[i:i+ns.n-1], ' ')))
               AS gram
        FROM base b
        CROSS JOIN (SELECT unnest([{ns}]) AS n) ns)
  GROUP BY doc_id, n, gram
),
top AS (
  SELECT doc_id, n, cnt * length(gram) AS top_chars
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
                  ORDER BY cnt DESC, gram DESC) AS rn
        FROM gram_counts WHERE n <= {max(TOP_NS)})
  WHERE rn = 1
),
dup AS (
  SELECT doc_id, n, sum((cnt - 1) * length(gram)) AS dup_chars
  FROM gram_counts WHERE n >= {min(DUP_NS)} AND cnt > 1
  GROUP BY doc_id, n
)
SELECT b.doc_id,
       round(coalesce((l.n_segs - l.n_distinct)
             / CAST(nullif(l.n_segs, 0) AS DOUBLE), 0), 4)
           AS dup_line_frac,
       round(coalesce(l.dup_chars
             / CAST(nullif(l.total_chars, 0) AS DOUBLE), 0), 4)
           AS dup_line_char_frac,
       round(coalesce((p.n_segs - p.n_distinct)
             / CAST(nullif(p.n_segs, 0) AS DOUBLE), 0), 4)
           AS dup_para_frac,
       round(coalesce(p.dup_chars
             / CAST(nullif(p.total_chars, 0) AS DOUBLE), 0), 4)
           AS dup_para_char_frac,
       {top_cols},
       {dup_cols}
FROM base b
LEFT JOIN seg_line l ON l.doc_id = b.doc_id
LEFT JOIN seg_para p ON p.doc_id = b.doc_id
{top_joins}
{dup_joins}
ORDER BY b.doc_id"""


def line_dedup_sql(max_docs: int = 4) -> str:
    """DuckDB mirror of kgp.dedup.cross_doc_line_dedup over the
    extracted pipeline text (the same extract CTE as extract_text):
    strike trimmed lines present in > max_docs distinct documents,
    rebuild each document in original line order."""
    ext = extract_text_sql()
    return f"""
WITH docs AS (SELECT url, text FROM ({ext})),
lines AS (
  SELECT url, idx, trim(raw) AS line
  FROM (SELECT url,
               unnest(string_split(text, chr(10))) AS raw,
               generate_subscripts(string_split(text, chr(10)), 1)
                   AS idx
        FROM docs)
  WHERE trim(raw) <> ''
),
freq AS (
  SELECT line FROM (SELECT DISTINCT url, line FROM lines)
  GROUP BY line HAVING count(*) > {max_docs}
),
kept AS (
  SELECT l.* FROM lines l LEFT JOIN freq f ON l.line = f.line
  WHERE f.line IS NULL
),
n_orig AS (SELECT url, count(*) AS n FROM lines GROUP BY url),
rebuilt AS (
  SELECT url, string_agg(line, chr(10) ORDER BY idx) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY url
)
SELECT o.url, coalesce(r.clean_text, '') AS clean_text,
       CAST(o.n - coalesce(r.n_kept, 0) AS INT) AS n_removed
FROM n_orig o LEFT JOIN rebuilt r ON o.url = r.url
ORDER BY o.url"""


# --------------------------------------------------- curation oracles

# line decorations the c4_filter GATE QUERY appends to the single-line
# documents text so every C4 rule family is non-degenerate; the Spark
# side (__spark_entry__._q_c4_filter) builds the identical column
C4_SLICES_SQL = (
    "text"
    " || CASE WHEN doc_id % 5 = 0 THEN chr(10) ||"
    " 'First full sentence for the keep rule to fire.' || chr(10) ||"
    " 'Second full sentence for the keep rule to fire.' || chr(10) ||"
    " 'Third full sentence for the keep rule to fire.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 7 = 1 THEN chr(10) || 'Short snip.' ||"
    " chr(10) ||"
    " 'We mention Lorem Ipsum dolor sit amet right here today.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 11 = 2 THEN chr(10) ||"
    " 'function f() does return early; it is a code line brace {.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 13 = 3 THEN chr(10) ||"
    " 'Please enable JavaScript to continue reading this page today.'"
    " ELSE '' END")


def c4_filter_sql(min_words: int = 5, min_lines: int = 3) -> str:
    """DuckDB mirror of kgp.curation.c4_filter over the decorated
    documents text (C4_SLICES_SQL)."""
    wc = ("CASE WHEN trim(l) = '' THEN 0 ELSE"
          " len(regexp_split_to_array(trim(l), '\\s+')) END")
    keep_line = (f"({wc} >= {min_words}"
                 " AND regexp_matches(trim(l), '[.!?\"]$')"
                 " AND NOT contains(lower(trim(l)), 'javascript'))")
    return f"""
WITH d AS (SELECT doc_id, {C4_SLICES_SQL} AS text FROM documents),
split AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines
          FROM d)
SELECT doc_id,
  coalesce(array_to_string(list_transform(
      list_filter(lines, l -> {keep_line}), l -> trim(l)), chr(10)), '')
    AS clean_text,
  CAST(len(list_filter(lines, l -> trim(l) <> '')) AS INT) AS n_lines,
  CAST(len(list_filter(lines, l -> {keep_line})) AS INT) AS n_kept,
  (len(list_filter(lines, l -> {keep_line})) >= {min_lines}
   AND NOT contains(lower(text), 'lorem ipsum')
   AND NOT contains(text, '{{')) AS keep_doc
FROM split ORDER BY doc_id"""


# messy-URL decoration for the url_canon_sample gate query: a pure
# function of doc_id the Spark query synthesizes identically
MESSY_URL_SQL = (
    "'https://WWW.News-' || CAST(doc_id % 5 AS VARCHAR)"
    " || '.Example.COM:443/Articles/' || CAST(doc_id AS VARCHAR)"
    " || '.html'"
    " || CASE WHEN doc_id % 3 = 0 THEN"
    "  '?utm_source=feed&ref=tw&b=' || CAST(doc_id % 7 AS VARCHAR)"
    "  || '&a=1'"
    " WHEN doc_id % 3 = 1 THEN"
    "  '/?z=2&a=' || CAST(doc_id % 7 AS VARCHAR)"
    " ELSE '#section-' || CAST(doc_id % 4 AS VARCHAR) END")


def url_canon_sample_sql(rates: dict[str, float] | None = None,
                         default_rate: float = 1.0) -> str:
    """DuckDB mirror of canonical_url + sample_key + stratified_sample
    over the synthesized messy URLs. The canonical form is computed by
    the same regex/sort pipeline, not a closed form, so the oracle
    exercises every canonicalization step."""
    rates = rates if rates is not None else {"src0": 0.25, "src1": 0.5}
    rate = "CASE " + " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in sorted(rates.items())
    ) + f" ELSE {default_rate} END"
    return f"""
WITH m AS (SELECT doc_id, source, {MESSY_URL_SQL} AS messy
           FROM documents),
nofrag AS (SELECT *, regexp_replace(messy, '#.*$', '') AS u FROM m),
parts AS (
  SELECT *, regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)
      AS head0,
    CASE WHEN regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)
           = '' THEN u
         ELSE substr(u, len(regexp_extract(u,
              '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)) + 1) END
      AS tail FROM nofrag),
canon AS (
  SELECT doc_id, source,
    regexp_replace(regexp_replace(regexp_replace(lower(head0),
        '^([a-z0-9+.-]+://)www\\.', '\\1'),
        '^(http://[^/?:]*):80$', '\\1'),
        '^(https://[^/?:]*):443$', '\\1')
    || regexp_replace(regexp_extract(tail, '^([^?]*)', 1),
                      '(.)/$', '\\1')
    || CASE WHEN coalesce(array_to_string(list_sort(list_filter(
           string_split(CASE WHEN contains(tail, '?') THEN
               regexp_replace(tail, '^[^?]*\\?', '') ELSE '' END, '&'),
           p -> p <> '' AND NOT regexp_matches(p,
             '^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref)='))), '&'),
           '') = '' THEN ''
       ELSE '?' || array_to_string(list_sort(list_filter(
           string_split(CASE WHEN contains(tail, '?') THEN
               regexp_replace(tail, '^[^?]*\\?', '') ELSE '' END, '&'),
           p -> p <> '' AND NOT regexp_matches(p,
             '^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref)='))), '&')
       END AS canon_url
  FROM parts)
SELECT doc_id, canon_url,
  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
    % 10000 AS k
FROM canon
WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000 AS DOUBLE) < ({rate}) * 10000.0
ORDER BY doc_id"""


def seq_packing_sql(seq_len: int = 512) -> str:
    """DuckDB mirror of kgp.packing.pack_sequences over documents:
    the two-phase distributed scan must equal the plain single-node
    window prefix sum."""
    wc = ("CASE WHEN trim(text) = '' THEN 0 ELSE"
          " len(regexp_split_to_array(trim(text), '\\s+')) END")
    return f"""
WITH c AS (SELECT doc_id, CAST({wc} AS BIGINT) AS n_tokens
           FROM documents),
o AS (SELECT doc_id, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS off
      FROM c)
SELECT doc_id, n_tokens, off AS "offset",
  off // {seq_len} AS chunk_first,
  CASE WHEN n_tokens > 0 THEN (off + n_tokens - 1) // {seq_len}
       ELSE off // {seq_len} END AS chunk_last
FROM o ORDER BY doc_id"""


def doc_scopes_sql() -> str:
    """Scope detectors over the closed-form location instances.

    Per document the templates yield these location-annotation
    instances (kgp.constants): {city} in S1 and S3 always, S4 when
    doc_id%3=0, S8 when doc_id%6=3; {city2} in S2 always, S7 when
    doc_id%23=11; {city3} in S9 when doc_id%7=4; {country} in S4 when
    doc_id%3=0. City i: population 10000*(i+3), lat 10+i, lon -3i;
    country i: population 1000000*(i+2), lat 20+i, lon 5i
    (kgp.corpus.gazetteer_rows). The ambiguous CITIES[0] duplicate
    loses linking on population, so city index i maps to CITY_ID+i."""
    city = f"{C.CITY_ID} + doc_id % 11"
    city2 = f"{C.CITY_ID} + (doc_id + 3) % 11"
    city3 = f"{C.CITY_ID} + (doc_id + 5) % 11"
    country = f"{C.COUNTRY_ID} + doc_id % 7"
    url = url_sql()

    def crow(e_expr, idx_expr, ord_, cond=None):
        # the ambiguous CITIES[0] surface: the tiny duplicate wins the
        # anchor-hierarchy boost when the document's country (present
        # iff doc_id%3=0, index doc_id%7) is its ancestor COUNTRY_ID+1
        w = f" WHERE {cond}" if cond else ""
        dup = (f"(({idx_expr}) = 0 AND doc_id % 3 = 0 "
               "AND doc_id % 7 = 1)")
        return (f"SELECT {url} AS url, "
                f"CASE WHEN {dup} THEN {C.CITY_DUP_ID} "
                f"ELSE {e_expr} END AS e, 0 AS is_cc, "
                f"CASE WHEN {dup} THEN 900 "
                f"ELSE 10000 * (({idx_expr}) + 3) END AS pop, "
                f"CASE WHEN {dup} THEN 51.0 "
                f"ELSE 10.0 + ({idx_expr}) END AS lat, "
                f"CASE WHEN {dup} THEN 7.0 "
                f"ELSE -3.0 * ({idx_expr}) END AS lon, {ord_} AS ord "
                f"FROM documents{w}")

    rows = [
        crow(city, "doc_id % 11", 1),                       # S1
        crow(city2, "(doc_id + 3) % 11", 2),                # S2
        crow(city, "doc_id % 11", 3),                       # S3
        crow(city, "doc_id % 11", 4, "doc_id % 3 = 0"),     # S4
        (f"SELECT {url} AS url, {country} AS e, 1 AS is_cc, "
         f"1000000 * ((doc_id % 7) + 2) AS pop, "
         f"20.0 + (doc_id % 7) AS lat, 5.0 * (doc_id % 7) AS lon, "
         "5 AS ord FROM documents WHERE doc_id % 3 = 0"),   # S4 country
        crow(city3, "(doc_id + 5) % 11", 6,
             f"doc_id % {C.S9_MOD} = {C.S9_VAL}"),          # S9
        crow(city2, "(doc_id + 3) % 11", 7,
             f"doc_id % {C.HOLDOUT_MOD} = {C.HOLDOUT_VAL}"),  # S7
        crow(city, "doc_id % 11", 8,
             f"doc_id % {C.S8_MOD} = {C.S8_VAL}"),          # S8
    ]
    inst = " UNION ALL ".join(rows)
    return f"""
WITH inst AS ({inst}),
freq AS (
  SELECT url, 'frequency' AS method, e AS entity_id FROM (
    SELECT url, e, count(*) AS n,
      row_number() OVER (PARTITION BY url
                         ORDER BY count(*) DESC, e ASC) AS rn
    FROM inst GROUP BY url, e) WHERE rn = 1),
pop AS (
  SELECT url, 'population' AS method, e AS entity_id FROM (
    SELECT url, e,
      row_number() OVER (PARTITION BY url
                         ORDER BY is_cc DESC, pop DESC, e ASC) AS rn
    FROM (SELECT DISTINCT url, e, is_cc, pop FROM inst)
    WHERE is_cc = 1 OR pop > 0) WHERE rn = 1),
mid AS (
  SELECT url, 'midpoint' AS method, e AS entity_id FROM (
    SELECT url, e,
      row_number() OVER (PARTITION BY url ORDER BY dot DESC, e ASC)
        AS rn
    FROM (SELECT url, e,
            round(avg(cos(radians(lat)) * cos(radians(lon))) OVER w
              * cos(radians(lat)) * cos(radians(lon))
            + avg(cos(radians(lat)) * sin(radians(lon))) OVER w
              * cos(radians(lat)) * sin(radians(lon))
            + avg(sin(radians(lat))) OVER w * sin(radians(lat)), 12)
              AS dot
          FROM inst WINDOW w AS (PARTITION BY url))) WHERE rn = 1),
frst AS (
  SELECT url, 'first' AS method, e AS entity_id FROM (
    SELECT url, e,
      row_number() OVER (PARTITION BY url ORDER BY ord ASC, e ASC)
        AS rn
    FROM inst) WHERE rn = 1),
ldst AS (
  -- LeastDistanceScopeDetector: per-annotation summed haversine to
  -- every annotation instance, quantized to 1e-6 km like the Spark
  -- side (kgp.scope.scope_least_distance)
  SELECT url, 'least_distance' AS method, e AS entity_id FROM (
    SELECT a.url, a.ord, a.e,
      round(SUM(2 * 6371.0 * asin(sqrt(least(
        pow(sin((radians(b.lat) - radians(a.lat)) / 2), 2)
        + cos(radians(a.lat)) * cos(radians(b.lat))
          * pow(sin((radians(b.lon) - radians(a.lon)) / 2), 2),
        1.0)))), 6) AS dsum
    FROM inst a JOIN inst b ON a.url = b.url
    GROUP BY a.url, a.ord, a.e) t
  QUALIFY row_number() OVER (PARTITION BY url
                             ORDER BY dsum ASC, ord ASC, e ASC) = 1)
SELECT * FROM freq UNION ALL SELECT * FROM pop
UNION ALL SELECT * FROM mid UNION ALL SELECT * FROM frst
UNION ALL SELECT * FROM ldst
ORDER BY url, method"""


def entity_pairs_sql() -> str:
    """DuckDB mirror of kgp.relations.co_occurrence_pairs in DOCUMENT
    mode over the closed-form mention rows: distinct (url, surface,
    tag), self-joined per url with surface_a < surface_b."""
    return f"""
WITH m AS (SELECT DISTINCT url, surface, tag FROM
           ({_mention_rows_sql()}))
SELECT a.surface AS surface_a, b.surface AS surface_b,
       a.tag AS tag_a, b.tag AS tag_b,
       CAST(count(*) AS BIGINT) AS n_contexts
FROM m a JOIN m b ON a.url = b.url AND a.surface < b.surface
GROUP BY a.surface, b.surface, a.tag, b.tag
ORDER BY surface_a, surface_b, tag_a, tag_b"""


def json_fields_sql() -> str:
    """Oracle for the JPath gate query: the Spark side round-trips
    document fields through to_json and extracts them back with JPath
    queries (kgp.sources.json_query), so the correct output equals the
    original fields."""
    return """
SELECT doc_id, source AS src, lang,
       CAST(n_chars AS VARCHAR) AS n_chars_str
FROM documents ORDER BY doc_id"""


def nb_lang_pred_sql(laplace: float = 1e-5) -> str:
    """DuckDB mirror of the Naive Bayes gate query: train on
    (n_chars numeric, bucket nominal) -> lang over the documents
    table, predict per doc — identical Laplace / Gaussian / density-
    normalization math as kgp.mlzoo.nb_classify (which itself ports
    NaiveBayesModel.java:85-199), argmax by score with ascending-
    category tie-break (scores are all-negative log space, so score
    order == probability order)."""
    return f"""
WITH feat AS (
  SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(doc_id % 3 AS VARCHAR) AS bucket, lang AS label
  FROM documents
), cat AS (
  SELECT label, COUNT(*) AS cat_n FROM feat GROUP BY label
), tot AS (
  SELECT COUNT(*) AS k, SUM(cat_n) AS total_n FROM cat
), nom AS (
  SELECT label, bucket, COUNT(*) AS n FROM feat GROUP BY label, bucket
), num AS (
  SELECT label, avg(n_chars) AS mean,
         COALESCE(stddev_samp(n_chars), 0) AS std
  FROM feat GROUP BY label
), nrm AS (
  SELECT SUM(CASE WHEN std > 0
                  THEN 1.0 / (std * sqrt(2 * pi())) END) AS norm
  FROM num
), scored AS (
  SELECT f.doc_id, c.label AS category,
    ln(CAST(c.cat_n AS DOUBLE) / t.total_n)
    + ln((COALESCE(nm.n, 0) + {laplace})
         / (c.cat_n + {laplace} * t.k))
    + CASE WHEN nu.std > 0 AND
                (1.0 / sqrt(2 * pi() * nu.std * nu.std)
                 * exp(-pow(f.n_chars - nu.mean, 2)
                       / (2 * nu.std * nu.std)) / r.norm) > 0
           THEN ln(1.0 / sqrt(2 * pi() * nu.std * nu.std)
                   * exp(-pow(f.n_chars - nu.mean, 2)
                         / (2 * nu.std * nu.std)) / r.norm)
           ELSE 0 END AS score
  FROM feat f
  CROSS JOIN cat c CROSS JOIN tot t CROSS JOIN nrm r
  LEFT JOIN nom nm ON nm.label = c.label AND nm.bucket = f.bucket
  LEFT JOIN num nu ON nu.label = c.label
), ranked AS (
  SELECT doc_id, category,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, category ASC) AS rk
  FROM scored
)
SELECT doc_id, category AS predicted FROM ranked WHERE rk = 1
ORDER BY doc_id
"""


# decoration for the gopher_quality gate query: deterministic slices
# keep every rule family non-degenerate on the keyword-soup documents
# table (which the word-count + stop-word rules correctly drop
# wholesale — the %3 prose slice pushes a third of the corpus over
# both bars so keep=true appears)
GOPHER_PROSE = (
    "the quick brown fox jumps over that lazy dog to be of and with "
    "have plenty more plain words in this long extra line so the keep "
    "rule can fire on some documents today and tomorrow without any "
    "trouble at all")

GOPHER_SLICES_SQL = (
    "text"
    f" || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{GOPHER_PROSE}'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN"
    " chr(10) || '• bullet one' || chr(10) || '• bullet two'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN"
    " chr(10) || 'to be continued...' || chr(10) || 'still going…'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN"
    " chr(10) || '# # # # # # # #' ELSE '' END")


def gopher_quality_sql(min_words: int = 50, max_words: int = 100000,
                       max_symbol_ratio: float = 0.1,
                       max_bullet_frac: float = 0.9,
                       max_ellipsis_frac: float = 0.3,
                       min_alpha_frac: float = 0.8,
                       min_stop_words: int = 2) -> str:
    """DuckDB mirror of kgp.curation.gopher_quality_signals + filter
    over the decorated documents text (GOPHER_SLICES_SQL)."""
    stops = ", ".join(f"'{s}'" for s in
                      ("the", "be", "to", "of", "and",
                       "that", "have", "with"))
    return f"""
WITH dec AS (SELECT doc_id, {GOPHER_SLICES_SQL} AS text FROM documents),
w AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
      AS words,
    list_filter(list_transform(string_split(text, chr(10)),
                               x -> trim(x)), x -> x <> '') AS lines
  FROM dec),
s AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    round(CAST(list_sum(list_transform(words, x -> length(x)))
               AS DOUBLE) / nullif(len(words), 0), 6) AS mean_word_len,
    round(CAST(length(text) - length(replace(text, '#', ''))
               AS DOUBLE) / nullif(len(words), 0), 6)
      AS hash_word_ratio,
    round(CAST((length(text) - length(replace(text, '…', '')))
               + (length(text) - length(replace(text, '...', ''))) / 3
               AS DOUBLE) / nullif(len(words), 0), 6)
      AS ellipsis_word_ratio,
    round(CAST(len(list_filter(lines, x -> starts_with(x, '•')
               OR starts_with(x, '-') OR starts_with(x, '*')))
               AS DOUBLE) / nullif(len(lines), 0), 6)
      AS bullet_line_frac,
    round(CAST(len(list_filter(lines, x -> ends_with(x, '…')
               OR ends_with(x, '...'))) AS DOUBLE)
          / nullif(len(lines), 0), 6) AS ellipsis_line_frac,
    round(CAST(len(list_filter(words, x -> regexp_matches(x,
               '[A-Za-z]'))) AS DOUBLE) / nullif(len(words), 0), 6)
      AS alpha_word_frac,
    CAST(len(list_intersect(list_transform(words, x -> lower(x)),
                            [{stops}])) AS INT) AS n_stop_words
  FROM w)
SELECT *,
  (n_words BETWEEN {min_words} AND {max_words}
   AND mean_word_len BETWEEN 3.0 AND 10.0
   AND hash_word_ratio <= {max_symbol_ratio}
   AND ellipsis_word_ratio <= {max_symbol_ratio}
   AND coalesce(bullet_line_frac, 1.0) <= {max_bullet_frac}
   AND coalesce(ellipsis_line_frac, 1.0) <= {max_ellipsis_frac}
   AND alpha_word_frac >= {min_alpha_frac}
   AND n_stop_words >= {min_stop_words}) AS keep
FROM s ORDER BY doc_id"""


# decoration for the pii_scrub gate query: deterministic PII snippets
# (the documents table contains none organically)
PII_SLICES_SQL = (
    "text"
    " || CASE WHEN doc_id % 4 = 0 THEN"
    " ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN"
    " ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN"
    " ' call +1 (555) 123-' || CAST(1000 + doc_id % 9000 AS VARCHAR)"
    " ELSE '' END")


def pii_scrub_sql() -> str:
    """DuckDB mirror of kgp.pii.pii_scrub over the decorated documents
    text — the identical regexes run under RE2 ('g' replace, group-0
    extract_all), in the identical email → IP → phone order."""
    from kgp.pii import (EMAIL_RE, EMAIL_TOKEN, IP_TOKEN, IPV4_RE,
                         PHONE_RE, PHONE_TOKEN)

    def q(p: str) -> str:
        # standard SQL string literals keep backslashes verbatim —
        # only quotes need doubling
        return p.replace("'", "''")

    return f"""
WITH dec AS (SELECT doc_id, {PII_SLICES_SQL} AS text FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{q(EMAIL_RE)}', '{EMAIL_TOKEN}', 'g'),
      '{q(IPV4_RE)}', '{IP_TOKEN}', 'g'),
      '{q(PHONE_RE)}', '{PHONE_TOKEN}', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text, '{q(EMAIL_RE)}')) AS INT)
    AS n_emails,
  CAST(len(regexp_extract_all(text, '{q(IPV4_RE)}')) AS INT) AS n_ips,
  CAST(len(regexp_extract_all(text, '{q(PHONE_RE)}')) AS INT)
    AS n_phones
FROM dec ORDER BY doc_id"""


# canary sentence for the decontaminate gate query (20 normalized
# tokens -> 8 matching 13-grams per contaminated slice); appended to
# the doc_id % 31 = 0 "benchmark" slice AND the doc_id % 17 = 5
# training slice, so contamination is non-degenerate on the keyword
# corpus (whose organic 13-gram overlap is ~0)
DECONTAM_CANARY = (
    "the quick brown benchmark fox jumps over the lazy evaluation "
    "suite and answers every single held out question")

DECONTAM_TEST_SLICE = "doc_id % 31 = 0"
DECONTAM_TRAIN_CONTAM_SLICE = "doc_id % 17 = 5"


def _decontam_tokens_sql(expr: str) -> str:
    return ("list_filter(string_split(regexp_replace(lower(" + expr +
            "), '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')")


def decontaminate_sql(n: int = 13) -> str:
    """DuckDB mirror of kgp.decontam.decontaminate over the decorated
    documents split: doc_id % 31 = 0 rows (plus canary) form the test
    set, the rest (canary on the % 17 = 5 slice) the training corpus.
    The n-gram pipeline (lowercase, punctuation -> space, split,
    space-joined n-grams) is recomputed from the same expressions."""
    grams = (f"list_transform(generate_series(1, len(words) - {n - 1}),"
             f" i -> array_to_string(list_slice(words, i, i + {n - 1}),"
             " ' '))")
    return f"""
WITH test_d AS (
  SELECT text || ' ' || '{DECONTAM_CANARY}' AS text
  FROM documents WHERE {DECONTAM_TEST_SLICE}),
train_d AS (
  SELECT doc_id,
    text || CASE WHEN {DECONTAM_TRAIN_CONTAM_SLICE}
                 THEN ' ' || '{DECONTAM_CANARY}' ELSE '' END AS text
  FROM documents WHERE NOT ({DECONTAM_TEST_SLICE})),
test_g AS (
  SELECT DISTINCT unnest({grams}) AS ngram
  FROM (SELECT {_decontam_tokens_sql('text')} AS words FROM test_d)),
train_g AS (
  SELECT doc_id, words, {grams} AS grams
  FROM (SELECT doc_id, {_decontam_tokens_sql('text')} AS words
        FROM train_d)),
matches AS (
  SELECT t.doc_id, count(*) AS n_matches
  FROM (SELECT doc_id, unnest(grams) AS ngram FROM train_g) t
  JOIN test_g USING (ngram) GROUP BY t.doc_id)
SELECT g.doc_id, CAST(len(g.grams) AS INT) AS n_ngrams,
  CAST(coalesce(m.n_matches, 0) AS INT) AS n_matches,
  coalesce(m.n_matches, 0) > 0 AS contaminated
FROM train_g g LEFT JOIN matches m ON g.doc_id = m.doc_id
ORDER BY g.doc_id"""


def unigram_lm_sql(max_vocab: int = 30) -> str:
    """DuckDB mirror of kgp.lmscore: top-`max_vocab` add-one unigram
    model fit on the documents table, then per-document mean token
    log-probability. Token logp quantized to integer 1e-7 units
    (Java vs C ln() last-ulp), the mean an exact BIGINT sum divided
    once — same order-independent recipe as the stage."""
    toks = _decontam_tokens_sql("text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS word FROM documents),
tot AS (SELECT count(*) AS t FROM toks),
voc AS (SELECT word, count(*) AS cnt FROM toks
        GROUP BY word ORDER BY cnt DESC, word ASC LIMIT {max_vocab}),
vn AS (SELECT count(*) AS v FROM voc)
SELECT d.doc_id,
  CAST(count(t.word) AS INT) AS n_tokens,
  CASE WHEN count(t.word) > 0 THEN
    SUM(CASE WHEN t.word IS NOT NULL THEN
          CAST(round(ln((coalesce(voc.cnt, 0) + 1.0)
                        / (tot.t + vn.v + 1)) * 10000000.0)
               AS BIGINT) END)
    / (count(t.word) * 10000000.0) END AS avg_logp
FROM documents d
LEFT JOIN toks t ON d.doc_id = t.doc_id
LEFT JOIN voc ON t.word = voc.word, tot, vn
GROUP BY d.doc_id ORDER BY d.doc_id"""


def dbscan_clusters_sql(threshold: float = 0.45, nlist: int = 8,
                        min_pts: int = 3) -> str:
    """DuckDB mirror of kgp.clustering.dbscan over the deterministic
    IVF-blocked within-eps pair set (embedding_near_dups_sql's exact
    blocking): degree+1 >= min_pts -> core; clusters = recursive
    reachability over core-core edges (min id); border -> min
    neighboring core cluster; noise -> singleton."""
    pairs = embedding_near_dups_sql(threshold, nlist)
    pairs_body = pairs[:pairs.rindex("ORDER BY")]
    return f"""
WITH RECURSIVE pair_set AS ({pairs_body}),
sym AS (
  SELECT a, b FROM pair_set UNION SELECT b, a FROM pair_set),
deg AS (SELECT a AS id, count(*) AS d FROM sym GROUP BY a),
core AS (SELECT id FROM deg WHERE d + 1 >= {min_pts}),
core_edges AS (
  SELECT s.a AS src, s.b AS dst FROM sym s
  JOIN core c1 ON s.a = c1.id JOIN core c2 ON s.b = c2.id),
walk(id, comp) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.dst, walk.comp FROM walk JOIN core_edges e
    ON e.src = walk.id),
core_cluster AS (
  SELECT id, MIN(comp) AS cluster_id FROM walk GROUP BY id),
border AS (
  SELECT s.a AS id, MIN(cc.cluster_id) AS cluster_id
  FROM sym s JOIN core_cluster cc ON s.b = cc.id
  WHERE s.a NOT IN (SELECT id FROM core)
  GROUP BY s.a)
SELECT e.vec_id,
  coalesce(cc.cluster_id, b.cluster_id, e.vec_id) AS cluster_id,
  CASE WHEN cc.id IS NOT NULL THEN 'core'
       WHEN b.id IS NOT NULL THEN 'border'
       ELSE 'noise' END AS role
FROM embeddings e
LEFT JOIN core_cluster cc ON e.vec_id = cc.id
LEFT JOIN border b ON e.vec_id = b.id
ORDER BY e.vec_id"""


# deterministic actual/predicted decoration for the model_eval gate
# query: every ConfusionMatrix edge case is non-degenerate — %5=0
# correct, %5=1 predicts the never-real 'ghost' class (recall-quirk
# row), %31=7 adds a real-but-never-predicted class (null precision),
# the rest are off-by-one wrong
EVAL_ACTUAL_SQL = ("CASE WHEN doc_id % 31 = 7 THEN 'never_pred' "
                   "ELSE 'c' || CAST(doc_id % 3 AS VARCHAR) END")
EVAL_PREDICTED_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN 'c' || CAST(doc_id % 3 AS VARCHAR) "
    "WHEN doc_id % 5 = 1 THEN 'ghost' "
    "ELSE 'c' || CAST((doc_id + 1) % 3 AS VARCHAR) END")


def model_eval_sql() -> str:
    """DuckDB mirror of kgp.evaluate.category_metrics over the
    decorated (actual, predicted) pairs, including the reference edge
    cases: recall=1.0 for categories with no real docs, precision
    null for categories never predicted."""
    return f"""
WITH r AS (
  SELECT {EVAL_ACTUAL_SQL} AS actual, {EVAL_PREDICTED_SQL} AS predicted
  FROM documents),
cm AS (SELECT actual, predicted, count(*) AS n FROM r
       GROUP BY actual, predicted),
cats AS (SELECT actual AS category FROM cm
         UNION SELECT predicted FROM cm),
real AS (SELECT actual AS category, sum(n) AS n_real FROM cm
         GROUP BY actual),
cls AS (SELECT predicted AS category, sum(n) AS n_classified FROM cm
        GROUP BY predicted),
corr AS (SELECT actual AS category, n AS n_correct FROM cm
         WHERE actual = predicted),
tot AS (SELECT sum(n) AS t FROM cm),
j AS (
  SELECT c.category,
    coalesce(r.n_real, 0) AS n_real,
    coalesce(cl.n_classified, 0) AS n_classified,
    coalesce(co.n_correct, 0) AS n_correct, tot.t
  FROM cats c
  LEFT JOIN real r ON c.category = r.category
  LEFT JOIN cls cl ON c.category = cl.category
  LEFT JOIN corr co ON c.category = co.category, tot),
m AS (
  SELECT *,
    CASE WHEN n_classified > 0
         THEN CAST(n_correct AS DOUBLE) / n_classified END AS prec,
    CASE WHEN n_real > 0 THEN CAST(n_correct AS DOUBLE) / n_real
         ELSE 1.0 END AS rec
  FROM j)
SELECT category, CAST(n_real AS BIGINT) AS n_real,
  CAST(n_classified AS BIGINT) AS n_classified, n_correct,
  round(CAST(n_real AS DOUBLE) / t, 6) AS prior,
  round(prec, 6) AS precision,
  round(rec, 6) AS recall,
  round(CASE WHEN prec IS NOT NULL AND prec + rec > 0
             THEN 2 * prec * rec / (prec + rec) END, 6) AS f1
FROM m ORDER BY category"""


def roc_auc_sql() -> str:
    """DuckDB mirror of kgp.evaluate.roc_auc: label = doc_id%3=0
    ranked by score = doc_id%7 (heavy ties exercise the tie-averaged
    trapezoid), one point per distinct score."""
    return """
WITH r AS (
  SELECT (doc_id % 3 = 0) AS label,
         CAST(doc_id % 7 AS DOUBLE) AS score
  FROM documents),
per_score AS (
  SELECT score,
    sum(CASE WHEN label THEN 1 ELSE 0 END) AS tp,
    sum(CASE WHEN label THEN 0 ELSE 1 END) AS fp
  FROM r GROUP BY score),
cum AS (
  SELECT score,
    sum(tp) OVER w AS ctp, sum(fp) OVER w AS cfp,
    sum(tp) OVER w - tp AS ptp, sum(fp) OVER w - fp AS pfp
  FROM per_score
  WINDOW w AS (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT CAST(max(ctp) AS INT) AS n_pos, CAST(max(cfp) AS INT) AS n_neg,
  CASE WHEN max(ctp) > 0 AND max(cfp) > 0 THEN
    round(sum((cfp - pfp) * (ctp + ptp))
          / (2.0 * max(ctp) * max(cfp)), 6) END AS auc
FROM cum"""


# deterministic nominal features for the feature_ranking gate query
FEATSEL_CATEGORY_SQL = "'c' || CAST(doc_id % 3 AS VARCHAR)"
FEATSEL_FEATURES_SQL = {
    "f_src": "source",
    "f_len": "CAST(CAST(floor(length(text) / 100) AS BIGINT) AS VARCHAR)",
    "f_par": "CAST(doc_id % 2 AS VARCHAR)",
}


def feature_ranking_sql() -> str:
    """DuckDB mirror of kgp.featuresel over the decorated documents
    features: chi² (AverageMergingStrategy — zero cells materialized
    via the category cross join) and information gain (log2
    entropies), both in the stage's exact integer 1e-9-unit sums
    (order-independent; one final division, no double SUM)."""
    fv = " UNION ALL ".join(
        f"SELECT {FEATSEL_CATEGORY_SQL} AS category, '{name}' AS feature,"
        f" coalesce({expr}, 'null') AS value FROM documents"
        for name, expr in sorted(FEATSEL_FEATURES_SQL.items()))
    return f"""
WITH lf AS ({fv}),
tot AS (SELECT count(*) AS n FROM documents),
ncat AS (SELECT count(DISTINCT category) AS k FROM lf),
cells AS (SELECT feature, value, category, count(*) AS n11
          FROM lf GROUP BY ALL),
fv_tot AS (SELECT feature, value, sum(n11) AS fv_sum
           FROM cells GROUP BY ALL),
cat_tot AS (SELECT {FEATSEL_CATEGORY_SQL} AS category,
                   count(*) AS cat_n FROM documents GROUP BY ALL),
full_cells AS (
  SELECT f.feature, f.value, c.category, f.fv_sum, c.cat_n,
         coalesce(ce.n11, 0) AS n11, tot.n
  FROM fv_tot f CROSS JOIN cat_tot c
  LEFT JOIN cells ce ON ce.feature = f.feature
    AND ce.value = f.value AND ce.category = c.category, tot),
chi AS (
  SELECT feature,
    sum(CASE WHEN (CAST(n11 AS DOUBLE) + (cat_n - n11))
              * (n11 + (fv_sum - n11))
              * ((fv_sum - n11) + (n - (fv_sum - n11) - (cat_n - n11)
                 - n11))
              * ((cat_n - n11) + (n - (fv_sum - n11) - (cat_n - n11)
                 - n11)) <> 0 THEN
      CAST(round((
      (CAST(n11 AS DOUBLE) + (fv_sum - n11) + (cat_n - n11)
       + (n - (fv_sum - n11) - (cat_n - n11) - n11))
      * pow(CAST(n11 AS DOUBLE)
            * (n - (fv_sum - n11) - (cat_n - n11) - n11)
            - CAST(fv_sum - n11 AS DOUBLE) * (cat_n - n11), 2)
      / ((CAST(n11 AS DOUBLE) + (cat_n - n11))
         * (n11 + (fv_sum - n11))
         * ((fv_sum - n11) + (n - (fv_sum - n11) - (cat_n - n11) - n11))
         * ((cat_n - n11) + (n - (fv_sum - n11) - (cat_n - n11) - n11)))
      ) * 1000000000.0) AS HUGEINT)
    ELSE NULL END) AS chi_units
  FROM full_cells GROUP BY feature),
chi_rank AS (
  SELECT feature,
         CAST(coalesce(chi_units, 0) AS DOUBLE)
           / (ncat.k * 1000000000.0) AS score
  FROM chi, ncat),
h_c AS (
  SELECT sum(CAST(round(-(CAST(cnt AS DOUBLE) / tot.n)
                   * ln(CAST(cnt AS DOUBLE) / tot.n) / ln(2)
                   * 1000000000.0) AS BIGINT)) AS h
  FROM (SELECT count(*) AS cnt FROM documents
        GROUP BY {FEATSEL_CATEGORY_SQL}), tot),
h_f AS (
  SELECT feature,
    sum(CAST(round(-(CAST(cnt AS DOUBLE) / tot.n)
              * ln(CAST(cnt AS DOUBLE) / tot.n) / ln(2)
              * 1000000000.0) AS BIGINT)) AS h
  FROM (SELECT feature, value, count(*) AS cnt FROM lf
        GROUP BY ALL), tot GROUP BY feature),
h_cf AS (
  SELECT feature,
    sum(CAST(round(-(CAST(cnt AS DOUBLE) / tot.n)
              * ln(CAST(cnt AS DOUBLE) / tot.n) / ln(2)
              * 1000000000.0) AS BIGINT)) AS h
  FROM (SELECT feature, value, category, count(*) AS cnt FROM lf
        GROUP BY ALL), tot GROUP BY feature),
ig_rank AS (
  SELECT f.feature,
         (h_c.h + f.h - cf.h) / 1000000000.0 AS score
  FROM h_f f JOIN h_cf cf ON f.feature = cf.feature, h_c),
rr_cells AS (
  SELECT feature, value, category,
    CASE WHEN (CAST(n11 AS DOUBLE) + (cat_n - n11))
              * (n11 + (fv_sum - n11))
              * ((fv_sum - n11) + (n - (fv_sum - n11) - (cat_n - n11)
                 - n11))
              * ((cat_n - n11) + (n - (fv_sum - n11) - (cat_n - n11)
                 - n11)) <> 0 THEN
      (CAST(n11 AS DOUBLE) + (fv_sum - n11) + (cat_n - n11)
       + (n - (fv_sum - n11) - (cat_n - n11) - n11))
      * pow(CAST(n11 AS DOUBLE)
            * (n - (fv_sum - n11) - (cat_n - n11) - n11)
            - CAST(fv_sum - n11 AS DOUBLE) * (cat_n - n11), 2)
      / ((CAST(n11 AS DOUBLE) + (cat_n - n11))
         * (n11 + (fv_sum - n11))
         * ((fv_sum - n11) + (n - (fv_sum - n11) - (cat_n - n11) - n11))
         * ((cat_n - n11) + (n - (fv_sum - n11) - (cat_n - n11) - n11)))
    ELSE NULL END AS cell_chi
  FROM full_cells),
rr_pos AS (
  SELECT feature,
         row_number() OVER (PARTITION BY category
                            ORDER BY cell_chi DESC NULLS FIRST,
                                     feature ASC) - 1 AS i
  FROM rr_cells),
rr_total AS (SELECT count(*) AS m FROM fv_tot),
rr_rank AS (
  SELECT feature, CAST(m - min(i) AS DOUBLE) AS score
  FROM rr_pos, rr_total GROUP BY feature, m)
SELECT 'chi2' AS method, feature, score FROM chi_rank
UNION ALL
SELECT 'chi2rr' AS method, feature, score FROM rr_rank
UNION ALL
SELECT 'infogain' AS method, feature, score FROM ig_rank
ORDER BY method, feature"""


def nominal_pred_sql() -> str:
    """DuckDB mirror of kgp.encode.nominal_train + nominal_predict:
    (value, category) co-occurrence counts over the source and
    doc_id%5 bucket columns (ONE row space — the reference quirk),
    count/rowSum scores rounded to 9, summed per (doc, category),
    normalized to 6; most likely with name-asc ties."""
    return """
WITH feats AS (
  SELECT doc_id, source AS f1,
         'b' || CAST(doc_id % 5 AS VARCHAR) AS f2,
         lang AS category
  FROM documents),
lf AS (
  SELECT f1 AS value, category FROM feats
  UNION ALL SELECT f2, category FROM feats),
cells AS (SELECT value, category, count(*) AS n FROM lf GROUP BY ALL),
sums AS (SELECT value, sum(n) AS row_sum FROM cells GROUP BY value),
melted AS (
  SELECT doc_id, f1 AS value FROM feats
  UNION ALL SELECT doc_id, f2 FROM feats),
scored AS (
  SELECT m.doc_id, c.category,
         sum(round(CAST(c.n AS DOUBLE) / s.row_sum, 9)) AS score
  FROM melted m JOIN cells c ON m.value = c.value
  JOIN sums s ON c.value = s.value
  GROUP BY m.doc_id, c.category),
tot AS (SELECT doc_id, sum(score) AS t FROM scored GROUP BY doc_id),
ranked AS (
  SELECT s.doc_id, s.category, s.score, tot.t,
         row_number() OVER (PARTITION BY s.doc_id
                            ORDER BY s.score DESC, s.category ASC)
           AS rn
  FROM scored s JOIN tot ON s.doc_id = tot.doc_id)
SELECT doc_id, category AS predicted,
       round(score / t, 6) AS probability
FROM ranked WHERE rn = 1 ORDER BY doc_id"""


def tfidf_vectors_sql(doc_mod: int = 17) -> str:
    """DuckDB mirror of kgp.textvector.vectorize_stage
    (TextVectorizer TERM_FREQUENCY x IDF, TextVectorizer.java:34-101):
    the corpus fits on ALL documents (distinct terms per doc ->
    doc_count), the output is the doc_id % doc_mod = 0 slice. The
    idf ln() is rounded to 7 decimals before the tf product, the
    weight to 6 (the repo cross-engine ladder)."""
    toks = _decontam_tokens_sql("text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents),
nd AS (SELECT count(*) AS n_docs FROM documents),
df AS (SELECT term, count(DISTINCT doc_id) AS doc_count
       FROM toks GROUP BY term),
cnt AS (SELECT doc_id, term, count(*) AS c FROM toks
        GROUP BY doc_id, term),
tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id)
SELECT c.doc_id, c.term,
       round((c.c / t.n) * round(ln(nd.n_docs / df.doc_count), 7), 6)
         AS weight
FROM cnt c JOIN tot t USING (doc_id) JOIN df USING (term), nd
WHERE c.doc_id % {doc_mod} = 0
ORDER BY c.doc_id, c.term"""


def tfidf_doc_sim_sql(pair_mod: int = 5) -> str:
    """DuckDB mirror of kgp.textvector.doc_weights_tfidfsim +
    tfidf_pair_sim_stage (TfIdfSimilarity.java:36-76): per-doc
    tf = count / total_tokens, idf = 1 + ln(N / (df + 1)) rounded to
    7, cosine over (doc_id, doc_id + 1) pairs for doc_id % pair_mod
    = 0, rounded to 4 (sums are engine-order-dependent; 4 decimals
    sit far above the 1e-13 accumulation error)."""
    toks = _decontam_tokens_sql("text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents),
nd AS (SELECT count(*) AS n_docs FROM documents),
df AS (SELECT term, count(DISTINCT doc_id) AS doc_count
       FROM toks GROUP BY term),
cnt AS (SELECT doc_id, term, count(*) AS c FROM toks
        GROUP BY doc_id, term),
tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id),
w AS (
  SELECT c.doc_id, c.term,
         (c.c / t.n)
           * round(1 + ln(nd.n_docs / (df.doc_count + 1)), 7) AS wt
  FROM cnt c JOIN tot t USING (doc_id) JOIN df USING (term), nd),
nrm AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nn FROM w
        GROUP BY doc_id),
prs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % {pair_mod} = 0),
dots AS (
  SELECT p.a_id, p.b_id, sum(wa.wt * wb.wt) AS dot
  FROM prs p
  JOIN w wa ON wa.doc_id = p.a_id
  JOIN w wb ON wb.doc_id = p.b_id AND wb.term = wa.term
  GROUP BY p.a_id, p.b_id)
SELECT p.a_id, p.b_id,
       coalesce(round(d.dot / (na.nn * nb.nn), 4), 0.0) AS cosine
FROM prs p
LEFT JOIN dots d ON d.a_id = p.a_id AND d.b_id = p.b_id
JOIN nrm na ON na.doc_id = p.a_id
JOIN nrm nb ON nb.doc_id = p.b_id
ORDER BY p.a_id"""


def feature_normalize_sql() -> str:
    """DuckDB mirror of kgp.encode fit/apply_minmax + fit/apply_zscore
    (MinMaxNormalizer.java:76-86, ZScoreNormalizer + SlimStats.java:
    109-117 sample stddev) over the events value column; both outputs
    rounded to 6."""
    return """
WITH s AS (
  SELECT min(value) AS mn, max(value) AS mx,
         avg(value) AS av, stddev_samp(value) AS sd FROM events)
SELECT event_id,
       round((value - s.mn) / (s.mx - s.mn), 6) AS value_minmax,
       round((value - s.av) / s.sd, 6) AS value_zscore
FROM events, s ORDER BY event_id"""


def one_hot_events_sql(slice_mod: int = 13) -> str:
    """DuckDB mirror of kgp.encode fit/apply_one_hot
    (DummyVariableCreator.java:59-127) over the events event_type
    column (stable 5-value domain: click/error/purchase/signup/view —
    > 2 uniques, so no collapse rule fires); event_id % slice_mod = 0
    slice."""
    cols = ",\n       ".join(
        f"CAST(event_type = '{v}' AS INT) AS \"event_type:{v}\""
        for v in ["click", "error", "purchase", "signup", "view"])
    return f"""
SELECT event_id,
       {cols}
FROM events WHERE event_id % {slice_mod} = 0 ORDER BY event_id"""


def threshold_metrics_sql(num_bins: int = 5) -> str:
    """DuckDB mirror of kgp.evaluate.threshold_analysis over the
    deterministic decoration label = doc_id % 3 = 0, score =
    (doc_id % 101) / 100: round(score * bins) bucketing, cumulative
    at-or-above counts, irrelevant-below for accuracy, empty bins
    between min and max occupied filled in."""
    return f"""
WITH binned AS (
  SELECT CAST(round(((doc_id % 101) / CAST(100 AS DOUBLE))
                    * {num_bins}) AS INT) AS bin,
         CAST(doc_id % 3 = 0 AS INT) AS rel
  FROM documents),
per_bin AS (
  SELECT bin, count(*) AS retrieved, sum(rel) AS relevant
  FROM binned GROUP BY bin),
bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM per_bin),
grid AS (SELECT unnest(range(lo, hi + 1)) AS bin FROM bounds),
filled AS (
  SELECT g.bin, coalesce(p.retrieved, 0) AS retrieved,
         coalesce(p.relevant, 0) AS relevant
  FROM grid g LEFT JOIN per_bin p USING (bin)),
cum AS (
  SELECT bin,
    sum(retrieved) OVER (ORDER BY bin
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ret_at,
    sum(relevant) OVER (ORDER BY bin
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rel_at,
    coalesce(sum(retrieved - relevant) OVER (ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS irr_below,
    sum(relevant) OVER () AS n_rel,
    sum(retrieved) OVER () AS n_tot
  FROM filled)
SELECT round(bin / CAST({num_bins} AS DOUBLE), 6) AS threshold,
       round(rel_at / CAST(ret_at AS DOUBLE), 6) AS "precision",
       round(rel_at / CAST(n_rel AS DOUBLE), 6) AS recall,
       CASE WHEN (rel_at / CAST(ret_at AS DOUBLE))
                  + (rel_at / CAST(n_rel AS DOUBLE)) > 0
            THEN round(2 * (rel_at / CAST(ret_at AS DOUBLE))
                         * (rel_at / CAST(n_rel AS DOUBLE))
                       / ((rel_at / CAST(ret_at AS DOUBLE))
                          + (rel_at / CAST(n_rel AS DOUBLE))), 6)
       END AS f1,
       round((rel_at + irr_below) / CAST(n_tot AS DOUBLE), 6)
         AS accuracy
FROM cum WHERE bin <= {num_bins} ORDER BY threshold"""


def avg_precision_sql(n_queries: int = 5) -> str:
    """DuckDB mirror of kgp.mathstats.average_precision_curve over
    query = doc_id % n, rank = doc_id, relevant = doc_id % 3 = 0
    (MathHelper.computeAveragePrecision semantics; total-relevant =
    the query's own relevant count)."""
    return f"""
WITH ranked AS (
  SELECT concat('q', doc_id % {n_queries}) AS query, doc_id AS rank,
         CAST(doc_id % 3 = 0 AS INT) AS rel
  FROM documents),
cum AS (
  SELECT query, rank, rel,
    sum(rel) OVER (PARTITION BY query ORDER BY rank
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS num_rel,
    row_number() OVER (PARTITION BY query ORDER BY rank) AS k1,
    sum(rel) OVER (PARTITION BY query) AS total
  FROM ranked),
pr AS (
  SELECT *, num_rel / CAST(k1 AS DOUBLE) AS pr_at_k FROM cum)
SELECT query, rank, round(pr_at_k, 6) AS pr_at_k,
  round(coalesce(sum(CASE WHEN rel = 1 THEN pr_at_k END)
    OVER (PARTITION BY query ORDER BY rank
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
    / total, 6) AS ap
FROM pr ORDER BY query, rank"""


def corr_regression_sql() -> str:
    """DuckDB mirror of kgp.mathstats.corr_regression over the events
    decoration x = value, y = event_id % 97."""
    return """
SELECT round(corr(value, event_id % 97), 6) AS pearson_r,
       round(regr_intercept(event_id % 97, value), 6) AS alpha,
       round(regr_slope(event_id % 97, value), 6) AS beta
FROM events"""


def set_sims_sql(pair_mod: int = 9) -> str:
    """DuckDB mirror of kgp.mathstats.set_similarity_expr over the
    norm-token SETS of (doc_id, doc_id + 1) pairs."""
    toks = _decontam_tokens_sql("text")
    return f"""
WITH t AS (
  SELECT doc_id, list_distinct({toks}) AS s FROM documents),
prs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.s AS sa, b.s AS sb
  FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % {pair_mod} = 0),
m AS (
  SELECT a_id, b_id, len(sa) AS na, len(sb) AS nb,
         CAST(len(list_intersect(sa, sb)) AS DOUBLE) AS i
  FROM prs)
SELECT a_id, b_id,
  round(CASE WHEN na = 0 AND nb = 0 THEN 1.0
             WHEN na = 0 OR nb = 0 THEN 0.0
             ELSE 2 * i / (na + nb) END, 6) AS dice,
  round(CASE WHEN na = 0 AND nb = 0 THEN 1.0
             WHEN na = 0 OR nb = 0 THEN 0.0
             ELSE i / (na + nb - i) END, 6) AS jaccard,
  round(CASE WHEN na = 0 AND nb = 0 THEN 1.0
             WHEN na = 0 OR nb = 0 THEN 0.0
             ELSE i / least(na, nb) END, 6) AS overlap
FROM m ORDER BY a_id"""


def value_percentiles_sql(ps: tuple = (10, 25, 50, 75, 90)) -> str:
    """DuckDB mirror of kgp.mathstats.fat_percentiles over the events
    value column (FatStats.getPercentile rule: integer n = p/100*count
    averages 1-based ranks n and n+1, else ceil(n))."""
    plist = ", ".join(str(p) for p in ps)
    return f"""
WITH v AS (
  SELECT value, row_number() OVER (ORDER BY value) AS rk
  FROM events WHERE value IS NOT NULL),
n AS (SELECT count(*) AS c FROM v),
ps AS (SELECT unnest([{plist}]) AS p)
SELECT ps.p,
  CASE WHEN (ps.p * n.c) % 100 = 0 AND ps.p * n.c / 100 >= 1
    THEN 0.5 * (SELECT value FROM v WHERE rk = ps.p * n.c / 100)
       + 0.5 * (SELECT value FROM v
                WHERE rk = least(ps.p * n.c / 100 + 1, n.c))
    ELSE (SELECT value FROM v
          WHERE rk = greatest(1, CAST(ceil(ps.p * n.c
                                           / CAST(100 AS DOUBLE))
                                      AS BIGINT)))
  END AS value
FROM ps, n ORDER BY ps.p"""


# ------------------------------------------------------------ web graph


def _link_class_sql(idx: str) -> str:
    """Registrable-domain class of doc `idx`'s host (com/org/net) —
    the include_subdomains=True in-domain test reduces to class
    equality on this corpus."""
    return (f"CASE WHEN ({idx}) % 10 < 4 THEN 'com' "
            f"WHEN ({idx}) % 10 < 6 THEN 'org' ELSE 'net' END")


def _page_link_rows_sql() -> str:
    """The followed links of every non-adversarial page, deduped on
    (src, dst) keeping the first in DOCUMENT ORDER — exactly what
    kgp.webgraph.extract_links_stage (getLinks set semantics) emits.
    Collisions that make the dedup observable: news pages' hub link
    equals their nav Home link (anchor 'Home' wins), and when
    doc_id % 7 == 6 on a host-stable id pair the 'next' and 'related'
    targets coincide (the 'next' anchor wins)."""
    host = host_sql("doc_id")
    dst2 = (f"(doc_id - (doc_id % {C.LINK_REL_STRIDE}) "
            f"+ {C.LINK_REL_STRIDE})")
    dst2_host = host_sql(dst2)
    next_s = "CAST(doc_id + 1 AS VARCHAR)"
    dst2_s = f"CAST({dst2} AS VARCHAR)"
    next_anchor = _tfmt_sql(C.LINK_NEXT_ANCHOR, {"next_id": next_s})
    rel_anchor = _tfmt_sql(C.LINK_REL_ANCHOR, {"dst2_id": dst2_s})
    in_dom_rel = (f"({_link_class_sql('doc_id')} = "
                  f"{_link_class_sql(dst2)})")
    rows = [
        (1, f"'https://' || {host} || '/'", "'Home'", "TRUE"),
        (2, f"'https://' || {host} || '/world'", "'World'", "TRUE"),
        (3, f"'https://' || {host} || '/articles/' || {next_s} "
            "|| '.html'", next_anchor, "TRUE"),
        (4, f"'https://' || {dst2_host} || '/articles/' || {dst2_s} "
            "|| '.html'", rel_anchor, in_dom_rel),
        (5, _lit(C.LINK_HUB_URL), _lit(C.LINK_HUB_ANCHOR),
         "(doc_id % 10 < 4)"),
        (6, f"'https://' || {host} || '/about.html'",
         _lit(C.LINK_ABOUT_ANCHOR), "TRUE"),
    ]
    selects = [
        (f"SELECT {url_sql()} AS src_url, {d} AS dst_url, "
         f"{a} AS anchor, {ind} AS in_domain, {ordv} AS ord "
         "FROM documents WHERE doc_id % 17 <> 13")
        for ordv, d, a, ind in rows
    ]
    return ("SELECT src_url, dst_url, anchor, in_domain FROM (\n"
            + "\nUNION ALL\n".join(selects) + "\n) "
            "QUALIFY ROW_NUMBER() OVER "
            "(PARTITION BY src_url, dst_url ORDER BY ord) = 1")


def page_links_sql() -> str:
    return (f"SELECT * FROM ({_page_link_rows_sql()}) "
            "ORDER BY src_url, dst_url")


def host_graph_sql() -> str:
    h = lambda c: f"split_part(split_part({c}, '//', 2), '/', 1)"  # noqa
    return (f"WITH l AS ({_page_link_rows_sql()}) "
            f"SELECT {h('src_url')} AS src_host, "
            f"{h('dst_url')} AS dst_host, "
            "COUNT(*) AS weight, "
            "COUNT(DISTINCT src_url) AS n_src_pages "
            "FROM l GROUP BY 1, 2 ORDER BY 1, 2")


def pagerank_sql(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled power iteration (DuckDB's recursive CTEs reject the
    per-step aggregation, so each of the K steps is its own CTE —
    fixed K keeps this closed-form). Literal float constants are
    injected via repr() so both engines evaluate the IEEE-identical
    expression tree; summation order still differs, which is why the
    gate column is the 6-decimal rounding (house round_to=6 rule)."""
    d = repr(float(damping))
    one_minus_d = repr(1.0 - damping)
    ctes = [
        f"l AS MATERIALIZED ({_page_link_rows_sql()})",
        "e AS MATERIALIZED (SELECT DISTINCT src_url AS src, dst_url AS dst FROM l)",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes)",
        "outdeg AS (SELECT src AS node, COUNT(*) AS deg "
        "FROM e GROUP BY src)",
        "pr0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank "
        "FROM nodes, nn)",
    ]
    for k in range(1, iterations + 1):
        p = f"pr{k - 1}"
        ctes.append(
            f"dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank), 0.0) AS mass "
            f"FROM {p} p LEFT JOIN outdeg o ON o.node = p.node "
            "WHERE o.node IS NULL)")
        ctes.append(
            f"pr{k} AS MATERIALIZED (SELECT n.node, "
            f"CAST({one_minus_d} AS DOUBLE) / nn.n "
            f"+ CAST({d} AS DOUBLE) * (COALESCE(c.contrib, 0.0) "
            f"+ dk.mass / nn.n) AS rank "
            f"FROM nodes n CROSS JOIN nn CROSS JOIN dang{k} dk "
            "LEFT JOIN (SELECT e.dst AS node, "
            "SUM(p.rank / o.deg) AS contrib "
            f"FROM e JOIN {p} p ON e.src = p.node "
            "JOIN outdeg o ON o.node = e.src GROUP BY e.dst) c "
            "ON c.node = n.node)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ROUND(rank, 6) AS rank_r6 "
            f"FROM pr{iterations} ORDER BY node")


def anchor_stats_sql() -> str:
    h = "split_part(split_part(src_url, '//', 2), '/', 1)"
    return (f"WITH l AS MATERIALIZED ({_page_link_rows_sql()}), "
            "t AS (SELECT dst_url, COUNT(*) AS n_inlinks, "
            f"COUNT(DISTINCT {h}) AS n_src_hosts FROM l GROUP BY dst_url), "
            "pa AS (SELECT dst_url, anchor, COUNT(*) AS n FROM l "
            "GROUP BY 1, 2), "
            "top AS (SELECT dst_url, anchor AS top_anchor FROM pa "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY dst_url "
            "ORDER BY n DESC, anchor ASC) = 1) "
            "SELECT t.dst_url, t.n_inlinks, t.n_src_hosts, "
            "top.top_anchor FROM t JOIN top USING (dst_url) "
            "ORDER BY dst_url")


def crawl_reachable_sql(max_depth: int = 4, seed_mod: int = 101,
                        blacklist: tuple[str, ...] =
                        (r"/about\.html",)) -> str:
    """Unrolled BFS mirroring kgp.webgraph.crawl_reachable
    (Crawler.java:398-428 follow rules: length < 400, no blacklist
    find-match; filters skip the seeds)."""
    follow = "LENGTH(url) < 400"
    for p in blacklist:
        esc = p.replace("'", "''")
        follow += f" AND NOT regexp_matches(url, '{esc}')"
    ctes = [
        f"l AS MATERIALIZED ({_page_link_rows_sql()})",
        "e AS MATERIALIZED (SELECT DISTINCT src_url AS src, dst_url AS dst FROM l)",
        f"r0 AS MATERIALIZED (SELECT DISTINCT {url_sql()} AS url, 0 AS depth "
        f"FROM documents WHERE doc_id % {seed_mod} = 0)",
    ]
    prev = "r0"
    all_parts = ["SELECT url, depth FROM r0"]
    for k in range(1, max_depth + 1):
        reached = " UNION ALL ".join(
            f"SELECT url FROM r{i}" for i in range(k))
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT url, {k} AS depth FROM ("
            f"SELECT DISTINCT e.dst AS url FROM e "
            f"JOIN r{k - 1} f ON e.src = f.url) "
            f"WHERE {follow} AND url NOT IN ({reached}))")
        all_parts.append(f"SELECT url, depth FROM r{k}")
        prev = f"r{k}"
    return ("WITH " + ",\n".join(ctes) + "\nSELECT url, depth FROM ("
            + " UNION ALL ".join(all_parts) + ") ORDER BY url")


def hits_sql(iterations: int = 5) -> str:
    """Unrolled HITS with per-half-step L1 normalization, mirroring
    kgp.webgraph.hits."""
    ctes = [
        f"l AS MATERIALIZED ({_page_link_rows_sql()})",
        "e AS MATERIALIZED (SELECT DISTINCT src_url AS src, dst_url AS dst FROM l)",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "s0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS hub, "
        "CAST(1.0 AS DOUBLE) AS auth FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        p = f"s{k - 1}"
        ctes.append(
            f"a{k}r AS MATERIALIZED (SELECT e.dst AS node, SUM(s.hub) AS a "
            f"FROM e JOIN {p} s ON e.src = s.node GROUP BY e.dst)")
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT node, a / (SELECT SUM(a) FROM a{k}r) "
            f"AS auth FROM a{k}r)")
        ctes.append(
            f"h{k}r AS MATERIALIZED (SELECT e.src AS node, SUM(a.auth) AS h "
            f"FROM e JOIN a{k} a ON e.dst = a.node GROUP BY e.src)")
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT node, h / (SELECT SUM(h) FROM h{k}r) "
            f"AS hub FROM h{k}r)")
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT n.node, "
            f"COALESCE(h.hub, CAST(0.0 AS DOUBLE)) AS hub, "
            f"COALESCE(a.auth, CAST(0.0 AS DOUBLE)) AS auth "
            f"FROM nodes n LEFT JOIN h{k} h ON h.node = n.node "
            f"LEFT JOIN a{k} a ON a.node = n.node)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ROUND(hub, 6) AS hub_r6, "
            f"ROUND(auth, 6) AS auth_r6 FROM s{iterations} "
            "ORDER BY node")


def text_urls_sql() -> str:
    """Symbolic derivation of the text_urls gate query: the prose is
    'Read more at <url> or www.example.com. Not a link: ...' so the
    matches are exactly [url, 'www.example.com'] (trailing dot
    refused by the pattern tail); cleaned = the canonical url (the
    appended ;jsessionid=<md5-prefix> token always matches the
    session-id pattern). Derived WITHOUT running any regex."""
    u = url_sql()
    return (f"SELECT doc_id, 0 AS pos, {u} AS url_match, "
            f"{u} AS cleaned FROM documents "
            "UNION ALL "
            f"SELECT doc_id, 1, 'www.example.com', {u} FROM documents "
            "ORDER BY doc_id, pos")


def sitemap_pages_sql() -> str:
    """Symbolic derivation of the sitemap_pages gate query (the Spark
    side builds real XML and parses it back; this never touches XML):
    sitemap_url = https://<host>/sitemap.xml (+'.gz' for odd siteK
    hosts), page_url = the canonical url plus the unescaped query
    suffix for the doc_id%5==2 slice, priority = (doc_id%10)/10 except
    the blog host where half the entries carry no priority tag and the
    reference's all-or-nothing rule nulls the WHOLE file."""
    host = host_sql("doc_id")
    gz = "(doc_id % 10 >= 6 AND (doc_id % 14) % 2 = 1)"
    blog = "(doc_id % 10 >= 4 AND doc_id % 10 < 6)"
    return (
        "SELECT ('https://' || " + host + " || '/sitemap.xml' || "
        f"CASE WHEN {gz} THEN '.gz' ELSE '' END) AS sitemap_url, "
        "(" + url_sql() + " || CASE WHEN doc_id % 5 = 2 "
        "THEN '?a=1&b=2' ELSE '' END) AS page_url, "
        f"CASE WHEN {blog} THEN NULL "
        "ELSE CAST(doc_id % 10 AS DOUBLE) / 10 END AS priority "
        "FROM documents ORDER BY sitemap_url, page_url")


def dataset_stats_sql() -> str:
    """DuckDB mirror of kgp.datasetstats.dataset_statistics over the
    events table: one UNION ALL branch per profiled column — numeric
    columns carry mean / SAMPLE std / min / max, nominal columns carry
    the distinct non-null count; the timestamp column is skipped like
    the reference's unsupported Value types."""
    def num(col):
        return (f"SELECT '{col}' AS \"column\", 'numeric' AS kind, "
                f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) "
                "AS BIGINT) AS num_nulls, "
                "CAST(NULL AS BIGINT) AS num_unique, "
                f"round(avg({col}), 6) AS mean, "
                f"round(stddev_samp({col}), 6) AS std_dev, "
                f"round(CAST(min({col}) AS DOUBLE), 6) AS \"min\", "
                f"round(CAST(max({col}) AS DOUBLE), 6) AS \"max\" "
                "FROM events")

    def nom(col):
        return (f"SELECT '{col}', 'nominal', "
                f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) "
                "AS BIGINT), "
                f"CAST(count(DISTINCT {col}) AS BIGINT), "
                "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
                "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) "
                "FROM events")

    return (" UNION ALL ".join([num("event_id"), num("user_id"),
                                nom("event_type"), num("value"),
                                nom("props")])
            + " ORDER BY \"column\"")


def token_informativeness_sql() -> str:
    """DuckDB mirror of kgp.informativeness.fit_informativeness_stage
    over the documents table.  The tokenizer is the reference's exact
    Java pattern (Tokenizer.java:27) — RE2 and Java agree on it
    (pinned corpus-wide by tests/test_informativeness.py); the
    normalization max spans only tokens longer than one character."""
    from kgp.informativeness import TOKEN_SPLIT_JAVA
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_SPLIT_JAVA}')) AS token
  FROM documents),
counts AS (
  SELECT token, count(*) AS count FROM toks GROUP BY token),
freq AS (
  SELECT token, count,
         count / sum(count) OVER () AS frequency
  FROM counts),
h AS (
  SELECT max(CASE WHEN length(token) > 1 THEN frequency END) AS highest
  FROM freq)
SELECT token, CAST(count AS BIGINT) AS count,
       round(frequency, 9) AS frequency,
       round(CASE WHEN highest IS NULL OR highest = 0 THEN frequency
                  ELSE frequency / highest END, 6) AS informativeness
FROM freq, h ORDER BY token"""


def synonym_groups_sql() -> str:
    """Symbolic derivation of the synonym_groups gate query: the demo
    thesaurus is code-defined (kgp.constants), so the expected
    components are stated directly — org+alias pairs (the Acme group
    chained transitively through the chain surface), per-city
    "<city> city" variants, the first country's republic variant;
    comment/lowercase/all-punctuation lines contribute nothing.
    Canonical = lexicographic min of each group.  Never runs the
    parser or the CC loop."""
    from kgp import constants as C
    groups: list[set] = []
    acme: set = set()
    for org, alias in zip(C.ORGS[:len(C.ORG_ALIASES)], C.ORG_ALIASES):
        g = {org.lower(), alias.lower()}
        if C.ORG_ALIASES[0].lower() in g:
            acme = g
        groups.append(g)
    acme.add(C.ORG_CHAIN_NAME.lower())
    for city in C.CITIES:
        groups.append({city.lower(), city.lower() + " city"})
    groups.append({C.COUNTRIES[0].lower(),
                   C.COUNTRIES[0].lower() + " republic"})
    rows = []
    for g in groups:
        canon = min(g)
        rows.extend((w, canon) for w in sorted(g))
    values = ", ".join(f"('{w}', '{c}')" for w, c in sorted(rows))
    return ("SELECT col0 AS word, col1 AS canon_word "
            f"FROM (VALUES {values}) ORDER BY word")


def heat_grid_sql() -> str:
    """DuckDB mirror of kgp.heatgrid.heat_grid_stage over events
    bucketed by (user_id%8, event_id%12): count grid, intensity =
    n/max(n), bucket = floor(i*15+0.5) (Math.round), color via a
    VALUES join on the 16 reference palette constants."""
    from kgp.heatgrid import PALETTE
    values = ", ".join(
        "(%d, '#%02x%02x%02x')" % ((i,) + rgb)
        for i, rgb in enumerate(PALETTE))
    return f"""
WITH g AS (
  SELECT user_id % 8 AS row, event_id % 12 AS col,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
i AS (
  SELECT row, col, n,
         round(n / max(n) OVER (), 9) AS intensity,
         CAST(floor(n / max(n) OVER () * 15 + 0.5) AS INT) AS bucket
  FROM g)
SELECT i.row, i.col, i.n, i.intensity, i.bucket, p.color_hex
FROM i JOIN (VALUES {values}) p(bucket, color_hex) USING (bucket)
ORDER BY row, col"""


def image_dup_pairs_sql(shift: int = 39) -> str:
    """Symbolic DIFFG (ImageHandler gray-difference) between the
    closed-form synth images of doc_id and doc_id+shift.  shift*7 mod
    256 = 17, so each channel delta is 17 unless the +17 wraps past
    256 (then 239); the gray is computed TWICE like the reference —
    substractImages writes the weighted gray, getAverageGray re-greys
    the (g,g,g) pixel, and 0.3g+0.59g+0.11g occasionally floors to
    g-1 — with the same IEEE double sums (every operand CAST to DOUBLE —
    DuckDB's bare 0.3 literal is an exact DECIMAL, which would
    never reproduce the floor losses); the average divides by
    w * h_a (rows beyond the shorter image are black).  Never decodes
    BMP bytes."""
    step = (shift * 7) % 256
    wrap = 256 - step
    return f"""
WITH prs AS (
  SELECT d1.doc_id AS id_a, d2.doc_id AS id_b,
         d1.doc_id % 13 + 4 AS w,
         d1.doc_id % 7 + 4 AS h_a, d2.doc_id % 7 + 4 AS h_b
  FROM documents d1 JOIN documents d2
    ON d2.doc_id = d1.doc_id + {shift}
  WHERE d1.doc_id % 3 = 0),
g1 AS (
  SELECT id_a, id_b, w, h_a,
    floor(
      0.3 * CAST(CASE WHEN (id_a*7 + ri*5 + ci*3 + 0) % 256 >= {wrap}
                  THEN {wrap} ELSE {step} END AS DOUBLE)
    + 0.59 * CAST(CASE WHEN (id_a*7 + ri*5 + ci*3 + 11) % 256 >= {wrap}
                   THEN {wrap} ELSE {step} END AS DOUBLE)
    + 0.11 * CAST(CASE WHEN (id_a*7 + ri*5 + ci*3 + 22) % 256 >= {wrap}
                   THEN {wrap} ELSE {step} END AS DOUBLE)) AS g
  FROM prs, range(0, 20) t1(ri), range(0, 20) t2(ci)
  WHERE ri < least(h_a, h_b) AND ci < w),
g2 AS (
  SELECT id_a, id_b, w, h_a,
    CAST(floor(0.3 * CAST(g AS DOUBLE) + 0.59 * CAST(g AS DOUBLE) + 0.11 * CAST(g AS DOUBLE)) AS BIGINT) AS gray
  FROM g1)
SELECT id_a, id_b,
  round(1 - (CAST(sum(gray) AS DOUBLE) / (any_value(w) * any_value(h_a)))
            / 255.0, 9) AS diffg,
  (1 - (CAST(sum(gray) AS DOUBLE) / (any_value(w) * any_value(h_a)))
   / 255.0) > 0.82 AS is_dup
FROM g2 GROUP BY id_a, id_b ORDER BY id_a"""


def date_particles_sql() -> str:
    """DuckDB mirror of the date_particles gate query: US week =
    floor((dayofyear + sundayDow(jan1) - 2)/7) + 1 (DuckDB dayofweek
    is Sunday=0, hence the +1), java.time names via upper(strftime/
    dayname), season CASE, signed day diff, the same-week-else-
    ceil(|days|/7) week walk, and the 5-per-full-week + remainder-run
    business-day closed form."""
    usweek = ("(CAST(floor((dayofyear({d}) + dayofweek("
              "date_trunc('year', {d})) + 1 - 2) / 7) AS INT) + 1)")
    wa, wb = usweek.format(d="d"), usweek.format(d="d2")
    extra = " + ".join(
        f"CASE WHEN {i} <= n % 7 AND ((sdow - 1 + {i}) % 7) + 1 "
        "NOT IN (1, 7) THEN 1 ELSE 0 END" for i in range(1, 7))
    return f"""
WITH b AS (
  SELECT event_id, CAST(ts AS DATE) AS d,
         CAST(ts AS DATE) + CAST(event_id % 21 - 10 AS INT) AS d2
  FROM events),
c AS (
  SELECT *, date_diff('day', d2, d) AS days,
         abs(date_diff('day', d2, d)) AS n,
         dayofweek(least(d, d2)) + 1 AS sdow
  FROM b)
SELECT event_id,
  CAST(year(d) AS INT) AS d_year_num,
  CASE WHEN month(d) IN (1,2,3) THEN 'WINTER'
       WHEN month(d) IN (4,5,6) THEN 'SPRING'
       WHEN month(d) IN (7,8,9) THEN 'SUMMER'
       ELSE 'AUTUMN' END AS d_quarter,
  upper(monthname(d)) AS d_month_nom,
  (year(d) || '-' || month(d)) AS d_year_month,
  {wa} AS d_week_num,
  CAST(dayofyear(d) AS INT) AS d_dayOfYear_num,
  CAST(isodow(d) AS INT) AS d_dayOfWeek_num,
  upper(dayname(d)) AS d_dayOfWeek_nom,
  isodow(d) IN (6, 7) AS d_weekend,
  CAST(days AS INT) AS d_minus_d2_days,
  CAST(CASE WHEN year(d) = year(d2) AND {wa} = {wb} THEN 0
            ELSE ceil(n / 7.0) END AS INT) AS d_minus_d2_weeks,
  CAST((n // 7) * 5 + {extra} AS INT) AS d_minus_d2_businessDays
FROM c ORDER BY event_id"""


# ------------------------------------------------------------- feeds
def _feed_items_cte(n_feeds: int = 40) -> str:
    """Symbolic mirror of kgp.feeds.synth_feeds' item derivation (the
    Spark side renders real RSS/Atom XML and parses it back; this
    never touches XML): membership by event_id residue classes, DAY-
    truncated timestamps for the chunked mode, second truncation
    elsewhere, and the already-session-stripped link."""
    big = 10 * n_feeds
    return f"""
feed_items AS (
  SELECT (event_id % {n_feeds}) AS fid,
    CASE WHEN (event_id % {n_feeds}) % 4 = 1
         THEN epoch_ms(date_trunc('day', ts))
         ELSE epoch_ms(date_trunc('second', ts)) END AS pub_ms,
    ('Event ' || event_id || ' ' || event_type) AS title,
    ('https://u' || user_id || '.feeds.example.org/items/' || event_id
     || '?ref=rss') AS link,
    ('urn:feed:' || (event_id % {n_feeds}) || ':item:' || event_id)
      AS guid
  FROM events
  WHERE ((event_id % {n_feeds}) % 4) IN (0, 1)
     OR (((event_id % {n_feeds}) % 4) = 2
         AND event_id % {big} = event_id % {n_feeds})
     OR (((event_id % {n_feeds}) % 4) = 3
         AND event_id = event_id % {n_feeds}))"""


def _feed_url_sql(fid: str = "fid") -> str:
    return (f"('https://feed' || {fid} || '.example.org/' || "
            f"CASE WHEN {fid} % 2 = 0 THEN 'rss' ELSE 'atom' END "
            "|| '.xml')")


def feed_items_sql(n_feeds: int = 40) -> str:
    """Oracle for the feed_items gate query."""
    return (f"WITH {_feed_items_cte(n_feeds)} "
            f"SELECT {_feed_url_sql()} AS feed_url, guid, title, link, "
            "pub_ms FROM feed_items ORDER BY feed_url, guid")


def _feed_stats_cte(n_feeds: int = 40) -> str:
    """Per-feed FeedPostStatistics mirror: sorted-timestamp list,
    neighbour gaps via a 1-indexed list lambda, FatStats median rule,
    exact HUGEINT moments -> sample stddev (the Spark twin carries
    DECIMAL(38,0)), Java truncating casts via trunc(), long division
    via //."""
    far = "epoch_ms(TIMESTAMP '2024-06-01 00:00:00')"
    return f"""
{_feed_items_cte(n_feeds)},
feed_shell AS (SELECT range AS fid FROM range(0, {n_feeds + 2})),
feed_per AS (
  SELECT fid, count(*) AS n, list_sort(list(pub_ms)) AS ts,
         min(pub_ms) AS oldest, max(pub_ms) AS newest
  FROM feed_items GROUP BY fid),
feed_base AS (
  SELECT s.fid, coalesce(p.n, 0) AS n, p.ts, p.oldest, p.newest,
    CASE WHEN (s.fid // 4) % 3 = 1 AND p.newest IS NOT NULL
           THEN p.newest + 259200000
         WHEN (s.fid // 4) % 3 = 2 AND p.newest IS NOT NULL
           THEN p.newest + 3000
         ELSE {far} END AS poll_ms,
    CASE WHEN coalesce(p.n, 0) > 1 THEN
      list_transform(range(2, p.n + 1), i -> p.ts[i] - p.ts[i - 1])
    END AS gaps
  FROM feed_shell s LEFT JOIN feed_per p USING (fid)),
feed_stat AS (
  SELECT fid, n, n - 1 AS m, poll_ms, gaps, list_sort(gaps) AS sg,
    CASE WHEN n > 0 THEN oldest ELSE -1 END AS time_oldest_ms,
    CASE WHEN n > 0 THEN newest ELSE -1 END AS time_newest_ms,
    CASE WHEN n > 1 THEN CAST(trunc(
        CASE WHEN (n - 1) % 2 = 0
             THEN 0.5 * list_sort(gaps)[CAST((n - 1) // 2 AS INT)]
                + 0.5 * list_sort(gaps)[CAST((n - 1) // 2 AS INT) + 1]
             ELSE CAST(list_sort(gaps)[CAST(n // 2 AS INT)] AS DOUBLE)
        END) AS BIGINT) ELSE -1 END AS median_gap_ms,
    CASE WHEN n > 1 THEN (newest - oldest) / CAST(n - 1 AS DOUBLE)
         ELSE -1.0 END AS avg_gap_ms,
    CASE WHEN n - 1 > 1 THEN CAST(trunc(sqrt(
        CAST((n - 1)
             * list_aggregate(list_transform(gaps, x -> x * x), 'sum')
             - list_aggregate(gaps, 'sum')
               * list_aggregate(gaps, 'sum') AS DOUBLE)
        / CAST((n - 1) * (n - 2) AS DOUBLE))) AS BIGINT)
         WHEN n - 1 = 1 THEN 0 ELSE -1 END AS gap_stddev_ms,
    CASE WHEN n > 1 THEN list_sort(gaps)[CAST(n - 1 AS INT)]
         ELSE -1 END AS longest_gap_ms,
    CASE WHEN n > 1 THEN gaps[1] ELSE -1 END AS first_gap_ms,
    CASE WHEN n > 0 THEN CAST(n AS DOUBLE)
           / CAST(greatest(1, (newest - oldest) // 86400000) AS DOUBLE)
         ELSE 0.0 END AS items_per_day,
    CASE WHEN n > 0 THEN poll_ms - newest ELSE -1 END AS delay_ms,
    n > 1 AS valid
  FROM feed_base)"""


def feed_activity_sql(n_feeds: int = 40) -> str:
    """Oracle for the feed_activity gate query: stats + the
    FeedClassifier.java:96-148 CASE cascade."""
    day = 86_400_000
    return f"""
WITH {_feed_stats_cte(n_feeds)}
SELECT {_feed_url_sql()} AS feed_url, n AS n_items, median_gap_ms,
  round(avg_gap_ms, 6) AS avg_gap_ms, gap_stddev_ms, longest_gap_ms,
  round(items_per_day, 6) AS items_per_day, delay_ms, valid,
  CASE WHEN n = 0 THEN 'EMPTY'
       WHEN n = 1 THEN 'SINGLE_ENTRY'
       WHEN NOT valid THEN 'UNKNOWN'
       WHEN median_gap_ms < 5000 THEN
         CASE WHEN delay_ms < 5000 THEN 'ON_THE_FLY' ELSE 'CHUNKED' END
       WHEN delay_ms >= 8 * median_gap_ms
            AND delay_ms > {8 * 7 * day} THEN 'ZOMBIE'
       WHEN gap_stddev_ms >= median_gap_ms / 10.0
            AND median_gap_ms > {day} THEN 'SPONTANEOUS'
       WHEN longest_gap_ms < 12 * median_gap_ms
            AND longest_gap_ms < 7200000
            AND items_per_day >= 4 THEN 'CONSTANT'
       ELSE 'SLICED' END AS pattern
FROM feed_stat ORDER BY feed_url"""


def feed_update_intervals_sql(n_feeds: int = 40, lowest: int = 1,
                              highest: int = 10080) -> str:
    """Oracle for feed_update_intervals: MAV (no-new-item branch,
    MavUpdateStrategy.java:63-86) + fixLearnedW/P
    (FixLearnedUpdateStrategy.java:70-90), clamped to
    [lowest, highest]."""
    clamp = "greatest({lo}, least({hi}, {x}))"

    def c(x):
        return clamp.format(lo=lowest, hi=highest, x=x)

    mav_min = ("CASE WHEN n <= 1 THEN 30 WHEN n - 1 > 0 THEN "
               "CASE WHEN avg_gap_ms = 0 THEN " + str(highest) +
               " ELSE CAST(trunc(adj / 60000.0) AS BIGINT) END "
               "ELSE 60 END")
    mav_max = ("CASE WHEN n <= 1 THEN 60 "
               "WHEN n - 1 > 0 AND avg_gap_ms <> 0 "
               "THEN CAST(trunc(n * adj / 60000.0) AS BIGINT) "
               "ELSE 60 END")
    fixw = ("CASE WHEN n >= 2 AND time_newest_ms - time_oldest_ms > 0 "
            "THEN (time_newest_ms - time_oldest_ms) // ((n - 1) * 60000) "
            "ELSE 60 END")
    fixp = ("CASE WHEN n >= 1 "
            "AND delay_ms + time_newest_ms - time_oldest_ms > 0 "
            "THEN (delay_ms + time_newest_ms - time_oldest_ms) "
            "// (n * 60000) ELSE 60 END")
    return f"""
WITH {_feed_stats_cte(n_feeds)},
feed_adj AS (
  SELECT *, CASE WHEN delay_ms > 0 AND n > 1
      THEN avg_gap_ms - first_gap_ms // (n - 1) + delay_ms // (n - 1)
      ELSE avg_gap_ms END AS adj
  FROM feed_stat)
SELECT {_feed_url_sql()} AS feed_url,
  {c(mav_min)} AS mav_min, {c(mav_max)} AS mav_max,
  {c(fixw)} AS fixw, {c(fixp)} AS fixp
FROM feed_adj ORDER BY feed_url"""


def intent_actions_sql() -> str:
    """Symbolic mirror of the intent_actions gate: kgp.intents.
    synth_queries builds one query per event (variant = event_id % 5),
    each exercising exactly one DEFAULT_INTENTS rule; the expected
    activated action per variant is a closed form (the Spark side runs
    the real four-pass cascade)."""
    return """
WITH q AS (
  SELECT event_id AS qid, event_id % 5 AS v, event_type AS et,
         CAST(trunc(value * 10) AS INT) AS amount
  FROM events)
SELECT qid,
  CASE WHEN v = 0 THEN 'cheap ' || et
       WHEN v = 1 THEN 'under ' || amount || ' dollars ' || et
       WHEN v = 2 THEN 'best laptop'
       WHEN v = 3 THEN 'goto ' || et || ' page'
       ELSE et || ' deals today' END AS query,
  0 AS action_idx,
  CASE WHEN v IN (0, 1, 4) THEN 'DEFINITION'
       WHEN v = 2 THEN 'REWRITE' ELSE 'REDIRECT' END AS action_type,
  CASE WHEN v = 0 THEN 'CONTAINS' WHEN v IN (1, 3) THEN 'REGEX'
       WHEN v = 2 THEN 'MATCH' ELSE 'PHRASE_MATCH' END AS trigger_type,
  CASE WHEN v = 0 THEN 'cheap' WHEN v = 1 THEN 'under (\\d+) dollars'
       WHEN v = 2 THEN 'best laptop' WHEN v = 3 THEN 'goto (\\w+) page'
       ELSE 'deals' END AS trigger_text,
  CASE WHEN v IN (0, 1) THEN et
       WHEN v = 2 THEN 'laptop premium'
       WHEN v = 3 THEN 'goto ' || et || ' page'
       ELSE et || '  today' END AS modified_query,
  CASE WHEN v = 2 THEN 'laptop premium' END AS rewrite,
  CASE WHEN v = 3 THEN 'https://shop.example.com/' || et
  END AS redirect,
  CASE WHEN v IN (0, 1) THEN 'cost.PRICE' END AS filter_key,
  CASE WHEN v IN (0, 1) THEN CAST(0.0 AS DOUBLE) END AS filter_min,
  CASE WHEN v = 0 THEN 233.0
       WHEN v = 1 THEN CAST(amount AS DOUBLE) END AS filter_max,
  CASE WHEN v IN (0, 1) THEN '' END AS filter_values,
  CASE WHEN v = 0 THEN 'cost.PRICE'
       WHEN v = 4 THEN 'popularity' END AS sort_key,
  CASE WHEN v = 0 THEN 'ASC' WHEN v = 4 THEN 'DESC' END AS sort_dir
FROM q ORDER BY qid"""


def discovered_feeds_sql() -> str:
    """Symbolic mirror of kgp.feeds.synth_feed_pages + discover_feeds
    (the Spark side parses the real HTML): variant = doc_id % 6 ->
    expected (page_url, feed_url, feed_type, title) rows; variant 4's
    stylesheet/text-html links yield nothing."""
    page = "'https://site' || (doc_id % 7) || '.example.org/p/' || doc_id"
    site = "'https://site' || (doc_id % 7) || '.example.org'"
    return f"""
WITH d AS (
  SELECT doc_id, doc_id % 6 AS v, {page} AS page_url FROM documents)
SELECT page_url, feed_url, feed_type, title FROM (
  SELECT page_url,
         'https://feeds.example.org/r' || doc_id || '.xml' AS feed_url,
         'RSS' AS feed_type, CAST(NULL AS VARCHAR) AS title
  FROM d WHERE v = 0
  UNION ALL
  SELECT page_url, {site} || '/feeds/atom.xml', 'ATOM', NULL
  FROM d WHERE v = 1
  UNION ALL
  SELECT page_url, 'https://feeds.example.org/R' || doc_id || '.XML',
         'RSS', NULL
  FROM d WHERE v = 2
  UNION ALL
  SELECT page_url, 'http://feeds.example.org/f' || doc_id || '.xml',
         'RSS', NULL
  FROM d WHERE v = 3
  UNION ALL
  SELECT page_url, {site} || '/rss.xml', 'RSS', 'Site RSS'
  FROM d WHERE v = 5
  UNION ALL
  SELECT page_url, 'https://feeds.example.org/a' || doc_id || '.xml',
         'ATOM', 'Site Atom'
  FROM d WHERE v = 5)
ORDER BY page_url, feed_url"""


def unit_amounts_sql() -> str:
    """Mirror of the unit_amounts gate: the expected detected-unit
    name and base-unit multiplier per event_id%12 slot are computed
    HERE from kgp.units' reference-golden-pinned twins (detect_unit /
    unit_lookup, themselves pinned to NormalizationTest.java goldens),
    so the SQL stays symbolic while the Spark side runs the JVM
    regexp + map-literal path."""
    from kgp.units import GATE_UNITS, detect_unit, unit_lookup
    det = []
    mult = []
    for i, u in enumerate(GATE_UNITS):
        d = detect_unit(f"about 7 {u} total")
        det.append(f"WHEN {i} THEN '{d}'" if d is not None
                   else f"WHEN {i} THEN CAST(NULL AS VARCHAR)")
        m = unit_lookup(u)
        mult.append(f"WHEN {i} THEN value * {m!r}"
                    if m != -1.0 else f"WHEN {i} THEN value")
    units_case = " ".join(
        f"WHEN {i} THEN '{u}'" for i, u in enumerate(GATE_UNITS))
    return f"""
WITH e AS (
  SELECT event_id, value, event_id % {len(GATE_UNITS)} AS slot
  FROM events)
SELECT event_id,
  CASE slot {units_case} END AS unit,
  CASE slot {" ".join(det)} END AS detected,
  floor((CASE slot {" ".join(mult)} END) * 1000.0 + 0.5) / 1000.0
    AS base_value
FROM e ORDER BY event_id"""


def _content_rated_cte() -> str:
    """Shared base..rated CTE text for the content-date gates (the
    closed-form candidate features + forest rate)."""
    from kgp.contentdates import gate_rater_forest
    from kgp.dtree import tree_sql
    p_pos = tree_sql(gate_rater_forest(), "pos")
    return f"""WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS url, doc_id, CAST(ci AS BIGINT) AS ci
  FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS ci) cand
), f AS (
  SELECT url, doc_id, ci,
    CAST(CASE (doc_id + ci) % 3 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 3 END
         AS DOUBLE) AS key_class,
    CAST((doc_id * 3 + ci) % 3 AS DOUBLE) AS key_loc,
    CASE WHEN (doc_id * 3 + ci) % 3 = 2
         THEN CAST((doc_id * 7 + ci) % 31 AS DOUBLE) / 30.0
         ELSE CAST(0 AS DOUBLE) END AS key_diff,
    CAST((doc_id * 13 + ci * 37) % 100 AS DOUBLE) / 100.0
      AS rel_doc_pos,
    CAST(ci + 1 AS DOUBLE) / 3.0 AS ord_doc_pos,
    CAST((doc_id + 2 * ci) % 3 + 1 AS DOUBLE) / 3.0 AS ord_age_pos,
    CAST((doc_id * 5 + ci) % 3 + 1 AS DOUBLE) / 3.0 AS rel_cnt_same,
    CAST(1 AS DOUBLE) / 3.0 AS rel_size,
    CAST((doc_id + ci * 2) % 7 AS DOUBLE) AS exactness,
    CASE WHEN (doc_id + ci * 2) % 7 >= 4 THEN CAST(1 AS DOUBLE)
         ELSE CAST(0 AS DOUBLE) END AS hour_set,
    CASE WHEN doc_id % 5 = ci THEN CAST(1 AS DOUBLE)
         ELSE CAST(0 AS DOUBLE) END AS in_meta_d,
    CASE WHEN (doc_id + ci) % 9 = 0 THEN CAST(1 AS DOUBLE)
         ELSE CAST(0 AS DOUBLE) END AS h_tag_d,
    CASE WHEN (doc_id + ci) % 4 = 1 THEN CAST(1 AS DOUBLE)
         ELSE CAST(0 AS DOUBLE) END AS struct_d,
    CASE WHEN doc_id % 11 = 0 AND ci = 0 THEN CAST(1 AS DOUBLE)
         ELSE CAST(0 AS DOUBLE) END AS in_url_d,
    CAST(ci * 120 + doc_id % 50 AS BIGINT) AS abs_pos,
    CAST(2015 + (doc_id + ci) % 10 AS BIGINT) AS year,
    CAST((doc_id + 2 * ci) % 12 + 1 AS BIGINT) AS month,
    CAST((doc_id * 3 + ci) % 28 + 1 AS BIGINT) AS day,
    CAST(CASE WHEN (doc_id + ci * 2) % 7 >= 4 THEN (doc_id + ci) % 24
              ELSE -1 END AS BIGINT) AS hour
  FROM base
), v AS (
  SELECT *, printf('%04d-%02d-%02d', year, month, day) AS value
  FROM f
), rated AS (
  SELECT *,
    CASE WHEN in_url_d > 0 THEN CAST(1 AS DOUBLE)
         ELSE round({p_pos}, 9) + CAST(0 AS DOUBLE) END AS rate
  FROM v"""


def content_date_rates_sql() -> str:
    """Mirror of the content_date_rates gate: the SAME deterministic
    quickdt forest (kgp.contentdates.gate_rater_forest — trained on
    closed-form synthetic DateInstanceFactory vectors, no RNG)
    rendered as SQL by tree_sql; the candidate features, the
    publish+inUrl override (ContentDateRater.java:90-91) and the
    RatedDateComparator window (RatedDateComparator.java:39-75) are
    all recomputed symbolically."""
    return _content_rated_cte() + """
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY url
    ORDER BY rate DESC, abs_pos ASC, year DESC, month DESC, day DESC,
             hour DESC, value ASC) AS rn
  FROM rated
)
SELECT url, doc_id, value, year, month, day, hour, abs_pos, rate
FROM ranked WHERE rn = 1 ORDER BY doc_id"""


def audio_features_sql(window: int = 64, hop: int = 32) -> str:
    """Mirror of the audio_features gate: the WAV payload decodes back
    to the closed synth form pcm(i) = (mid*13 + i*17) % 4096 - 2048
    over n = mid%400+100 samples (kgp.multimodal.synth_samples), and
    every gate feature is an exact integer, so frame energy / zero
    crossings / peak recompute bit-for-bit in SQL."""
    return f"""
WITH aud AS (
  SELECT doc_id AS media_id, doc_id % 400 + 100 AS n
  FROM documents WHERE doc_id % 3 = 1),
fr AS (
  SELECT media_id, n,
         unnest(range(0, (n - {window}) // {hop} + 1)) AS frame_idx
  FROM aud WHERE n >= {window}),
sm AS (
  SELECT media_id, frame_idx, frame_idx * {hop} AS fstart,
         unnest(range(0, {window})) AS j
  FROM fr),
v AS (
  SELECT media_id, frame_idx, fstart, j,
    (media_id * 13 + (fstart + j) * 17) % 4096 - 2048 AS s,
    CASE WHEN j < {window - 1} THEN
      (media_id * 13 + (fstart + j + 1) * 17) % 4096 - 2048 END AS s2
  FROM sm)
SELECT CAST(media_id AS BIGINT) AS media_id,
  CAST(frame_idx AS BIGINT) AS frame_idx,
  CAST(MIN(fstart) AS BIGINT) AS start,
  CAST(SUM(s * s) AS BIGINT) AS energy_sumsq,
  CAST(SUM(CASE WHEN s2 IS NOT NULL AND ((s < 0) <> (s2 < 0))
      THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
  CAST(MAX(ABS(s)) AS BIGINT) AS peak
FROM v GROUP BY media_id, frame_idx ORDER BY media_id, frame_idx"""


def audio_fp_pairs_sql(k: int = 33, max_hamming: int = 3) -> str:
    """Mirror of the audio_fp_pairs gate (kgp.audiofp): the
    energy-difference fingerprint recomputes bit-for-bit from the
    closed synth PCM form pcm(i) = (src*13 + i*17) % 4096 - 2048 over
    n = src%400+100 samples. The decorated copies (gain-doubled ids
    +1_000_000 for src%5==0, polarity-flipped ids +2_000_000 for
    src%5==2) get their code computed from the SOURCE samples — the
    sign code is provably invariant to exact gain and polarity
    (energies scale by g^2 / are unchanged), so if the Spark side ever
    breaks that invariance the hashes diverge. All-pairs Hamming is
    fine oracle-side; the Spark path uses the 4x8-bit pigeonhole band
    join."""
    return f"""
WITH aud AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id, doc_id AS src
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT CAST(doc_id + 1000000 AS BIGINT), doc_id
  FROM documents WHERE doc_id % 3 = 1 AND doc_id % 5 = 0
  UNION ALL
  SELECT CAST(doc_id + 2000000 AS BIGINT), doc_id
  FROM documents WHERE doc_id % 3 = 1 AND doc_id % 5 = 2),
segs AS (
  SELECT media_id, src, src % 400 + 100 AS n,
         unnest(range(0, {k})) AS s
  FROM aud),
idx AS (
  SELECT media_id, src, s,
         unnest(range((s * n) // {k}, ((s + 1) * n) // {k})) AS i
  FROM segs),
en AS (
  SELECT media_id, s,
         SUM(CAST(((src*13 + i*17) % 4096 - 2048)
                  * ((src*13 + i*17) % 4096 - 2048) AS BIGINT)) AS e
  FROM idx GROUP BY media_id, s),
nxt AS (
  SELECT media_id, s, e,
         LEAD(e) OVER (PARTITION BY media_id ORDER BY s) AS e2
  FROM en),
fp AS (
  SELECT media_id,
         SUM(CASE WHEN e2 > e THEN CAST(1 AS BIGINT) << CAST(s AS INT)
             ELSE 0 END) AS code
  FROM nxt WHERE s < {k - 1} GROUP BY media_id)
SELECT x.media_id AS a, y.media_id AS b,
       CAST(bit_count(xor(x.code, y.code)) AS INT) AS hamming
FROM fp x JOIN fp y ON x.media_id < y.media_id
WHERE bit_count(xor(x.code, y.code)) <= {max_hamming}
ORDER BY a, b"""


def bovw_histograms_sql(seed_mod: int = 30) -> str:
    """Mirror of the bovw_histograms gate (kgp.bovw): grid-patch
    descriptors (2x2 cells, quadrant luminosity sums — every value an
    exact integer over the closed-form pixels), seed vocabulary = the
    descriptors of the %seed_mod==0 training images ordered by
    (media_id, cell), assignment = exact integer squared Euclidean
    with strict-< first-wins ties (word ASC in the ranking), histogram
    = COUNT per (media_id, word)."""
    lum = ("trunc(0.21*((7*media_id + 5*(yi*ch+qy*qh+rr)"
           " + 3*(xi*cw+qx*qw+cc)) % 256)"
           " + 0.72*((7*media_id + 5*(yi*ch+qy*qh+rr)"
           " + 3*(xi*cw+qx*qw+cc) + 11) % 256)"
           " + 0.07*((7*media_id + 5*(yi*ch+qy*qh+rr)"
           " + 3*(xi*cw+qx*qw+cc) + 22) % 256))")
    return f"""
WITH img AS (
  SELECT doc_id AS media_id,
         (doc_id % 13 + 4) // 2 AS cw, (doc_id % 7 + 4) // 2 AS ch
  FROM documents WHERE doc_id % 3 = 0),
dims AS (
  SELECT media_id, cw, ch, cw // 2 AS qw, ch // 2 AS qh FROM img),
grid AS (
  SELECT media_id, cw, ch, qw, qh, xi, yi, qx, qy
  FROM dims, range(0, 2) x(xi), range(0, 2) y(yi),
       range(0, 2) a(qx), range(0, 2) b(qy)),
pr AS (SELECT *, unnest(range(0, qh)) AS rr FROM grid),
pc AS (SELECT *, unnest(range(0, qw)) AS cc FROM pr),
descs AS (
  SELECT media_id, xi * 2 + yi AS cell, qx * 2 + qy AS dim,
         CAST(SUM({lum}) AS BIGINT) AS val
  FROM pc GROUP BY media_id, xi * 2 + yi, qx * 2 + qy),
vocab AS (
  SELECT DENSE_RANK() OVER (ORDER BY media_id, cell) - 1 AS word,
         dim, val
  FROM descs WHERE media_id % {seed_mod} = 0),
dist AS (
  SELECT d.media_id, d.cell, v.word,
         SUM((d.val - v.val) * (d.val - v.val)) AS dd
  FROM descs d JOIN vocab v ON d.dim = v.dim
  GROUP BY d.media_id, d.cell, v.word),
best AS (
  SELECT media_id, cell, word FROM dist
  QUALIFY ROW_NUMBER() OVER (PARTITION BY media_id, cell
                             ORDER BY dd, word) = 1)
SELECT media_id, CAST(word AS INT) AS word,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM best GROUP BY media_id, word ORDER BY media_id, word"""


def png_pixel_stats_sql() -> str:
    """Mirror of the png_pixel_stats gate: the pixels fed through the
    PNG encode→decode loop are the closed form (7*id + 5r + 3c +
    11*ch) % 256 (kgp.multimodal.synth_pixel_array), so every channel
    sum and corner value is integer-exact SQL."""
    return """
WITH img AS (
  SELECT doc_id AS media_id, doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
  FROM documents WHERE doc_id % 3 = 0),
pr AS (SELECT media_id, w, h, unnest(range(0, h)) AS r FROM img),
px AS (SELECT media_id, w, h, r, unnest(range(0, w)) AS c FROM pr),
v AS (
  SELECT media_id, w, h, r, c,
    (7 * media_id + 5 * r + 3 * c) % 256 AS red,
    (7 * media_id + 5 * r + 3 * c + 11) % 256 AS grn,
    (7 * media_id + 5 * r + 3 * c + 22) % 256 AS blu
  FROM px)
SELECT media_id,
  CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(h) AS BIGINT) AS height,
  CAST(SUM(red) AS BIGINT) AS sum_red,
  CAST(SUM(grn) AS BIGINT) AS sum_grn,
  CAST(SUM(blu) AS BIGINT) AS sum_blu,
  CAST(MIN(CASE WHEN r = 0 AND c = 0 THEN red END) AS BIGINT)
    AS first_red,
  CAST(MIN(CASE WHEN r = h - 1 AND c = w - 1 THEN blu END) AS BIGINT)
    AS last_blu
FROM v GROUP BY media_id ORDER BY media_id"""


def jpeg_pixel_stats_sql() -> str:
    """Mirror of the jpeg_pixel_stats gate: tile-constant grayscale
    round-trips the baseline JPEG codec EXACTLY with the all-ones
    quant table (kgp.jpegcodec exactness contract), so every stat is
    the closed tile form (7*id + 31*tr + 17*tc) % 256 scaled by the
    64 pixels per tile."""
    return """
WITH img AS (
  SELECT doc_id AS media_id, doc_id % 5 + 1 AS th, doc_id % 4 + 1 AS tw
  FROM documents WHERE doc_id % 3 = 0),
tr AS (SELECT media_id, th, tw, unnest(range(0, th)) AS r FROM img),
tc AS (SELECT media_id, th, tw, r, unnest(range(0, tw)) AS c FROM tr),
v AS (
  SELECT media_id, th, tw, r, c,
    (7 * media_id + 31 * r + 17 * c) % 256 AS val
  FROM tc)
SELECT media_id,
  CAST(MIN(tw) * 8 AS BIGINT) AS width,
  CAST(MIN(th) * 8 AS BIGINT) AS height,
  CAST(SUM(val) * 64 AS BIGINT) AS sum_gray,
  CAST(MIN(CASE WHEN r = 0 AND c = 0 THEN val END) AS BIGINT)
    AS first_gray,
  CAST(MIN(CASE WHEN r = th - 1 AND c = tw - 1 THEN val END)
       AS BIGINT) AS last_gray
FROM v GROUP BY media_id ORDER BY media_id"""


def video_frame_stats_sql() -> str:
    """Mirror of the video_frame_stats gate: MJPEG-in-MP4 frames are
    tile-constant grayscale under the all-ones quant table (exact per
    the kgp.jpegcodec contract) at 100 ms spacing, so every stat is
    the closed tile form (7*id + 13*f + 31*tr + 17*tc) % 256."""
    return """
WITH vid AS (
  SELECT doc_id AS media_id, doc_id % 3 + 1 AS th, doc_id % 4 + 1 AS tw,
         doc_id % 4 + 2 AS nf
  FROM documents WHERE doc_id % 3 = 2),
fr AS (SELECT media_id, th, tw, unnest(range(0, nf)) AS f FROM vid),
tr AS (SELECT media_id, th, tw, f, unnest(range(0, th)) AS r FROM fr),
tc AS (SELECT media_id, th, tw, f, r, unnest(range(0, tw)) AS c
       FROM tr),
v AS (
  SELECT media_id, th, tw, f, r, c,
    (7 * media_id + 13 * f + 31 * r + 17 * c) % 256 AS val
  FROM tc)
SELECT media_id,
  CAST(f AS BIGINT) AS frame_idx,
  CAST(f * 100 AS BIGINT) AS ts_ms,
  CAST(MIN(tw) * 8 AS BIGINT) AS width,
  CAST(MIN(th) * 8 AS BIGINT) AS height,
  CAST(SUM(val) * 64 AS BIGINT) AS sum_gray,
  CAST(MIN(CASE WHEN r = 0 AND c = 0 THEN val END) AS BIGINT)
    AS first_gray
FROM v GROUP BY media_id, f ORDER BY media_id, f"""


def ml_disambig_links_sql() -> str:
    """Mirror of the ml_disambig_links gate: the expanded gate
    gazetteer inlined as VALUES, every ConfigurableFeatureExtractor
    feature recomputed in SQL (window ambiguity counts, doc-level
    entity/ancestor sets, haversine 50 km pair counts), the SAME
    deterministic quickdt forest rendered by tree_sql, then the argmax
    window + probability threshold (FeatureBasedDisambiguation.java:
    36,79-99)."""
    from kgp.disambig_ml import (PROBABILITY_THRESHOLD,
                                 gate_disambig_forest,
                                 gate_gazetteer_rows)
    from kgp.dtree import tree_sql
    p_pos = tree_sql(gate_disambig_forest(), "pos")

    gaz_vals = []
    for r in gate_gazetteer_rows():
        uniq = list(dict.fromkeys([r["name"], *r["alt_names"]]))
        pop = r["population"] if r["population"] is not None else -1
        anc = "CAST([" + ", ".join(str(a) for a in r["ancestor_ids"]) \
            + "] AS BIGINT[])"
        lat = "CAST(NULL AS DOUBLE)" if r["lat"] is None \
            else f"CAST({r['lat']!r} AS DOUBLE)"
        lon = "CAST(NULL AS DOUBLE)" if r["lon"] is None \
            else f"CAST({r['lon']!r} AS DOUBLE)"
        for form in uniq:
            gaz_vals.append(
                f"(CAST({r['id']} AS BIGINT), {_lit(r['name'])}, "
                f"{_lit(form.lower())}, {_lit(r['type'])}, "
                f"CAST({pop} AS BIGINT), {anc}, {lat}, {lon}, "
                f"CAST({len(uniq)} AS BIGINT))")

    hav = ("2 * 6371.0 * asin(sqrt(pow(sin(radians(c.lat - o.lat) / 2)"
           ", 2) + cos(radians(o.lat)) * cos(radians(c.lat)) * "
           "pow(sin(radians(c.lon - o.lon) / 2), 2)))")
    mention_selects = f"""
  SELECT CAST(doc_id AS VARCHAR) AS url, CAST(0 AS BIGINT) AS sent_idx,
         CAST(5 AS BIGINT) AS "start",
         {_pick(C.CITIES, 'doc_id % 11')} AS surface, 'CITY' AS tag,
         CAST(0.9 AS DOUBLE) AS score FROM documents
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 1, 40,
         {_pick(C.COUNTRIES, 'doc_id % 7')}, 'COUNTRY',
         CAST(0.7 AS DOUBLE) FROM documents
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 2, 80,
         {_pick(C.ORGS, 'doc_id % 13')}, 'ORG',
         CAST(0.5 AS DOUBLE) FROM documents
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 3, 120, 'Rivertown Port',
         'POI', CAST(0.6 AS DOUBLE) FROM documents WHERE doc_id % 4 = 1
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 4, 160, 'ACME', 'ORG',
         CAST(0.4 AS DOUBLE) FROM documents WHERE doc_id % 6 = 2
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 5, 200, 'Zanzitown',
         'CITY', CAST(0.3 AS DOUBLE) FROM documents
         WHERE doc_id % 9 = 3"""
    d0 = "CAST(0 AS DOUBLE)"
    return f"""
WITH m AS MATERIALIZED (
  SELECT *, CAST("start" + length(surface) AS BIGINT) AS "end"
  FROM ({mention_selects})
), gaz(entity_id, canon_name, norm, etype, population, anc, lat, lon,
       n_forms) AS (
  VALUES {", ".join(gaz_vals)}
), cand AS MATERIALIZED (
  SELECT m.url, m.sent_idx, m."start", m."end", m.surface, m.tag,
         m.score, g.entity_id, g.canon_name, g.etype, g.population,
         g.anc, g.lat, g.lon, g.n_forms
  FROM m LEFT JOIN gaz g ON g.norm = lower(m.surface)
), docagg AS MATERIALIZED (
  SELECT url,
    list_distinct(list(entity_id)
      FILTER (WHERE entity_id IS NOT NULL)) AS doc_ids,
    list_distinct(flatten(list(anc)
      FILTER (WHERE entity_id IS NOT NULL))) AS doc_anc,
    max(CASE WHEN entity_id IS NOT NULL AND lat IS NOT NULL
             AND population >= 100000 THEN 1 ELSE 0 END) AS bigpop
  FROM cand GROUP BY url
), geo AS MATERIALIZED (
  SELECT url, entity_id AS eid, lat, lon FROM cand
  WHERE entity_id IS NOT NULL AND lat IS NOT NULL
), n50 AS MATERIALIZED (
  SELECT c.url, c.entity_id, count(*) AS cnt
  FROM (SELECT DISTINCT url, eid AS entity_id, lat, lon FROM geo) c
  JOIN geo o ON o.url = c.url AND o.eid <> c.entity_id
            AND {hav} < 50
  GROUP BY c.url, c.entity_id
), feat AS MATERIALIZED (
  SELECT c.url, c.sent_idx, c."start", c."end", c.surface, c.tag,
    c.entity_id, c.canon_name,
    COALESCE(CAST(length(c.surface) AS DOUBLE), {d0}) AS f_num_chars,
    COALESCE(CAST(len(string_split(c.surface, ' ')) AS DOUBLE), {d0})
      AS f_num_tokens,
    CASE WHEN regexp_matches(c.surface, '^([A-Z]+|([A-Z]\\.)+)$')
         THEN CAST(1 AS DOUBLE) ELSE {d0} END AS f_acronym,
    COALESCE(CAST(c.population AS DOUBLE), {d0}) AS f_population,
    COALESCE(CAST(CASE WHEN c.entity_id IS NOT NULL THEN len(c.anc)
                       ELSE 0 END AS DOUBLE), {d0})
      AS f_hierarchy_depth,
    CAST(1 AS DOUBLE) / GREATEST(COUNT(c.entity_id) OVER (
      PARTITION BY c.url, c.sent_idx, c."start", c."end"), 1)
      AS f_name_ambiguity,
    CAST(1 AS DOUBLE) / GREATEST(COALESCE(c.n_forms, 1), 1)
      AS f_name_diversity,
    CASE WHEN lower(c.surface) = lower(c.canon_name)
         THEN CAST(1 AS DOUBLE) ELSE {d0} END AS f_primary_name,
    COALESCE(CAST(CASE c.etype WHEN 'CITY' THEN 0 WHEN 'COUNTRY' THEN 1
      WHEN 'UNIT' THEN 2 WHEN 'CONTINENT' THEN 3 WHEN 'REGION' THEN 4
      WHEN 'POI' THEN 5 WHEN 'LANDMARK' THEN 6 WHEN 'UNDETERMINED'
      THEN 7 ELSE -1 END AS DOUBLE), {d0}) AS f_type_code,
    CASE WHEN list_has_any(COALESCE(c.anc, CAST([] AS BIGINT[])),
                           COALESCE(a.doc_ids, CAST([] AS BIGINT[])))
         THEN CAST(1 AS DOUBLE) ELSE {d0} END AS f_has_ancestor_in_doc,
    CASE WHEN c.entity_id IS NOT NULL AND list_contains(
           COALESCE(a.doc_anc, CAST([] AS BIGINT[])), c.entity_id)
         THEN CAST(1 AS DOUBLE) ELSE {d0} END
      AS f_has_descendant_in_doc,
    CASE WHEN c.entity_id IS NULL OR c.lat IS NULL THEN {d0}
         ELSE COALESCE(CAST(n.cnt AS DOUBLE), {d0}) END
      AS f_num_loc_in_50,
    COALESCE(CAST(a.bigpop AS DOUBLE), {d0}) AS f_big_pop_in_doc,
    COALESCE(CAST(c.score AS DOUBLE), {d0}) AS f_mention_score
  FROM cand c
  LEFT JOIN docagg a ON a.url = c.url
  LEFT JOIN n50 n ON n.url = c.url AND n.entity_id = c.entity_id
), scored AS MATERIALIZED (
  SELECT *, round({p_pos}, 9) + {d0} AS p_true FROM feat
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY url, sent_idx, "start", "end"
    ORDER BY p_true DESC, entity_id ASC) AS rn
  FROM scored
), best AS (
  SELECT *, (entity_id IS NOT NULL
             AND p_true >= {PROBABILITY_THRESHOLD!r}) AS keep
  FROM ranked WHERE rn = 1
)
SELECT url, sent_idx, "start", "end", surface, tag,
  CASE WHEN keep THEN entity_id END AS entity_id,
  CASE WHEN keep THEN canon_name ELSE surface END AS canon_name,
  CASE WHEN keep THEN p_true ELSE {d0} END AS link_score
FROM best ORDER BY url, sent_idx"""


def dt_predictions_sql() -> str:
    """Mirror of the dt_predictions gate: the SAME deterministic tree
    (kgp.dtree.gate_model — trained on closed-form synthetic data, no
    RNG) rendered as nested SQL CASE by tree_sql; features derived
    from events identically on both sides."""
    from kgp.dtree import gate_model, tree_sql
    model = gate_model()
    p_pos = tree_sql(model, "pos")
    p_neg = tree_sql(model, "neg")
    return f"""
WITH f AS (
  SELECT event_id,
    CAST(value AS DOUBLE) AS x,
    CAST(user_id % 10 AS DOUBLE) AS y,
    CASE event_id % 3 WHEN 0 THEN 'red' WHEN 1 THEN 'green'
         ELSE 'blue' END AS color
  FROM events)
SELECT event_id, x, y, color,
  {p_neg} AS p_neg, {p_pos} AS p_pos,
  CASE WHEN {p_pos} > {p_neg} THEN 'pos' ELSE 'neg' END AS predicted
FROM f ORDER BY event_id"""


def image_features_sql() -> str:
    """Mirror of the image_features gate: the BMP corpus pixels are
    the closed form (7*id + 5r + 3c + 11*ch) % 256 (kgp.multimodal.
    synth_pixel_array), so every HistogramStats/Symmetry feature is
    derivable from exact integer moments; floats that traverse
    different accumulation orders are rounded to 9 on both sides."""
    return """
WITH img AS (
  SELECT doc_id AS media_id, doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
  FROM documents WHERE doc_id % 3 = 0),
pr AS (SELECT media_id, w, h, unnest(range(0, h)) AS r FROM img),
px AS (SELECT media_id, w, h, r, unnest(range(0, w)) AS c FROM pr),
v AS (
  SELECT media_id, w, h, r, c,
    (7*media_id + 5*r + 3*c) % 256 AS red,
    (7*media_id + 5*r + 3*c + 11) % 256 AS grn,
    (7*media_id + 5*r + 3*c + 22) % 256 AS blu
  FROM px),
agg AS (
  SELECT media_id, any_value(w) AS w, any_value(h) AS h,
    count(*) AS n, sum(red) AS s1, sum(red*red) AS s2,
    sum(red*red*red) AS s3, min(red) AS mn, max(red) AS mx,
    list_sort(list(red)) AS sr,
    sum(CAST(trunc(0.21*red + 0.72*grn + 0.07*blu) AS BIGINT))
      AS lsum,
    sum(pow(abs(red - ((7*media_id + 5*(h-1-r) + 3*c) % 256))
            / 255.0, 2)) AS dh,
    sum(pow(abs(red - ((7*media_id + 5*r + 3*(w-1-c)) % 256))
            / 255.0, 2)) AS dv
  FROM v GROUP BY media_id),
st AS (
  SELECT *, CAST(s1 AS DOUBLE) / n AS mean,
    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n AS m2,
    (CAST(s3 AS DOUBLE)
     - 3.0 * (CAST(s1 AS DOUBLE) / n) * s2
     + 3.0 * pow(CAST(s1 AS DOUBLE) / n, 2) * s1
     - n * pow(CAST(s1 AS DOUBLE) / n, 3)) / n AS m3
  FROM agg)
SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CAST(h AS DOUBLE) / w AS ratio,
  mean AS red_mean, CAST(mn AS DOUBLE) AS red_min,
  CAST(mx AS DOUBLE) AS red_max, CAST(s1 AS DOUBLE) AS red_sum,
  CASE WHEN n % 2 = 0
       THEN 0.5 * sr[CAST(n // 2 AS INT)]
            + 0.5 * sr[CAST(n // 2 AS INT) + 1]
       ELSE CAST(sr[CAST((n + 1) // 2 AS INT)] AS DOUBLE)
  END AS red_p50,
  round(sqrt(m2), 9) AS red_stddev,
  round(m3 / pow(m2, 1.5), 9) AS red_skewness,
  round(CAST(lsum AS DOUBLE) / n, 9) AS lum_mean,
  round(1 - sqrt(dh / n), 9) AS sym_h_red,
  round(1 - sqrt(dv / n), 9) AS sym_v_red
FROM st ORDER BY media_id"""


_IMAGE_LUM_PX = """
img AS (
  SELECT doc_id AS media_id, doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
  FROM documents WHERE doc_id % 3 = 0),
pr AS (SELECT media_id, w, h, unnest(range(0, h)) AS r FROM img),
px AS (SELECT media_id, w, h, r, unnest(range(0, w)) AS c FROM pr),
lum AS (
  SELECT media_id, w, h, r, c,
    CAST(trunc(0.21 * ((7*media_id + 5*r + 3*c) % 256)
             + 0.72 * ((7*media_id + 5*r + 3*c + 11) % 256)
             + 0.07 * ((7*media_id + 5*r + 3*c + 22) % 256))
         AS BIGINT) AS v
  FROM px)"""


def _hash_bits_ctes() -> str:
    """Shared CTE chain deriving the AverageHash and GradientHash bit
    tables from the closed-form BMP pixels (kgp.imagehash: integer
    area-mean cells, bit = 64*cell > total / cell < right-neighbor)."""
    return f"""
WITH {_IMAGE_LUM_PX},
c8 AS (
  SELECT media_id, oy, ox, SUM(v * wx * wy) AS cell
  FROM (
    SELECT l.media_id, l.v, oyt.oy, oxt.ox,
      greatest(0, least(8*(l.c+1), (oxt.ox+1)*l.w)
                  - greatest(8*l.c, oxt.ox*l.w)) AS wx,
      greatest(0, least(8*(l.r+1), (oyt.oy+1)*l.h)
                  - greatest(8*l.r, oyt.oy*l.h)) AS wy
    FROM lum l, range(0, 8) oxt(ox), range(0, 8) oyt(oy))
  WHERE wx > 0 AND wy > 0 GROUP BY media_id, oy, ox),
tot AS (SELECT media_id, SUM(cell) AS total FROM c8 GROUP BY media_id),
abits AS (
  SELECT c8.media_id, oy * 8 + ox AS idx,
         CASE WHEN 64 * cell > total THEN 1 ELSE 0 END AS b
  FROM c8 JOIN tot ON c8.media_id = tot.media_id),
c9 AS (
  SELECT media_id, oy, ox, SUM(v * wx * wy) AS cell
  FROM (
    SELECT l.media_id, l.v, oyt.oy, oxt.ox,
      greatest(0, least(9*(l.c+1), (oxt.ox+1)*l.w)
                  - greatest(9*l.c, oxt.ox*l.w)) AS wx,
      greatest(0, least(8*(l.r+1), (oyt.oy+1)*l.h)
                  - greatest(8*l.r, oyt.oy*l.h)) AS wy
    FROM lum l, range(0, 9) oxt(ox), range(0, 8) oyt(oy))
  WHERE wx > 0 AND wy > 0 GROUP BY media_id, oy, ox),
gbits AS (
  SELECT a.media_id, a.ox * 8 + a.oy AS idx,
         CASE WHEN a.cell < b.cell THEN 1 ELSE 0 END AS b
  FROM c9 a JOIN c9 b
    ON a.media_id = b.media_id AND a.oy = b.oy AND b.ox = a.ox + 1
  WHERE a.ox < 8)"""


def image_hashes_sql() -> str:
    """Mirror of the image_hashes gate: AverageHash + GradientHash hex
    strings rebuilt nibble-by-nibble from the bit tables (bit 0 is the
    MSB, HashUtil.toHex zero-padded 16-char hex)."""
    return _hash_bits_ctes() + """,
ahex AS (
  SELECT media_id, idx // 4 AS nib,
         SUM(b << (3 - idx % 4)) AS val
  FROM abits GROUP BY media_id, nib),
ghex AS (
  SELECT media_id, idx // 4 AS nib,
         SUM(b << (3 - idx % 4)) AS val
  FROM gbits GROUP BY media_id, nib),
a AS (SELECT media_id,
        string_agg(printf('%x', CAST(val AS INT)), '' ORDER BY nib) AS ahash
      FROM ahex GROUP BY media_id),
g AS (SELECT media_id,
        string_agg(printf('%x', CAST(val AS INT)), '' ORDER BY nib) AS ghash
      FROM ghex GROUP BY media_id)
SELECT a.media_id, a.ahash, g.ghash
FROM a JOIN g ON a.media_id = g.media_id ORDER BY a.media_id"""


def phash_pairs_sql(max_hamming: int = 3) -> str:
    """Mirror of the phash_dup_pairs gate: exact Hamming over the
    recomputed AverageHash bits (all-pairs is fine oracle-side; the
    Spark path uses the 4x16 pigeonhole band join)."""
    return _hash_bits_ctes() + f""",
pairs AS (
  SELECT x.media_id AS a, y.media_id AS b,
         SUM(CASE WHEN x.b <> y.b THEN 1 ELSE 0 END) AS hamming
  FROM abits x JOIN abits y
    ON x.idx = y.idx AND x.media_id < y.media_id
  GROUP BY x.media_id, y.media_id)
SELECT a, b, CAST(hamming AS INT) AS hamming
FROM pairs WHERE hamming <= {max_hamming} ORDER BY a, b"""


def grid_similarity_sql() -> str:
    """Mirror of the grid_similarity gate (GridSimilarityExtractor
    d=2): cell-pair luminosity similarities recomputed positionally
    from the closed-form pixels; sims rounded to 9 before the
    FatStats aggregates (and aggregates re-rounded to 9) so numpy and
    SQL accumulation orders agree. The mean is excluded: the average
    of six 9-decimal values lands exactly on a .5 at the 9th decimal
    for ~10%% of images (banker's vs half-away rounding divergence);
    the sum carries the identical information and is decimal-exact."""

    def lum(row: str, col: str) -> str:
        return (f"CAST(trunc(0.21 * ((7*media_id + 5*({row}) + 3*({col})) % 256)"
                f" + 0.72 * ((7*media_id + 5*({row}) + 3*({col}) + 11) % 256)"
                f" + 0.07 * ((7*media_id + 5*({row}) + 3*({col}) + 22) % 256))"
                f" AS BIGINT)")

    la = lum("ay * ch + rr", "ax * cw + cc")
    lb = lum("by_ * ch + rr", "bx * cw + cc")
    return f"""
WITH img AS (
  SELECT doc_id AS media_id,
         (doc_id % 13 + 4) // 2 AS cw, (doc_id % 7 + 4) // 2 AS ch
  FROM documents WHERE doc_id % 3 = 0),
pairdef(pi, ax, ay, bx, by_) AS (VALUES
  (0, 0, 0, 0, 1), (1, 0, 0, 1, 0), (2, 0, 0, 1, 1),
  (3, 0, 1, 1, 0), (4, 0, 1, 1, 1), (5, 1, 0, 1, 1)),
pr2 AS (
  SELECT media_id, cw, ch, unnest(range(0, ch)) AS rr FROM img),
rel AS (
  SELECT media_id, cw, ch, rr, unnest(range(0, cw)) AS cc FROM pr2),
pp AS (
  SELECT media_id, pi,
         pow(abs({la} - {lb}) / 255.0, 2) AS d2
  FROM rel, pairdef),
sims AS (
  SELECT media_id, pi,
         round(1 - sqrt(SUM(d2) / COUNT(*)), 9) AS sim
  FROM pp GROUP BY media_id, pi),
iv AS (
  SELECT media_id, sim, CAST(round(sim * 1e9) AS BIGINT) AS v
  FROM sims),
agg AS (
  SELECT media_id, min(sim) AS sim_min, max(sim) AS sim_max,
         sqrt(CAST(COUNT(*) * CAST(SUM(CAST(v AS HUGEINT) * v)
                                   AS HUGEINT)
                   - CAST(SUM(v) AS HUGEINT) * CAST(SUM(v) AS HUGEINT) AS DOUBLE)
              / (COUNT(*) * (COUNT(*) - 1)) / 1e18) AS sim_stddev,
         round(sum(sim), 9) AS sim_sum,
         list_sort(list(sim)) AS sr
  FROM iv GROUP BY media_id)
SELECT media_id, sim_min, sim_max, sim_stddev, sim_sum,
       sr[2] AS sim_p30, 0.5 * sr[3] + 0.5 * sr[4] AS sim_p50,
       sr[5] AS sim_p80
FROM agg ORDER BY media_id"""


def block_codes_sql() -> str:
    """Mirror of the block_codes gate (BlockCodeExtractor with the
    GREY_SCALE_5 palette, pixelation 2, 2x2 blocks, 2x2 sections):
    corner pixels are closed-form, quantized to the nearest palette
    gray by full CIE76 Lab distance (palette Lab values inlined as
    exact literals; first-strictly-smaller == lowest-index tie rule),
    then the word grammar (main color by first-appearance mode, shape
    code, the asymmetric +1-on-x section quirk, '!' suffix) is
    rebuilt in SQL."""
    from kgp.multimodal import rgb_to_lab
    grays = [(0, 0, 0), (255, 255, 255), (192, 192, 192),
             (128, 128, 128), (64, 64, 64)]
    labs = [rgb_to_lab(*c) for c in grays]

    def chan(off: int) -> str:
        return f"((7*media_id + 5*y + 3*x + {off}) % 256)"

    def lin(expr: str) -> str:
        return (f"(CASE WHEN {expr} / 255.0 <= 0.04045 "
                f"THEN {expr} / 255.0 / 12.92 "
                f"ELSE pow(({expr} / 255.0 + 0.055) / 1.055, 2.4) "
                f"END) * 100")

    # exact _SRGB_M / D65 constants (kgp.multimodal.rgb_to_lab)
    xyz = [
        f"(rl * 0.4124 + gl * 0.3576 + bl * 0.1805) / 95.047",
        f"(rl * 0.2126 + gl * 0.7152 + bl * 0.0722) / 100.0",
        f"(rl * 0.0193 + gl * 0.1192 + bl * 0.9505) / 108.883",
    ]

    def fl(expr: str) -> str:
        return (f"CASE WHEN {expr} > 0.008856 THEN pow({expr}, "
                f"1.0/3) ELSE 7.787 * {expr} + 16.0/116.0 END")

    dists = " , ".join(
        f"(lab_l - {labs[k][0]!r})^2 + (lab_a - {labs[k][1]!r})^2 "
        f"+ (lab_b - {labs[k][2]!r})^2 AS d{k}" for k in range(5))
    argmin = ("CASE WHEN d0 <= least(d1, d2, d3, d4) THEN 0 "
              "WHEN d1 <= least(d2, d3, d4) THEN 1 "
              "WHEN d2 <= least(d3, d4) THEN 2 "
              "WHEN d3 <= d4 THEN 3 ELSE 4 END")
    counts = " , ".join(
        "(" + " + ".join(f"CASE WHEN v{j} = v{k} THEN 1 ELSE 0 END"
                         for j in range(4)) + f") AS c{k}"
        for k in range(4))
    return f"""
WITH img AS (
  SELECT doc_id AS media_id, doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
  FROM documents WHERE doc_id % 3 = 0),
bj AS (SELECT media_id, w, h, unnest(range(0, h // 4)) AS j FROM img),
bi AS (SELECT media_id, w, h, j, unnest(range(0, w // 4)) AS i
       FROM bj),
corners AS (
  SELECT media_id, w, h, j, i, k.k,
         4 * i + (k.k % 2) * 2 AS x, 4 * j + (k.k // 2) * 2 AS y
  FROM bi, range(0, 4) k(k)),
lin AS (
  SELECT media_id, w, h, j, i, k,
         {lin(chan(0))} AS rl, {lin(chan(11))} AS gl,
         {lin(chan(22))} AS bl
  FROM corners),
lab AS (
  SELECT media_id, w, h, j, i, k,
         116.0 * {fl(xyz[1])} - 16.0 AS lab_l,
         500.0 * ({fl(xyz[0])} - {fl(xyz[1])}) AS lab_a,
         200.0 * ({fl(xyz[1])} - {fl(xyz[2])}) AS lab_b
  FROM lin),
q AS (
  SELECT media_id, w, h, j, i, k, {argmin} AS v
  FROM (SELECT media_id, w, h, j, i, k, {dists} FROM lab)),
blocks AS (
  SELECT media_id, any_value(w) AS w, any_value(h) AS h, j, i,
         MAX(CASE WHEN k = 0 THEN v END) AS v0,
         MAX(CASE WHEN k = 1 THEN v END) AS v1,
         MAX(CASE WHEN k = 2 THEN v END) AS v2,
         MAX(CASE WHEN k = 3 THEN v END) AS v3
  FROM q GROUP BY media_id, j, i),
coded AS (
  SELECT media_id, j, i,
         (4 * i) // (w // 2) + 1 AS sx, (4 * j) // (h // 2) AS sy,
         {counts},
         (CASE WHEN v0 = v1 THEN 0 ELSE 1 END
          + CASE WHEN v2 IN (v0, v1) THEN 0 ELSE 1 END
          + CASE WHEN v3 IN (v0, v1, v2) THEN 0 ELSE 1 END + 1)
           AS n_colors,
         v0, v1, v2, v3
  FROM blocks),
words AS (
  SELECT media_id, j, i,
         chr(CAST(97 + CASE
           WHEN c0 = greatest(c0, c1, c2, c3) THEN v0
           WHEN c1 = greatest(c1, c2, c3) THEN v1
           WHEN c2 = greatest(c2, c3) THEN v2 ELSE v3 END AS INT))
         || CAST(CASE
              WHEN n_colors = 1 THEN 1
              WHEN v0 = v2 AND v1 = v3 THEN 2
              WHEN v0 = v1 AND v2 = v3 THEN 3
              WHEN v0 = v3 AND v1 = v2 THEN 4 ELSE 0 END AS VARCHAR)
         || chr(CAST(96 + sy * 2 + sx AS INT)) || '!' AS word
  FROM coded)
SELECT media_id,
       string_agg(word, ' ' ORDER BY j, i) AS text
FROM words GROUP BY media_id ORDER BY media_id"""


def utm_coords_sql() -> str:
    """Mirror of the utm_coords gate: the full Transverse-Mercator
    forward series (UtmConverter.mapLatLonToXY + toUtm) over the
    closed-form synthetic coordinates, with the precomputed WGS84
    series constants inlined as exact literals; easting/northing
    rounded to 4 decimals on both engines (trig libm differences sit
    around 1e-9 m)."""
    from kgp import utm as U
    n = (U.SM_A - U.SM_B) / (U.SM_A + U.SM_B)
    alpha = ((U.SM_A + U.SM_B) / 2.0) * (1.0 + n ** 2 / 4.0
                                         + n ** 4 / 64.0)
    beta = -3.0 * n / 2.0 + 9.0 * n ** 3 / 16.0 - 3.0 * n ** 5 / 32.0
    gamma = 15.0 * n ** 2 / 16.0 - 15.0 * n ** 4 / 32.0
    delta = -35.0 * n ** 3 / 48.0 + 105.0 * n ** 5 / 256.0
    epsilon = 315.0 * n ** 4 / 512.0
    ep2 = (U.SM_A ** 2 - U.SM_B ** 2) / U.SM_B ** 2
    na2 = U.SM_A ** 2
    return f"""
WITH base AS (
  SELECT doc_id,
         ((doc_id * 37) % 16400) / 100.0 - 80.0 AS lat,
         ((doc_id * 73) % 36000) / 100.0 - 180.0 AS lon
  FROM documents),
z AS (
  SELECT *, CASE
    WHEN lat >= 72.0 AND lat < 84.0 THEN CASE
      WHEN lon >= 0.0 AND lon < 9.0 THEN 31
      WHEN lon >= 9.0 AND lon < 21.0 THEN 33
      WHEN lon >= 21.0 AND lon < 33.0 THEN 35
      WHEN lon >= 33.0 AND lon < 42.0 THEN 37
      WHEN lat >= 56.0 AND lat < 64.0 AND lon >= 3.0 AND lon < 12.0
        THEN 32
      ELSE CAST(floor((lon + 180.0) / 6) AS INT) + 1 END
    WHEN lat >= 56.0 AND lat < 64.0 AND lon >= 3.0 AND lon < 12.0
      THEN 32
    ELSE CAST(floor((lon + 180.0) / 6) AS INT) + 1 END AS zone
  FROM base),
p AS (
  SELECT *, radians(lat) AS phi, radians(lon) AS lam,
         radians(-183.0 + zone * 6.0) AS lambda0
  FROM z),
q AS (
  SELECT *, cos(phi) AS cp, tan(phi) AS t,
         {ep2!r} * cos(phi) * cos(phi) AS nu2
  FROM p),
r AS (
  SELECT *, {na2!r} / ({U.SM_B!r} * sqrt(nu2 + 1)) AS big_n,
         t * t AS t2, lam - lambda0 AS ln
  FROM q),
s AS (
  SELECT *,
    {alpha!r} * (phi + {beta!r} * sin(2 * phi)
                 + {gamma!r} * sin(4 * phi)
                 + {delta!r} * sin(6 * phi)
                 + {epsilon!r} * sin(8 * phi)) AS arc,
    1.0 - t2 + nu2 AS l3,
    5.0 - t2 + 9 * nu2 + 4.0 * nu2 * nu2 AS l4,
    5.0 - 18.0 * t2 + t2 * t2 + 14.0 * nu2 - 58.0 * t2 * nu2 AS l5,
    61.0 - 58.0 * t2 + t2 * t2 + 270.0 * nu2 - 330.0 * t2 * nu2 AS l6,
    61.0 - 479.0 * t2 + 179.0 * t2 * t2 - t2 * t2 * t2 AS l7,
    1385.0 - 3111.0 * t2 + 543.0 * t2 * t2 - t2 * t2 * t2 AS l8
  FROM r),
xy AS (
  SELECT doc_id, lat, lon, zone,
    (big_n * cp * ln
     + big_n / 6.0 * pow(cp, 3.0) * l3 * pow(ln, 3.0)
     + big_n / 120.0 * pow(cp, 5.0) * l5 * pow(ln, 5.0)
     + big_n / 5040.0 * pow(cp, 7.0) * l7 * pow(ln, 7.0))
      * {U.UTM_SCALE!r} + 500000.0 AS easting,
    (arc + t / 2.0 * big_n * cp * cp * ln * ln
     + t / 24.0 * big_n * pow(cp, 4.0) * l4 * pow(ln, 4.0)
     + t / 720.0 * big_n * pow(cp, 6.0) * l6 * pow(ln, 6.0)
     + t / 40320.0 * big_n * pow(cp, 8.0) * l8 * pow(ln, 8.0))
      * {U.UTM_SCALE!r} AS northing_raw
  FROM s)
SELECT doc_id, round(lat, 6) AS lat, round(lon, 6) AS lon, zone,
  substring('{U.UTM_BAND_CHARS}',
            CAST(trunc(lat + 80) AS INT) // 8 + 1, 1) AS band,
  round(easting, 4) AS easting,
  round(CASE WHEN northing_raw < 0.0 THEN northing_raw + 10000000.0
        ELSE northing_raw END, 4) AS northing
FROM xy ORDER BY doc_id"""


def time_intervals_sql() -> str:
    """Mirror of the time_intervals gate: interval phrases synthesized
    from event_id closed forms; expected seconds derived SYMBOLICALLY
    (RE2 has no lookahead, so the oracle never runs the parser's
    regexes). Variant 3 with minutes=0 pins the reference's
    parsed-but-zero -> 0 (not null) quirk; variant 2 with an all-zero
    compact total pins the > 0 -> null rule."""
    return """
WITH e AS (
  SELECT event_id, event_id % 4 AS d, event_id % 24 AS h,
         event_id % 60 AS m, event_id % 5 AS v
  FROM events),
t AS (
  SELECT event_id,
    CASE v
      WHEN 0 THEN d || ' days ' || h || ' hours ' || m || ' minutes'
      WHEN 1 THEN 'the movie lasted ' || h || ' hours and ' || m
                  || ' minutes'
      WHEN 2 THEN h || 'h' || m || 'm'
      WHEN 3 THEN m || ' min read'
      ELSE 'no interval mentioned here'
    END AS text,
    CASE v
      WHEN 0 THEN 86400 * d + 3600 * h + 60 * m
      WHEN 1 THEN 3600 * h + 60 * m
      WHEN 2 THEN CASE WHEN 3600 * h + 60 * m > 0
                       THEN 3600 * h + 60 * m END
      WHEN 3 THEN 60 * m
    END AS seconds
  FROM e)
SELECT event_id, text, CAST(seconds AS BIGINT) AS seconds
FROM t ORDER BY event_id"""


def multilabel_eval_sql() -> str:
    """Mirror of the multilabel_eval gate: example-based multi-label
    counts/precision/recall derived symbolically from the closed-form
    label membership rules (label l_k true iff (event_id + k) %
    (k + 2) == 0; assigned iff (event_id * 3 + k) % (k + 2) == 0)."""
    t = [f"CASE WHEN (event_id + {k}) % {k + 2} = 0 THEN 1 ELSE 0 END"
         for k in range(6)]
    a = [f"CASE WHEN (event_id * 3 + {k}) % {k + 2} = 0 "
         f"THEN 1 ELSE 0 END" for k in range(6)]
    both = [f"CASE WHEN (event_id + {k}) % {k + 2} = 0 AND "
            f"(event_id * 3 + {k}) % {k + 2} = 0 THEN 1 ELSE 0 END"
            for k in range(6)]
    return f"""
WITH c AS (
  SELECT event_id,
         {' + '.join(t)} AS n_true,
         {' + '.join(a)} AS n_assigned,
         {' + '.join(both)} AS n_common
  FROM events)
SELECT event_id, CAST(n_true AS INT) AS n_true,
       CAST(n_assigned AS INT) AS n_assigned,
       CAST(n_common AS INT) AS n_common,
       CASE WHEN n_assigned <> 0
            THEN CAST(n_common AS DOUBLE) / n_assigned
            ELSE 1.0 END AS precision,
       CASE WHEN n_true <> 0
            THEN CAST(n_common AS DOUBLE) / n_true
            ELSE 1.0 END AS recall
FROM c ORDER BY event_id"""


def ensemble_votes_sql(threshold: float = 0.5) -> str:
    """Mirror of the ensemble_votes gate: majority vote aggregation
    recomputed from the closed-form per-classifier probabilities
    (item = event_id // 3, classifier = event_id % 3, prob(l_k) =
    ((event_id * 7 + k * 13) %% 100) / 100)."""
    return f"""
WITH votes AS (
  SELECT event_id // 3 AS item_id, event_id % 3 AS classifier_id,
         'l' || k AS label,
         ((event_id * 7 + k * 13) % 100) / 100.0 AS prob
  FROM events, range(0, 4) t(k)),
n AS (SELECT item_id, COUNT(DISTINCT classifier_id) AS n
      FROM votes GROUP BY item_id),
v AS (SELECT item_id, label, COUNT(*) AS v
      FROM votes WHERE prob > {threshold}
      GROUP BY item_id, label)
SELECT v.item_id, v.label,
       CAST(v.v AS DOUBLE) / n.n AS score
FROM v JOIN n ON v.item_id = n.item_id
ORDER BY v.item_id, v.label"""


def reliability_bins_sql(num_bins: int = 10) -> str:
    """Mirror of the reliability_bins gate: bins over closed-form
    predictions p = ((event_id * 13) % 101) / 100, positives
    event_id % 3 = 0; Math.round == floor(x + 0.5) on both engines;
    the reference's dropped top bin reproduced."""
    return f"""
WITH r AS (
  SELECT ((event_id * 13) % 101) / 100.0 AS p,
         CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS pos
  FROM events),
b AS (
  SELECT CAST(floor({num_bins} * p + 0.5) AS INT) AS bin, p, pos
  FROM r)
SELECT bin, round(avg(p), 9) AS mean_prediction,
       COUNT(*) AS num_items, CAST(SUM(pos) AS BIGINT) AS num_positive,
       CAST(SUM(pos) AS DOUBLE) / COUNT(*) AS positive_fraction
FROM b WHERE bin < {num_bins}
GROUP BY bin ORDER BY bin"""


def dup_spans_sql(span_len: int = 40, stride: int = 10) -> str:
    """Mirror of the dup_spans gate: shingle hashes recomputed with
    the identical md5 prefix over the identical substring positions."""
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(
           (length(text) - {span_len}) // {stride} + 1, 0))) AS i
  FROM documents WHERE length(text) >= {span_len}),
sh AS (
  SELECT doc_id, CAST(i * {stride} AS BIGINT) AS p,
         substr(md5(substring(text, CAST(i * {stride} + 1 AS INT),
                              {span_len})), 1, 16) AS span_hash
  FROM pos)
SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences
FROM sh GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY span_hash"""


def er_candidates_sql(threshold: int = 2,
                      max_block_size: int = 1000) -> str:
    """Mirror of the er_candidates gate: token blocking over part
    names (lowercased whitespace tokens, distinct per entity, blocks
    above the cap purged), CBS weights, weight-threshold pruning."""
    return f"""
WITH toks AS (
  SELECT DISTINCT p_partkey AS entity_id,
         unnest(string_split(lower(p_name), ' ')) AS block
  FROM part),
t AS (SELECT * FROM toks WHERE block <> ''),
keep AS (
  SELECT block FROM t GROUP BY block
  HAVING COUNT(*) <= {max_block_size}),
b AS (SELECT t.* FROM t JOIN keep USING (block)),
pairs AS (
  SELECT x.entity_id AS a, y.entity_id AS b, COUNT(*) AS weight
  FROM b x JOIN b y
    ON x.block = y.block AND x.entity_id < y.entity_id
  GROUP BY x.entity_id, y.entity_id)
SELECT a, b, CAST(weight AS BIGINT) AS weight
FROM pairs WHERE weight >= {threshold} ORDER BY a, b"""


def wiktionary_words_sql() -> str:
    """Mirror of the wiktionary_words gate: the dump pages are
    synthesized closed-form, so every extracted field is derived
    SYMBOLICALLY — the oracle never parses wikitext. Substantiv pages
    (doc_id %% 2 = 0) carry the Silbentrennung plural; %% 7 = 0 pages
    omit the Sprache template (language '')."""
    return """
SELECT 'Wort' || doc_id AS word,
       CASE WHEN doc_id % 2 = 0
            THEN 'Wort' || doc_id || 'en' ELSE '' END AS plural,
       CASE WHEN doc_id % 2 = 0 THEN 'Substantiv'
            ELSE 'Verb' END AS word_type,
       CASE WHEN doc_id % 7 = 0 THEN '' ELSE 'Deutsch' END
         AS language,
       'Alt' || doc_id || '|' || 'Syn' || doc_id AS synonyms,
       CASE WHEN doc_id % 3 = 0 THEN 'Ober' || doc_id
            ELSE '' END AS hypernyms,
       CASE WHEN doc_id % 5 = 0
            THEN 'U' || doc_id || 'a' || '|' || 'U' || doc_id || 'b'
            ELSE '' END AS hyponyms
FROM documents ORDER BY word"""


def wiki_locations_sql() -> str:
    """Mirror of the wiki_locations gate: pages synthesized
    closed-form (namespace 2 on %%13, 'Geography of' blacklist on
    %%17 — both dropped; ' (Region)' title suffix on %%11 cleaned
    away); type CITY/LANDMARK by infobox parity, coordinates from the
    closed-form lat/lng, alternative name Alt<doc_id> from the bold
    first line."""
    return """
SELECT doc_id AS location_id,
       CASE WHEN doc_id % 11 = 0 THEN 'Ort' || doc_id || ' (Region)'
            ELSE 'Ort' || doc_id END AS title,
       'Ort' || doc_id AS name,
       CASE WHEN doc_id % 2 = 0 THEN 'CITY' ELSE 'LANDMARK' END
         AS type,
       (doc_id % 160 - 80) + 0.5 AS lat,
       (doc_id % 340 - 170) + 0.25 AS lng,
       CAST(NULL AS BIGINT) AS population,
       'Alt' || doc_id AS alt_names
FROM documents
WHERE doc_id % 13 <> 0 AND doc_id % 17 <> 0
ORDER BY location_id"""


def class_resample_sql() -> str:
    """Mirror of the class_resample gate: ZeroR class probabilities
    from one aggregation, keep rule sample_key(event_id)/10000 <=
    minP / P(class) (the md5 sample key recomputed identically)."""
    return """
WITH lbl AS (
  SELECT event_id, event_type AS category FROM events),
p AS (
  SELECT category, COUNT(*) * 1.0
         / (SELECT COUNT(*) FROM lbl) AS prob
  FROM lbl GROUP BY category),
minp AS (SELECT MIN(prob) AS mp FROM p),
keyed AS (
  SELECT l.event_id, l.category,
    CAST(('0x' || substr(md5(CAST(l.event_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 10000 AS sk,
    (SELECT mp FROM minp) / p.prob AS keep
  FROM lbl l JOIN p ON l.category = p.category)
SELECT event_id, category
FROM keyed WHERE sk / 10000.0 <= keep
ORDER BY event_id"""


def image_frequency_sql() -> str:
    """Mirror of the image_frequency gate: detectFrequencies'
    interior-pixel mean-|brightness-delta| over the DISTINCT sampled
    neighbors (the reference's 7-cell neighborhood with its missing
    corner), rebuilt from the closed-form gray values; per-pixel sums
    run in the SAME sorted order as the python twin, the cross-pixel
    mean rounds to 9, the median uses the FatStats rule."""
    def gray(dr: int, dc: int) -> str:
        base = f"(7*media_id + 5*(r{'%+d' % dr if dr else ''}) " \
               f"+ 3*(c{'%+d' % dc if dc else ''}))"
        return (f"CAST(trunc(0.3 * ({base} % 256)"
                f" + 0.59 * (({base} + 11) % 256)"
                f" + 0.11 * (({base} + 22) % 256)) AS BIGINT)")

    neigh = [gray(-1, -1), gray(-1, 0), gray(1, 0), gray(0, -1),
             gray(0, 1), gray(1, -1), gray(1, 1)]
    return f"""
WITH img AS (
  SELECT doc_id AS media_id, doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
  FROM documents WHERE doc_id % 3 = 0),
pr AS (SELECT media_id, w, h, unnest(range(1, h - 1)) AS r FROM img),
px AS (SELECT media_id, w, h, r, unnest(range(1, w - 1)) AS c
       FROM pr),
vals AS (
  SELECT media_id,
    {gray(0, 0)} AS v0,
    list_sort(list_distinct([{', '.join(neigh)}])) AS ns
  FROM px),
perpix AS (
  SELECT media_id,
    list_sum(list_transform(ns,
      x -> abs(x / 255.0 - v0 / 255.0))) / len(ns) AS v
  FROM vals),
agg AS (
  SELECT media_id, COUNT(*) AS n, round(AVG(v), 9) AS freq_mean,
         list_sort(list(v)) AS sv
  FROM perpix GROUP BY media_id)
SELECT media_id, CAST(n AS INT) AS freq_count, freq_mean,
  CASE WHEN n % 2 = 0
       THEN 0.5 * sv[CAST(n // 2 AS INT)]
            + 0.5 * sv[CAST(n // 2 AS INT) + 1]
       ELSE sv[CAST((n + 1) // 2 AS INT)]
  END AS freq_median
FROM agg ORDER BY media_id"""


# ----------------------------------------------- cooccurrence oracle


def phrase_probs_sql(n_tokens: int = 6) -> str:
    """DuckDB mirror of kgp.cooccurrence: fit the CooccurrenceMatrix
    (unigram + adjacent-bigram counts over the lowercase \\s-split of
    documents.text, Java split semantics — trailing empties dropped
    via the rtrim-regex) and score each document's first-`n_tokens`
    phrase with the reference's add-one-smoothed bigram LM
    (PhraseProbabilityCalculator.java:54-66): log10((c(t0)+1)/(N+V))
    + SUM log10((c(a,b)+1)/(c(a)+V)).  Same determinism recipe as the
    stage: 7-decimal terms scaled to integer 1e-7 units, summed as
    BIGINT (exact, order-independent), divided back once."""
    split_lo = (r"string_split_regex(regexp_replace(lower(text),"
                r" '\s+$', ''), '\s')")
    split_raw = (r"string_split_regex(regexp_replace(text,"
                 r" '\s+$', ''), '\s')")
    phr_split = (r"string_split_regex(regexp_replace(lower(phrase),"
                 r" '\s+$', ''), '\s')")
    return f"""
WITH arrs AS (
  SELECT doc_id, {split_lo} AS arr, {split_raw} AS arr_raw
  FROM documents),
toks AS (SELECT unnest(arr) AS tok FROM arrs),
uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT (SELECT COUNT(*) FROM toks) AS n_items,
               (SELECT COUNT(*) FROM uni) AS n_unique),
pos AS (SELECT doc_id, unnest(arr) AS tok,
               generate_subscripts(arr, 1) AS i
        FROM arrs),
big AS (SELECT p1.tok AS tok_a, p2.tok AS tok_b, COUNT(*) AS c
        FROM pos p1 JOIN pos p2
          ON p1.doc_id = p2.doc_id AND p2.i = p1.i + 1
        GROUP BY 1, 2),
phr AS (SELECT doc_id,
               array_to_string(arr_raw[1:{n_tokens}], ' ') AS phrase
        FROM arrs),
ptoks AS (SELECT doc_id, unnest({phr_split}) AS tok,
                 generate_subscripts({phr_split}, 1) AS i
          FROM phr),
first_terms AS (
  SELECT p.doc_id,
         round(log10((coalesce(u.c, 0) + 1.0)
                     / (t.n_items + t.n_unique)), 7) AS term
  FROM ptoks p CROSS JOIN tot t
  LEFT JOIN uni u ON u.tok = p.tok
  WHERE p.i = 1),
big_terms AS (
  SELECT a.doc_id,
         round(log10((coalesce(b.c, 0) + 1.0)
                     / (coalesce(ua.c, 0) + t.n_unique)), 7) AS term
  FROM ptoks a
  JOIN ptoks nx ON nx.doc_id = a.doc_id AND nx.i = a.i + 1
  CROSS JOIN tot t
  LEFT JOIN big b ON b.tok_a = a.tok AND b.tok_b = nx.tok
  LEFT JOIN uni ua ON ua.tok = a.tok),
terms AS (SELECT * FROM first_terms UNION ALL SELECT * FROM big_terms),
scored AS (SELECT doc_id,
                  SUM(CAST(round(term * 1e7) AS BIGINT)) / 10000000.0
                    AS log_prob
           FROM terms GROUP BY doc_id)
SELECT p.doc_id, p.phrase, s.log_prob
FROM phr p LEFT JOIN scored s ON s.doc_id = p.doc_id
ORDER BY p.doc_id"""


# ------------------------------------------------- segmenter oracle


def template_pairs_sql(window: int = 30, limit: int = 5,
                       need: float = 0.689) -> str:
    """DuckDB mirror of kgp.segmenter.template_pairs over synth_pages:
    the per-doc TAG TOKEN LIST is rebuilt symbolically from the page
    template (kgp.corpus._page_columns) — the listTags truncation +
    skip rules reduce every synth tag to its bare form, and document
    text never contains '<' (asserted at build time), so the list is
    closed-form in doc_id's slice conditions.  Fingerprints, the
    asymmetric variance mean, Jaccard, erg, the [need, 1.0) cut and
    the (erg DESC, sim_url) top-`limit` all recompute the stage's
    math with the same 9/6 rounding."""
    head = ("['<head>','<title>','</title>','<meta>','<style>',"
            "'</style>','<script>','</script>','</head>']")
    brk = "['<p>','</p>','<p>','</p>']"
    li = "['<li>','<a>','</a>','</li>']"
    para = ("CASE WHEN unclosed THEN ['<p>'] "
            "ELSE ['<p>','</p>'] END")
    body_open = ("['<body>','<header>','<nav>','<ul>'] || {li} || {li}"
                 " || ['</ul>','</nav>','</header>']").format(li=li)
    comments = "['<div>','<h3>','</h3>','<p>','</p>','<p>','</p>','</div>']"
    related = ("['<div>','<h3>','</h3>','<ul>'] || {li} || {li} || {li}"
               " || {li} || {li} || {li} || ['</ul>','</div>']"
               ).format(li=li)
    footer = "['<footer>','<p>','</p>','</footer>','</body>','</html>']"
    empty = "CAST([] AS VARCHAR[])"
    return f"""
WITH d AS (
  SELECT doc_id,
         doc_id % 17 = 13 AS adv,
         doc_id % 10 = 7 AS unclosed,
         (doc_id % 3 = 0 OR doc_id % 4 = 1 OR doc_id % 5 = 2
          OR doc_id % 7 = 4) AS has_p2,
         doc_id % 23 = 11 AS has_s7,
         doc_id % 6 = 3 AS has_s8,
         CASE WHEN doc_id % 10 < 4 THEN 'news.example.com'
              WHEN doc_id % 10 < 6 THEN 'blog.example.org'
              ELSE 'site' || CAST(doc_id % 14 AS VARCHAR)
                   || '.example.net' END AS host
  FROM documents),
pages AS (
  SELECT doc_id, host,
         'https://' || host || '/articles/'
           || CAST(doc_id AS VARCHAR) || '.html' AS url,
         CASE WHEN adv THEN
           {head} || ['<body>'] || {brk} || ['<span>','</span>']
             || {brk}
             || CASE WHEN has_p2 THEN {brk} ELSE {empty} END
             || {brk}
             || CASE WHEN has_s7 THEN {brk} ELSE {empty} END
             || CASE WHEN has_s8 THEN {brk} ELSE {empty} END
             || {brk} || ['</body>','</html>']
         ELSE
           {head} || {body_open}
             || ['<div>','<h1>','</h1>'] || {para}
             || CASE WHEN has_p2 THEN {para} ELSE {empty} END
             || {para}
             || CASE WHEN has_s7 THEN {para} ELSE {empty} END
             || CASE WHEN has_s8 THEN {para} ELSE {empty} END
             || {para} || ['</div>']
             || {comments} || {related} || {footer}
         END AS tags
  FROM d),
grams AS (
  SELECT url, host,
         array_to_string(tags[i:i+8], ' ') AS qgram
  FROM (SELECT url, host, tags,
               unnest(range(1, len(tags) - 7)) AS i
        FROM pages)),
fp AS (SELECT url, host, qgram, COUNT(*) AS c
       FROM grams GROUP BY url, host, qgram),
sizes AS (SELECT url, COUNT(*) AS n FROM fp GROUP BY url),
ordd AS (SELECT url, host,
                row_number() OVER (PARTITION BY host ORDER BY url)
                    AS o
         FROM pages),
cand AS (
  SELECT a.url AS url, b.url AS sim_url
  FROM ordd a JOIN ordd b
    ON a.host = b.host AND a.url <> b.url
   AND abs(a.o - b.o) <= {window}),
joined AS (
  SELECT c.url, c.sim_url, fa.qgram, fa.c AS ca, fb.c AS cb
  FROM cand c
  JOIN fp fa ON fa.url = c.url
  LEFT JOIN fp fb ON fb.url = c.sim_url AND fb.qgram = fa.qgram),
agg AS (
  SELECT url, sim_url, COUNT(*) AS n1,
         SUM(round(CASE WHEN cb IS NULL THEN 1.0
                        WHEN ca = cb THEN 0.0
                        ELSE 1.0 - least(ca, cb)
                             / CAST(greatest(ca, cb) AS DOUBLE)
                   END, 9)) AS dsum,
         SUM(CASE WHEN cb IS NOT NULL THEN 1 ELSE 0 END) AS inter
  FROM joined GROUP BY url, sim_url),
scored AS (
  SELECT a.url, a.sim_url,
         a.dsum / a.n1 AS vari,
         a.inter / CAST(a.n1 + s.n - a.inter AS DOUBLE) AS jacc,
         round((1.0 - a.dsum / a.n1
                + a.inter / CAST(a.n1 + s.n - a.inter AS DOUBLE))
               / 2.0, 6) AS erg
  FROM agg a JOIN sizes s ON s.url = a.sim_url)
SELECT url, sim_url, round(vari, 9) AS vari, round(jacc, 9) AS jacc,
       erg,
       CAST(row_number() OVER (PARTITION BY url
                               ORDER BY erg DESC, sim_url) AS INT)
           AS rank
FROM scored
WHERE erg >= {need} AND erg < 1.0
QUALIFY rank <= {limit}
ORDER BY url, rank"""


# Segment ids for page_segments_sql — the synth template's xpath
# space under /html/body (closed-form: the DOM diff over synth pages
# can only ever touch these nodes).
_SEG_XPATHS = {
    0: ("/html/body", 2),
    1: ("/html/body/div[1]", 3),
    2: ("/html/body/div[1]/h1[1]", 4),
    11: ("/html/body/div[1]/p[1]", 4),
    12: ("/html/body/div[1]/p[2]", 4),
    13: ("/html/body/div[1]/p[3]", 4),
    14: ("/html/body/div[1]/p[4]", 4),
    15: ("/html/body/div[1]/p[5]", 4),
    16: ("/html/body/div[1]/p[6]", 4),
    20: ("/html/body/div[2]", 3),
    21: ("/html/body/div[2]/p[1]", 4),
    22: ("/html/body/div[2]/h3[1]", 4),
    23: ("/html/body/div[2]/p[2]", 4),
    30: ("/html/body/div[3]", 3),
    31: ("/html/body/div[3]/ul", 4),
    32: ("/html/body/div[3]/ul/li[1]", 5),
    33: ("/html/body/div[3]/ul/li[1]/a", 6),
    34: ("/html/body/div[3]/ul/li[2]", 5),
    35: ("/html/body/div[3]/ul/li[2]/a", 6),
    36: ("/html/body/div[3]/h3[1]", 4),
    40: ("/html/body/header[1]", 3),
    41: ("/html/body/footer", 3),
    50: ("/html/body/div[3]/ul/li[3]", 5),
    51: ("/html/body/div[3]/ul/li[4]", 5),
    52: ("/html/body/div[3]/ul/li[5]", 5),
    53: ("/html/body/div[3]/ul/li[6]", 5),
}


def page_segments_sql(limit: int = 5) -> str:
    """FULL closed-form mirror of kgp.segmenter.page_segments_stage
    over synth_pages (PageSegmenter.startPageSegmentation:789-868).

    The whole pipeline collapses to integer arithmetic because the
    synth template pins every DOM-diff outcome (validated empirically
    against the stage at both SFs):

    * similar pages come from template_pairs (reused verbatim as a
      CTE); adv (%17==13) pages only ever pair with adv pages and
      regular with regular (erg < 0.689 across the two shapes —
      asserted by the zero mixed-pair count at both SFs).
    * REGULAR pair (A, B): story children are h1 + the p-ladder
      (p1, [p2], p3, [s7], [s8], p4; n = 4+p2+s7+s8 children).  h1
      carries doc_id and p1/p3 are doc-unique (p1's slot moduli
      17*13*11 = 2431 exceed any doc_id in the corpus; p3 is the
      unique document text), but p2/s7/s8 CAN coincide between
      candidate pairs — the ±30 window is in URL-STRING ordinal
      space, so numerically distant ids are neighbors — whenever
      their composition flags and slot residues agree; each
      paragraph therefore gets a canonical TEXT KEY (composition
      markers + slot residues) and two aligned children are equal
      iff both are p4, or both are p2/s7/s8 at the same position
      with equal keys.  Everything else: the comments div conflicts
      iff doc%7 differs ('great read {doc%7}'); the related div
      always conflicts via the next-article anchor, li[2] iff the
      stride-7 block (doc//7 -> dst2) differs; header/footer/h3s/
      li[3..6] are non-conflicts.
    * ADV pair: every text child resolves to xpath /html/body (the
      '' construct-xpath segment for #text), so new_c == [/html/body]
      and the 50%% growth rule (Java int division — 0 < len*50/100
      is false at len 1) REJECTS every sim after the first.
    * The merge fold (per-rank accept + set union), the
      contains-scrub (identity hits plus div[2] inside div[2]/p[1])
      and the line-bag Jaccard ratings all become closed-form: line
      sets per node are known, inter/union counts depend only on
      (n, doc%7, doc//7) of the two roots — e.g. jacc(div[1]) =
      1/(n_a+n_b-1) (only the constant p4 line is shared), jacc(ul) =
      5/7 or 4/8, jacc(div[3]) = 6/8 or 5/9 — and the average-of-
      averages runs over the kept-rank-ordered roots + self exactly
      like SimilarityCalculator.calculateSimilarityForNode."""
    tp = template_pairs_sql()
    xpath_case = " ".join(
        f"WHEN {i} THEN '{xp}'" for i, (xp, _) in
        sorted(_SEG_XPATHS.items()))
    depth_case = " ".join(
        f"WHEN {i} THEN {d}" for i, (_, d) in sorted(_SEG_XPATHS.items()))
    # "texts at p-position {i} of docs {a} and {b} are equal": both
    # p4 (the constant closing paragraph), or both p2/s7/s8 at the
    # same position with equal canonical keys.  p1/p3/h1 are
    # doc-unique and never equal.
    def eq(i: str, a: str, b: str) -> str:
        return (f"(({i} = {a}.n - 1 AND {i} = {b}.n - 1)"
                f" OR ({i} = 2 AND {a}.p2 = 1 AND {b}.p2 = 1"
                f"     AND {a}.p2k = {b}.p2k)"
                f" OR ({a}.s7 = 1 AND {b}.s7 = 1"
                f"     AND {i} = 3 + {a}.p2 AND {i} = 3 + {b}.p2"
                f"     AND {a}.s7k = {b}.s7k)"
                f" OR ({a}.s8 = 1 AND {b}.s8 = 1"
                f"     AND {i} = 3 + {a}.p2 + {a}.s7"
                f"     AND {i} = 3 + {b}.p2 + {b}.s7"
                f"     AND {a}.s8k = {b}.s8k))")

    # shared-line count between the two docs' story/body line sets:
    # p4 always, plus p2/s7/s8 when both present with equal keys
    def inter(a: str, b: str) -> str:
        return (f"(1 + CASE WHEN {a}.p2 = 1 AND {b}.p2 = 1"
                f"              AND {a}.p2k = {b}.p2k"
                f"         THEN 1 ELSE 0 END"
                f"   + CASE WHEN {a}.s7 = 1 AND {b}.s7 = 1"
                f"              AND {a}.s7k = {b}.s7k"
                f"         THEN 1 ELSE 0 END"
                f"   + CASE WHEN {a}.s8 = 1 AND {b}.s8 = 1"
                f"              AND {a}.s8k = {b}.s8k"
                f"         THEN 1 ELSE 0 END)")

    # per-pair jaccard between roots A=rr[i], B=rr[j] for segment
    # x.xid — inlined into the list lambdas (no subqueries there)
    A, B = "(r.rr[i])", "(r.rr[j])"
    jacc = f"""
        CASE
          WHEN x.xid IN (2, 32, 33) THEN 0.0
          WHEN x.xid IN (0, 1) THEN
            {inter(A, B)} / CAST({A}.n + {B}.n - {inter(A, B)}
                                 AS DOUBLE)
          WHEN x.xid BETWEEN 11 AND 16 THEN
            CASE WHEN {eq('(x.xid - 10)', A, B)}
                 THEN 1.0 ELSE 0.0 END
          WHEN x.xid = 20 THEN
            CASE WHEN {A}.m7 = {B}.m7 THEN 1.0 ELSE 0.5 END
          WHEN x.xid = 21 THEN
            CASE WHEN {A}.m7 = {B}.m7 THEN 1.0 ELSE 0.0 END
          WHEN x.xid = 30 THEN
            CASE WHEN {A}.st = {B}.st THEN 0.75 ELSE 5.0 / 9.0 END
          WHEN x.xid = 31 THEN
            CASE WHEN {A}.st = {B}.st THEN 5.0 / 7.0 ELSE 0.5 END
          WHEN x.xid IN (34, 35) THEN
            CASE WHEN {A}.st = {B}.st THEN 1.0 ELSE 0.0 END
        END"""
    # unrolled 5-step merge fold: accept sim j iff
    # len(new_c) - len(S) < len(S)*50//100 (Java int division)
    fold_steps = []
    for j in range(2, limit + 1):
        fold_steps.append(f"""
f{j} AS (
  SELECT url, cs, ns,
    CASE WHEN len(cs) >= {j}
              AND len(cs[{j}]) - len(s) < (len(s) * 50) // 100
         THEN list_distinct(s || cs[{j}]) ELSE s END AS s,
    CASE WHEN len(cs) >= {j}
              AND len(cs[{j}]) - len(s) < (len(s) * 50) // 100
         THEN kept || [{j}] ELSE kept END AS kept
  FROM f{j - 1}),""")
    fold = "".join(fold_steps)
    return f"""
WITH tp AS MATERIALIZED (SELECT url, sim_url, rank FROM ({tp})),
dd AS MATERIALIZED (
  SELECT doc_id,
         doc_id % 17 = 13 AS adv,
         4 + p2 + s7 + s8 AS n, p2, s7, s8, p2k, s7k, s8k,
         doc_id % 7 AS m7,
         doc_id // 7 AS st,
         'https://'
           || CASE WHEN doc_id % 10 < 4 THEN 'news.example.com'
                   WHEN doc_id % 10 < 6 THEN 'blog.example.org'
                   ELSE 'site' || CAST(doc_id % 14 AS VARCHAR)
                        || '.example.net' END
           || '/articles/' || CAST(doc_id AS VARCHAR) || '.html' AS url
  FROM (
    SELECT doc_id,
      CASE WHEN doc_id % 3 = 0 OR doc_id % 4 = 1
                OR doc_id % 5 = 2 OR doc_id % 7 = 4
           THEN 1 ELSE 0 END AS p2,
      CASE WHEN doc_id % 23 = 11 THEN 1 ELSE 0 END AS s7,
      CASE WHEN doc_id % 6 = 3 THEN 1 ELSE 0 END AS s8,
      -- canonical p2 TEXT key: marker letter per present sentence +
      -- its slot residues (s4: city %11, country %7; s5: per2
      -- (id+5)%17, org %13; s6: org %13, per %17; s9: org2
      -- (id+4)%13, city3 (id+5)%11)
      CASE WHEN doc_id % 3 = 0 THEN
        'a' || CAST(doc_id % 11 AS VARCHAR) || '.'
            || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
      || CASE WHEN doc_id % 4 = 1 THEN
        'b' || CAST((doc_id + 5) % 17 AS VARCHAR) || '.'
            || CAST(doc_id % 13 AS VARCHAR) ELSE '' END
      || CASE WHEN doc_id % 5 = 2 THEN
        'c' || CAST(doc_id % 13 AS VARCHAR) || '.'
            || CAST(doc_id % 17 AS VARCHAR) ELSE '' END
      || CASE WHEN doc_id % 7 = 4 THEN
        'd' || CAST((doc_id + 4) % 13 AS VARCHAR) || '.'
            || CAST((doc_id + 5) % 11 AS VARCHAR) ELSE '' END AS p2k,
      (doc_id + 3) % 11 AS s7k,    -- S7's only slot: city2
      doc_id % 11 AS s8k           -- S8's only slot: city
    FROM documents)),
pairsets AS (
  SELECT t.url, t.rank,
    CASE WHEN a.adv THEN [0]
    ELSE
      [1, 2]
      || list_filter(list_transform(range(1, a.n), i -> 10 + i),
                     i -> NOT {eq('(i - 10)', 'a', 'b')})
      || CASE WHEN a.m7 = b.m7 THEN [] ELSE [20, 21] END
      || [30, 31, 32, 33]
      || CASE WHEN a.st = b.st THEN [] ELSE [34, 35] END
    END AS cset,
    CASE WHEN a.adv THEN CAST([] AS BIGINT[])
    ELSE
      list_filter(list_transform(range(1, a.n), i -> 10 + i),
                  i -> {eq('(i - 10)', 'a', 'b')})
      || CASE WHEN a.m7 = b.m7 THEN [20] ELSE [22, 23] END
      || [36, 50, 51, 52, 53, 40, 41]
    END AS ncset
  FROM tp t
  JOIN dd a ON a.url = t.url
  JOIN dd b ON b.url = t.sim_url),
fold_src AS (
  SELECT url, list(cset ORDER BY rank) AS cs,
         list(ncset ORDER BY rank) AS ns
  FROM pairsets GROUP BY url),
f1 AS (SELECT url, cs, ns, cs[1] AS s, [1] AS kept FROM fold_src),{fold}
final AS (
  SELECT url, s AS conf,
    list_filter(list_distinct(flatten(
        list_transform(kept, k -> ns[k]))),
      x -> NOT list_contains(s, x)
           AND NOT (x = 20 AND list_contains(s, 21))) AS nc,
    kept
  FROM f{limit}),
roots AS (
  SELECT f.url,
         list(struct_pack(n := b.n, m7 := b.m7, st := b.st,
                          p2 := b.p2, s7 := b.s7, s8 := b.s8,
                          p2k := b.p2k, s7k := b.s7k, s8k := b.s8k)
              ORDER BY t.rank)
         || [struct_pack(n := sd.n, m7 := sd.m7, st := sd.st,
                         p2 := sd.p2, s7 := sd.s7, s8 := sd.s8,
                         p2k := sd.p2k, s7k := sd.s7k,
                         s8k := sd.s8k)] AS rr
  FROM final f
  JOIN tp t ON t.url = f.url AND list_contains(f.kept, t.rank)
  JOIN dd b ON b.url = t.sim_url
  JOIN dd sd ON sd.url = f.url
  GROUP BY f.url, sd.n, sd.m7, sd.st, sd.p2, sd.s7, sd.s8,
           sd.p2k, sd.s7k, sd.s8k),
conf_rows AS (
  SELECT url, unnest(conf) AS xid FROM final),
nc_rows AS (
  SELECT url, unnest(nc) AS xid FROM final),
rated AS (
  SELECT x.url, x.xid,
    1.0 - list_sum(list_transform(range(1, len(r.rr) + 1), i ->
            list_sum(list_transform(range(1, len(r.rr) + 1), j ->
              CASE WHEN i = j THEN 0.0 ELSE {jacc} END))
            / (len(r.rr) - 1)))
          / len(r.rr) AS var
  FROM conf_rows x JOIN roots r ON r.url = x.url),
allsegs AS (
  SELECT url, xid, var FROM rated
  UNION ALL
  SELECT url, xid, 0.0 AS var FROM nc_rows)
SELECT url,
  CASE xid {xpath_case} END AS xpath,
  CAST(CASE xid {depth_case} END AS INT) AS depth,
  round(var, 6) AS variability,
  CASE WHEN var > 0.86 THEN 'RED'
       WHEN var > 0.72 THEN 'LIGHTRED'
       WHEN var > 0.58 THEN 'REDYELLOW'
       WHEN var > 0.42 THEN 'YELLOW'
       WHEN var > 0.28 THEN 'GREENYELLOW'
       WHEN var > 0.14 THEN 'LIGHTGREEN'
       ELSE 'GREEN' END AS color
FROM allsegs
ORDER BY url, xpath"""


def reservoir_sample_sql(k: int = 97) -> str:
    """DuckDB mirror of kgp.curation.reservoir_sample: rank rows by
    the md5-derived sample key (first 8 hex chars as int mod 10000,
    ties by doc_id) and keep the first k — the deterministic
    substitute for ReservoirSampler's java.util.Random."""
    key = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
           " AS BIGINT) % 10000")
    return f"""
SELECT doc_id, source FROM documents
ORDER BY {key}, doc_id
LIMIT {k}"""


# fixed weighted vocabulary for the bpe_encode gate: the merge TABLE
# is a deterministic pure function of these counts (learn_bpe_from_
# counts — the fit itself is the non-SQL-expressible half, pinned in
# tests/test_bpe.py), so gate and oracle share the identical ranked
# merges and the SQL verifies the greedy ENCODER end-to-end
BPE_GATE_COUNTS = [
    ("the", 50), ("and", 40), ("nation", 30), ("sing", 25),
    ("herder", 20), ("wanted", 15), ("of", 12), ("tion", 10),
    ("inning", 8), ("thesis", 6),
]
BPE_GATE_MERGES = 30


def bpe_encode_sql() -> str:
    """DuckDB mirror of kgp.bpe.bpe_encode under the fixed
    BPE_GATE_COUNTS merge table: per DISTINCT lowercase word, a
    recursive CTE replays encode_word's greedy apply rule — the
    LOWEST-rank adjacent pair merges first (first occurrence on rank
    ties, i.e. (rank, position) struct sort), chars + '</w>' initial
    state, terminal when no pair has a rank — then the per-doc word
    sequence reassembles (doc_id, n_tokens, token_str)."""
    from kgp.bpe import learn_bpe_from_counts
    merges = learn_bpe_from_counts(BPE_GATE_COUNTS, BPE_GATE_MERGES)

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    keys = ", ".join(f"{lit(a)} || chr(31) || {lit(b)}"
                     for a, b in merges)
    vals = ", ".join(str(i) for i in range(len(merges)))
    cands = ("list_filter(list_transform(range(1, len(sy)), i -> "
             "{'r': rk[sy[i] || chr(31) || sy[i + 1]][1], 'i': i}), "
             "x -> x.r IS NOT NULL)")
    return f"""
WITH RECURSIVE
rkm AS (SELECT MAP([{keys}], [{vals}]) AS rk),
docs_w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS words
  FROM documents),
docw AS (
  SELECT doc_id, unnest(words) AS word,
         generate_subscripts(words, 1) AS pos
  FROM docs_w),
vocab AS (SELECT DISTINCT word FROM docw),
enc AS (
  SELECT word,
         string_split_regex(word, '') || ['</w>'] AS sy
  FROM vocab
  UNION ALL
  SELECT word,
    sy[1:(list_sort({cands})[1].i) - 1]
      || [sy[list_sort({cands})[1].i]
          || sy[list_sort({cands})[1].i + 1]]
      || sy[(list_sort({cands})[1].i) + 2:len(sy)] AS sy
  FROM enc, rkm
  WHERE len({cands}) > 0),
final AS (
  SELECT word, sy FROM enc, rkm WHERE len({cands}) = 0),
perword AS (
  SELECT word, array_to_string(sy, ' ') AS toks, len(sy) AS n
  FROM final),
perdoc AS (
  SELECT d.doc_id,
         COALESCE(SUM(p.n), 0) AS n_tokens,
         COALESCE(string_agg(p.toks, ' ' ORDER BY d.pos), '')
           AS token_str
  FROM docw d JOIN perword p ON p.word = d.word
  GROUP BY d.doc_id)
SELECT a.doc_id, CAST(COALESCE(b.n_tokens, 0) AS INT) AS n_tokens,
       COALESCE(b.token_str, '') AS token_str
FROM documents a LEFT JOIN perdoc b ON b.doc_id = a.doc_id
ORDER BY a.doc_id"""


def gaussian_blur_sql(width: int = 2) -> str:
    """DuckDB mirror of kgp.imageops.gaussian_blur over the
    closed-form BMP pixels ((7*id + 5r + 3c + 11*ch) % 256): the
    float32 kernel is computed in Python and inlined as exact
    literals; each ConvolveOp pass replays the per-tap float32
    accumulation ORDER with CAST AS REAL after every multiply/add
    (double arithmetic over float32-exact operands rounds once =
    the IEEE float32 op), edge padding via clamped source indices,
    (int)(x+0.5) quantization via floor, and the EDGE_ZERO_FILL
    borders; pass 2 consumes pass 1's zeroed borders exactly like
    the numpy twin.  Ordered row/column LISTS give the neighbor
    taps without 5-way joins."""
    from kgp.imageops import gaussian_kernel
    kern = [f"CAST({float(v)!r} AS REAL)"
            for v in gaussian_kernel(width)]
    n_taps = 2 * width + 1

    def fold(px: list[str]) -> str:
        acc = f"CAST({kern[0]} * ({px[0]}) AS REAL)"
        for i in range(1, n_taps):
            acc = (f"CAST({acc} + CAST({kern[i]} * ({px[i]}) AS REAL)"
                   f" AS REAL)")
        return acc

    def quant(x: str) -> str:
        return (f"CAST(least(greatest(floor(CAST({x} + 0.5 AS REAL))"
                f", 0), 255) AS INT)")

    # pass-1 taps: row list indexed 1-based; output col ce (0-based
    # over the EXTENDED width) uses list positions ce+k-width+1
    def taps1(ch: str) -> list[str]:
        return [f"{ch}[ce + {k - width + 1}]" for k in range(n_taps)]

    def taps2(ch: str) -> list[str]:
        return [f"{ch}[re + {k - width + 1}]" for k in range(n_taps)]

    w2 = 2 * width
    return f"""
WITH img AS (
  SELECT doc_id AS media_id, doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
  FROM documents WHERE doc_id % 3 = 0),
grid AS (
  SELECT media_id, w, h, re, unnest(range(0, w + {w2})) AS ce
  FROM (SELECT media_id, w, h, unnest(range(0, h + {w2})) AS re
        FROM img)),
extv AS (
  SELECT media_id, w, h, re, ce,
    (7 * media_id + 5 * least(greatest(re - {width}, 0), h - 1)
       + 3 * least(greatest(ce - {width}, 0), w - 1)) % 256 AS red,
    (7 * media_id + 5 * least(greatest(re - {width}, 0), h - 1)
       + 3 * least(greatest(ce - {width}, 0), w - 1) + 11) % 256
      AS grn,
    (7 * media_id + 5 * least(greatest(re - {width}, 0), h - 1)
       + 3 * least(greatest(ce - {width}, 0), w - 1) + 22) % 256
      AS blu
  FROM grid),
rowlists AS (
  SELECT media_id, w, h, re,
         list(red ORDER BY ce) AS lr,
         list(grn ORDER BY ce) AS lg,
         list(blu ORDER BY ce) AS lb
  FROM extv GROUP BY media_id, w, h, re),
p1 AS (
  SELECT media_id, w, h, re, ce,
    CASE WHEN ce < {width} OR ce >= w + {width} THEN 0
         ELSE {quant(fold(taps1('lr')))} END AS red,
    CASE WHEN ce < {width} OR ce >= w + {width} THEN 0
         ELSE {quant(fold(taps1('lg')))} END AS grn,
    CASE WHEN ce < {width} OR ce >= w + {width} THEN 0
         ELSE {quant(fold(taps1('lb')))} END AS blu
  FROM rowlists, unnest(range(0, 30)) AS t(ce)
  WHERE ce < w + {w2}),
collists AS (
  SELECT media_id, w, h, ce,
         list(red ORDER BY re) AS lr,
         list(grn ORDER BY re) AS lg,
         list(blu ORDER BY re) AS lb
  FROM p1 GROUP BY media_id, w, h, ce),
p2 AS (
  SELECT media_id, w, h, re, ce,
    CASE WHEN re < {width} OR re >= h + {width} THEN 0
         ELSE {quant(fold(taps2('lr')))} END AS red,
    CASE WHEN re < {width} OR re >= h + {width} THEN 0
         ELSE {quant(fold(taps2('lg')))} END AS grn,
    CASE WHEN re < {width} OR re >= h + {width} THEN 0
         ELSE {quant(fold(taps2('lb')))} END AS blu
  FROM collists, unnest(range(0, 20)) AS t(re)
  WHERE re < h + {w2})
SELECT media_id, CAST(re - {width} AS INT) AS r,
       CAST(ce - {width} AS INT) AS c, red, grn, blu
FROM p2
WHERE re >= {width} AND re < h + {width}
  AND ce >= {width} AND ce < w + {width}
ORDER BY media_id, r, c"""


def bloom_membership_sql(num_elements: int = 250,
                         fp_prob: float = 0.01) -> str:
    """DuckDB mirror of kgp.bloom (BloomFilter.java:42-247): the
    bundled 32-bit murmur2 (m=0x5bd1e995, r=24, seed=i, little-endian
    4-byte blocks, tail switch with fall-through, Java int wrap)
    re-implemented EXACTLY in SQL — list_reduce folds the block chain
    in 64-bit integers (products stay under 2^63), the tail and
    avalanche are CASE chains, and the signed cast + Java-% shifted
    modulus give the bit positions.  Bit set = DISTINCT positions of
    the member values; probe = every seed's position present.  Values
    are ASCII by construction so ord(substr) IS the UTF-8 byte.
    Sizing replays the reference's formulas (incl. the INT division
    in numHashFunctions) in Python and inlines the literals."""
    import math as _m
    size = int(_m.ceil(num_elements * _m.log(1 / fp_prob)
                       / _m.log(2) ** 2))
    k = int(_m.ceil((size // num_elements) * _m.log(2)))
    M, W = 0x5BD1E995, 1 << 32
    murmur = f"""
f AS (SELECT doc_id, member, s, seed, n,
  list_reduce(
    [CAST(xor(seed, n) AS BIGINT)] ||
    list_transform(range(0, n // 4), i ->
      CAST(ord(substr(s, CAST(i*4+1 AS INT), 1))
      + ord(substr(s, CAST(i*4+2 AS INT), 1)) * 256
      + ord(substr(s, CAST(i*4+3 AS INT), 1)) * 65536
      + ord(substr(s, CAST(i*4+4 AS INT), 1)) * 16777216 AS BIGINT)),
    (h, k0) -> xor((h * {M}) % {W},
                   ((xor((k0 * {M}) % {W},
                         ((k0 * {M}) % {W}) >> 24) * {M}) % {W}))
  ) AS h FROM src),
t AS (SELECT *, CASE WHEN n % 4 = 3
      THEN xor(h, ord(substr(s, n - n % 4 + 3, 1)) * 65536)
      ELSE h END AS h3 FROM f),
t2 AS (SELECT *, CASE WHEN n % 4 >= 2
       THEN xor(h3, ord(substr(s, n - n % 4 + 2, 1)) * 256)
       ELSE h3 END AS h2 FROM t),
t3 AS (SELECT *, CASE WHEN n % 4 >= 1
       THEN (xor(h2, ord(substr(s, n - n % 4 + 1, 1))) * {M}) % {W}
       ELSE h2 END AS hh FROM t2),
hs AS (SELECT doc_id, member, seed,
  CASE WHEN hf >= 2147483648 THEN hf - 4294967296 ELSE hf END AS hv
  FROM (SELECT *, xor(xor(hh, hh >> 13) * {M} % {W},
                      (xor(hh, hh >> 13) * {M} % {W}) >> 15) AS hf
        FROM t3)),
pos AS (SELECT doc_id, member, seed,
        ((hv % {size}) + {size}) % {size} AS p FROM hs)"""
    return f"""
WITH src AS (
  SELECT doc_id, doc_id % 2 = 0 AS member,
         'doc-' || CAST(doc_id AS VARCHAR) || '-suffix' AS s,
         length('doc-' || CAST(doc_id AS VARCHAR) || '-suffix') AS n,
         unnest(range(0, {k})) AS seed
  FROM documents),{murmur},
bits AS (SELECT DISTINCT p FROM pos WHERE member)
SELECT q.doc_id,
       bool_and(b.p IS NOT NULL) AS maybe_seen
FROM pos q LEFT JOIN bits b ON b.p = q.p
GROUP BY q.doc_id ORDER BY q.doc_id"""


def nbsvm_r_sql() -> str:
    """DuckDB mirror of kgp.nbsvm.nbsvm_fit_ratios over word-count
    vectors of the documents table (label = doc_id parity):
    per-token class-weighted counts + ALPHA=1, normalized by the
    EXACT integer-valued totals (numpy's pairwise p.sum() equals any
    SQL sum order because every addend is an integer-valued double),
    r = ln((p/Σp)/(q/Σq)) cast to float32 exactly like the
    reference's float[] model."""
    toks = _decontam_tokens_sql("text")
    return f"""
WITH toks AS (
  SELECT doc_id, CAST(doc_id % 2 AS VARCHAR) AS cat,
         unnest({toks}) AS word
  FROM documents),
agg AS (
  SELECT word AS token,
    CAST(SUM(CASE WHEN cat = '1' THEN 1 ELSE 0 END) AS DOUBLE)
      + 1.0 AS p,
    CAST(SUM(CASE WHEN cat = '0' THEN 1 ELSE 0 END) AS DOUBLE)
      + 1.0 AS q
  FROM toks GROUP BY word),
tot AS (SELECT SUM(p) AS sp, SUM(q) AS sq FROM agg)
SELECT token,
       CAST(CAST(ln((p / tot.sp) / (q / tot.sq)) AS REAL) AS DOUBLE)
         AS r
FROM agg, tot ORDER BY token"""


# ---------------------------------------------------- spatial oracle


def geo_box_neighbors_sql(distance_km: float = 500.0,
                          q_mod: int = 97) -> str:
    """DuckDB mirror of kgp.spatial.closest_to_stage over the
    deterministic event-derived point cloud: getBoundingBox
    (lat +- d/111.2, lng +- d/|cos(lat)*111.2|), inclusive box,
    approximateDistance (equirectangular, R=6371) rounded to 9,
    rank by (dist, id).  DuckDB joins the box directly — the grid
    blocking is a Spark-side physical optimization with identical
    output."""
    return f"""
WITH pts AS (
  SELECT event_id AS id,
         ((event_id * 37) % 16000) / 100.0 - 80.0 AS lat,
         ((event_id * 73) % 36000) / 100.0 - 180.0 AS lng
  FROM events),
q AS (
  SELECT id AS qid, lat AS qlat, lng AS qlng,
         lat - {distance_km} / 111.2 AS lat1,
         lat + {distance_km} / 111.2 AS lat2,
         lng - {distance_km} / abs(cos(radians(lat)) * 111.2) AS lng1,
         lng + {distance_km} / abs(cos(radians(lat)) * 111.2) AS lng2
  FROM pts WHERE id % {q_mod} = 0),
hits AS (
  SELECT q.qid, p.id,
         (radians(q.qlng) - radians(p.lng))
           * cos((radians(p.lat) + radians(q.qlat)) / 2) AS x,
         radians(q.qlat) - radians(p.lat) AS y
  FROM q JOIN pts p
    ON p.lat BETWEEN q.lat1 AND q.lat2
   AND p.lng BETWEEN q.lng1 AND q.lng2)
SELECT qid, id, round(sqrt(x * x + y * y) * 6371.0, 9) AS dist_km,
       CAST(row_number() OVER (PARTITION BY qid
                               ORDER BY round(sqrt(x * x + y * y)
                                              * 6371.0, 9), id)
            AS INT) AS rank
FROM hits ORDER BY qid, rank"""


def _unit_multiplier_values() -> str:
    """Render the alphabetic single-word slice of the unit bank
    (kgp/units_data.py, itself the UnitNormalizer.java bank port) as a
    VALUES list of (name, unitLookup(name)) — static data, same policy
    as the dt_predictions forest render. Names whose lookup is 1.0 or
    -1 are omitted: for a single-word suffix both leave the number
    unchanged (UnitNormalizer.getNormalizedNumber:616-707 falls back
    to multiplier 1)."""
    from kgp.units import ALL_UNITS, unit_lookup
    rows, seen = [], set()
    for n in ALL_UNITS:
        if not n.isalpha() or n in seen:
            continue
        seen.add(n)
        v = unit_lookup(n)
        if v not in (-1.0, 1.0):
            rows.append(f"('{n}', {v!r})")
    return ", ".join(rows)


def wiktionary_pos_sql() -> str:
    """Semantic mirror of the wiktionary_pos gate
    (WiktionaryPosTagger.java:47-150): the token stream and the word
    dictionary are synthesized closed-form from documents exactly like
    the Spark side, then the TAGGING ITSELF is re-implemented in SQL —
    the hard-coded rule chain, isNumericExpression (char-class regex +
    the unit branch against the rendered bank; exact on the gate's
    alphabetic single-word suffixes), the exact-then-lowercase
    dictionary lookups, the posTagMapping CASE, and the final
    upper()."""
    return f"""
WITH dict AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 'word' || doc_id
              ELSE 'Word' || doc_id END AS word,
         CASE doc_id % 7 WHEN 0 THEN 'Noun' WHEN 1 THEN 'Verb'
              WHEN 2 THEN 'Adjective' WHEN 3 THEN 'Proper'
              WHEN 4 THEN 'Article' WHEN 5 THEN 'Preposition'
              ELSE 'Interjection' END AS word_type
  FROM documents),
units(u_name, u_mult) AS (VALUES {_unit_multiplier_values()}),
toks AS (
  SELECT doc_id, p.pos,
         CASE p.pos
           WHEN 0 THEN 'The'
           WHEN 1 THEN 'word' || doc_id
           WHEN 2 THEN 'Word' || doc_id
           WHEN 3 THEN CASE doc_id % 4 WHEN 0 THEN '5km'
                WHEN 1 THEN '1000' WHEN 2 THEN '3,5' ELSE '5xyz' END
           WHEN 4 THEN CASE doc_id % 4 WHEN 0 THEN '.'
                WHEN 1 THEN '$' WHEN 2 THEN 'I' ELSE 'a' END
           WHEN 5 THEN CASE doc_id % 8 WHEN 0 THEN 'was'
                WHEN 1 THEN 'is' WHEN 2 THEN 'been'
                WHEN 3 THEN 'being' WHEN 4 THEN 'am'
                WHEN 5 THEN 'are' WHEN 6 THEN 'were' ELSE 'be' END
           WHEN 6 THEN CASE doc_id % 4 WHEN 0 THEN 'and'
                WHEN 1 THEN 'or' WHEN 2 THEN 'either'
                ELSE 'some' END
           WHEN 7 THEN CASE doc_id % 8 WHEN 0 THEN 'me'
                WHEN 1 THEN 'him' WHEN 2 THEN 'he' WHEN 3 THEN 'she'
                WHEN 4 THEN 'we' WHEN 5 THEN 'they' WHEN 6 THEN 'you'
                ELSE 'them' END
           WHEN 8 THEN CASE doc_id % 13 WHEN 0 THEN 'can'
                WHEN 1 THEN 'should' WHEN 2 THEN 'will'
                WHEN 3 THEN 'have' WHEN 4 THEN 'had'
                WHEN 5 THEN 'having' WHEN 6 THEN 'do'
                WHEN 7 THEN 'did' WHEN 8 THEN 'does'
                WHEN 9 THEN 'this' WHEN 10 THEN 'that'
                WHEN 11 THEN 'these' ELSE 'those' END
           ELSE 'zz' || doc_id
         END AS token
  FROM documents
  CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9))
    p(pos)),
num AS (
  SELECT t.*, regexp_extract(token, '^[0-9]+') AS npfx,
         substr(token, length(regexp_extract(token, '^[0-9]+')) + 1)
           AS usfx
  FROM toks t),
feats AS (
  SELECT n.doc_id, n.pos, n.token,
         regexp_matches(n.token,
           '^[\\p{{Nd}}\\p{{Pd}}\\p{{Pc}}\\p{{Sc}}\\p{{Zs}}%.,:]+$')
           AS charclass,
         COALESCE(n.npfx <> '' AND n.usfx <> ''
           AND round(TRY_CAST(n.npfx AS DOUBLE)
                     * COALESCE(ue.u_mult, ul.u_mult, 1.0), 3)
               <> TRY_CAST(n.npfx AS DOUBLE), FALSE) AS unit_numeric,
         COALESCE(de.word_type, dl.word_type) AS wt
  FROM num n
  LEFT JOIN units ue ON ue.u_name = n.usfx
  LEFT JOIN units ul ON ul.u_name = lower(n.usfx)
  LEFT JOIN dict de ON de.word = n.token
  LEFT JOIN dict dl ON dl.word = lower(n.token))
SELECT doc_id, pos, token,
  upper(CASE
    WHEN length(token) = 1 AND token <> 'I' AND lower(token) <> 'a'
      THEN token
    WHEN lower(token) IN ('a', 'the') THEN 'AT'
    WHEN token = 'be' THEN 'BE' WHEN token = 'were' THEN 'BED'
    WHEN token = 'was' THEN 'BEDZ' WHEN token = 'being' THEN 'BEG'
    WHEN token = 'am' THEN 'BEM' WHEN token = 'been' THEN 'BEN'
    WHEN token = 'are' THEN 'BER' WHEN token = 'is' THEN 'BEZ'
    WHEN token IN ('and', 'or') THEN 'CC'
    WHEN charclass OR unit_numeric THEN 'CD'
    WHEN token = 'do' THEN 'DO' WHEN token = 'did' THEN 'DOD'
    WHEN token = 'does' THEN 'DOZ'
    WHEN token IN ('this', 'that') THEN 'DT'
    WHEN token IN ('some', 'any') THEN 'DTI'
    WHEN token IN ('these', 'those') THEN 'DTS'
    WHEN token = 'either' THEN 'DTX'
    WHEN token = 'have' THEN 'HV' WHEN token = 'had' THEN 'HVD'
    WHEN token = 'having' THEN 'HVG'
    WHEN token IN ('can', 'should', 'will') THEN 'MD'
    WHEN token IN ('me', 'him', 'them') THEN 'PPO'
    WHEN token IN ('he', 'she', 'it', 'one') THEN 'PPS'
    WHEN token IN ('I', 'we', 'they', 'you') THEN 'PPSS'
    ELSE COALESCE(CASE wt WHEN 'Article' THEN 'AT'
                          WHEN 'Noun' THEN 'NN'
                          WHEN 'Proper' THEN 'NNP'
                          WHEN 'Adjective' THEN 'JJ'
                          WHEN 'Verb' THEN 'VB'
                          WHEN 'Preposition' THEN 'IN'
                          ELSE wt END, '?')
  END) AS tag
FROM feats ORDER BY doc_id, pos"""


def single_feature_ranking_sql(laplace: float = 1e-5) -> str:
    """Semantic mirror of the single_feature_ranking gate
    (SingleFeatureClassification.java:39-147): features/label
    synthesized closed-form from events, then per-feature Naive Bayes
    (prior + Laplace likelihood, NaiveBayesModel.java:85-100), argmax
    by score with ascending-category tie-break, confusion counts and
    the F1('true')-with-NaN->0 mapper — all re-implemented in SQL."""
    return f"""
WITH feat AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END
           AS category,
         CAST((event_id % 2 + CASE WHEN event_id % 11 = 0
                                   THEN 1 ELSE 0 END) % 2 AS VARCHAR)
           AS f_strong,
         CAST((event_id % 2 + CASE WHEN event_id % 3 = 0
                                   THEN 1 ELSE 0 END) % 2 AS VARCHAR)
           AS f_weak,
         CAST(event_id % 7 AS VARCHAR) AS f_noise
  FROM events),
train AS (SELECT * FROM feat WHERE event_id % 5 <> 0),
val AS (SELECT * FROM feat WHERE event_id % 5 = 0),
long_train AS (
  SELECT category, 'f_strong' AS feature, f_strong AS value FROM train
  UNION ALL
  SELECT category, 'f_weak', f_weak FROM train
  UNION ALL
  SELECT category, 'f_noise', f_noise FROM train),
long_val AS (
  SELECT event_id, category AS actual, 'f_strong' AS feature,
         f_strong AS value FROM val
  UNION ALL
  SELECT event_id, category, 'f_weak', f_weak FROM val
  UNION ALL
  SELECT event_id, category, 'f_noise', f_noise FROM val),
cat AS (
  SELECT category, COUNT(*) AS cat_n FROM train GROUP BY category),
tot AS (SELECT COUNT(*) AS k, SUM(cat_n) AS total_n FROM cat),
nom AS (
  SELECT category, feature, value, COUNT(*) AS n
  FROM long_train GROUP BY category, feature, value),
scored AS (
  SELECT v.event_id, v.feature, v.actual, c.category,
         ln(CAST(c.cat_n AS DOUBLE) / t.total_n)
         + ln((COALESCE(nm.n, 0) + {laplace})
              / (c.cat_n + {laplace} * t.k)) AS score
  FROM long_val v
  CROSS JOIN cat c CROSS JOIN tot t
  LEFT JOIN nom nm ON nm.category = c.category
   AND nm.feature = v.feature AND nm.value = v.value),
pred AS (
  SELECT event_id, feature, actual, category AS predicted
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY event_id, feature
                             ORDER BY score DESC, category ASC) = 1),
agg AS (
  SELECT feature,
         SUM(CASE WHEN predicted = 'true' THEN 1 ELSE 0 END)
           AS n_classified,
         SUM(CASE WHEN actual = 'true' THEN 1 ELSE 0 END) AS n_real,
         SUM(CASE WHEN actual = 'true' AND predicted = 'true'
                  THEN 1 ELSE 0 END) AS n_correct
  FROM pred GROUP BY feature)
SELECT feature,
  round(COALESCE(
    CASE WHEN n_classified > 0
          AND (CAST(n_correct AS DOUBLE) / n_classified
               + CASE WHEN n_real > 0
                      THEN CAST(n_correct AS DOUBLE) / n_real
                      ELSE 1.0 END) > 0
         THEN 2 * (CAST(n_correct AS DOUBLE) / n_classified)
                * (CASE WHEN n_real > 0
                        THEN CAST(n_correct AS DOUBLE) / n_real
                        ELSE 1.0 END)
              / (CAST(n_correct AS DOUBLE) / n_classified
                 + CASE WHEN n_real > 0
                        THEN CAST(n_correct AS DOUBLE) / n_real
                        ELSE 1.0 END)
    END, 0.0), 6) AS score
FROM agg ORDER BY feature"""


def wiki_formatting_sql() -> str:
    """Oracle for the wiki_formatting gate: the input markups are the
    reference's OWN test corpus (MediaWikiFormattingParserTest.java:
    53-77, a fixed 12-template set) keyed by doc_id %% 12; the
    expected (html, counts) constants are rendered from the local
    twin, whose parity with the Java parser is pinned by the 13
    reference goldens in tests/test_wikiformat.py — same render
    policy as the dt_predictions forest."""
    from kgp.wikiformat import REFERENCE_MARKUPS, parse_stats

    def q(s: str) -> str:
        return s.replace("'", "''")

    html_case, nb_case, ni_case, nbi_case = [], [], [], []
    for i, markup in enumerate(REFERENCE_MARKUPS):
        html, nb, ni, nbi = parse_stats(markup)
        html_case.append(f"WHEN {i} THEN '{q(html)}'")
        nb_case.append(f"WHEN {i} THEN {nb}")
        ni_case.append(f"WHEN {i} THEN {ni}")
        nbi_case.append(f"WHEN {i} THEN {nbi}")
    return f"""
SELECT doc_id,
       CAST(doc_id % 12 AS INT) AS variant,
       CASE doc_id % 12 {' '.join(html_case)} END AS html,
       CAST(CASE doc_id % 12 {' '.join(nb_case)} END AS INT)
         AS n_bold,
       CAST(CASE doc_id % 12 {' '.join(ni_case)} END AS INT)
         AS n_italic,
       CAST(CASE doc_id % 12 {' '.join(nbi_case)} END AS INT)
         AS n_bold_italic
FROM documents ORDER BY doc_id"""


def postrate_intervals_sql() -> str:
    """Semantic mirror of the postrate_intervals gate
    (PostRateUpdateStrategy.java:50-168, first-check slice): the item
    timeline synthesis, the posts/chances minute-of-day histogram
    (full-day count + rotated remainder window), the rotated running
    probability sum, and the closed-form walk c = k0*1440 + min{j :
    pref[j] >= T - k0*S} for T = 1 (min) and T = n_items (max), with
    the 31-day / 186-day defaults and the getAllowedInterval clamp —
    re-implemented in SQL. Whole-day spans make every probability
    binary-exact, so the running sums hash identically across
    engines."""
    base0 = 26_666_666 * 60_000
    return f"""
WITH ev AS (
  SELECT event_id % 40 AS feed, event_id FROM events),
params AS (
  SELECT feed,
         (CASE feed % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)
           * 1440 - 1 AS span,
         {base0} + feed * 1440 * 60000 AS base
  FROM (SELECT DISTINCT feed FROM ev)),
items AS (
  SELECT e.feed,
         p.base + ((e.event_id * 131) % (p.span + 1)) * 60000 AS ts
  FROM ev e JOIN params p USING (feed)
  UNION ALL SELECT feed, base FROM params
  UNION ALL SELECT feed, base + span * 60000 FROM params),
stats AS (
  SELECT feed, MIN(ts) AS oldest, MAX(ts) AS newest,
         COUNT(*) AS n_items
  FROM items GROUP BY feed),
stats2 AS (
  SELECT *, (newest - oldest) // 60000 + 1 AS steps,
         (oldest // 60000) % 1440 AS start_minute
  FROM stats),
posts AS (
  SELECT feed, (ts // 60000) % 1440 AS minute, COUNT(*) AS posts
  FROM items GROUP BY feed, (ts // 60000) % 1440),
grid AS (
  SELECT s.feed, g.minute,
         s.steps // 1440
           + CASE WHEN (g.minute - s.start_minute + 1440) % 1440
                       < s.steps % 1440 THEN 1 ELSE 0 END AS chance,
         COALESCE(p.posts, 0) AS posts
  FROM stats2 s
  CROSS JOIN (SELECT unnest(generate_series(0, 1439)) AS minute) g
  LEFT JOIN posts p ON p.feed = s.feed AND p.minute = g.minute),
pref AS (
  SELECT feed,
         (minute - ({base0 + 30 * 60000} // 60000) % 1440 + 1440)
           % 1440 AS j,
         SUM(CASE WHEN chance > 0
                  THEN CAST(posts AS DOUBLE) / chance
                  ELSE 0.0 END)
           OVER (PARTITION BY feed ORDER BY
                 (minute - ({base0 + 30 * 60000} // 60000) % 1440
                  + 1440) % 1440
                 ROWS UNBOUNDED PRECEDING) AS pref
  FROM grid),
tot AS (SELECT feed, MAX(pref) AS s FROM pref GROUP BY feed),
targets AS (
  SELECT st.feed, st.n_items, t.s, tt.tag,
         CASE tt.tag WHEN 'min' THEN 1.0
              ELSE CAST(st.n_items AS DOUBLE) END AS t,
         CASE WHEN t.s > 0 THEN GREATEST(0, CAST(ceil(
              CASE tt.tag WHEN 'min' THEN 1.0
                   ELSE CAST(st.n_items AS DOUBLE) END / t.s)
              AS BIGINT) - 1) END AS k0
  FROM stats2 st JOIN tot t USING (feed)
  CROSS JOIN (VALUES ('min'), ('max')) tt(tag)),
hits AS (
  SELECT p.feed, g.tag, MIN(g.k0 * 1440 + p.j) AS c
  FROM pref p JOIN targets g USING (feed)
  WHERE g.k0 IS NOT NULL AND p.pref >= g.t - g.k0 * g.s
  GROUP BY p.feed, g.tag),
wide AS (
  SELECT s.feed, s.n_items, hmin.c AS c_min, hmax.c AS c_max
  FROM stats2 s
  LEFT JOIN hits hmin ON hmin.feed = s.feed AND hmin.tag = 'min'
  LEFT JOIN hits hmax ON hmax.feed = s.feed AND hmax.tag = 'max'),
final AS (
  SELECT feed AS feed_id, n_items,
         COALESCE(CASE WHEN c_min < 267840 THEN c_min
                       ELSE 44640 END, 44640) AS min_check,
         COALESCE(CASE WHEN c_max < 267840 THEN c_max
                       ELSE 267840 END, 267840) AS max_check
  FROM wide)
SELECT feed_id, n_items, min_check, max_check,
       GREATEST(min_check, 5) AS postrate_min,
       GREATEST(max_check, 5) AS postrate_max
FROM final ORDER BY feed_id"""


def ttl_intervals_sql() -> str:
    """Semantic mirror of the ttl_intervals gate: AdaptiveTTL
    (AdaptiveTTLUpdateStrategy.java:57-85 — (int)(weightM * (poll -
    newest) / 1 min), default 60 on non-positive gap) and LRU2
    (LRU2UpdateStrategy.java:46-77 — (int)((newest - lastButOne) /
    1 min), default on missing bound / non-positive gap, duplicate
    newest timestamps -> sorted predecessor shares the time -> gap 0
    -> default), plus the getAllowedInterval clamp [5, 10080]."""
    base = 26_000_000 * 60_000
    poll = base + 90_000 * 60_000
    return f"""
WITH items AS (
  SELECT event_id % 30 AS feed,
         {base} + ((event_id * 991) % 86400) * 60000 AS ts
  FROM events),
agg AS (
  SELECT feed, MAX(ts) AS newest FROM items GROUP BY feed),
sec AS (
  SELECT i.feed, MAX(i.ts) AS second_newest
  FROM items i JOIN agg a ON a.feed = i.feed AND i.ts < a.newest
  GROUP BY i.feed),
dups AS (
  SELECT i.feed, COUNT(*) AS c
  FROM items i JOIN agg a ON a.feed = i.feed AND i.ts = a.newest
  GROUP BY i.feed)
SELECT a.feed AS feed_id,
  GREATEST(LEAST(
    CASE WHEN {poll} - a.newest > 0
         THEN CAST(trunc(CAST(0.2 AS DOUBLE) * ({poll} - a.newest)
                         / 60000) AS BIGINT)
         ELSE 60 END, 10080), 5) AS adaptive_ttl,
  GREATEST(LEAST(
    CASE WHEN d.c = 1 AND s.second_newest IS NOT NULL
              AND a.newest - s.second_newest > 0
         THEN (a.newest - s.second_newest) // 60000
         ELSE 60 END, 10080), 5) AS lru2
FROM agg a
LEFT JOIN sec s ON s.feed = a.feed
LEFT JOIN dups d ON d.feed = a.feed
ORDER BY feed_id"""


def wiki_ner_dictionary_sql() -> str:
    """Symbolic mirror of the wiki_ner_dictionary gate
    (WikipediaDatasetCreator.java:83-222): the corpus is closed-form,
    so every dictionary entry derives from joins + CASE — link
    destinations resolve by a self-join on the page id, the infobox
    of page j is CASE j %% 5 (airport->LOC artist->PER airline->ORG
    nosuchbox->*IGNORE* none->no entry), resolvable links add
    destination + caption + the linked page's 'Alt j' bold title,
    missing destinations ('Ghost i', out-of-corpus ids) add *IGNORE*,
    mapped own infoboxes add 'Alt i'/'Page i', PER rows add the
    last-token variant and ORG rows the ',? Inc.'-stripped variant
    (identity here), duplicate-destination links are skipped, and
    surface collisions resolve last-insertion-wins."""
    return """
WITH ids AS (SELECT doc_id AS i FROM documents),
pages AS (
  SELECT i, CASE i % 5 WHEN 0 THEN 'LOC' WHEN 1 THEN 'PER'
                       WHEN 2 THEN 'ORG' WHEN 3 THEN '*IGNORE*'
            END AS linked_tag,
         i % 5 <> 4 AS has_box,
         i % 5 IN (0, 1, 2) AS mapped
  FROM ids),
links AS (
  SELECT i, 1 AS seq, (i * 3 + 1) % 555 AS dest_id,
         CAST(NULL AS VARCHAR) AS caption FROM ids
  UNION ALL
  SELECT i, 2, (i * 7 + 2) % 555, 'Cap ' || i FROM ids
  WHERE (i * 7 + 2) % 555 <> (i * 3 + 1) % 555),
base AS (
  -- destination / caption / linked-alt rows from resolvable links
  SELECT l.i, l.seq * 10 + 0 AS seq, 'Page ' || l.dest_id AS surface,
         CASE WHEN p2.i IS NULL THEN '*IGNORE*'
              ELSE p2.linked_tag END AS tag
  FROM links l LEFT JOIN pages p2 ON p2.i = l.dest_id
  WHERE p2.i IS NULL OR p2.has_box
  UNION ALL
  SELECT l.i, l.seq * 10 + 1, l.caption, p2.linked_tag
  FROM links l JOIN pages p2 ON p2.i = l.dest_id
  WHERE p2.has_box AND l.caption IS NOT NULL
  UNION ALL
  SELECT l.i, l.seq * 10 + 2, 'Alt ' || l.dest_id, p2.linked_tag
  FROM links l JOIN pages p2 ON p2.i = l.dest_id
  WHERE p2.has_box
  UNION ALL
  SELECT i, 30, 'Ghost ' || i, '*IGNORE*' FROM ids
  UNION ALL
  SELECT i, 40, 'Alt ' || i, linked_tag FROM pages WHERE mapped
  UNION ALL
  SELECT i, 41, 'Page ' || i, linked_tag FROM pages WHERE mapped),
dedup1 AS (
  SELECT i, surface, tag, seq FROM base
  QUALIFY row_number() OVER (PARTITION BY i, surface
                             ORDER BY seq DESC) = 1),
variants AS (
  SELECT i, regexp_extract(surface, '[^ ]+$') AS surface, tag,
         100 + seq AS seq
  FROM dedup1 WHERE tag = 'PER'
  UNION ALL
  SELECT i, regexp_replace(surface, ',? Inc\\.', ''), tag, 100 + seq
  FROM dedup1 WHERE tag = 'ORG'),
unioned AS (
  SELECT * FROM dedup1 UNION ALL SELECT * FROM variants)
SELECT i AS page_id, surface, tag FROM unioned
WHERE surface <> ''
QUALIFY row_number() OVER (PARTITION BY i, surface
                           ORDER BY seq DESC) = 1
ORDER BY page_id, surface"""


def indhist_intervals_sql() -> str:
    """Semantic mirror of the indhist_intervals gate
    (IndHistUpdateStrategy.java:87-160 + FeedDatabase.getIndHistModel:
    412-434): hourly rates = per-hour counts / touched-days, then the
    walk — remaining-hour branch, day loop in closed form k =
    max(0, ceil((theta - pending0)/daily) - 1), rotated 24-row prefix
    sums for the hour loop, truncating last-hour fraction, clamp.
    Poll 1599999300000 (hour 12 UTC, 2700 s remaining), theta 0.75."""
    base0 = 26_666_666 * 60_000
    return f"""
WITH ev AS (
  SELECT event_id % 35 AS feed, event_id FROM events),
params AS (
  SELECT feed,
         (CASE feed % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)
           * 1440 - 1 AS span,
         {base0} + feed * 7 * 1440 * 60000 AS base
  FROM (SELECT DISTINCT feed FROM ev)),
items AS (
  SELECT e.feed,
         p.base + ((e.event_id * 197) % (p.span + 1)) * 60000 AS ts
  FROM ev e JOIN params p USING (feed)
  UNION ALL SELECT feed, base FROM params
  UNION ALL SELECT feed, base + span * 60000 FROM params),
stats AS (
  SELECT feed, COUNT(*) AS n_items,
         (MAX(ts) - MIN(ts)) // 86400000 + 1 AS obs_days
  FROM items GROUP BY feed),
counts AS (
  SELECT feed, (ts // 3600000) % 24 AS hour, COUNT(*) AS c
  FROM items GROUP BY feed, (ts // 3600000) % 24),
grid AS (
  SELECT s.feed, g.hour,
         CAST(COALESCE(c.c, 0) AS DOUBLE) / s.obs_days AS rate
  FROM stats s
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hour) g
  LEFT JOIN counts c ON c.feed = s.feed AND c.hour = g.hour),
daily AS (SELECT feed, SUM(rate) AS daily FROM grid GROUP BY feed),
atpoll AS (
  SELECT feed, rate AS rate_poll FROM grid WHERE hour = 12),
pref AS (
  SELECT feed, (hour - 13 + 24) % 24 AS j, rate,
         SUM(rate) OVER (PARTITION BY feed
                         ORDER BY (hour - 13 + 24) % 24
                         ROWS UNBOUNDED PRECEDING) AS pref
  FROM grid),
base AS (
  SELECT s.feed, s.n_items, d.daily, a.rate_poll,
         a.rate_poll * 2700 / 3600 AS rem_pending
  FROM stats s JOIN daily d USING (feed) JOIN atpoll a USING (feed)),
base2 AS (
  SELECT *, GREATEST(0, CAST(ceil((0.75 - rem_pending) / daily)
                             AS BIGINT) - 1) AS k
  FROM base WHERE daily > 0),
base3 AS (
  SELECT *, rem_pending + k * daily AS pending1 FROM base2),
hit AS (
  SELECT p.feed, MIN(p.j) AS jstar
  FROM pref p JOIN base3 b USING (feed)
  WHERE b.pending1 + p.pref >= 0.75 GROUP BY p.feed),
last AS (
  SELECT p.feed, h.jstar, p.rate AS rate_star,
         p.pref - p.rate AS pref_excl
  FROM pref p JOIN hit h ON h.feed = p.feed AND p.j = h.jstar),
walked AS (
  SELECT b.feed, b.n_items,
         CASE WHEN b.rem_pending >= 0.75
              THEN CAST(floor(60 * 0.75 / b.rate_poll) AS BIGINT)
              ELSE CAST(floor(45 + b.k * 1440 + 60 * l.jstar
                              + 60 * (0.75 - (b.pending1
                                              + l.pref_excl))
                                / l.rate_star) AS BIGINT)
         END AS raw
  FROM base3 b JOIN last l USING (feed)),
final AS (
  SELECT b.feed AS feed_id, b.n_items,
         COALESCE(w.raw, 60) AS raw
  FROM base b LEFT JOIN walked w ON w.feed = b.feed)
SELECT feed_id, n_items, GREATEST(raw, 5) AS indhist
FROM final ORDER BY feed_id"""


def mavsync_intervals_sql() -> str:
    """Semantic mirror of the mavsync_intervals gate
    (MAVSynchronizationUpdateStrategy.java:77-160, rssTTLmode=1):
    window-average sync interval with toward-zero truncation (it can
    be negative), in-bounds check against the [5, 10080] clamp,
    (lastPoll - oldest)/n fallback, ttl-as-lower-bound, final
    clamp."""
    base = 26_000_000 * 60_000
    poll = base + 101_000 * 60_000
    return f"""
WITH items AS (
  SELECT event_id % 25 AS feed,
         {base} + ((event_id * 383) % 100800) * 60000 AS ts
  FROM events),
stats AS (
  SELECT feed, MIN(ts) AS oldest, MAX(ts) AS newest,
         COUNT(*) AS n FROM items GROUP BY feed),
calc AS (
  SELECT feed,
    CASE WHEN n >= 2 AND newest - oldest > 0
         THEN (newest - oldest) // ((n - 1) * 60000)
         ELSE 0 END AS window_iv,
    oldest, newest, n,
    CASE WHEN feed % 4 = 0 THEN 120 END AS rss_ttl
  FROM stats),
sync AS (
  SELECT *,
    CAST(trunc((newest + window_iv * 60000 - {poll}) / 60000.0)
         AS BIGINT) AS ci
  FROM calc),
chosen AS (
  SELECT *,
    CASE WHEN ci = GREATEST(LEAST(ci, 10080), 5) THEN ci
         WHEN n >= 1 AND {poll} - oldest > 0
         THEN ({poll} - oldest) // (n * 60000)
         ELSE 60 END AS ci2
  FROM sync),
ttl AS (
  SELECT feed,
    CASE WHEN rss_ttl IS NOT NULL AND rss_ttl >= 0 AND ci2 < rss_ttl
         THEN rss_ttl ELSE ci2 END AS ci3
  FROM chosen)
SELECT feed AS feed_id,
       GREATEST(LEAST(ci3, 10080), 5) AS mav_sync
FROM ttl ORDER BY feed_id"""


# ------------------------------------------- round-5 dataset-ops gates


def dataset_join_sql() -> str:
    """Mirror of the dataset_join gate (kgp.datasetops.join_datasets —
    DatasetJoiner.java:41-105): inner equi-join on the join column,
    d2's category survives, multi-matches multiply."""
    return (
        "SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey, "
        "o.o_totalprice AS totalprice, c.c_acctbal AS acctbal, "
        "c.c_mktsegment AS category "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "ORDER BY orderkey")


def dataset_concat_sql() -> str:
    """Mirror of the dataset_concat gate (kgp.datasetops
    .concat_datasets — ConcatenatedDataset.java:14-76): UNION ALL with
    null padding for the union feature space."""
    return (
        "SELECT o_orderkey AS a, o_totalprice AS b, "
        "CAST(NULL AS DOUBLE) AS c, o_orderstatus AS category "
        "FROM orders "
        "UNION ALL "
        "SELECT c_custkey, NULL, c_acctbal, c_mktsegment "
        "FROM customer ORDER BY a, category")


def protected_areas_sql(areas: int = 400, points: int = 8) -> str:
    """Closed-form mirror of the protected_areas gate
    (kgp.protectedplanet — ProtectedPlanetImporter.java:60-127): the
    synthetic WDPA ring for area k has vertices j = 0..points-1 with
    vertex points-1 repeating vertex 0, so the HashSet keeps
    j = 0..points-2; the midpoint is the unit-sphere vector average
    (GeoUtils.getMidpoint, GeoUtils.java:61-87)."""
    return f"""
WITH ks AS (
  SELECT DISTINCT o_orderkey % {areas} AS k FROM orders),
verts AS (
  SELECT k, j,
    CAST((k*7 + j*13) % 120 AS DOUBLE)/2.0 - 30
      + CAST(j AS DOUBLE)/100.0 AS lat,
    CAST((k*11 + j*17) % 300 AS DOUBLE)/2.0 - 75
      + CAST(j AS DOUBLE)/100.0 AS lng
  FROM ks, range(0, {points - 1}) t(j)),
mid AS (
  SELECT k,
    avg(cos(radians(lat))*cos(radians(lng))) AS x,
    avg(cos(radians(lat))*sin(radians(lng))) AS y,
    avg(sin(radians(lat))) AS z
  FROM verts GROUP BY k)
SELECT k AS id,
  'Area ' || k || ', Reserve' AS primary_name,
  CASE WHEN k % 3 = 0 THEN 'Reserva ' || k ELSE '' END AS alt_names,
  'LANDMARK' AS type,
  round(degrees(atan2(z, sqrt(x*x + y*y))), 6) + 0.0 AS lat,
  round(degrees(atan2(y, x)), 6) + 0.0 AS lng
FROM mid ORDER BY id"""


def sparse_dataset_sql() -> str:
    """Mirror of the sparse_dataset gate (kgp.sparsedataset —
    SparseDatasetReader.java): the synthetic line for an event is
    ``event_type 0:<id%97> 1:"u <user_id>" 2:<?|id%13>``; parsing it
    back gives three long-format rows per event, feature '1' quoted
    (string), feature '2' null-marked every 5th event, types from the
    headerless first-occurrence parser chain (int/string/int)."""
    return (
        "SELECT event_type AS category, '0' AS feature, "
        "'int' AS value_type, CAST(event_id % 97 AS VARCHAR) AS value "
        "FROM events "
        "UNION ALL "
        "SELECT event_type, '1', 'string', "
        "'u ' || CAST(user_id AS VARCHAR) FROM events "
        "UNION ALL "
        "SELECT event_type, '2', 'int', "
        "CASE WHEN event_id % 5 = 0 THEN NULL "
        "ELSE CAST(event_id % 13 AS VARCHAR) END FROM events "
        "ORDER BY category, feature, value")


def libsvm_dataset_sql() -> str:
    """Mirror of the libsvm_dataset gate (kgp.sparsedataset
    .parse_libsvm_lines — LibSvmDatasetReader.java:37-113): the
    synthetic line for an event is ``<id%3> 1:<id%7+0.5>`` plus
    `` 3:<(user%11)/2>`` on odd ids; parsing it back is exact (every
    value is a 0.5-step double, round-trip-faithful through the
    string cast)."""
    return (
        "SELECT CAST(event_id % 3 AS VARCHAR) AS category, "
        "1 AS feature, CAST(event_id % 7 AS DOUBLE) + 0.5 AS value "
        "FROM events "
        "UNION ALL "
        "SELECT CAST(event_id % 3 AS VARCHAR), 3, "
        "CAST(user_id % 11 AS DOUBLE)/2.0 FROM events "
        "WHERE event_id % 2 = 1 "
        "ORDER BY category, feature, value")


def lihz_intervals_sql() -> str:
    """Semantic mirror of the lihz_intervals gate
    (LIHZUpdateStrategy.java:44-130): day-of-week found/checks model
    from 21 daily training polls (index 7 = Saturday AND the sum row,
    so Saturday polls double-increment), prediction-poll update, the
    <= 7-step walk unrolled with left-associated double sums and the
    NaN exit at the untrained index 0, DEFAULT_CHECK_TIME for empty
    feeds, GREATEST clamp."""
    day = 86_400_000
    theta = "0.75"
    f_cases = []
    for d in range(1, 7):
        f_cases.append(
            f"COALESCE(f.found{d}, 0) + CASE WHEN b.has_new = 1 AND "
            f"b.dow_p = {d} THEN 1 ELSE 0 END AS g{d}")
    probs = []
    for j in range(1, 8):
        local = f"CASE WHEN (dow_p + {j}) % 7 = 0 THEN 'NaN'::DOUBLE"
        for d in range(1, 7):
            local += (f" WHEN (dow_p + {j}) % 7 = {d} THEN "
                      f"CAST(0.9 AS DOUBLE) * g{d} / checks{d}")
        local += " END"
        glob = (f"(1 - CAST(0.9 AS DOUBLE)) * g7 / (checks7 + {j} + "
                f"CASE WHEN dow_p = 7 THEN 1 ELSE 0 END)")
        probs.append(f"({local}) + {glob} AS p{j}")
    cums = []
    for j in range(1, 8):
        e = "p1"
        for i in range(2, j + 1):
            e = f"({e} + p{i})"
        cums.append(f"{e} AS c{j}")
    walk = "CASE "
    for j in range(1, 8):
        walk += (f"WHEN isnan(c{j}) OR c{j} >= {theta} "
                 f"THEN {1440 * j} ")
    walk += f"ELSE {1440 * 7} END"
    found_sums = ",\n         ".join(
        f"SUM(CASE WHEN dow = {d} THEN 1 ELSE 0 END) AS found{d}"
        for d in range(1, 7))
    check_sums = ",\n         ".join(
        f"SUM(CASE WHEN dow = {d} THEN 1 ELSE 0 END) AS checks{d}"
        for d in range(1, 7))
    return f"""
WITH feeds AS (
  SELECT f AS feed,
         (18001 + f % 7) * {day} + 9 * 3600000 AS first
  FROM (SELECT unnest(generate_series(0, 39)) AS f)),
ev AS (SELECT event_id % 37 AS feed, event_id FROM events),
items AS (
  SELECT e.feed,
         fd.first + ((e.event_id * 7919) % 21) * {day}
                  + (60 + (e.event_id * 37) % 1320) * 60000 AS ts
  FROM ev e JOIN feeds fd USING (feed)),
it AS (
  SELECT feed, r FROM (
    SELECT i.feed,
           CASE WHEN i.ts <= fd.first THEN 0
                ELSE (i.ts - fd.first - 1) // {day} + 1 END AS r
    FROM items i JOIN feeds fd USING (feed))
  WHERE r <= 21),
ni AS (SELECT feed, COUNT(*) AS n_items FROM it GROUP BY feed),
frd AS (
  SELECT f.feed,
         ((fd.first + f.r * {day}) // {day} + 4) % 7 + 1 AS dow
  FROM (SELECT DISTINCT feed, r FROM it WHERE r < 21) f
  JOIN feeds fd USING (feed)),
found AS (
  SELECT feed,
         {found_sums},
         COUNT(*) + SUM(CASE WHEN dow = 7 THEN 1 ELSE 0 END)
           AS found7
  FROM frd GROUP BY feed),
cg AS (
  SELECT fd.feed,
         ((fd.first + g.r * {day}) // {day} + 4) % 7 + 1 AS dow
  FROM feeds fd CROSS JOIN
       (SELECT unnest(generate_series(0, 20)) AS r) g),
checks AS (
  SELECT feed,
         {check_sums},
         21 + SUM(CASE WHEN dow = 7 THEN 1 ELSE 0 END) AS checks7
  FROM cg GROUP BY feed),
hn AS (SELECT DISTINCT feed, 1 AS has_new FROM it WHERE r = 21),
b AS (
  SELECT fd.feed, COALESCE(n.n_items, 0) AS n_items,
         COALESCE(h.has_new, 0) AS has_new,
         ((fd.first + 21 * {day}) // {day} + 4) % 7 + 1 AS dow_p
  FROM feeds fd
  LEFT JOIN ni n USING (feed) LEFT JOIN hn h USING (feed)),
upd AS (
  SELECT b.feed, b.n_items, b.has_new, b.dow_p,
         {', '.join(f_cases)},
         COALESCE(f.found7, 0)
           + CASE WHEN b.has_new = 1
                  THEN CASE WHEN b.dow_p = 7 THEN 2 ELSE 1 END
                  ELSE 0 END AS g7,
         {', '.join(f'c.checks{d}' for d in range(1, 7))}, c.checks7
  FROM b LEFT JOIN found f USING (feed) JOIN checks c USING (feed)),
probs AS (
  SELECT *, {', '.join(probs)} FROM upd),
cums AS (
  SELECT *, {', '.join(cums)} FROM probs),
walked AS (
  SELECT feed, n_items, has_new,
         CASE WHEN g7 = 0 THEN 60 ELSE ({walk}) END AS raw
  FROM cums)
SELECT feed AS feed_id, n_items, has_new,
       GREATEST(raw, 5) AS lihz
FROM walked ORDER BY feed_id"""


def mavpr_intervals_sql() -> str:
    """Semantic mirror of the mavpr_intervals gate
    (MavPrUpdateStrategy.java:39-76): the PostRate CTE chain from
    postrate_intervals_sql (clamped [5, 20000]), the MAV min-delay
    formula in both has-new branches (MavUpdateStrategy.java:44-86,
    trunc-division), the strict-less winner flag over the carried
    predictions, and the SWAPPED final branch (usePostRate -> MAV)."""
    base0 = 26_666_666 * 60_000
    lookup = base0 + 30 * 60_000
    return f"""
WITH ev AS (
  SELECT event_id % 40 AS feed, event_id FROM events),
params AS (
  SELECT feed,
         (CASE feed % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)
           * 1440 - 1 AS span,
         {base0} + feed * 1440 * 60000 AS base
  FROM (SELECT DISTINCT feed FROM ev)),
items AS (
  SELECT e.feed,
         p.base + ((e.event_id * 131) % (p.span + 1)) * 60000 AS ts
  FROM ev e JOIN params p USING (feed)
  UNION ALL SELECT feed, base FROM params
  UNION ALL SELECT feed, base + span * 60000 FROM params),
stats AS (
  SELECT feed, MIN(ts) AS oldest, MAX(ts) AS newest,
         COUNT(*) AS n_items
  FROM items GROUP BY feed),
firstgap AS (
  SELECT feed,
         MAX(CASE WHEN rn = 2 THEN ts END)
           - MAX(CASE WHEN rn = 1 THEN ts END) AS first_gap
  FROM (SELECT feed, ts,
               ROW_NUMBER() OVER (PARTITION BY feed ORDER BY ts) AS rn
        FROM items)
  WHERE rn <= 2 GROUP BY feed),
stats2 AS (
  SELECT s.feed, s.n_items, s.oldest, s.newest,
         (s.newest - s.oldest) // 60000 + 1 AS steps,
         (s.oldest // 60000) % 1440 AS start_minute,
         CAST(s.newest - s.oldest AS DOUBLE) / (s.n_items - 1)
           AS avg_gap,
         fg.first_gap,
         {lookup} - s.newest AS delay
  FROM stats s JOIN firstgap fg USING (feed)),
posts AS (
  SELECT feed, (ts // 60000) % 1440 AS minute, COUNT(*) AS posts
  FROM items GROUP BY feed, (ts // 60000) % 1440),
grid AS (
  SELECT s.feed, g.minute,
         s.steps // 1440
           + CASE WHEN (g.minute - s.start_minute + 1440) % 1440
                       < s.steps % 1440 THEN 1 ELSE 0 END AS chance,
         COALESCE(p.posts, 0) AS posts
  FROM stats2 s
  CROSS JOIN (SELECT unnest(generate_series(0, 1439)) AS minute) g
  LEFT JOIN posts p ON p.feed = s.feed AND p.minute = g.minute),
pref AS (
  SELECT feed,
         (minute - ({lookup} // 60000) % 1440 + 1440) % 1440 AS j,
         SUM(CASE WHEN chance > 0
                  THEN CAST(posts AS DOUBLE) / chance
                  ELSE 0.0 END)
           OVER (PARTITION BY feed ORDER BY
                 (minute - ({lookup} // 60000) % 1440 + 1440) % 1440
                 ROWS UNBOUNDED PRECEDING) AS pref
  FROM grid),
tot AS (SELECT feed, MAX(pref) AS s FROM pref GROUP BY feed),
kzero AS (
  SELECT st.feed, t.s,
         CASE WHEN t.s > 0 THEN GREATEST(0,
              CAST(ceil(1.0 / t.s) AS BIGINT) - 1) END AS k0
  FROM stats2 st JOIN tot t USING (feed)),
hits AS (
  SELECT p.feed, MIN(g.k0 * 1440 + p.j) AS c
  FROM pref p JOIN kzero g USING (feed)
  WHERE g.k0 IS NOT NULL AND p.pref >= 1.0 - g.k0 * g.s
  GROUP BY p.feed),
prmin AS (
  SELECT s.feed,
         GREATEST(LEAST(COALESCE(
           CASE WHEN h.c < 267840 THEN h.c ELSE 44640 END, 44640),
           20000), 5) AS postrate_min
  FROM stats2 s LEFT JOIN hits h USING (feed)),
mav AS (
  SELECT feed, n_items, newest,
         GREATEST(LEAST(
           CASE WHEN n_items <= 1 THEN 30
                ELSE CAST(trunc(avg_gap / 60000.0) AS BIGINT) END,
           20000), 5) AS mav_t,
         GREATEST(LEAST(
           CASE WHEN n_items <= 1 THEN 30
                WHEN avg_gap = 0 THEN 20000
                ELSE CAST(trunc((CASE WHEN delay > 0
                     THEN avg_gap - first_gap // (n_items - 1)
                          + delay // (n_items - 1)
                     ELSE avg_gap END) / 60000.0) AS BIGINT) END,
           20000), 5) AS mav_f
  FROM stats2),
state AS (
  SELECT feed, (feed * 53) % 3000 AS pr_pred,
         (feed * 97) % 3000 AS mav_pred,
         CASE WHEN feed % 2 = 0 THEN 1 ELSE 0 END AS use_pr_prev,
         CASE WHEN feed % 3 <> 1 THEN 1 ELSE 0 END AS has_new,
         {lookup} - 1440 * 60000 + feed * 60000 AS last_lookup
  FROM params),
winner AS (
  SELECT m.feed, m.n_items,
         CASE WHEN s.has_new = 1 THEN
           CASE WHEN ABS(CAST(s.last_lookup + s.pr_pred * 60000
                              - m.newest AS DOUBLE))
                   < ABS(CAST(s.last_lookup + s.mav_pred * 60000
                              - m.newest AS DOUBLE))
                THEN 1 ELSE 0 END
           ELSE s.use_pr_prev END AS use_post_rate,
         CASE WHEN s.has_new = 1 THEN m.mav_t ELSE m.mav_f END
           AS mav_iv,
         p.postrate_min
  FROM mav m JOIN state s USING (feed) JOIN prmin p USING (feed))
SELECT feed AS feed_id, n_items, use_post_rate,
       GREATEST(LEAST(CASE WHEN use_post_rate = 1 THEN mav_iv
                           ELSE postrate_min END, 20000), 5) AS mavpr
FROM winner ORDER BY feed_id"""


def indhist_ttl_intervals_sql() -> str:
    """Semantic mirror of the indhist_ttl_intervals gate
    (IndHistTTLUpdateStrategy.java:93-246): the IndHist model + walk
    (poll at hour 12 minute 45 -> 900 s remaining, ci0 = 15), the
    predicted-updates backward window walk folded to its scalar
    shape for this poll (cm = 2700 quirk-minutes, W = 2880: t0 =
    rate[12]*2700/60, hours 11 and 10, 60-minute tail on hour 9),
    the real-new-items window count, the burst pick, and the
    AdaptiveTTL fallback -- all in SQL."""
    base0 = 26_666_666 * 60_000
    poll = base0 + (40 * 1440 + 19) * 60_000
    wstart = poll - 48 * 3_600_000
    return f"""
WITH ev AS (
  SELECT event_id % 35 AS feed, event_id FROM events),
params AS (
  SELECT feed,
         (CASE feed % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)
           * 1440 - 1 AS span,
         {base0} + feed * 1440 * 60000 AS base
  FROM (SELECT DISTINCT feed FROM ev)),
model AS (
  SELECT feed, ts FROM (
    SELECT e.feed,
           p.base + ((e.event_id * 197) % (p.span + 1)) * 60000 AS ts
    FROM ev e JOIN params p USING (feed)
    WHERE e.event_id % 9 <> 0
    UNION ALL SELECT feed, base FROM params
    UNION ALL SELECT feed, base + span * 60000 FROM params)
  WHERE feed <> 34),
new_items AS (
  SELECT feed,
         {poll} - (1 + (event_id * 13)
                   % (CASE WHEN feed % 4 = 0 THEN 600 ELSE 3000 END))
                * 60000 AS ts
  FROM ev WHERE event_id % 9 = 0 AND feed % 6 <> 5),
stats AS (
  SELECT feed, COUNT(*) AS n_items, MAX(ts) AS newest,
         (MAX(ts) - MIN(ts)) // 86400000 + 1 AS obs_days
  FROM model GROUP BY feed),
counts AS (
  SELECT feed, (ts // 3600000) % 24 AS hour, COUNT(*) AS c
  FROM model GROUP BY feed, (ts // 3600000) % 24),
grid AS (
  SELECT s.feed, g.hour,
         CAST(COALESCE(c.c, 0) AS DOUBLE) / s.obs_days AS rate
  FROM stats s
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hour) g
  LEFT JOIN counts c ON c.feed = s.feed AND c.hour = g.hour),
daily AS (SELECT feed, SUM(rate) AS daily FROM grid GROUP BY feed),
atpoll AS (
  SELECT feed, rate AS rate_poll FROM grid WHERE hour = 12),
pref AS (
  SELECT feed, (hour - 13 + 24) % 24 AS j, rate,
         SUM(rate) OVER (PARTITION BY feed
                         ORDER BY (hour - 13 + 24) % 24
                         ROWS UNBOUNDED PRECEDING) AS pref
  FROM grid),
base AS (
  SELECT s.feed, s.n_items, d.daily, a.rate_poll,
         a.rate_poll * 900 / 3600 AS rem_pending
  FROM stats s JOIN daily d USING (feed) JOIN atpoll a USING (feed)),
base2 AS (
  SELECT *, GREATEST(0, CAST(ceil((0.75 - rem_pending) / daily)
                             AS BIGINT) - 1) AS k
  FROM base WHERE daily > 0),
base3 AS (
  SELECT *, rem_pending + k * daily AS pending1 FROM base2),
hit AS (
  SELECT p.feed, MIN(p.j) AS jstar
  FROM pref p JOIN base3 b USING (feed)
  WHERE b.pending1 + p.pref >= 0.75 GROUP BY p.feed),
last AS (
  SELECT p.feed, h.jstar, p.rate AS rate_star,
         p.pref - p.rate AS pref_excl
  FROM pref p JOIN hit h ON h.feed = p.feed AND p.j = h.jstar),
walked AS (
  SELECT b.feed,
         CASE WHEN b.rem_pending >= 0.75
              THEN CAST(floor(60 * 0.75 / b.rate_poll) AS BIGINT)
              ELSE CAST(floor(15 + b.k * 1440 + 60 * l.jstar
                              + 60 * (0.75 - (b.pending1
                                              + l.pref_excl))
                                / l.rate_star) AS BIGINT)
         END AS raw
  FROM base3 b JOIN last l USING (feed)),
indhist AS (
  SELECT b.feed, GREATEST(COALESCE(w.raw, 60), 5) AS indhist
  FROM base b LEFT JOIN walked w ON w.feed = b.feed),
pred AS (
  SELECT feed,
         MAX(CASE WHEN hour = 12 THEN rate END) * 2700 / 60
         + COALESCE(SUM(CASE WHEN hour IN (11, 10) THEN rate END),
                    0.0)
         + 60 * (MAX(CASE WHEN hour = 9 THEN rate END) / 60)
           AS predicted
  FROM grid GROUP BY feed),
realw AS (
  SELECT feed, COUNT(*) AS real_in_window
  FROM new_items WHERE ts >= {wstart} GROUP BY feed),
alln AS (
  SELECT feed, MAX(ts) AS newest_all FROM (
    SELECT feed, ts FROM model
    UNION ALL SELECT feed, ts FROM new_items) GROUP BY feed),
ttl AS (
  SELECT feed,
         GREATEST(CASE WHEN {poll} - newest_all > 0
              THEN CAST(trunc(0.2 * ({poll} - newest_all) / 60000.0)
                        AS BIGINT)
              ELSE 60 END, 5) AS adaptive_ttl
  FROM alln),
roster AS (SELECT DISTINCT feed FROM ev),
joined AS (
  SELECT r.feed, COALESCE(s.n_items, 0) AS n_items,
         COALESCE(rw.real_in_window, 0) AS real_in_window,
         COALESCE(p.predicted, 0.0) AS predicted,
         i.indhist, t.adaptive_ttl
  FROM roster r
  LEFT JOIN stats s USING (feed)
  LEFT JOIN realw rw USING (feed)
  LEFT JOIN pred p USING (feed)
  LEFT JOIN indhist i USING (feed)
  LEFT JOIN ttl t USING (feed)),
final AS (
  SELECT feed, n_items, real_in_window,
         CASE WHEN (real_in_window > 0 AND predicted = 0.0)
                OR (predicted <> 0.0
                    AND CAST(real_in_window AS DOUBLE) / predicted
                        > 2.0)
              THEN 1 ELSE 0 END AS used_ttl,
         adaptive_ttl, COALESCE(indhist, 60) AS indhist
  FROM joined)
SELECT feed AS feed_id, n_items, real_in_window, used_ttl,
       CASE WHEN used_ttl = 1 THEN adaptive_ttl ELSE indhist END
         AS indhist_ttl
FROM final ORDER BY feed_id"""


def page_date_stack_sql() -> str:
    """Symbolic mirror of the page_date_stack gate: the synthesized
    pages make every getter output a closed form of doc_id -- head
    rows per doc_id%4 (the author variant yields none), exactly one
    structure row (the div; the img's date attribute is skipped by
    StructureDateGetter.java:62), one url row per doc_id%5 shape with
    the UrlDateRater constant."""
    return """
WITH d AS (
  SELECT doc_id,
         lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
         lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd,
         lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') AS hh,
         lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS mi,
         lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0') AS ss,
         lpad(CAST((doc_id * 3) % 12 + 1 AS VARCHAR), 2, '0') AS mm2,
         lpad(CAST((doc_id * 5) % 28 + 1 AS VARCHAR), 2, '0') AS dd2,
         doc_id % 4 AS v, doc_id % 5 AS u
  FROM documents WHERE doc_id % 7 = 3),
urls AS (
  SELECT *,
         CASE WHEN u = 0
              THEN 'https://pages.example.org/2012-' || mm
                   || '/doc-' || doc_id
              ELSE 'https://pages.example.org/2012/' || mm || '/'
                   || dd || '/doc-' || doc_id END AS url
  FROM d),
head_rows AS (
  SELECT url, 'head' AS technique, 0 AS pos,
         CASE v WHEN 0 THEN 'published' WHEN 1 THEN 'last-modified'
                ELSE 'published' END AS keyword,
         CAST(NULL AS VARCHAR) AS tag, -1 AS depth,
         CASE v WHEN 0 THEN '2010-' || mm || '-' || dd || ' ' || hh
                          || ':' || mi || ':' || ss
                WHEN 1 THEN '2010-' || mm || '-' || dd
                ELSE '2011-' || mm END AS date_string,
         CASE v WHEN 0 THEN 'YYYY-MM-DDTHH:MM:SS+HH:MM'
                WHEN 1 THEN 'YYYY-MM-DD'
                ELSE 'YYYY-MM' END AS fmt,
         CASE v WHEN 0 THEN '2010-' || mm || '-' || dd || ' ' || hh
                          || ':' || mi || ':' || ss
                WHEN 1 THEN '2010-' || mm || '-' || dd
                ELSE '2011-' || mm END AS normalized,
         CASE v WHEN 0 THEN 6 WHEN 1 THEN 3 ELSE 2 END AS exactness,
         CAST(NULL AS DOUBLE) AS rate
  FROM urls WHERE v <> 3),
struct_rows AS (
  SELECT url, 'structure' AS technique, 0 AS pos,
         'posted' AS keyword, 'div' AS tag, 2 AS depth,
         '2012-' || mm2 || '-' || dd2 AS date_string,
         'YYYY-MM-DD' AS fmt,
         '2012-' || mm2 || '-' || dd2 AS normalized,
         3 AS exactness, CAST(NULL AS DOUBLE) AS rate
  FROM urls),
url_rows AS (
  SELECT url, 'url' AS technique, 0 AS pos,
         CAST(NULL AS VARCHAR) AS keyword,
         CAST(NULL AS VARCHAR) AS tag, -1 AS depth,
         CASE WHEN u = 0 THEN '2012-' || mm
              ELSE '2012/' || mm || '/' || dd END AS date_string,
         CASE WHEN u = 0 THEN 'YYYY_MM' ELSE 'YYYY_MM_DD' END AS fmt,
         CASE WHEN u = 0 THEN '2012-' || mm
              ELSE '2012-' || mm || '-' || dd END AS normalized,
         CASE WHEN u = 0 THEN 2 ELSE 3 END AS exactness,
         CASE WHEN u = 0 THEN 0.99 ELSE 0.95 END AS rate
  FROM urls)
SELECT * FROM (
  SELECT * FROM head_rows
  UNION ALL SELECT * FROM struct_rows
  UNION ALL SELECT * FROM url_rows)
ORDER BY url, technique, pos"""


def reference_dates_sql() -> str:
    """Mirror of the reference_dates gate
    (ReferenceDateGetter.java:29-77): shared rated-candidate CTE,
    winner per target page = highest rate then OLDEST date (unset
    fields oldest-first: plain ASC over the -1 sentinels) then
    candidate position, joined to the closed-form link table."""
    return _content_rated_cte() + """
), winners AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY url
    ORDER BY rate DESC, year ASC, month ASC, day ASC, hour ASC,
             abs_pos ASC) AS rn
  FROM rated
), links AS (
  SELECT DISTINCT doc_id AS src, dst FROM (
    SELECT doc_id, (doc_id * 7 + 1) % 500 AS dst FROM documents
    WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, (doc_id * 13 + 2) % 500 AS dst FROM documents
    WHERE doc_id % 3 = 0)
)
SELECT l.src, l.dst, w.value, w.year, w.month, w.day, w.hour, w.rate
FROM links l JOIN winners w ON w.url = CAST(l.dst AS VARCHAR)
WHERE w.rn = 1 ORDER BY l.src, l.dst"""


def wiki_dump_pages_sql() -> str:
    """Mirror of the wiki_dump_pages gate: the synthesized chunks make
    every page/link a closed form of doc_id -- 3 pages per even
    doc_id, links = [Link (id*3)%100 with anchor, T(id*5)%50 with the
    fragment stripped and an EMPTY anchor (the JVM
    regexp_extract_all convention for a non-participating group)],
    category links dropped, disambiguation per id%7==3 / id%11==0."""
    return """
WITH ids AS (
  SELECT doc_id * 3 + k AS page_id, k AS ns
  FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) kk
  WHERE doc_id % 2 = 0)
SELECT page_id, CAST(ns AS BIGINT) AS namespace_id,
       'Page ' || page_id
         || CASE WHEN page_id % 7 = 3 THEN ' (disambiguation)'
                 ELSE '' END AS title,
       2 AS n_links,
       'Link ' || (page_id * 3) % 100 || '|a' || page_id
         || ';T' || (page_id * 5) % 50 || '|' AS links_s,
       CASE WHEN page_id % 7 = 3 OR page_id % 11 = 0 THEN 1 ELSE 0 END
         AS disamb
FROM ids ORDER BY page_id"""


def wiki_case_dictionary_sql() -> str:
    """Mirror of the wiki_case_dictionary gate
    (WikipediaCaseDictionaryCreator.java:42-140): the synthesized
    MAIN-namespace page renders to exactly two real sentences per
    doc, so the counted token stream (sentence-initial tokens
    skipped) is a closed form of doc_id; the ns-4 page contributes
    nothing. Re-aggregate totals/uppercase counts and apply the
    clean() gate: count >= 10 and full-match [A-Za-z-]+ (digit
    tokens and the '.' tokens die here)."""
    return """
WITH toks AS (
  SELECT 'beta' || substr('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1)
           AS word, 0 AS up FROM documents
  UNION ALL
  SELECT 'gamma' || substr('abcdefg', CAST(doc_id % 5 AS INT) + 1, 1),
         1 FROM documents
  UNION ALL
  SELECT 'x' || doc_id, 0 FROM documents
  UNION ALL
  SELECT 'delta' || substr('abcdefg', CAST(doc_id % 3 AS INT) + 1, 1),
         0 FROM documents
  UNION ALL
  SELECT 'well-known', 0 FROM documents
  UNION ALL
  SELECT 'zeta' || substr('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1),
         1 FROM documents
  UNION ALL
  SELECT '.', 0 FROM documents
  UNION ALL
  SELECT '.', 0 FROM documents)
SELECT word, COUNT(*) AS total, CAST(SUM(up) AS BIGINT) AS upper
FROM toks
GROUP BY word
HAVING COUNT(*) >= 10 AND regexp_full_match(word, '[A-Za-z\\-]+')
ORDER BY word"""


def stopword_stats_sql() -> str:
    """Mirror of the stopword_stats gate: same Tokenizer regex (RE2
    accepts the \\p{L} classes), stop list rendered as a literal,
    case-sensitive vs lowercased membership."""
    from kgp.informativeness import TOKEN_SPLIT_JAVA
    from kgp.stopwords import STOPWORDS_EN

    words = ", ".join("'" + w.replace("'", "''") + "'"
                      for w in STOPWORDS_EN)
    return f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text, '{TOKEN_SPLIT_JAVA}') AS toks
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_filter(toks,
            tok -> list_contains([{words}], tok))) AS INT)
         AS n_stop_cs,
       CAST(len(list_filter(toks,
            tok -> list_contains([{words}], lower(tok)))) AS INT)
         AS n_stop_ci
FROM t ORDER BY doc_id"""


def snowball_stems_sql() -> str:
    """Mirror of the snowball_stems gate: the fixed GATE_WORDS bank
    as a VALUES list joined on doc_id %% |bank|, expected stems
    rendered from the stem_word twin (Stemmer.java:29-108 +
    WordTransformer.stemWord:558-583), whose parity is pinned by the
    spec-trace goldens in tests/test_stemmer.py — same render policy
    as wiki_formatting/dt_predictions."""
    from kgp.stemmer import GATE_WORDS, stem_word

    def q(s: str) -> str:
        return s.replace("'", "''")

    rows = ", ".join(
        f"({i}, '{q(w)}', '{lg}', '{q(stem_word(w, lg))}')"
        for i, (w, lg) in enumerate(GATE_WORDS))
    return f"""
WITH bank(variant, word, lang, stem) AS (VALUES {rows})
SELECT d.doc_id,
       CAST(d.doc_id % {len(GATE_WORDS)} AS INT) AS variant,
       b.word, b.lang, b.stem
FROM documents d
JOIN bank b ON b.variant = d.doc_id % {len(GATE_WORDS)}
ORDER BY d.doc_id"""


def baseline_links_sql() -> str:
    """Mirror of the baseline_links gate (BaselineDisambiguation.
    java:29-47): expanded gazetteer as VALUES (unique forms
    lowercased, null population -> -1 per expand_gazetteer), mention
    synthesis from doc_id, then the selection window — first
    CONTINENT/COUNTRY by entity_id (the break), else max qualifying
    population with the last-wins >= tie (entity_id DESC), non-
    qualifying candidates filtered, NIL mentions dropped by the inner
    join."""
    from kgp.linker import baseline_gate_rows

    gaz_vals = []
    for r in baseline_gate_rows():
        uniq = list(dict.fromkeys([r["name"], *r["alt_names"]]))
        pop = r["population"] if r["population"] is not None else -1
        for form in uniq:
            gaz_vals.append(
                f"(CAST({r['id']} AS BIGINT), {_lit(r['name'])}, "
                f"{_lit(form.lower())}, {_lit(r['type'])}, "
                f"CAST({pop} AS BIGINT))")
    mention_selects = f"""
  SELECT CAST(doc_id AS VARCHAR) AS url, CAST(0 AS BIGINT) AS sent_idx,
         CAST(5 AS BIGINT) AS "start",
         {_pick(C.CITIES, 'doc_id % 11')} AS surface, 'CITY' AS tag
  FROM documents
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 1, 40,
         {_pick(C.COUNTRIES, 'doc_id % 7')}, 'COUNTRY' FROM documents
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 2, 80, 'Atlantis', 'LOC'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 3, 120, 'Twinville', 'LOC'
  FROM documents WHERE doc_id % 4 = 1
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 4, 160, 'Ghosttown', 'LOC'
  FROM documents WHERE doc_id % 5 = 2
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 5, 200, 'Zeroville', 'LOC'
  FROM documents WHERE doc_id % 6 = 3
  UNION ALL SELECT CAST(doc_id AS VARCHAR), 6, 240, 'Nowhere', 'LOC'
  FROM documents WHERE doc_id % 7 = 4"""
    return f"""
WITH m AS MATERIALIZED (
  SELECT *, CAST("start" + length(surface) AS BIGINT) AS "end"
  FROM ({mention_selects})
), gaz(entity_id, canon_name, norm, etype, population) AS (
  VALUES {", ".join(gaz_vals)}
), cand AS (
  SELECT m.url, m.sent_idx, m."start", m."end", m.surface, m.tag,
         g.entity_id, g.canon_name, g.etype, g.population,
         (g.etype IN ('CONTINENT', 'COUNTRY')) AS is_cc
  FROM m JOIN gaz g ON g.norm = lower(m.surface)
)
SELECT url, sent_idx, "start", "end", surface, tag,
       entity_id, canon_name, etype, population
FROM cand
WHERE is_cc OR population >= 0
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY url, sent_idx, "start", "end"
  ORDER BY is_cc DESC,
           CASE WHEN is_cc THEN -entity_id ELSE population END DESC,
           entity_id DESC) = 1
ORDER BY url, sent_idx"""


def context_patterns_sql() -> str:
    """Mirror of the context_patterns gate (PatternAnalyzer.java:
    50-111): each GATE_TEMPLATES variant's LEFT-size-2 (context, tag)
    contributions are HAND-DERIVED below (digit masking, NBSP, quote
    normalization, DOCSTART skip, ORG category filter and the .{2,}
    length filter all pre-applied by hand — a kgp.contextpatterns twin
    bug therefore mismatches); counts, the most-likely pick
    (count DESC, tag ASC) and both prunes (total >= 5, prob >= 0.6)
    recomputed in SQL."""
    return """
WITH docs AS (
  SELECT CASE WHEN doc_id % 250 = 0 THEN 8
              ELSE doc_id % 8 END AS v
  FROM documents
), contrib(v, ctx, tag) AS (VALUES
  (0, 'visited', 'CITY'), (0, 'he visited', 'CITY'),
  (1, 'met', 'PER'), (1, 'she''d met', 'PER'),
  (1, 'near', 'CITY'), (1, 'lee near', 'CITY'),
  (3, 'visited', 'CITY'), (3, 'he visited', 'CITY'),
  (4, 'near', 'PER'), (4, 'stand near', 'PER'),
  (7, '§§§§', 'PER'), (7, 'in §§§§', 'PER'),
  (8, 'of', 'CITY'), (8, 'talk of', 'CITY')
), counts AS (
  SELECT c.ctx, c.tag, COUNT(*) AS c
  FROM docs d JOIN contrib c ON c.v = d.v
  GROUP BY c.ctx, c.tag
), agg AS (
  SELECT ctx, tag, c,
         SUM(c) OVER (PARTITION BY ctx) AS total,
         ROW_NUMBER() OVER (PARTITION BY ctx
                            ORDER BY c DESC, tag ASC) AS rn
  FROM counts
)
SELECT ctx || ' *' AS pattern, tag,
       CAST(c AS BIGINT) AS count,
       ROUND(CAST(c AS DOUBLE) / CAST(total AS DOUBLE), 9) AS prob
FROM agg
WHERE rn = 1 AND total >= 5
  AND CAST(c AS DOUBLE) / CAST(total AS DOUBLE) >= 0.6
ORDER BY pattern"""


def tudloc_annotations_sql() -> str:
    """Mirror of the tudloc_annotations gate (TudLoc2013Dataset
    Iterable.java:70-174): every template's annotation rows are
    HAND-DERIVED — plain-text offsets (incl. the nested-markup
    cumulated-length case), LocationType.map, role="main" ordinal,
    and the Java String.hashCode ids inlined as spec constants — so a
    kgp.tudloc twin bug mismatches."""
    return """
WITH docs AS (
  SELECT doc_id, CAST(doc_id % 5 AS INT) AS v FROM documents
), ann(v, idx, "offset", value, loc_type, loc_id, is_main) AS (VALUES
  (0, CAST(0 AS BIGINT), CAST(8 AS BIGINT), 'Dresden', 'CITY',
   CAST(-713734991 AS BIGINT), true),
  (0, 1, 19, 'Germany', 'COUNTRY', 1588421523, false),
  (1, 0, 6, 'Bar', 'UNDETERMINED', 66547, false),
  (2, 0, 0, 'Eiffel Tower', 'POI', 362606260, false),
  (2, 1, 23, 'Paris', 'CITY', 76884331, true),
  (4, 0, 4, 'New York', 'CITY', 1382994575, false)
), coord(v, "offset", lat, lon) AS (VALUES
  (0, CAST(8 AS BIGINT), CAST(51.05 AS DOUBLE),
   CAST(13.74 AS DOUBLE)),
  (2, 23, 48.858, 2.294)
)
SELECT CAST(d.doc_id AS VARCHAR) AS file_name, a.idx, a."offset",
       a.value, a.loc_type, a.loc_id, a.is_main, c.lat, c.lon
FROM docs d
JOIN ann a ON a.v = d.v
LEFT JOIN coord c ON c.v = a.v AND c."offset" = a."offset"
ORDER BY d.doc_id, a.idx"""


def geotext_docs_sql() -> str:
    """Mirror of the geotext_docs gate (GeoTextDatasetReader.java:
    113-161, SINGLE + TRAIN): user/fold/coordinates reconstructed
    symbolically from doc_id (the hex round-trip collapses), the four
    ISO-8859-1 SHA-1 digests inlined as spec constants."""
    texts = ("at the café on main st", "raining again in the city",
             "go vols! game day", "new phone who dis")
    shas = ("e5d7cc473f173a3948b65c96e9172d960f377a25",
            "0a414f6061f55443130b9e97a8d913c5411ceb36",
            "344b0c9c8f685e5fcfea94768634b2afb83ae453",
            "dbe03a96cc873a551f8a6dc06b56f29bac9aa4bf")
    text_case = " ".join(f"WHEN {i} THEN '{t.replace(chr(39), chr(39)*2)}'"
                         for i, t in enumerate(texts))
    sha_case = " ".join(f"WHEN {i} THEN '{s}'"
                        for i, s in enumerate(shas))
    return f"""
WITH base AS (
  SELECT doc_id,
         'USER_' || upper(to_hex(doc_id % 29)) AS user_name,
         CAST(CASE WHEN (doc_id % 29) % 5 = 0 THEN 5
                   ELSE (doc_id % 29) % 5 END AS INT) AS fold,
         CAST(doc_id % 90 AS DOUBLE) + 0.5 AS lat,
         -(CAST(doc_id % 180 AS DOUBLE) + 0.25) AS lon,
         CASE doc_id % 4 {text_case} END AS text,
         CASE doc_id % 4 {sha_case} END AS sha
  FROM documents
)
SELECT user_name || '#' || sha AS doc_name, user_name, fold,
       lat, lon, text
FROM base
WHERE fold IN (1, 2, 3)
ORDER BY user_name, doc_name, lat"""


def wiki_scope_docs_sql() -> str:
    """Mirror of the wiki_scope_docs gate (WikipediaLocationScope
    Iterator.java:86-106): clean texts HAND-derived from the markup
    bank; coordinates mirror MediaWikiUtil.parseComponents
    (d + m/60 + s/3600, :606-613) term-for-term so the IEEE result is
    bit-identical; inline-only display and no-coordinate variants
    keep the document with a null scope."""
    return """
SELECT CAST(doc_id AS VARCHAR) AS file_name,
       CASE doc_id % 4
         WHEN 0 THEN 'Dresden is a city. More text here.'
         WHEN 1 THEN 'Paris is the capital of France.'
         WHEN 2 THEN 'Plain article with links and no coordinate.'
         WHEN 3 THEN 'Just some text about nothing.'
       END AS clean_text,
       CASE doc_id % 4
         WHEN 0 THEN 51 + 3/60.0 + 0/3600.0
         WHEN 1 THEN CAST(48.8566 AS DOUBLE)
       END AS lat,
       CASE doc_id % 4
         WHEN 0 THEN 13 + 44/60.0 + 0/3600.0
         WHEN 1 THEN CAST(2.3522 AS DOUBLE)
       END AS lon
FROM documents ORDER BY doc_id"""


def twitter_sentiment_sql() -> str:
    """Mirror of the twitter_sentiment gate
    (TwitterSentimentDatasetIterator.java:78-103): the normalized
    (category, text) of every GATE_LINES variant HAND-derived — the
    quote-aware split, replaceWord boundary/casing rules, and the
    ASCII repeated-letter collapse are all pre-applied by hand, so a
    kgp.twittersentiment twin bug mismatches."""
    return """
SELECT CASE doc_id % 5 WHEN 0 THEN '0' WHEN 1 THEN '4'
       WHEN 2 THEN '2' WHEN 3 THEN '0' WHEN 4 THEN '4'
       END AS category,
       CASE doc_id % 5
         WHEN 0 THEN
           'USERNAME check URL I am soo huungry for QUERY_TERM now'
         WHEN 1 THEN 'I love it, really cool stuff'
         WHEN 2 THEN 'my QUERY_TERM concatenates cat-like things'
         WHEN 3 THEN 'wow!!!! yes__no aab'
         WHEN 4 THEN 'see URL and USERNAME now'
       END AS text
FROM documents ORDER BY category, text"""


def feature_selection_rank_sql() -> str:
    """Mirror of the feature_selection_rank gate (FeatureSelector.
    java:139-195, forward): shared NB term table, then FOUR unrolled
    greedy rounds -- each round scores every remaining candidate with
    the base sum over the previous winner subqueries, winner = max
    score with the last-in-ascending-name tie rule (ORDER BY score
    DESC, cand DESC LIMIT 1), ranks count down from N-1."""
    lap = "0.00001"
    feats = ["f_good", "f_junk", "f_mid", "f_noise"]
    cell_selects = "\n    UNION ALL ".join(
        f"SELECT id, '{f}' AS feature, {f} AS value FROM val"
        for f in feats)
    rounds = []
    for r in range(1, 5):
        prev = " UNION ALL ".join(
            f"SELECT cand AS feature FROM winner{i}"
            for i in range(1, r))
        sel_cte = (f"sel{r} AS ({prev}),\n" if prev else "")
        base_join = (
            f"base{r} AS (\n"
            f"  SELECT id, category, SUM(term) AS base FROM terms\n"
            f"  WHERE feature IN (SELECT feature FROM sel{r})\n"
            f"  GROUP BY id, category),\n" if prev else "")
        not_in = (f"AND feature NOT IN (SELECT feature FROM sel{r})"
                  if prev else "")
        total = (
            f"SELECT t.id, t.feature AS cand, t.category,\n"
            f"       ln(t.prior) + b.base + t.term AS score\n"
            f"FROM terms t JOIN base{r} b\n"
            f"  ON b.id = t.id AND b.category = t.category\n"
            f"WHERE TRUE {not_in}" if prev else
            f"SELECT id, feature AS cand, category,\n"
            f"       ln(prior) + term AS score\n"
            f"FROM terms WHERE TRUE {not_in}")
        rounds.append(f"""{sel_cte}{base_join}total{r} AS (
  {total}),
pred{r} AS (
  SELECT id, cand, category AS predicted FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY id, cand ORDER BY score DESC, category ASC) AS rk
    FROM total{r}) WHERE rk = 1),
score{r} AS (
  SELECT p.cand,
         CAST(SUM(CASE WHEN p.predicted = a.actual THEN 1 ELSE 0 END)
              AS DOUBLE) / COUNT(*) AS score
  FROM pred{r} p JOIN actual a USING (id) GROUP BY p.cand),
winner{r} AS (
  SELECT cand, score FROM score{r}
  ORDER BY score DESC, cand DESC LIMIT 1)""")
    rounds_sql = ",\n".join(rounds)
    finals = " UNION ALL ".join(
        f"SELECT cand AS feature, {4 - i} AS rank, {i} AS sel_order, "
        f"round(score, 6) AS score FROM winner{i}"
        for i in range(1, 5))
    return f"""
WITH ev AS (
  SELECT event_id AS id,
         'c' || (event_id % 3) AS category,
         'g' || (CASE WHEN event_id % 10 < 8 THEN event_id % 3
                      ELSE (event_id + 1) % 3 END) AS f_good,
         'm' || (CASE WHEN event_id % 2 = 0 THEN event_id % 3
                      ELSE (event_id * 7) % 5 END) AS f_mid,
         'j' || ((event_id * 13) % 4) AS f_junk,
         'n' || ((event_id * 11) % 2) AS f_noise
  FROM events),
train AS (SELECT * FROM ev WHERE id % 2 = 0),
val AS (SELECT * FROM ev WHERE id % 2 = 1),
cats AS (
  SELECT category, COUNT(*) AS cat_n FROM train GROUP BY category),
kt AS (SELECT COUNT(*) AS k, SUM(cat_n) AS total_n FROM cats),
catp AS (
  SELECT c.category, c.cat_n, kt.k,
         CAST(c.cat_n AS DOUBLE) / kt.total_n AS prior
  FROM cats c CROSS JOIN kt),
nom AS (
  SELECT category, feature, value, COUNT(*) AS n FROM (
    SELECT category, 'f_good' AS feature, f_good AS value FROM train
    UNION ALL SELECT category, 'f_junk', f_junk FROM train
    UNION ALL SELECT category, 'f_mid', f_mid FROM train
    UNION ALL SELECT category, 'f_noise', f_noise FROM train)
  GROUP BY category, feature, value),
cells AS (
    {cell_selects}),
terms AS (
  SELECT c.id, c.feature, p.category, p.prior,
         ln((COALESCE(n.n, 0) + {lap}) / (p.cat_n + {lap} * p.k))
           AS term
  FROM cells c CROSS JOIN catp p
  LEFT JOIN nom n ON n.feature = c.feature AND n.value = c.value
                 AND n.category = p.category),
actual AS (SELECT id, category AS actual FROM val),
{rounds_sql}
SELECT * FROM ({finals}) ORDER BY sel_order"""


def feed_meta_sql() -> str:
    """Mirror of the feed_meta gate (MetaInformationExtractor.java:
    60-214): every capability flag re-derived from the closed-form
    synthesis contract -- RSS for even fid (guid per fid%3/%9, pubDate
    per fid%4, cloud %5, ttl %6, skipDays %7, skipHours %8, hub link
    %10==2), Atom for odd (id %3, updated %4, published %5), the
    %11==3 non-feed payload and the %13 inaccessible statuses."""
    return """
WITH f AS (
  SELECT DISTINCT event_id % 60 AS fid FROM events),
k AS (
  SELECT fid,
         fid % 11 = 3 AS nonfeed,
         fid % 2 = 0 AS rss,
         fid % 13 IN (4, 9) AS badstatus
  FROM f)
SELECT fid AS feed_id,
  CASE WHEN NOT badstatus AND NOT nonfeed THEN 1 ELSE 0 END
    AS accessible,
  CASE WHEN NOT nonfeed AND rss AND fid % 10 = 2 THEN 1 ELSE 0 END
    AS pubsub,
  CASE WHEN nonfeed THEN NULL
       WHEN rss THEN 'rss_2.0' ELSE 'atom_1.0' END AS feed_format,
  CASE WHEN nonfeed THEN NULL
       WHEN fid % 3 <> 0 THEN 1 ELSE 0 END AS has_item_ids,
  CASE WHEN nonfeed OR NOT rss THEN NULL
       WHEN fid % 4 <> 1 THEN 1 ELSE 0 END AS has_pub_date,
  CASE WHEN nonfeed OR NOT rss THEN NULL
       WHEN fid % 5 = 0 THEN 1 ELSE 0 END AS has_cloud,
  CASE WHEN nonfeed OR NOT rss THEN NULL
       WHEN fid % 6 = 0 THEN fid * 3 ELSE -1 END AS ttl,
  CASE WHEN nonfeed OR NOT rss THEN NULL
       WHEN fid % 7 = 0 THEN 1 ELSE 0 END AS has_skip_days,
  CASE WHEN nonfeed OR NOT rss THEN NULL
       WHEN fid % 8 = 0 THEN 1 ELSE 0 END AS has_skip_hours,
  CASE WHEN nonfeed OR rss THEN NULL
       WHEN fid % 4 <> 1 THEN 1 ELSE 0 END AS has_updated,
  CASE WHEN nonfeed OR rss THEN NULL
       WHEN fid % 5 = 0 THEN 1 ELSE 0 END AS has_published
FROM k ORDER BY feed_id"""


def alternate_names_sql() -> str:
    """DuckDB mirror of the alternate_names gate: the synthesized TSV
    line, the tab split with <4-column skip, the empty/'abbr' null
    language, and the ISO-639-1 domain drop (Language.java:19-118's
    98 codes inlined)."""
    langs = ["de", "en", "es", "sq", "", "abbr", "post", "link", "xx",
             "fr", "ja", "ru"]
    from kgp.corpus import ISO_639_1_LANGUAGES
    iso_list = ", ".join(f"'{c}'" for c in sorted(ISO_639_1_LANGUAGES))
    lang_case = "CASE CAST(doc_id % 12 AS INT) " + " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(langs)) + " END"
    return f"""
WITH lines AS (
  SELECT CASE WHEN doc_id % 17 = 3 THEN
           CAST(doc_id AS VARCHAR) || chr(9)
             || CAST(doc_id % 50 AS VARCHAR)
         ELSE
           CAST(doc_id AS VARCHAR) || chr(9)
             || CAST(doc_id % 50 AS VARCHAR) || chr(9)
             || {lang_case} || chr(9) || 'Name'
             || CAST(doc_id % 23 AS VARCHAR)
         END AS value
  FROM documents),
parts AS (
  SELECT string_split(value, chr(9)) AS p FROM lines)
SELECT CAST(p[2] AS BIGINT) AS id, p[4] AS name,
       CASE WHEN p[3] IN ('', 'abbr') THEN '~' ELSE p[3] END
         AS language
FROM parts
WHERE len(p) >= 4
  AND (p[3] IN ('', 'abbr') OR p[3] IN ({iso_list}))
ORDER BY id"""
