"""Content-date extraction + rating — the full WebPageDateEvaluator
content path (beyond the source-priority cascade in kgp.pagedates).

Ports, per reference file:
- ContentDateGetter.java:49-362 — date candidates from body text
  nodes with the full feature set (document/tag positions, ordinal
  position/age ranks, keyword location & distance, structure-date
  agreement, meta/url agreement, same-day counts);
- KeyWords.java:13-108 — keyword classes (incl. the reference quirk
  that MODIFIED keywords never classify: `getKeywordPriority` compares
  against the byte constant, so only classes 1 and 3 exist);
- DateInstanceFactory.java:26-92 — the feature vector the rater
  consumes;
- ContentDateRater.java:84-105 — `publish && inUrl → 1.0`, else a
  model score. The reference bundles a serialized QuickDt forest
  (dates_pub_model.gz) we can neither ship nor deserialize; the port
  substitutes (a) a deterministic keyword/position heuristic as the
  model-free default and (b) `train_content_date_rater` — a
  pyspark.ml RandomForest over the SAME feature vector for users with
  labeled data (the reference's dates_pub.csv shape);
- RatedDateComparator.java:39-75 — rate desc, then document position,
  then age (newest first).

Scale notes: candidate extraction is one Arrow pass over (url, html)
via mapInPandas — per-page pure Python against the already-parsed DOM,
no shuffle; rating is a pure column projection (heuristic) or a
broadcast-model transform (trained forest).
"""

from __future__ import annotations

import html as _html
import re
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.dates import ALL_DATE_FORMATS, FoundDate, find_dates
from kgp.html_text import Node, document_to_readable_text, parse_html
from kgp.pagedates import meta_dates, url_dates

# ---------------------------------------------------- KeyWords port

PUBLISH_KEYWORD, MODIFIED_KEYWORD, OTHER_KEYWORD = 1, 2, 3

# KeyWords.BODY_CONTENT_KEYWORDS_ALL (declaration order matters: the
# content-keyword scan masks found keywords format-by-format)
BODY_CONTENT_KEYWORDS_ALL = [
    "published", "publish", "posted", "created", "create", "released",
    "release", "pubdate", "veröffentlicht", "geschrieben", "added",
    "updated", "update", "pdate", "revised", "revise", "aktualisiert",
    "date_first_released", "date_last_published", "displaydate",
    "display_date", "date-last-modified", "last-modified",
    "last modified", "datetime", "datestamp", "date-header", "date",
]

_FIRST_PRIORITY = {
    "published", "publish", "posted", "released", "release", "pubdate",
    "pdate", "date_first_released", "date_last_published",
    "displaydate", "display_date", "veröffentlicht", "create",
    "created", "added", "geschrieben",
}
_THIRD_PRIORITY = {"date", "time", "datetime", "datestamp", "dc:date",
                   "xsd:date", "xsd:datetime", "date-header"}

DATE_BODY_STRUC = [
    "published", "publish", "posted", "create", "created", "released",
    "pubdate", "pdate", "date_first_released", "date_last_published",
    "displaydate", "display_date", "last-modified", "last modified",
    "date-last-modified", "update", "dc:date", "xsd:date",
    "xsd:dateTime", "date", "time", "datetime", "datestamp",
    "date-header", "revised", "revise",
]


def keyword_priority(keyword: str | None) -> int:
    """KeyWords.getKeywordPriority (:72-86). The reference checks the
    MODIFIED class against `Arrays.asList(MODIFIED_KEYWORD)` — a list
    containing the byte constant 2, which never equals a string — so
    update/modified keywords fall through to -1. Quirk kept."""
    if keyword is None:
        return -1
    k = keyword.lower()
    if k in _FIRST_PRIORITY:
        return PUBLISH_KEYWORD
    if k in _THIRD_PRIORITY:
        return OTHER_KEYWORD
    return -1


def search_keyword(text: str, keys: list[str]) -> str | None:
    """KeyWords.searchKeyword (:93-101): first key CONTAINED in the
    lowercased text, in declaration order."""
    t = text.lower()
    for key in keys:
        if key.lower() in t:
            return key
    return None


# ------------------------------------------- text / date primitives

SIMPLE_ELEMENTS = {"b", "i", "em", "ins", "del", "s", "small", "big",
                   "strong", "u"}
HEADLINE_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

_WS_RUN = re.compile(r"  +")


def replace_html_symbols(text: str) -> str:
    """ContentDateGetter.replaceHtmlSymbols (:329-345): entity
    unescape, NBSP → space, double-whitespace collapse, then the
    literal cleanup replaces in reference order."""
    result = _html.unescape(text)
    result = result.replace("\xa0", " ")  # NBSP
    result = _WS_RUN.sub(" ", result)
    result = result.replace("&#8203;", " ")
    result = result.replace("\n", " ")
    result = result.replace("&#09;", " ")
    result = result.replace("\t", " ")
    result = result.replace(" ,", " ")
    return result


def find_all_dates(text: str) -> list[FoundDate]:
    """ContentDateGetter.findAllDates (:313-338) — like
    DateParser.findDates but with ONLY the digit-neighbor rejection
    (no dot rule), over the FULL RegExp.ALL_DATE_FORMATS bank, and
    with the reference's as-written neighbor OVERWRITE: the
    right-neighbor check unconditionally replaces the left-neighbor
    verdict whenever end < length (:318-326), so a left-digit with a
    right-non-digit is ACCEPTED."""
    from kgp.dateparse import REF_ALL_DATE_FORMATS
    out: list[FoundDate] = []
    if not re.search(r"\d", text):
        return out
    current = text
    for fmt in REF_ALL_DATE_FORMATS:
        for m in fmt.pattern.finditer(current):
            start, end = m.start(), m.end()
            digit_neighbor = start > 0 and current[start - 1].isdigit()
            if end < len(current):
                digit_neighbor = current[end].isdigit()
            if digit_neighbor:
                continue
            out.append(FoundDate(start, m.group(), fmt.fmt))
        for d in out:
            if d.fmt == fmt.fmt:
                current = (current[:d.start] + "x" * len(d.value)
                           + current[d.start + len(d.value):])
    return out


_MONTHS = {m: i + 1 for i, m in enumerate(
    ["january", "february", "march", "april", "may", "june", "july",
     "august", "september", "october", "november", "december"])}
for _m, _i in list(_MONTHS.items()):
    _MONTHS[_m[:3]] = _i
_MONTHS.update({"sept": 9, "märz": 3, "mai": 5, "juni": 6, "juli": 7,
                "oktober": 10, "dezember": 12, "januar": 1,
                "februar": 2})


def _norm_year(y: int) -> int:
    """DateParser two-digit year normalization (documented cut: <=35
    maps to 2000s, else 1900s)."""
    if y >= 100:
        return y
    return 2000 + y if y <= 35 else 1900 + y


class DateParts(NamedTuple):
    year: int
    month: int       # -1 when unset
    day: int         # -1 when unset
    hour: int        # -1 when unset
    minute: int
    second: int


def parse_parts(value: str, fmt: str) -> DateParts | None:
    """(matched string, format key) → calendar components. Field ORDER
    comes from the format key (DD before MM etc.); values are read
    generically (month names via the name map, numbers positionally).
    Feature-grade parsing — it feeds age ordering, exactness and the
    hour-set flags, not a calendar library."""
    v = value.strip()
    tm = re.search(r"(\d{1,2}):(\d{2})(?::(\d{2}))?", v)
    hour = minute = second = -1
    if tm and ("HH" in fmt or "TIME" in fmt):
        hour, minute = int(tm.group(1)), int(tm.group(2))
        second = int(tm.group(3)) if tm.group(3) else 0
        v = v[:tm.start()] + " " + v[tm.end():]
    month = -1
    mname = re.search(r"[A-Za-zäöü]{3,}\.?", v)
    while mname is not None:
        key = mname.group().rstrip(".").lower()
        if key in _MONTHS:
            month = _MONTHS[key]
            v = v[:mname.start()] + " " + v[mname.end():]
            break
        v2 = v[:mname.start()] + " " * (mname.end() - mname.start()) \
            + v[mname.end():]
        mname = re.search(r"[A-Za-zäöü]{3,}\.?", v2)
        v = v2 if mname is None else v
        if mname is None:
            break
    if fmt == "YYYYMMDD":
        m = re.search(r"(\d{4})(\d{2})(\d{2})", value)
        if not m:
            return None
        return DateParts(int(m.group(1)), int(m.group(2)),
                         int(m.group(3)), hour, minute, second)
    nums = [int(n) for n in re.findall(r"\d+", v)]
    # drop obvious UTC-offset remnants (a trailing small pair after a
    # +/-) — the time regex already consumed HH:MM so offsets appear
    # only in with-offset ISO strings
    if not nums:
        return None
    year = day = -1
    if fmt.startswith("YYYY"):
        year = _norm_year(nums[0])
        rest = nums[1:]
        if month == -1 and rest:
            month = rest[0]
            rest = rest[1:]
        if rest:
            day = rest[0]
    elif fmt.startswith("MM/DD") or fmt.startswith("MMMM") \
            or fmt.startswith("WD"):
        rest = nums
        if month == -1 and rest:
            month = rest[0]
            rest = rest[1:]
        if "YYYY" in fmt and len(rest) >= 2:
            day, year = rest[0], _norm_year(rest[1])
        elif "DD" in fmt and rest:
            day = rest[0]
        elif rest:
            year = _norm_year(rest[0])
    else:  # DD-first families
        rest = nums
        if rest:
            day = rest[0]
            rest = rest[1:]
        if month == -1 and rest:
            month = rest[0]
            rest = rest[1:]
        if "YYYY" in fmt and rest:
            year = _norm_year(rest[0])
    if fmt == "MM/DD":
        day = month if day == -1 else day
    if year == -1 and "YYYY" not in fmt and fmt not in ("MM/DD", "DD.MM.",
                                                        "MMMM DD",
                                                        "DD.MMMM"):
        return None
    return DateParts(year, month, day, hour, minute, second)


def exactness(p: DateParts) -> int:
    """DateExactness value chain (DateExactness.java:21-33)."""
    if p.year == -1:
        return 0
    if p.month == -1:
        return 1
    if p.day == -1:
        return 2
    if p.hour == -1:
        return 3
    if p.minute == -1:
        return 4
    return 6 if p.second != -1 else 5


def _age_key(p: DateParts) -> tuple:
    """Sort key: newest first (DateComparator, unset fields last)."""
    return tuple(-(x if x != -1 else -9999)
                 for x in (p.year, p.month, p.day, p.hour, p.minute,
                           p.second))


def _same_day(a: DateParts, b: DateParts) -> bool:
    return (a.year, a.month, a.day) == (b.year, b.month, b.day) \
        and a.year != -1 and a.month != -1 and a.day != -1


def _hours_between(a: DateParts, b: DateParts) -> int:
    def h(p: DateParts) -> int:
        return (((p.year if p.year != -1 else 0) * 8760)
                + ((p.month if p.month != -1 else 1) - 1) * 730
                + ((p.day if p.day != -1 else 1) - 1) * 24
                + (p.hour if p.hour != -1 else 0))
    return abs(h(a) - h(b))


# -------------------------------------------------- node-level logic


def _serialize(node: Node) -> str:
    """HtmlHelper.xmlToString stand-in: tag, attributes, inner text."""
    attrs = " ".join(f'{k}="{v}"' for k, v in node.attrs.items())
    return f"<{node.tag} {attrs}>{node.text_content()}</{node.tag}>"


def structure_date(node: Node) -> str | None:
    """StructureDateGetter.getDate (:92-131) essentials: a date inside
    any non-href attribute value."""
    for name, val in node.attrs.items():
        if name.lower() == "href" or not val:
            continue
        if find_dates(str(val)):
            return str(val)
    return None


def find_content_keywords(text: str) -> dict[int, str]:
    """ContentDateGetter.findContentKeywords (:231-243): keyword start
    indices over the lowercased text, each hit masked with 'x' so
    overlapping later keywords can't re-match."""
    out: dict[int, str] = {}
    temp = text.lower()
    for keyword in BODY_CONTENT_KEYWORDS_ALL:
        idx = temp.find(keyword)
        while idx != -1:
            out[idx] = keyword
            temp = temp[:idx] + "x" * len(keyword) \
                + temp[idx + len(keyword):]
            idx = temp.find(keyword)
    return out


CANDIDATE_FIELDS = [
    "value", "fmt", "year", "month", "day", "hour",
    "abs_pos", "rel_doc_pos", "ord_doc_pos", "ord_age_pos",
    "keyword", "key_class", "key_loc", "key_diff",
    "tag_name", "simple_tag", "h_tag", "has_structure_date",
    "in_meta", "in_url", "rel_cnt_same", "rel_size",
    "dist_pos_before", "dist_pos_after", "dist_age_before",
    "dist_age_after", "exactness",
]


def content_date_candidates(root: Node, url: str = "") -> list[dict]:
    """ContentDateGetter.getDates for one parsed page: candidates from
    body text nodes with the full rating feature set."""
    body = next((n for n in root.iter() if n.tag == "body"), root)
    doc_string = _WS_RUN.sub(
        " ", replace_html_symbols(document_to_readable_text(body)))
    content_keywords = find_content_keywords(doc_string)

    cands: list[dict] = []
    stack: list[tuple[Node, Node | None]] = [(body, None)]
    order: list[tuple[Node, Node | None]] = []
    while stack:
        cur, par = stack.pop()
        order.append((cur, par))
        for c in reversed(cur.children):
            stack.append((c, cur))
    for cur, par in order:
        if cur.tag != "#text" or par is None:
            continue
        if par.tag in ("script", "style", "#comment"):
            continue
        text = replace_html_symbols(cur.data)
        dates = find_all_dates(text)
        if not dates:
            continue
        index = doc_string.find(text)
        # the parent chain is not stored on Node; the immediate parent
        # is both the tagName feature and the keyword/structure scope
        # (exactly the reference's `tag`; the simple-element climb only
        # widens the keyword fallback, which _closest_keyword covers)
        tag = par
        has_struct = structure_date(tag) is not None
        keyword = search_keyword(_serialize(tag),
                                 BODY_CONTENT_KEYWORDS_ALL)
        for d in dates:
            parts = parse_parts(d.value, d.fmt)
            if parts is None:
                continue
            abs_pos = index + d.start if index != -1 else -1
            c = dict.fromkeys(CANDIDATE_FIELDS)
            c.update(value=d.value, fmt=d.fmt, year=parts.year,
                     month=parts.month, day=parts.day, hour=parts.hour,
                     abs_pos=abs_pos,
                     rel_doc_pos=(round(abs_pos / len(doc_string), 3)
                                  if abs_pos != -1 and doc_string
                                  else 0.0),
                     keyword=None, key_class=0, key_loc=0, key_diff=0.0,
                     tag_name=tag.tag.upper(),
                     simple_tag=tag.tag in SIMPLE_ELEMENTS,
                     h_tag=tag.tag in HEADLINE_TAGS,
                     has_structure_date=has_struct,
                     dist_pos_before=-1, dist_pos_after=-1,
                     dist_age_before=-1, dist_age_after=-1,
                     exactness=exactness(parts), _parts=parts)
            kw = keyword
            key_loc = 1 if kw is not None else 0
            third = kw is not None and \
                keyword_priority(kw) == OTHER_KEYWORD
            if kw is None or third:
                ck, diff = _closest_keyword(abs_pos, d.value,
                                            doc_string,
                                            content_keywords)
                if ck is not None:
                    kw, key_loc = ck, 2
                    c["key_diff"] = diff
            if kw is not None:
                c["keyword"] = kw
                c["key_class"] = max(0, keyword_priority(kw))
                c["key_loc"] = key_loc
            cands.append(c)

    if not cands:
        return []

    # ---- setFeatures (:56-110) over the full candidate list
    # (index by id(): dicts compare by VALUE, and two syntactically
    # identical candidates must keep their own list positions)
    pos_order = sorted([c for c in cands if c["abs_pos"] != -1],
                       key=lambda c: c["abs_pos"])
    age_order = sorted(cands, key=lambda c: _age_key(c["_parts"]))
    pos_idx = {id(c): i for i, c in enumerate(pos_order)}
    age_idx = {id(c): i for i, c in enumerate(age_order)}
    metas = [m for m in meta_dates(root)]
    meta_parts = [p for p in (parse_parts(m.value, m.fmt)
                              for m in metas) if p]
    url_parts = [p for p in (parse_parts(u.value, u.fmt)
                             for u in url_dates(url)) if p]
    n = len(cands)
    for c in cands:
        p = c["_parts"]
        c["rel_size"] = round(1.0 / n, 3)
        c["ord_doc_pos"] = (round((pos_idx[id(c)] + 1) /
                                  len(pos_order), 3)
                            if id(c) in pos_idx else 0.0)
        c["ord_age_pos"] = round((age_idx[id(c)] + 1) / n, 3)
        c["in_meta"] = any(_same_day(p, mp) for mp in meta_parts)
        c["in_url"] = any(_same_day(p, up) for up in url_parts)
        same = sum(1 for o in cands
                   if o is not c and _same_day(p, o["_parts"]))
        c["rel_cnt_same"] = round((same + 1) / n, 3)
        if id(c) in pos_idx:
            i = pos_idx[id(c)]
            if i > 0:
                c["dist_pos_before"] = (c["abs_pos"]
                                        - pos_order[i - 1]["abs_pos"])
            if i < len(pos_order) - 1:
                c["dist_pos_after"] = (pos_order[i + 1]["abs_pos"]
                                       - c["abs_pos"])
        j = age_idx[id(c)]
        if j > 0:
            c["dist_age_before"] = _hours_between(
                p, age_order[j - 1]["_parts"])
        if j < n - 1:
            c["dist_age_after"] = _hours_between(
                p, age_order[j + 1]["_parts"])
    for c in cands:   # second pass: every cross-candidate read is done
        del c["_parts"]
    return cands


def _closest_keyword(date_pos: int, date_string: str, doc_string: str,
                     content_keywords: dict[int, str]
                     ) -> tuple[str | None, float]:
    """ContentDateGetter.setClosestKeyword (:255-296): scan ±150 chars
    for a keyword START index; keyDiff = 1 - whitespace-count/30 over
    the gap (0 when the gap has ≥30 whitespaces)."""
    if date_pos < 0:
        return None, 0.0
    for i in range(1, 151):
        kb = content_keywords.get(date_pos - i)
        if kb is not None:
            sub = doc_string[date_pos - i + len(kb):date_pos]
            return kb, _key_diff(sub)
        ka = content_keywords.get(date_pos + i)
        if ka is not None:
            sub = doc_string[date_pos + len(date_string):date_pos + i]
            return ka, _key_diff(sub)
    return None, 0.0


def _key_diff(gap: str) -> float:
    ws = sum(1 for ch in gap if ch == " ")
    if ws >= 30:
        return 0.0
    return 1 - round(ws / 30.0, 3)


# --------------------------------------------------- Spark surfaces

_SCHEMA = T.StructType(
    [T.StructField("url", T.StringType())]
    + [T.StructField(f, T.StringType()) if f in ("value", "fmt",
                                                 "keyword", "tag_name")
       else T.StructField(f, T.BooleanType()) if f in (
           "simple_tag", "h_tag", "has_structure_date", "in_meta",
           "in_url")
       else T.StructField(f, T.DoubleType()) if f in (
           "rel_doc_pos", "ord_doc_pos", "ord_age_pos", "key_diff",
           "rel_cnt_same", "rel_size")
       else T.StructField(f, T.IntegerType())
       for f in CANDIDATE_FIELDS])


def content_dates_stage(pages: DataFrame, html_col: str = "html",
                        url_col: str = "url") -> DataFrame:
    """pages(url, html) → one row per content-date candidate with the
    full DateInstanceFactory feature set. One Arrow pass, no shuffle."""
    cols = [url_col, html_col]

    def gen(batches):
        for pdf in batches:
            rows = []
            for url, page_html in zip(pdf[url_col], pdf[html_col]):
                raw = (bytes(page_html)
                       if isinstance(page_html, (bytes, bytearray))
                       else str(page_html))
                try:
                    root = parse_html(raw)
                except Exception:
                    continue
                for c in content_date_candidates(root, url or ""):
                    rows.append({"url": url, **c})
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SCHEMA.fields])

    return pages.select(*cols).mapInPandas(gen, _SCHEMA)


def rate_content_dates(cands: DataFrame,
                       page_type: str = "publish") -> DataFrame:
    """ContentDateRater.rate, model-free default: the publish+inUrl
    rule is exact (ContentDateRater.java:90-91 → rate 1.0); the forest
    score is substituted by a deterministic keyword/position heuristic
    over the same features (documented stand-in for the bundled
    QuickDt model). Pure column expressions."""
    base = (F.when(F.col("key_class") == PUBLISH_KEYWORD, F.lit(0.9))
            .when(F.col("key_class") == OTHER_KEYWORD, F.lit(0.5))
            .otherwise(F.lit(0.3)))
    loc = (F.when(F.col("key_loc") == 1, F.lit(1.0))
           .when(F.col("key_loc") == 2,
                 0.5 + 0.5 * F.col("key_diff"))
           .otherwise(F.lit(0.7)))
    heur = F.round(base * loc
                   * (1.0 - 0.2 * F.col("rel_doc_pos"))
                   * F.when(F.col("in_meta"), 1.2).otherwise(1.0), 4)
    rate = (F.when(F.col("in_url") & F.lit(page_type == "publish"),
                   F.lit(1.0))
            .otherwise(F.least(heur, F.lit(0.999))))
    return cands.withColumn("rate", rate)


def best_content_dates(rated: DataFrame) -> DataFrame:
    """One best candidate per url — RatedDateComparator order: rate
    desc, document position asc, newest first (age), then value for a
    total deterministic order."""
    from pyspark.sql import Window
    w = Window.partitionBy("url").orderBy(
        F.desc("rate"), F.asc("abs_pos"),
        F.desc("year"), F.desc("month"), F.desc("day"), F.desc("hour"),
        F.asc("value"))
    return (rated.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def train_content_date_rater(cands: DataFrame, label_col: str = "label",
                             num_trees: int = 10, seed: int = 13):
    """QuickDtLearner.randomForest(10) counterpart: a pyspark.ml
    RandomForest over the DateInstanceFactory numeric features, for
    users with labeled candidates (the reference's dates_pub.csv
    shape). Returns a fitted PipelineModel whose transform adds a
    `rate` = P(label=1) column."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    numeric = ["hour", "rel_doc_pos", "ord_doc_pos", "ord_age_pos",
               "key_class", "key_loc", "key_diff", "rel_cnt_same",
               "rel_size", "dist_pos_before", "dist_pos_after",
               "dist_age_before", "exactness"]
    flags = ["simple_tag", "h_tag", "has_structure_date", "in_meta",
             "in_url"]
    df = cands
    for f_ in flags:
        df = df.withColumn(f_ + "_d", F.col(f_).cast("double"))
    df = df.withColumn("hour_set",
                       (F.col("hour") >= 0).cast("double"))
    feats = ([c for c in numeric if c != "hour"] + ["hour_set"]
             + [f_ + "_d" for f_ in flags])
    asm = VectorAssembler(inputCols=feats, outputCol="_fv",
                          handleInvalid="keep")
    rf = RandomForestClassifier(featuresCol="_fv", labelCol=label_col,
                                numTrees=num_trees, seed=seed)
    return Pipeline(stages=[asm, rf]).fit(df), feats


RATER_FEATURES = [
    "key_class", "key_loc", "key_diff", "rel_doc_pos", "ord_doc_pos",
    "ord_age_pos", "rel_cnt_same", "rel_size", "exactness", "hour_set",
    "in_meta_d", "h_tag_d", "struct_d",
]


def synth_rater_training(n: int = 600) -> list[tuple[dict, str]]:
    """Deterministic labeled candidate vectors over the
    DateInstanceFactory feature set (DateInstanceFactory.java:26-92)
    — closed-form arithmetic (no RNG) so the gate oracle regenerates
    the exact same forest. The label rule mirrors what the
    reference's bundled dates_pub model rewards: PUBLISH-class
    keywords found structurally, early document position, same-day
    agreement and meta confirmation."""
    rows: list[tuple[dict, str]] = []
    for i in range(n):
        key_class = float((0, 1, 3)[i % 3])
        key_loc = float((i // 3) % 3)
        key_diff = ((i * 11) % 31) / 30.0 if key_loc == 2 else 0.0
        rel_doc_pos = ((i * 17) % 100) / 100.0
        ord_doc_pos = ((i * 19) % 100) / 100.0
        ord_age_pos = ((i * 23) % 100) / 100.0
        rel_cnt_same = (((i * 29) % 10) + 1) / 10.0
        rel_size = 1.0 / (1 + i % 8)
        exactness = float((i * 13) % 7)
        hour_set = 1.0 if exactness >= 4 else 0.0
        in_meta = 1.0 if i % 5 == 0 else 0.0
        h_tag = 1.0 if i % 9 == 0 else 0.0
        struct = 1.0 if i % 4 == 1 else 0.0
        score = ((2.0 if key_class == 1 else 0.5 if key_class == 3
                  else 0.0)
                 + (1.0 if key_loc == 1 else key_diff
                    if key_loc == 2 else 0.0)
                 + 0.8 * rel_cnt_same - rel_doc_pos + 0.6 * in_meta
                 + 0.3 * struct - 0.4 * h_tag + 0.1 * exactness)
        rows.append(({"key_class": key_class, "key_loc": key_loc,
                      "key_diff": key_diff, "rel_doc_pos": rel_doc_pos,
                      "ord_doc_pos": ord_doc_pos,
                      "ord_age_pos": ord_age_pos,
                      "rel_cnt_same": rel_cnt_same,
                      "rel_size": rel_size, "exactness": exactness,
                      "hour_set": hour_set, "in_meta_d": in_meta,
                      "h_tag_d": h_tag, "struct_d": struct},
                     "pos" if score > 1.6 else "neg"))
    return rows


_GATE_FOREST = None


def gate_rater_forest():
    """The fixed ContentDateRater forest the gate scores with —
    kgp.dtree.train_forest (the quickdt port) over the deterministic
    training set; this mirrors the reference's bundled QuickDt forest
    (ContentDateRater.java:60-68 loads dates_pub_model.gz, a
    serialized quickdt RandomForest) more faithfully than the
    pyspark.ml substitute. Cached per process; fully deterministic."""
    global _GATE_FOREST
    if _GATE_FOREST is None:
        from kgp.dtree import train_forest
        _GATE_FOREST = train_forest(synth_rater_training(),
                                    num_trees=10, seed=13)
    return _GATE_FOREST


def rate_with_forest(cands: DataFrame, forest=None) -> DataFrame:
    """ContentDateRater.rate with a quickdt forest: rate = P(pos)
    compiled into one nested CASE WHEN column (whole-stage-codegen,
    model inlined into the plan — no broadcast, no Python); the
    publish+inUrl override stays exact (ContentDateRater.java:90-91).
    Expects the RATER_FEATURES columns (derive the _d flags from the
    boolean candidate columns first when rating content_dates_stage
    output)."""
    from kgp.dtree import tree_column
    forest = forest or gate_rater_forest()
    p_pos = tree_column(forest, "pos")
    rate = (F.when(F.col("in_url_d") > 0, F.lit(1.0))
            .otherwise(F.round(p_pos, 9) + F.lit(0.0)))
    return cands.withColumn("rate", rate)


def apply_trained_rater(cands: DataFrame, model) -> DataFrame:
    """Score candidates with a trained forest: rate = P(1); the
    publish+inUrl override stays exact like the reference."""
    from pyspark.ml.functions import vector_to_array
    df = cands
    for f_ in ["simple_tag", "h_tag", "has_structure_date", "in_meta",
               "in_url"]:
        df = df.withColumn(f_ + "_d", F.col(f_).cast("double"))
    df = df.withColumn("hour_set", (F.col("hour") >= 0).cast("double"))
    scored = model.transform(df)
    rate = (F.when(F.col("in_url"), F.lit(1.0))
            .otherwise(F.round(
                F.element_at(vector_to_array("probability"), 2), 4)))
    keep = [c for c in cands.columns]
    return scored.select(*keep, rate.alias("rate"))
