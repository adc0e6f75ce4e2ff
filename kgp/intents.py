"""Search-intent parsing: a rule engine that maps free-text queries to
structured actions (filters / sorts / rewrites / redirects).

Reference: palladian-retrieval ws.palladian.retrieval.search.intents.
SearchIntentParser.java:148-256 — four trigger passes in strict
priority order (MATCH exact-equality, PHRASE_MATCH word-boundary,
CONTAINS substring, REGEX case-insensitive find), restarting from the
first pass with the modified query after every activation, bounded by
the reference's ``numTries++ < 10`` post-increment (max 11
activations); ``processMatch`` (:258-356):

- REWRITE: regex triggers run Java ``matcher.replaceAll(rewrite)``
  over the WHOLE query and lower-case the result (:264-266); plain
  triggers do a literal ``String.replace``; the rewrite becomes the
  modified query (trimmed by ActivatedSearchIntentAction:29).
- REDIRECT: regex triggers wrap the pattern in ``.*...*`` first
  (SearchIntentParser.java:219-221) so the replacement consumes the
  entire query; parsing stops at the first redirect (:172 etc.).
- DEFINITION: filter min/max come from a ``$N`` capture-group
  reference or a literal (:276-299); regex-matched ``values`` carrying
  ``$N`` become a ±margin (default 0.05) numeric band when the group
  is numeric, else a string substitution (:301-337; the UnitNormalizer
  branch is out of scope — no unit tables in this container);
  ``removeTrigger`` (default true, SearchIntentAction.java:14) scrubs
  ``[^ ]*<trigger>[^ ]*`` — the matched group Pattern.quote'd for
  regex triggers, the RAW trigger text otherwise, faithfully unquoted
  like the reference (:339-346).

PHRASE_MATCH uses StringHelper.containsWordCaseSensitive
(palladian-commons StringHelper.java:472-515): every occurrence is
checked for non-letter/digit borders on both sides.

Spark-first design: the intent bank is a tiny broadcast list; the
cascade runs as ONE Arrow-batched mapInPandas stage over the query
table (inherently imperative per-row logic — the sanctioned UDF case);
query synthesis for tests/gates is pure column expressions over the
events table so the DuckDB oracle can derive every expected action
symbolically.
"""

from __future__ import annotations

import regex as re   # Java-regex parity: variable-width lookbehind
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUM_RE = re.compile(r"^[+-]?\d+(\.\d+)?$")
_GROUP_REF_RE = re.compile(r"\$(\d+)")


def _contains_word_cs(word: str, text: str) -> bool:
    """StringHelper.containsWordCaseSensitive:472-515 — every
    occurrence checked for non-alnum borders."""
    if not word:
        return False
    start = 0
    while True:
        idx = text.find(word, start)
        if idx == -1:
            return False
        left_ok = idx == 0 or not text[idx - 1].isalnum()
        end = idx + len(word)
        right_ok = end == len(text) or not text[end].isalnum()
        if left_ok and right_ok:
            return True
        start = idx + 1


def _java_repl(template: str) -> str:
    """Java replaceAll templates use $N group refs; translate to
    Python's backreference syntax."""
    return _GROUP_REF_RE.sub(r"\\\g<1>", template)


def _fill_number(defn) -> float | None:
    if defn is None or defn == "":
        return None
    try:
        return float(defn)
    except (TypeError, ValueError):
        return None


def _process_match(qmt: str, intent: dict, query: str, match,
                   trigger: dict) -> dict:
    """processMatch (SearchIntentParser.java:258-356) over plain
    dicts; returns the activated action."""
    action = intent["action"]
    out: dict[str, Any] = {
        "type": action.get("type", "DEFINITION"),
        "trigger_type": qmt,
        "trigger_text": trigger["text"],
        "rewrite": action.get("rewrite"),
        "redirect": action.get("redirect"),
        "filters": [],
        "sorts": list(action.get("sorts", [])),
        "modified_query": query.strip(),
    }
    if out["type"] == "REWRITE":
        if qmt == "REGEX":
            rewritten = re.sub(trigger["_pat"].pattern,
                               _java_repl(action["rewrite"]), query,
                               flags=trigger["_pat"].flags).lower()
        else:
            rewritten = query.replace(trigger["text"], action["rewrite"])
        out["rewrite"] = rewritten
        out["modified_query"] = rewritten.strip()
        return out
    if out["type"] == "REDIRECT":
        redirect = action["redirect"]
        if qmt == "REGEX":
            redirect = re.sub(trigger["_pat"].pattern,
                              _java_repl(redirect), query,
                              flags=trigger["_pat"].flags)
        out["redirect"] = redirect
        return out
    # DEFINITION
    for filt in action.get("filters", []):
        filled = {"key": filt.get("key"), "min": None, "max": None,
                  "values": list(filt.get("values", []))}
        for bound in ("min", "max"):
            defn = filt.get(bound)
            if defn is None:
                continue
            s = str(defn)
            if "$" in s:
                filled[bound] = float(match.group(int(s.replace("$", ""))))
            else:
                filled[bound] = _fill_number(s)
        if qmt == "REGEX":
            replaced = []
            for value in filled["values"]:
                if "$" in value:
                    pos = int(_GROUP_REF_RE.search(value).group(1))
                    group = match.group(pos)
                    if group is not None and _NUM_RE.match(group):
                        num = float(group)
                        margin = filt.get("margin")
                        if margin is None:
                            margin = 0.05
                        unit = filt.get("unit")
                        if unit is not None and "$" in unit:
                            # SearchIntentParser.java:315-325: unit
                            # group -> UnitTranslator.translate ->
                            # UnitNormalizer.getNormalizedNumber
                            from kgp.units import (get_normalized_number,
                                                   translate_unit)
                            upos = int(unit.replace("$", ""))
                            ugroup = match.group(upos)
                            if ugroup is not None:
                                translated = translate_unit(
                                    ugroup, trigger.get("language", "en"))
                                num = get_normalized_number(
                                    num, translated)
                        filled["min"] = num - num * margin
                        filled["max"] = num + num * margin
                    else:
                        replaced.append(value.replace(f"${pos}", group))
                else:
                    replaced.append(value)
            filled["values"] = replaced
        out["filters"].append(filled)
    if action.get("removeTrigger", True):
        if match is not None:
            scrub = "[^ ]*" + re.escape(match.group()) + "[^ ]*"
        else:
            # reference quirk: the raw trigger text is interpolated
            # into the regex UNQUOTED (SearchIntentParser.java:340)
            scrub = "[^ ]*" + trigger["text"] + "[^ ]*"
        out["modified_query"] = re.sub(scrub, "", query).strip()
    return out


def _compile_bank(intents: list[dict]) -> list[dict]:
    """Pre-compile REGEX trigger patterns (PatternHelper.compileOrGet
    with CASE_INSENSITIVE; redirect intents wrap in .*...* —
    SearchIntentParser.java:217-226)."""
    bank = []
    for intent in intents:
        it = {"action": dict(intent["action"]), "triggers": []}
        for trig in intent["triggers"]:
            t = dict(trig)
            if t["type"] == "REGEX":
                pat = t["text"]
                if it["action"].get("redirect") is not None:
                    pat = ".*" + pat + ".*"
                t["_pat"] = re.compile(pat, re.IGNORECASE)
            it["triggers"].append(t)
        bank.append(it)
    return bank


_PASSES = ("MATCH", "PHRASE_MATCH", "CONTAINS", "REGEX")


def parse_intents(query: str, bank: list[dict]) -> list[dict]:
    """SearchIntentParser.parse:148-256 — pass-priority cascade,
    restart on every activation, stop on redirect, max 11 rounds."""
    actions: list[dict] = []
    tries = 0
    while True:
        activated = None
        for qmt in _PASSES:
            for intent in bank:
                for trig in intent["triggers"]:
                    if trig["type"] != qmt:
                        continue
                    match = None
                    if qmt == "MATCH":
                        hit = trig["text"] == query
                    elif qmt == "PHRASE_MATCH":
                        hit = _contains_word_cs(trig["text"], query)
                    elif qmt == "CONTAINS":
                        hit = trig["text"] in query
                    else:
                        match = trig["_pat"].search(query)
                        hit = match is not None
                    if hit:
                        activated = _process_match(
                            qmt, intent, query, match, trig)
                        break
                if activated:
                    break
            if activated:
                break
        if activated is None:
            return actions
        actions.append(activated)
        query = activated["modified_query"]
        if activated["redirect"] is not None:
            return actions
        if tries >= 10:
            return actions
        tries += 1


# ----------------------------------------------------------- staging
_ACTION_SCHEMA = T.StructType([
    T.StructField("qid", T.LongType()),
    T.StructField("query", T.StringType()),
    T.StructField("action_idx", T.IntegerType()),
    T.StructField("action_type", T.StringType()),
    T.StructField("trigger_type", T.StringType()),
    T.StructField("trigger_text", T.StringType()),
    T.StructField("modified_query", T.StringType()),
    T.StructField("rewrite", T.StringType()),
    T.StructField("redirect", T.StringType()),
    T.StructField("filter_key", T.StringType()),
    T.StructField("filter_min", T.DoubleType()),
    T.StructField("filter_max", T.DoubleType()),
    T.StructField("filter_values", T.ArrayType(T.StringType())),
    T.StructField("sort_key", T.StringType()),
    T.StructField("sort_dir", T.StringType()),
])


def intent_stage(queries: DataFrame, intents: list[dict],
                 qid_col: str = "qid",
                 query_col: str = "query") -> DataFrame:
    """Run the intent cascade over a query table: ONE Arrow-batched
    mapInPandas pass against the broadcast-small intent bank; one
    output row per (activated action x filter), actions without
    filters emit a single null-filter row."""
    src = queries.select(F.col(qid_col).alias("qid"),
                         F.col(query_col).alias("query"))

    def run(batches):
        import pandas as pd
        bank = _compile_bank(intents)
        cols = [f.name for f in _ACTION_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for qid, q in zip(pdf["qid"], pdf["query"]):
                for i, act in enumerate(parse_intents(q, bank)):
                    sort = act["sorts"][0] if act["sorts"] else {}
                    base = (qid, q, i, act["type"], act["trigger_type"],
                            act["trigger_text"], act["modified_query"],
                            act["rewrite"], act["redirect"])
                    tail = (sort.get("key"), sort.get("direction"))
                    if act["filters"]:
                        for filt in act["filters"]:
                            rows.append(base + (
                                filt["key"], filt["min"], filt["max"],
                                filt["values"]) + tail)
                    else:
                        rows.append(base + (None, None, None, None) + tail)
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, _ACTION_SCHEMA)


# ------------------------------------------------ deterministic bank
DEFAULT_INTENTS: list[dict] = [
    {"triggers": [{"type": "CONTAINS", "text": "cheap"}],
     "action": {"type": "DEFINITION",
                "filters": [{"key": "cost.PRICE", "min": "0",
                             "max": "233"}],
                "sorts": [{"key": "cost.PRICE", "direction": "ASC"}]}},
    {"triggers": [{"type": "REGEX", "text": r"under (\d+) dollars"}],
     "action": {"type": "DEFINITION",
                "filters": [{"key": "cost.PRICE", "min": "0",
                             "max": "$1"}]}},
    {"triggers": [{"type": "MATCH", "text": "best laptop"}],
     "action": {"type": "REWRITE", "rewrite": "laptop premium"}},
    {"triggers": [{"type": "REGEX", "text": r"goto (\w+) page"}],
     "action": {"type": "REDIRECT",
                "redirect": "https://shop.example.com/$1"}},
    {"triggers": [{"type": "PHRASE_MATCH", "text": "deals"}],
     "action": {"type": "DEFINITION",
                "sorts": [{"key": "popularity",
                           "direction": "DESC"}]}},
]


def synth_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query table from events, mirrored symbolically by
    the oracle: variant = event_id % 5 selects which DEFAULT_INTENTS
    rule the query exercises."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = F.col("event_id") % 5
    et = F.col("event_type")
    amount = (F.col("value") * 10).cast("int").cast("string")
    query = (F.when(v == 0, F.concat(F.lit("cheap "), et))
             .when(v == 1, F.concat(F.lit("under "), amount,
                                    F.lit(" dollars "), et))
             .when(v == 2, F.lit("best laptop"))
             .when(v == 3, F.concat(F.lit("goto "), et, F.lit(" page")))
             .otherwise(F.concat(et, F.lit(" deals today"))))
    return events.select(F.col("event_id").alias("qid"),
                         query.alias("query"))
