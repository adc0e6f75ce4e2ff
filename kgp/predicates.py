"""Predicate normalization — the WordTransformer role of SURVEY §2.8.

The reference's WordTransformer
(/root/reference/palladian-core/src/main/java/ws/palladian/semantics/WordTransformer.java,
849 LoC) normalizes word forms (plural→singular :215-276, verb base
form getSimplePresent :672-686). In the KG pipeline that machinery's
job is predicate canonicalization: surface phrasings that mean the
same relation ("based in", "headquartered in") must merge into ONE
predicate before the triple table is materialized, or the graph
fragments by phrasing.

Two layers:
  * PREDICATE_CANON — an explicit variant → canonical map (broadcast
    as a literal column map; zero shuffle, whole-stage codegen);
  * normalize_predicate_name — WordTransformer-style token
    normalization (verb simple-present, noun singular) applied to
    UNMAPPED predicate names (e.g. the induced patterns of
    kgp.relations.induce_patterns: "serves_as_chairman_of" →
    "serve_as_chairman_of"), then re-looked-up in the map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Canonical predicate map. Keys are snake_cased phrasings as produced
# by the pattern bank / induced patterns; values are the pipeline's
# canonical predicates (kgp.constants.PREDICATES).
PREDICATE_CANON: dict[str, str] = {
    "based_in": "headquartered_in",
    "is_based_in": "headquartered_in",
    "headquarters_in": "headquartered_in",
    "has_headquarters_in": "headquartered_in",
    "hq_in": "headquartered_in",
    "chief_executive_officer_of": "ceo_of",
    "chief_executive_of": "ceo_of",
    "serve_as_ceo_of": "ceo_of",
    "founded_by": "founded",
    "established_by": "founded",
    "started_by": "founded",
    "works_at": "works_for",
    "work_for": "works_for",
    "work_at": "works_for",
    "employed_by": "works_for",
    "employee_of": "works_for",
    "born_at": "born_in",
    "capital_city_of": "capital_of",
}

# Irregular verbs (used subset of the reference's irregularVerbs.csv,
# loaded at WordTransformer.java:140-155): past/participle → present.
IRREGULAR_VERBS: dict[str, str] = {
    "was": "be", "were": "be", "been": "be", "is": "be", "are": "be",
    "has": "have", "had": "have",
    "went": "go", "gone": "go",
    "ran": "run", "held": "hold", "led": "lead", "made": "make",
    "built": "build", "bought": "buy", "sold": "sell",
    "grew": "grow", "grown": "grow",
    "became": "become", "begun": "begin", "began": "begin",
    "wrote": "write", "written": "write",
    "took": "take", "taken": "take",
    "gave": "give", "given": "give",
}

# Irregular nouns (subset of irregularNouns.csv): plural → singular.
IRREGULAR_NOUNS: dict[str, str] = {
    "men": "man", "women": "woman", "children": "child",
    "people": "person", "feet": "foot", "teeth": "tooth",
    "companies": "company", "subsidiaries": "subsidiary",
}

_VOWELS = set("aeiou")


def word_to_singular(plural: str) -> str:
    """wordToSingularEnglish port (WordTransformer.java:215-276):
    irregular map, then ices→ix / ies→y / ves→f(e) / -es / -s suffix
    rules; words shorter than 4 chars pass through."""
    if not plural:
        return ""
    if plural in IRREGULAR_NOUNS:
        return IRREGULAR_NOUNS[plural]
    if len(plural) < 4:
        return plural
    low = plural.lower()
    if low.endswith("ices"):
        return plural[:-4] + "ix"
    if low.endswith("ies"):
        return plural[:-3] + "y"
    if low.endswith("ves"):
        before = plural[-3]
        out = plural[:-3] + "f"
        if before not in _VOWELS and out[-2] in _VOWELS:
            out += "e"
        return out
    if low.endswith("es") and len(plural) >= 5:
        two, one = low[-4:-2], low[-3:-2]
        if two in ("ss", "ch", "sh") or one == "x" or two[0] in _VOWELS:
            return plural[:-2]
    if low.endswith("s"):
        return plural[:-1]
    return plural


def verb_simple_present(verb: str) -> str:
    """getSimplePresent port (WordTransformer.java:672-686): irregular
    base form, else strip a trailing -ed, else third-person -s/-es
    undone via word_to_singular-style stripping is deliberately NOT
    applied (the reference leaves 3rd-person forms to
    getThirdPersonSingular's inverse, which predicates don't need)."""
    if not verb:
        return verb
    if verb in IRREGULAR_VERBS:
        return IRREGULAR_VERBS[verb]
    if verb.endswith("ed"):
        return verb[:-2]
    return verb


def normalize_predicate_name(pred: str) -> str:
    """Canonicalize one snake_cased predicate name: direct map hit
    first; else normalize the leading verb token to simple present and
    re-look-up; else return the verb-normalized name."""
    if pred in PREDICATE_CANON:
        return PREDICATE_CANON[pred]
    toks = pred.split("_")
    toks[0] = verb_simple_present(toks[0])
    norm = "_".join(toks)
    return PREDICATE_CANON.get(norm, norm)


def normalize_predicates(triples: DataFrame,
                         mapping: dict[str, str] | None = None,
                         pred_col: str = "pred") -> DataFrame:
    """Rewrite pred through the canonical map as a literal column map —
    no join, no shuffle, stays in whole-stage codegen. Unmapped
    predicates pass through unchanged (the map is the explicit layer;
    induced-pattern names should be pre-normalized with
    normalize_predicate_name when the patterns are built)."""
    m = PREDICATE_CANON if mapping is None else mapping
    if not m:
        return triples
    lit_map = F.create_map(
        *[F.lit(x) for kv in sorted(m.items()) for x in kv])
    return triples.withColumn(
        pred_col,
        F.coalesce(lit_map[F.col(pred_col)], F.col(pred_col)))
