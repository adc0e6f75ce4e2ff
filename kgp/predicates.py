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
    "mice": "mouse", "geese": "goose",
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


# ------------------------------------- generative word transforms
# The inverse directions of WordTransformer, used when GENERATING
# surface variants for relation patterns (one canonical predicate ->
# every phrasing to match). Pure functions; the reference keys its
# irregular-verb lookups by the Snowball stem (stemEnglishWord) — the
# compact Porter port (kgp.textclassifier.porter_stem) stands in, with
# a raw-form lookup first so common forms never depend on stemmer
# agreement.

# (present, simple past, past participle) — used subset of
# EnglishVerb/irregularVerbs.csv
IRREGULAR_VERB_FORMS: dict[str, tuple[str, str]] = {
    "be": ("was", "been"), "have": ("had", "had"),
    "go": ("went", "gone"), "run": ("ran", "run"),
    "hold": ("held", "held"), "lead": ("led", "led"),
    "make": ("made", "made"), "build": ("built", "built"),
    "buy": ("bought", "bought"), "sell": ("sold", "sold"),
    "grow": ("grew", "grown"), "become": ("became", "become"),
    "begin": ("began", "begun"), "write": ("wrote", "written"),
    "take": ("took", "taken"), "give": ("gave", "given"),
}

_MODALS = {"can", "could", "will", "would", "may", "might", "shall",
           "should", "must"}


def word_to_plural(singular: str) -> str:
    """wordToPluralEnglishCaseSensitive port (WordTransformer.java:
    414-489): composite terms pluralize the LAST word; irregular map;
    vowel+y -> +s; consonant+y -> -ies; -is -> -es; s/z/x/ch/sh ->
    +es; default +s. Words under 3 chars pass through."""
    if not singular:
        return ""
    s = singular.lower()
    prefix = ""
    parts = s.split(" ")
    if len(parts) > 1:
        s = parts[-1]
        prefix = " ".join(parts[:-1]) + " "
    inv_nouns = {v: k for k, v in sorted(IRREGULAR_NOUNS.items())}
    if s in inv_nouns:
        return prefix + inv_nouns[s]
    if len(s) < 3:
        return prefix + s
    last, last2 = s[-1], s[-2:]
    if last2 in ("ay", "ey", "iy", "oy", "uy"):
        return prefix + s + "s"
    if last == "y":
        return prefix + s[:-1] + "ies"
    if last2 == "is":
        return prefix + s[:-2] + "es"
    if last in "szx" or last2 in ("ch", "sh"):
        return prefix + s + "es"
    return prefix + s + "s"


def _lookup_irregular(verb: str) -> str | None:
    """Present form of an irregular verb, by raw form then stem
    (stemEnglishWord lookup at WordTransformer.java:635-636)."""
    from kgp.stemmer import stem_english_word
    if verb in IRREGULAR_VERBS:
        return IRREGULAR_VERBS[verb]
    if verb in IRREGULAR_VERB_FORMS:
        return verb
    stem = stem_english_word(verb)
    if stem in IRREGULAR_VERB_FORMS:
        return stem
    return None


def third_person_singular(verb: str) -> str:
    """getThirdPersonSingular port (WordTransformer.java:608-671):
    be/was/been/have specials, modals stay, past forms of irregular
    verbs stay, regular -ed stays, then the es/ies suffix rules
    (incl. the vowel+s/z letter-doubling branch)."""
    if not verb:
        return verb
    v = verb.lower()
    if v == "be":
        return "is"
    if v in ("was", "been"):
        return v
    if v == "have":
        return "has"
    if v in _MODALS:
        return v
    present = _lookup_irregular(v)
    if present is not None:
        past, part = IRREGULAR_VERB_FORMS.get(present, ("", ""))
        if v in (past, part):
            return v
        v = present
    elif v.endswith("ed"):
        return v
    if len(v) >= 2:
        before = v[-2]
        if v.endswith(("ch", "sh", "x", "o")):
            return v + "es"
        if before not in _VOWELS and v[-1] in "sz":
            return v + "es"
        if before in _VOWELS and v[-1] in "sz":
            return v + v[-1] + "es"
        if before not in _VOWELS and v.endswith("y"):
            return v[:-1] + "ies"
    return v + "s"


def _regular_verb_past(verb: str) -> str:
    """getRegularVerbPast port (WordTransformer.java:706-729) incl.
    the qui/qua/quo/quu final-consonant-doubling quirk."""
    if not verb:
        return verb
    v = verb.lower()
    if v.endswith("ed"):
        return v
    if v.endswith("e"):
        return v + "d"
    if v.endswith("y"):
        return v[:-1] + "ied"
    if any(q in v for q in ("qui", "qua", "quo", "quu")):
        return v + v[-1] + "ed"
    return v + "ed"


def simple_past(verb: str) -> str:
    """getSimplePast port (:694-704): irregular past, else regular."""
    if not verb:
        return verb
    present = _lookup_irregular(verb.lower())
    if present is not None:
        return IRREGULAR_VERB_FORMS[present][0]
    return _regular_verb_past(verb)


def past_participle(verb: str) -> str:
    """getPastParticiple port (:731-745): irregular participle, else
    the regular past of the STEMMED word (the reference quirk —
    participles of regular verbs are built on the Snowball stem)."""
    from kgp.stemmer import stem_english_word
    if not verb:
        return verb
    present = _lookup_irregular(verb.lower())
    if present is not None:
        return IRREGULAR_VERB_FORMS[present][1]
    return _regular_verb_past(stem_english_word(verb.lower()))


def predicate_variants(pred: str) -> list[str]:
    """Every surface phrasing of a snake_cased predicate the pattern
    bank should match: the name itself plus third-person / past /
    participle forms of the leading verb. Deterministic order, no
    duplicates — feeds kgp.relations pattern generation."""
    toks = pred.split("_")
    head, tail = toks[0], toks[1:]
    forms = [head, third_person_singular(head), simple_past(head),
             past_participle(head)]
    out, seen = [], set()
    for f in forms:
        name = "_".join([f] + tail)
        if name not in seen:
            seen.add(name)
            out.append(name)
    return out


# ------------------------------------------------- tense detection

# EnglishTense.java values
SIMPLE_PRESENT = "SIMPLE_PRESENT"
SIMPLE_PAST = "SIMPLE_PAST"
PRESENT_PERFECT = "PRESENT_PERFECT"
PAST_PERFECT = "PAST_PERFECT"


def get_tense(text: str, tags: list[str]) -> str:
    """getTense port (WordTransformer.java:760-806): signal-word
    checks (do/does -> present, did -> past) first, then the POS-tag
    rules over the sentence's tag set — VBD without is/are -> past,
    HVD+VBN/HVN -> past perfect, HV+VBN/HVN -> present perfect, VBN
    without is/are -> present perfect, was/were fallback -> past.
    Tags come from the Brown-tagged kgp.postag output."""
    from kgp.rules import contains_word
    if not text:
        return SIMPLE_PRESENT
    text = text.lower()
    if contains_word(["do", "don't", "does", "doesn't"], text):
        return SIMPLE_PRESENT
    if contains_word(["did", "didn't"], text):
        return SIMPLE_PAST
    is_are = contains_word(["is", "are"], text)
    was_were = contains_word(["was", "were"], text)
    pos = set(tags)
    if "VBD" in pos and not is_are:
        return SIMPLE_PAST
    if "HVD" in pos and ("VBN" in pos or "HVN" in pos):
        return PAST_PERFECT
    if "HV" in pos and ("VBN" in pos or "HVN" in pos):
        return PRESENT_PERFECT
    if "VBN" in pos and not is_are:
        return PRESENT_PERFECT
    if was_were:
        return SIMPLE_PAST
    return SIMPLE_PRESENT
