"""Stage 2 — mention detection & typing (NER).

Spark-first decomposition of the reference's PalladianNer
(/root/reference/palladian-core/src/main/java/ws/palladian/extraction/entity/tagger/PalladianNer.java:459-565):

  * model TRAINING = distributed DataFrame aggregations (groupBy counts)
    over the corpus + seed dictionary — the trie the reference builds
    per-JVM becomes `groupBy(term, category).count()` which Catalyst
    executes as partial+final hash aggregation; the (pruned) result is
    collected and broadcast;
  * TAGGING = one vectorized pandas UDF over (url, sentences) batches
    scoring candidates against the broadcast dictionaries.

Ported semantics (file:line cites at each function):
  StringTagger candidate regex, case-dictionary sentence-start removal,
  date-fragment removal, entity-dictionary override with concept
  priority, char-5-padded-gram classification with DefaultScorer
  (score += (termCategoryCount/dictCount)^2, priors when unmatched,
  drop when P(NO_ENTITY) >= 0.5), nested-annotation removal.

The two-pass training trick of PalladianNer.trainEnglish
(:381-438) — re-train with false-positive candidates as NO_ENTITY — is
expressed as: corpus candidates that are not seed surfaces contribute
NO_ENTITY grams to the annotation dictionary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import pandas as pd
import regex
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp import constants as C
from kgp.tokenize import char_ngrams

NO_ENTITY = "NO_ENTITY"

# ---------------------------------------------------------- StringTagger
# port of StringTagger.compilePattern
# (/root/reference/palladian-core/src/main/java/ws/palladian/extraction/entity/StringTagger.java:25-77)
# Branch order matters: Java alternation is first-match, same as `regex`.

_CAMEL = "(GmbH|LLC)"
_SUFFIX = r"((?<=(Inc|Corp|Co|Ave))\.)?"
_BRANCHES = [
    # dashed compounds ("Ontario-based", "St. Louis-based")
    r"([A-Z][a-z]\. )?([A-Z]{1}[A-Za-z\p{Ll}]+(-[a-z\p{Ll}]+)(-[A-Za-z\p{Ll}]+)*)",
    # "A. Anderson"
    r"([A-Z]\.)( )?[A-Z]{1}['’A-Za-z\p{Ll}]{1,100}",
    # "Alexander A. Anderson", "Mayor Bobby E. Horton"
    r"([A-Z][a-z\p{Ll}]+ ){1,2}[A-Z]{1}\. [A-Za-z\p{Ll}]{1,100}",
    # "Dr. Anderson Emeraldy"
    r"([A-Z][a-z\p{Ll}]{0,2}\.) [A-Z]{1}[A-Za-z\p{Ll}]{1,100}( [A-Z]{1}[A-Za-z\p{Ll}]{1,100})?",
    # "A.B.C. Anderson"
    r"([A-Z]\.)+( ([A-Z]{1}([A-Za-z-\p{Ll}0-9&]+))+(([ ])*[A-Z]+([A-Za-z-\p{Ll}0-9]*)){0,10})*",
    # ending with dash ("Real- Rumble")
    r"([A-Z][A-Za-z\p{Ll}]+ )*[A-Z][A-Za-z\p{Ll}]+(?=-+? )",
    # "ex-President"
    r"([A-Z][A-Za-z\p{Ll}]+ )?([a-z\p{Ll}]+-[A-Z][A-Za-z\p{Ll}0-9]+)",
    # "National Bank of Scotland", "L’Arc de Triomphe"
    r"(([A-Z]{1}['’]?[A-Za-z\p{Ll}]+ )+(?:of|de) (([A-Z]{1}[A-Za-z-\p{Ll}]+)"
    r"(?!([a-z-]{0,20}\s[A-Z]))))|([A-Z]{1}[A-Za-z-\p{Ll}]+ of( [A-Z]{1}[A-Za-z\p{Ll}]+){1,})",
    # capitalized sequences (+ GmbH/LLC), "Acme Corp"
    r"([A-Z]{1}([a-z-\p{Ll}0-9®]+)(( " + _CAMEL +
    r")?(([ &])*([A-Z]['’])?[A-Z]{1}([a-z-\p{Ll}0-9®]+))?)*)" + _SUFFIX,
    # "O'Sullivan", "D&G", all-caps
    r"((([A-Z]{1}([A-Za-z-\p{Ll}0-9&]+|['’][A-Z][A-Za-z]{2,20}))+"
    r"(([ &])*[A-Z]+(['’][A-Z])?([A-Za-z-\p{Ll}0-9®]*)){0,10})(?!(\.[A-Z])+))" + _SUFFIX,
    # camelCase ("iPhone 4")
    r"([a-z][A-Z][A-Za-z0-9]+( [A-Z0-9][A-Za-z0-9]{0,20}){0,20})",
]
STRING_TAGGER_PATTERN = regex.compile("|".join(_BRANCHES))


class Candidate(NamedTuple):
    start: int
    value: str


def candidate_annotations(text: str) -> list[Candidate]:
    """StringTagger.getAnnotations port (NBSP normalized to space first,
    as RegExTagger does via replaceProtectedSpace)."""
    text = text.replace(" ", " ")
    return [Candidate(m.start(), m.group())
            for m in STRING_TAGGER_PATTERN.finditer(text) if m.group()]


# ------------------------------------------------------- date fragments
# RegExp.DATE_FRAGMENTS = month + weekday names
# (/root/reference/palladian-commons/src/main/java/ws/palladian/helper/constants/RegExp.java:320)

_DATE_FRAGMENTS = [
    r"Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec",
    r"January|February|March|April|May|June|July|August|September|October"
    r"|November|December",
    r"Mon|Tue|Wed|Thu|Fri|Sat|Sun",
    r"Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday",
]


def is_date_fragment(value: str) -> bool:
    """PalladianNer.isDateFragment port (:812-819): value is blank after
    removing any one fragment alternation."""
    for frag in _DATE_FRAGMENTS:
        if not regex.sub(frag, " ", value).strip():
            return True
    return False


def remove_date_fragment(start: int, value: str) -> tuple[int, str] | None:
    """PalladianNer.removeDateFragment port (:828-849): strip leading/
    trailing date fragments, fix offset; None if nothing changed."""
    new_value, new_start = value, start
    for frag in _DATE_FRAGMENTS:
        begin = "^(?:" + frag + r")\.? "
        end = r" (?:" + frag + r")\.?$"
        ln = len(new_value)
        if regex.search(begin, new_value):
            new_value = regex.sub(begin, " ", new_value).strip()
            new_start += ln - len(new_value)
        if regex.search(end, new_value):
            new_value = regex.sub(end, " ", new_value).strip()
    if new_value == value:
        return None
    return new_start, new_value


# ------------------------------------------------------------- the model


@dataclass
class NerModel:
    """Broadcastable NER model = the four dictionaries of
    PalladianNerModel (:15-94) in plain-dict form."""
    entity_dict: dict[str, str]                  # lower(surface) -> tag
    annotation_dict: dict[str, dict[str, int]]   # gram -> {tag: count}
    priors: dict[str, float]                     # tag -> P(tag)
    case_dict: set[str] = field(default_factory=set)  # lowercase-usual tokens
    remove_annotations: set[str] = field(default_factory=set)
    concept_order: list[str] = field(default_factory=lambda:
                                     list(C.CONCEPT_PRIORITY))


GRAM_N = 5  # ANNOTATION_FEATURE_SETTING = chars(5).characterPadding()
#             (PalladianNerTrainingSettings.java:83-88)


def classify_surface(surface: str, model: NerModel) -> dict[str, float]:
    """PalladianTextClassifier.classify + DefaultScorer port
    (/root/reference/palladian-core/src/main/java/ws/palladian/classification/text/PalladianTextClassifier.java:213-271,107-133):
    for each unique padded char-5-gram: score[cat] += (count/dictCount)^2;
    normalize; when no gram matched return the category priors."""
    scores: dict[str, float] = {}
    grams = set(char_ngrams(surface.lower(), GRAM_N, GRAM_N, padding=True))
    for g in grams:
        entry = model.annotation_dict.get(g)
        if not entry:
            continue
        dict_count = sum(entry.values())
        for cat, cnt in entry.items():
            p = cnt / dict_count
            scores[cat] = scores.get(cat, 0.0) + p * p
    total = sum(scores.values())
    if total == 0:
        return dict(model.priors)
    return {k: v / total for k, v in scores.items()}


def pick_tag(surface: str, model: NerModel) -> tuple[str, float]:
    """Entity-dictionary exact match wins (dictionary 'switch',
    PalladianNer.java:522-530); else char-gram classification; drop rule
    P(NO_ENTITY) >= 0.5 (:446-456) applied by the caller."""
    exact = model.entity_dict.get(surface.lower())
    if exact is not None:
        return exact, 1.0
    scores = classify_surface(surface, model)
    if not scores:
        return NO_ENTITY, 1.0
    tag = max(scores, key=lambda k: (scores[k], -_order(model, k)))
    return tag, scores.get(tag, 0.0)


def _order(model: NerModel, tag: str) -> int:
    try:
        return model.concept_order.index(tag)
    except ValueError:
        return len(model.concept_order)


def remove_nested(anns: list[tuple[int, int]]) -> list[int]:
    """Annotations.removeNested semantics (Annotations.java:43-56): sort
    by (start asc, end desc); drop spans contained in a kept span.
    Returns kept indices of the input list."""
    order = sorted(range(len(anns)), key=lambda i: (anns[i][0], -anns[i][1]))
    kept: list[int] = []
    max_end = -1
    for i in order:
        s, e = anns[i]
        if s < max_end and e <= max_end:
            continue  # nested in a previous (earlier-starting) annotation
        kept.append(i)
        max_end = max(max_end, e)
    return sorted(kept)


# --------------------------------------------------- per-sentence tagging


def tag_sentence(sentence: str, sent_start: int, model: NerModel) -> list[dict]:
    cands = candidate_annotations(sentence)
    out = []
    for cand in cands:
        start, value = cand.start, cand.value
        # removeSentenceStartErrors (:748-762): single-token word whose
        # lowercase form is usually lowercase -> not an entity
        if " " not in value and value.lower() in model.case_dict:
            continue
        # removeIncorrectlyTaggedInTraining (:764-772)
        if value.lower() in model.remove_annotations:
            continue
        # date handling (:670-693)
        if is_date_fragment(value):
            continue
        fixed = remove_date_fragment(start, value)
        if fixed is not None:
            start, value = fixed
            if not value or is_date_fragment(value):
                continue
        # exact dictionary match; the StringTagger suffix rule keeps a
        # trailing "." after Inc/Corp/Co/Ave (StringTagger.java:76) so
        # fall back to the dot-stripped surface
        exact = model.entity_dict.get(value.lower())
        if exact is None and value.endswith("."):
            exact = model.entity_dict.get(value.lower().rstrip("."))
        if exact is not None:
            tag, score = exact, 1.0
        else:
            scores = classify_surface(value, model)
            if not scores or scores.get(NO_ENTITY, 0.0) >= 0.5:
                continue  # classifyCandidates drop rule (:446-456)
            tag = max(scores, key=lambda k: (scores[k], -_order(model, k)))
            score = scores[tag]
            if tag == NO_ENTITY:
                continue
        out.append({"start": sent_start + start,
                    "end": sent_start + start + len(value),
                    "surface": value, "tag": tag, "score": float(score)})
    kept = remove_nested([(m["start"], m["end"]) for m in out])
    return [out[i] for i in kept]


# ------------------------------------------------------ model training


def build_case_dictionary(docs: DataFrame, min_count: int = 2,
                          max_size: int = 200_000) -> DataFrame:
    """buildCaseDictionary as an aggregation (PalladianNer.java:191-222):
    alphabetic tokens whose occurrences are lowercase with P > 0.5.
    min_count/max_size bound the broadcast at web scale."""
    words = docs.select(
        F.explode(F.split(F.col("text"), r"[^\p{L}]+")).alias("w")
    ).where("w <> ''")
    return (
        words.groupBy(F.lower(F.col("w")).alias("token"))
        .agg(F.count("*").alias("n"),
             F.sum(F.when(F.col("w") == F.lower(F.col("w")), 1)
                   .otherwise(0)).alias("n_lower"))
        .where(F.col("n") >= min_count)
        .where(F.col("n_lower") / F.col("n") > 0.5)
        .orderBy(F.desc("n")).limit(max_size)
        .select("token")
    )


def build_annotation_dictionary(seeds: DataFrame,
                                docs: DataFrame | None = None,
                                min_count: int = 1) -> DataFrame:
    """(gram, tag, count) via explode + groupBy — the reference's trie
    build (DictionaryTrieModel.Builder.addDocument, :78-100) as a hash
    aggregation. When `docs` is given, corpus candidates that are not
    seed surfaces contribute NO_ENTITY rows (trainEnglish 2nd pass)."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def gram_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: char_ngrams((x or "").lower(), GRAM_N,
                                           GRAM_N, padding=True))

    seed_grams = seeds.select(F.col("concept").alias("tag"),
                              F.explode(gram_udf("entity")).alias("gram"))
    parts = [seed_grams]
    if docs is not None:
        @F.pandas_udf(T.ArrayType(T.StringType()))
        def cand_udf(col: pd.Series) -> pd.Series:
            return col.map(lambda sents: list(
                {c.value for s in (sents if sents is not None else [])
                 for c in candidate_annotations(s["text"])}))
        surfaces = docs.select(
            F.explode(cand_udf("sentences")).alias("surface"))
        seed_set = seeds.select(F.lower("entity").alias("k")).distinct()
        # dot-stripped comparison: "Acme Corp." (suffix rule keeps the
        # sentence dot) is NOT a false positive of seed "Acme Corp"
        negatives = (surfaces
                     .join(seed_set,
                           F.lower(F.regexp_replace("surface", r"\.+$", ""))
                           == F.col("k"), "left_anti")
                     .select(F.lit(NO_ENTITY).alias("tag"),
                             F.explode(gram_udf("surface")).alias("gram")))
        parts.append(negatives)
    grams = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return (grams.groupBy("gram", "tag").count()
            .where(F.col("count") >= min_count))


def build_entity_dictionary(seeds: DataFrame) -> DataFrame:
    """(surface, concept, count) — buildEntityDictionary as aggregation
    (PalladianNer.java:326-333)."""
    return seeds.groupBy(F.lower("entity").alias("surface"),
                         "concept").count()


def assemble_model(entity_rows, ann_rows, case_tokens) -> NerModel:
    """Collect the three (small, pruned) model tables into the
    broadcastable NerModel. Rows may be pyspark Rows or plain tuples
    (surface, concept, count) / (gram, tag, count) / (token,)."""
    best: dict[str, tuple[int, int]] = {}
    entity_dict: dict[str, str] = {}
    for r in entity_rows:
        surface, concept, count = r[0], r[1], r[2]
        pri = (C.CONCEPT_PRIORITY.index(concept)
               if concept in C.CONCEPT_PRIORITY else 99)
        key = (-count, pri)
        if surface not in best or key < best[surface]:
            best[surface] = key
            entity_dict[surface] = concept

    annotation_dict: dict[str, dict[str, int]] = {}
    tag_totals: dict[str, int] = {}
    for r in ann_rows:
        gram, tag, count = r[0], r[1], r[2]
        annotation_dict.setdefault(gram, {})[tag] = count
        tag_totals[tag] = tag_totals.get(tag, 0) + count
    total = sum(tag_totals.values()) or 1
    priors = {t: c / total for t, c in tag_totals.items()}

    case_dict = {r[0] for r in case_tokens}
    return NerModel(entity_dict=entity_dict, annotation_dict=annotation_dict,
                    priors=priors, case_dict=case_dict)


def train_ner_model(spark: SparkSession, docs: DataFrame,
                    seeds: DataFrame) -> NerModel:
    """Distributed training -> small broadcastable model."""
    return assemble_model(
        build_entity_dictionary(seeds).collect(),
        build_annotation_dictionary(seeds, docs).collect(),
        build_case_dictionary(docs).collect(),
    )


# --------------------------------------------------------- Spark stage

MENTION_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("surface", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("sent_start", T.IntegerType()),
    T.StructField("sent_text", T.StringType()),
]))


def detect_mentions(docs: DataFrame, model_bc) -> DataFrame:
    """docs -> mentions(url, sent_idx, start, end, surface, tag, score,
    sent_text).

    One Arrow pass; model arrives via spark broadcast. Offsets are
    document-level (sentence.start + in-sentence offset). Each mention
    row carries its sentence text so the downstream relation stage needs
    NO join back to the (much larger) docs table — the duplication is
    bounded by mentions-per-sentence and is the cheaper side of the
    trade at corpus scale."""

    @F.pandas_udf(MENTION_SCHEMA)
    def _mentions_udf(sentences: pd.Series) -> pd.Series:
        model = model_bc.value
        result = []
        for sents in sentences:
            doc_mentions = []
            for idx, s in enumerate(sents if sents is not None else []):
                for m in tag_sentence(s["text"], int(s["start"]), model):
                    m["sent_idx"] = idx
                    m["sent_start"] = int(s["start"])
                    m["sent_text"] = s["text"]
                    doc_mentions.append(m)
            result.append(doc_mentions)
        return pd.Series(result)

    exploded = docs.select(
        "url", F.explode(_mentions_udf("sentences")).alias("m"))
    return exploded.select(
        "url", "m.sent_idx", "m.start", "m.end", "m.surface", "m.tag",
        "m.score", "m.sent_start", "m.sent_text")
