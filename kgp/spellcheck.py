"""Spell checking / auto-correction — PalladianSpellChecker port
(semantics/PalladianSpellChecker.java:1-514, the Norvig-style
counts-plus-edits corrector with bigram-context boosting).

Semantics kept exactly:
- Dictionary fit tokenizes lowercased lines with ``[\\w\\p{L}-]+`` and
  counts unigrams plus adjacent-pair contexts ``left_word`` (:78-105).
- ``edits()`` enumerates deletes, transpositions, a-z + umlaut
  alternations and insertions IN THAT ORDER (:158-223); candidate
  selection keys a map by COUNT, so among equal-count candidates the
  LAST in edits order wins (:370-385, HashMap.put overwrite) — that
  tie behavior is deterministic in the reference and preserved here.
- ``correct_word``: manual mappings first; words longer than
  max_word_length, with >1 ASCII uppercase letter, or already in the
  dictionary pass through; otherwise edit-distance-1 candidates score
  count + 100 * left/right bigram-context count; if none, edit
  distance 2 (first character pinned, no context boost, only on
  edit-1 strings <= max_word_length_distance_two) (:330-425).
- ``auto_correct``: phrase mappings by whole-word containment, split
  on whitespace, skip words shorter than min_word_length / longer
  than max_word_length / matching the no-correction class (digits or
  ``<>=-*'#/+'&.``), re-attach leading/trailing OTHER_PUNCTUATION
  characters, single-space join (:252-299).
- A single leading ASCII uppercase letter survives correction via
  upperCaseFirstLetter (:338-346, countUppercaseLetters is ASCII-only
  per StringHelper.java:55).

German compound support (germanCompoundSupport=true, :402-426) is
ported via kgp.germancompound: when no edit-1 candidate clears
germanCompoundStopCount (default 50), a word whose compound parts all
sit in the dictionary (directly or via the German singular transform)
is declared correct and passes through unchanged. The reference's
germanWords.txt lexicon is not shipped upstream, so the noun DB is
injected (demo_db default, load_noun_db_tsv for the reference's own
germanSingularPluralNouns.tsv format).

Spark shape: the dictionary fit is ONE explode + two aggregations
(unigram counts, adjacent-pair counts) with map-side combine — the
canonical word-count shuffle; the model (vocabulary-sized) broadcasts
into a single Arrow pass that auto-corrects each document. The corpus
text never shuffles.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.tokenize import _clean_trim

# Java [\w\p{L}-]+ == ASCII word chars + any unicode letter + hyphen;
# Python's unicode \w covers that union (plus unicode digits, which
# the corpus never produces inside words)
_TOKEN_RE = re.compile(r"[\w-]+", re.UNICODE)
_NO_CORRECTION_RE = re.compile(r"[0-9<>=\-*'#/+&.]")
_SPLIT_RE = re.compile(r"\s")
_UMLAUTS = "äöü"
_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _upper_first(word: str) -> str:
    return word[:1].upper() + word[1:] if word else word


def _count_ascii_upper(word: str) -> int:
    return sum(1 for ch in word if "A" <= ch <= "Z")


def edits(word: str) -> list[str]:
    """All edit-distance-1 variations in the reference's exact order
    (PalladianSpellChecker.java:158-223): deletes, transpositions,
    alternations (a-z then äöü per position), insertions (a-z then
    äöü per position). Empties removed."""
    n = len(word)
    if n == 0:
        return []
    out: list[str] = []
    for i in range(n):
        out.append(word[:i] + word[i + 1:])
    for i in range(n - 1):
        out.append(word[:i] + word[i + 1] + word[i] + word[i + 2:])
    for i in range(n):
        pre, post = word[:i], word[i + 1:]
        for c in _ALPHABET:
            out.append(pre + c + post)
        for c in _UMLAUTS:
            out.append(pre + c + post)
    for i in range(n + 1):
        pre, post = word[:i], word[i:]
        for c in _ALPHABET:
            out.append(pre + c + post)
        for c in _UMLAUTS:
            out.append(pre + c + post)
    return [w for w in out if w]


class SpellChecker:
    """The fitted model: unigram counts, bigram-context counts and
    manual word/phrase mappings."""

    def __init__(self, words: dict[str, int] | None = None,
                 contexts: dict[str, int] | None = None,
                 min_word_length: int = 2, max_word_length: int = 20,
                 max_word_length_distance_two: int = 10,
                 german_compound_support: bool = False,
                 german_noun_db=None,
                 german_compound_stop_count: int = 50):
        self.german_compound_support = german_compound_support
        self.german_compound_stop_count = german_compound_stop_count
        if german_compound_support:
            from kgp.germancompound import demo_db
            self.german_noun_db = german_noun_db or demo_db()
        else:
            self.german_noun_db = german_noun_db
        self.words = dict(words or {})
        self.contexts = dict(contexts or {})
        self.word_mappings: dict[str, str] = {}
        self.phrase_mappings: dict[str, str] = {}
        self.min_word_length = min_word_length
        self.max_word_length = max_word_length
        self.max_word_length_distance_two = max_word_length_distance_two

    # ------------------------------------------------------- training

    def add_text(self, line: str, ignore_diacritics: bool = False) -> None:
        """One training line (PalladianSpellChecker.java:78-105):
        lowercase, ``[\\w\\p{L}-]+`` tokens, unigram + adjacent-pair
        counts."""
        if ignore_diacritics:
            line = "".join(c for c in unicodedata.normalize("NFD", line)
                           if not unicodedata.combining(c))
        last = None
        for m in _TOKEN_RE.finditer(line.lower()):
            tok = m.group()
            self.words[tok] = self.words.get(tok, 0) + 1
            if last is not None:
                key = last + "_" + tok
                self.contexts[key] = self.contexts.get(key, 0) + 1
            last = tok

    def add_manual_mapping(self, source: str, target: str) -> None:
        if " " in source:
            self.phrase_mappings[source.lower()] = target
        else:
            self.word_mappings[source.lower()] = target

    # ----------------------------------------------------- correction

    def correct_word(self, word: str, left_context: str | None = None,
                     right_context: str | None = None,
                     case_sensitive: bool = False) -> str:
        uppercase = False
        if not case_sensitive:
            upper_count = _count_ascii_upper(word)
            uppercase = upper_count == 1
            word = word.lower()
        else:
            upper_count = 0

        mapped = self.word_mappings.get(word)
        if mapped is not None:
            return _upper_first(mapped) if uppercase else mapped
        if len(word) > self.max_word_length:
            return word
        if not case_sensitive and upper_count > 1:
            return word
        if not word:
            return word
        if word in self.words:
            return _upper_first(word) if uppercase else word

        variations = edits(word)
        # HashMap<count, candidate>: same count -> LAST candidate in
        # edits order wins, then the max count is taken
        candidates: dict[int, str] = {}
        for s in variations:
            count = self.words.get(s)
            if count is None:
                continue
            if left_context is not None:
                count += 100 * self.contexts.get(
                    left_context + "_" + s, 0)
            if right_context is not None:
                count += 100 * self.contexts.get(
                    s + "_" + right_context, 0)
            candidates[count] = s

        # German compound handling (PalladianSpellChecker.java:402-426):
        # when no candidate clears germanCompoundStopCount, a word whose
        # compound parts (>= 2 chars each) are all in the dictionary —
        # directly or via wordToSingularGermanCaseSensitive — is
        # declared correct and returned unchanged.
        compound_correct = False
        if self.german_compound_support:
            if not candidates or max(candidates) \
                    < self.german_compound_stop_count:
                from kgp.germancompound import (
                    split_german_compound_words, word_to_singular_german)
                compound_correct = True
                for part in split_german_compound_words(
                        word, self.german_noun_db):
                    if len(part) < 2:
                        compound_correct = False
                        break
                    if self.words.get(part) is None:
                        key = word_to_singular_german(
                            part, self.german_noun_db)
                        if self.words.get(key) is None:
                            compound_correct = False
                            break

        if not candidates and not compound_correct:
            # edit distance 2: first character pinned, no context boost
            for s in variations:
                if len(s) > self.max_word_length_distance_two:
                    continue
                for w in edits(s):
                    count = self.words.get(w)
                    if count is not None and w and word \
                            and w[0] == word[0]:
                        candidates[count] = w

        corrected = word
        if candidates and not compound_correct:
            corrected = candidates[max(candidates)]
        return _upper_first(corrected) if uppercase else corrected

    def auto_correct(self, text: str, case_sensitive: bool = False,
                     ignore_words: set[str] | None = None) -> str:
        """autoCorrect port (PalladianSpellChecker.java:252-299)."""
        ignore = ignore_words or set()
        for phrase, target in self.phrase_mappings.items():
            if re.search(r"(?<![0-9A-Za-z])" + re.escape(phrase)
                         + r"(?![0-9A-Za-z])", text, re.IGNORECASE):
                text = text.replace(phrase, target)
                break
        out: list[str] = []
        words = _SPLIT_RE.split(text)
        for i, word in enumerate(words):
            left = words[i - 1] if i > 0 else None
            right = words[i + 1] if i < len(words) - 1 else None
            if (len(word) < self.min_word_length
                    or len(word) > self.max_word_length
                    or word in ignore
                    or _NO_CORRECTION_RE.search(word)):
                out.append(word)
                continue
            start, end = word[0], word[-1]
            trimmed = _html.unescape(_clean_trim(word, keep=""))
            piece = ""
            if unicodedata.category(start) == "Po":
                piece += start
            piece += self.correct_word(trimmed, left, right,
                                       case_sensitive)
            if unicodedata.category(end) == "Po":
                piece += end
            out.append(piece)
        return " ".join(out).strip()


# ------------------------------------------------------- Spark stages


def fit_spell_model(docs: DataFrame, text_col: str = "text"
                    ) -> SpellChecker:
    """Distributed dictionary fit: ONE token explode feeds the unigram
    count and the adjacent-pair context count (two word-count shuffles
    with map-side combine over (token) / (pair) keys); both results
    are vocabulary-sized and collect into the broadcastable model."""
    # Java-regex side needs the explicit \p{L} (Spark \w is ASCII-only)
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), "
        "'[\\\\w\\\\p{L}-]+', 0)")
    base = docs.select(toks.alias("toks"))
    uni = (base.select(F.explode("toks").alias("w"))
           .groupBy("w").agg(F.count("*").cast("int").alias("n")))
    pairs = (base.select(F.explode(F.expr(
        "transform(slice(toks, 1, size(toks) - 1), "
        "(t, i) -> concat(t, '_', toks[i + 1]))")).alias("p"))
        .groupBy("p").agg(F.count("*").cast("int").alias("n")))
    words = {r["w"]: r["n"] for r in uni.collect()}
    contexts = {r["p"]: r["n"] for r in pairs.collect()}
    return SpellChecker(words, contexts)


def spellcheck_stage(docs: DataFrame, model: SpellChecker,
                     id_col: str = "doc_id", text_col: str = "text",
                     case_sensitive: bool = False) -> DataFrame:
    """Auto-correct every document in ONE Arrow pass; the model
    travels in the UDF closure (vocabulary-sized broadcast). Output:
    (id, corrected)."""
    @F.pandas_udf("string")
    def _fix(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: model.auto_correct(
            t or "", case_sensitive=case_sensitive))

    return docs.select(F.col(id_col),
                       _fix(F.col(text_col)).alias("corrected"))
