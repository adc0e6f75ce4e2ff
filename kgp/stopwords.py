"""Stop-word removal (StopWordRemover).

Reference: palladian-core .../extraction/feature/StopWordRemover.java

* loadStopwords (:131-146): one stop word per line; lines whose
  TRIMMED form is empty or starts with ``#`` are skipped, but the
  word added is the RAW line lowercased (the trim is only applied to
  the comment/empty check — a line ``" the "`` yields the entry
  ``" the "``; kept as-written).
* language constructors (:68-101): bundled ``stopwords_<iso>.txt``
  resource per language (+ ``_small`` variants). The upstream data
  files are not shipped here; built-ins are compact substitutes
  (EN reuses the corpus-wide list in kgp.textstats, DE is a minimal
  function-word set) and any user list loads through
  ``load_stopwords`` with the exact reference line semantics.
* removeStopWords (:148-160): for every stop word,
  StringHelper.removeWord — case-insensitive whole-word replace with
  "" (borders: not letter/digit/dash-punctuation,
  StringHelper.java:577-622) then collapse runs of 2..10 spaces to
  one (PATTERN_LIMITED_WHITESPACES, :48,555-557). The reference
  iterates a HashSet (unspecified order); removal order is only
  observable when one stop word is a bordered substring inside
  another's span (``isn`` vs ``isn't``) — we fix length-DESC order,
  the reference's own StringLengthComparator convention from
  StringHelper.removeWords (:547-553). Deviation documented.
* isStopWord (:167-169): CASE-SENSITIVE set membership (the set
  holds lowercased entries, so ``The`` is NOT a stop word here even
  though removeStopWords would remove it); test (:162-165) negates.

Spark shape: token-level predicates are pure JVM (isin over a
literal list — stop lists are vocabulary-sized); full-text removal
is the exception and runs as ONE Arrow pass with the scalar twin
(per-word scan loops are not expressible as a bounded column op).
"""

from __future__ import annotations

import re

from kgp.stringhelpers import replace_word

_LIMITED_WS = re.compile(r"[ ]{2,10}")  # StringHelper.java:48

# Compact built-in substitutes for the upstream resource files.
from kgp.textstats import STOPWORDS_EN as _EN_BASE

STOPWORDS_EN = sorted(set(_EN_BASE) | {
    "this", "are", "or", "from", "but", "not", "they", "his", "her",
    "we", "you", "all", "were", "their", "has", "have", "had", "can",
    "will", "been", "if", "he", "she", "its", "into", "than", "then",
    "there", "these", "those", "which", "who", "what", "when", "how",
    "no", "nor", "so", "too", "very", "own", "same", "such", "only",
    "both", "each", "few", "more", "most", "other", "some", "any",
    "about", "up", "out", "off", "over", "under", "again", "once",
    "here", "where", "why", "am", "do", "does", "did", "doing",
    "would", "should", "could", "ought", "i", "me", "my", "him",
    "them", "us", "our", "your", "also"})

STOPWORDS_DE = sorted({
    "der", "die", "das", "und", "oder", "aber", "nicht", "ein",
    "eine", "einen", "einem", "einer", "eines", "ist", "sind", "war",
    "waren", "wird", "werden", "wurde", "wurden", "hat", "haben",
    "hatte", "hatten", "kann", "muss", "von", "mit", "zu", "zum",
    "zur", "im", "in", "am", "an", "auf", "aus", "bei", "nach",
    "vor", "als", "auch", "noch", "nur", "schon", "sich", "so",
    "um", "wie", "was", "wer", "wo", "wenn", "dann", "denn", "dass",
    "er", "sie", "es", "wir", "ihr", "ich", "du", "man", "kein",
    "keine", "mehr", "sehr", "für", "durch", "gegen", "ohne",
    "über", "unter", "zwischen", "dem", "den", "des"})

_BUILTIN = {"en": STOPWORDS_EN, "de": STOPWORDS_DE}


def load_stopwords(lines) -> set[str]:
    """loadStopwords (:131-146): skip lines whose trimmed form is
    empty or a ``#`` comment; add the RAW line lowercased."""
    result: set[str] = set()
    for line in lines:
        line = line.rstrip("\n")
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        result.add(line.lower())
    return result


def stopword_set(language: str = "en") -> set[str]:
    """Language constructor (:68-101) over the built-in substitutes;
    unknown languages yield the empty set (the default branch)."""
    return set(_BUILTIN.get(language, ()))


def is_stop_word(word: str, stopwords: set[str]) -> bool:
    """isStopWord (:167-169): case-sensitive membership."""
    return word in stopwords


def remove_stop_words(text: str, stopwords: set[str]) -> str:
    """removeStopWords (:148-160): removeWord per stop word (comment
    entries skipped a second time, :152-155), 2..10-space runs
    collapsed after each removal; fixed length-DESC (then lexical)
    order replaces the reference's HashSet walk (see module doc)."""
    for word in sorted(stopwords, key=lambda w: (-len(w), w)):
        if word.startswith("#"):
            continue
        # removeWord (:555-557) = replaceWord(word, "", text) + the
        # limited-whitespace collapse
        text = _LIMITED_WS.sub(" ", replace_word(word, "", text))
    return text


# ----------------------------------------------------------- Spark side
def stop_token_col(token_col, stopwords, *, case_sensitive=True):
    """isStopWord as a pure-JVM predicate column. Case-sensitive by
    default (the reference's contains); pass case_sensitive=False
    for the removeStopWords-equivalent (lowercased) membership."""
    from pyspark.sql import functions as F

    words = sorted(stopwords)
    col = token_col if case_sensitive else F.lower(token_col)
    return col.isin(words)


def remove_stopwords_stage(df, text_col: str, stopwords,
                           out_col: str = "text_nostop"):
    """Full-text removeStopWords over a corpus: ONE Arrow batch pass
    with the scalar twin. The stop set is captured in the UDF
    closure (vocabulary-sized, serialized once per executor)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    words = frozenset(stopwords)
    scrub = F.pandas_udf(
        lambda s: s.map(lambda t: remove_stop_words(t, words)),
        StringType())
    return df.withColumn(out_col, scrub(F.col(text_col)))
