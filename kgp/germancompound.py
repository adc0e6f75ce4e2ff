"""German compound-word splitting — WordTransformer port.

Reference: /root/reference/palladian-core/src/main/java/ws/palladian/
semantics/WordTransformer.java:
- :290-308 ``wordToSingularGermanCaseSensitive`` — wiktionary-DB
  plural→singular lookup with a longest-suffix recursive fallback
  (suffix length must be < len(word)-1 per the ``w.length() <
  maxLength`` filter) and Java String.replace (ALL occurrences);
- :310-362 ``splitGermanCompoundWords`` — greedy longest-suffix
  decomposition over the length-sorted word list: a suffix match
  must be longer than 3 chars and (on the first match) no longer
  than the word; each match is prepended, removed with
  String.replace, and the scan restarts at index ONE (the reference
  sets ``i = 0`` and the loop's ``i++`` fires before the re-test —
  quirk kept); an unconsumed remainder is prepended as-is.

The reference loads its lexicon from two bundled resources:
``germanSingularPluralNouns.tsv`` (ships with the repo; loader below
parses the identical 4-column format) and ``germanWords.txt`` (NOT
shipped with the reference repo — the word list itself is absent
upstream). The lexicon is therefore INJECTED: ``GermanNounDb`` takes
(singular, plural) pairs plus an optional general word list, and
``demo_db()`` provides a small deterministic lexicon for tests and
the pipeline default.

Order contract (StringLengthComparator.java): longest first, ties
case-insensitive lexicographic.

Spark shape: the db is model-sized and broadcasts; splitting runs
inside the spell-check Arrow pass (kgp.spellcheck) — never per-row
Python UDFs on the driver path.
"""

from __future__ import annotations

from collections.abc import Iterable


def _length_sorted(words: Iterable[str]) -> list[str]:
    """StringLengthComparator: longest first, ties case-insensitive
    lexicographic (stable against input order)."""
    return sorted(words, key=lambda w: (-len(w), w.lower()))


class GermanNounDb:
    """Injected lexicon: plural→singular map + length-sorted noun and
    word lists (WordTransformer.java:67-110 static init)."""

    def __init__(self, singular_plural: Iterable[tuple[str, str]],
                 words: Iterable[str] = ()):
        self.singular_plural: dict[str, str] = {}
        self.plural_singular: dict[str, str] = {}
        for singular, plural in singular_plural:
            s, p = singular.lower(), plural.lower()
            if not s:
                continue
            self.singular_plural[s] = p
            self.plural_singular[p] = s
        nouns = set(self.singular_plural) | set(
            self.singular_plural.values())
        self.nouns: list[str] = _length_sorted(nouns)
        # germanWords.txt filter: 2..15 chars (WordTransformer.java:97)
        self.words: list[str] = _length_sorted(
            {w.lower() for w in words if 2 <= len(w) <= 15}
            or nouns)


def load_noun_db_tsv(lines: Iterable[str],
                     words: Iterable[str] = ()) -> GermanNounDb:
    """Parse the reference's germanSingularPluralNouns.tsv format:
    ``article \\t singular \\t article \\t plural``; rows with <4
    columns or an empty singular are skipped (WordTransformer.java:
    74-86)."""
    pairs = []
    for line in lines:
        parts = line.rstrip("\n").split("\t")
        if len(parts) < 4 or not parts[1]:
            continue
        pairs.append((parts[1], parts[3]))
    return GermanNounDb(pairs, words)


_DEMO_PAIRS = [
    ("kette", "ketten"), ("schloss", "schlösser"), ("haus", "häuser"),
    ("tür", "türen"), ("hund", "hunde"), ("katze", "katzen"),
    ("wagen", "wagen"), ("rad", "räder"), ("buch", "bücher"),
    ("schule", "schulen"), ("garten", "gärten"), ("zaun", "zäune"),
    ("blume", "blumen"), ("topf", "töpfe"), ("wasser", "wasser"),
    ("flasche", "flaschen"), ("brief", "briefe"), ("kasten", "kästen"),
    ("markt", "märkte"), ("platz", "plätze"), ("straße", "straßen"),
    ("bahn", "bahnen"), ("hof", "höfe"), ("meister", "meister"),
    ("berg", "berge"), ("steiger", "steiger"), ("gold", "golde"),
    ("fahrrad", "fahrräder"), ("lampe", "lampen"),
    ("schuh", "schuhe"), ("tisch", "tische"),
    ("kunststoff", "kunststoffe"),
    ("fahrradschloss", "fahrradschlösser"),
]
_DEMO_WORDS = [s for s, _ in _DEMO_PAIRS] + ["eisen", "silber", "holz"]

_DEMO_DB: GermanNounDb | None = None


def demo_db() -> GermanNounDb:
    """Small deterministic lexicon (own composition — the reference's
    germanWords.txt is not shipped upstream); cached per process."""
    global _DEMO_DB
    if _DEMO_DB is None:
        _DEMO_DB = GermanNounDb(_DEMO_PAIRS, _DEMO_WORDS)
    return _DEMO_DB


def word_to_singular_german(lower_case_plural: str,
                            db: GermanNounDb) -> str:
    """wordToSingularGermanCaseSensitive port (WordTransformer.java:
    290-308): exact-map hit, else the longest noun suffix STRICTLY
    shorter than len(word)-1 is singularized recursively and replaced
    (Java String.replace = all occurrences)."""
    singular = db.plural_singular.get(lower_case_plural)
    if singular is not None:
        return singular
    max_length = len(lower_case_plural) - 1
    for word2 in db.nouns:
        if len(word2) >= max_length:
            continue
        if lower_case_plural.endswith(word2):
            singular2 = word_to_singular_german(word2, db)
            return lower_case_plural.replace(word2, singular2)
    return lower_case_plural


def split_german_compound_words(word: str, db: GermanNounDb,
                                force_split: bool = False) -> list[str]:
    """splitGermanCompoundWords port (WordTransformer.java:310-362).
    Greedy longest-suffix decomposition; quirks kept verbatim:

    - a match must be > 3 chars and, while no parts were found yet,
      no longer than the (singularized) word — ``word2Length <=
      wordLength`` uses the length captured BEFORE the loop;
    - matches are removed with String.replace (ALL occurrences) and
      the scan restarts at list index 1 (``i = 0`` + loop ``i++``);
    - an unconsumed remainder is prepended, not discarded.
    """
    words: list[str] = []
    lc_singular = word_to_singular_german(word.lower(), db)
    word_length = len(lc_singular)

    lst = db.words
    i = 0
    while i < len(lst):
        word2 = lst[i]
        word2_length = len(word2)
        if force_split and word2_length == word_length:
            i += 1
            continue
        if (word2_length > 3
                and (word2_length <= word_length or words)
                and lc_singular.endswith(word2)):
            words.insert(0, word2)
            lc_singular = lc_singular.replace(word2, "")
            if not lc_singular:
                break
            i = 1      # Java: i = 0, then the loop's i++ fires
            continue
        i += 1
    if lc_singular:
        words.insert(0, lc_singular)
    return words


__all__ = ["GermanNounDb", "load_noun_db_tsv", "demo_db",
           "word_to_singular_german", "split_german_compound_words"]
