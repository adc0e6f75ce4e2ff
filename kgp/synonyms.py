"""Synonym dictionaries — port of the reference's synonym stack
(semantics/synonyms/):

- SynonymDictionary (SynonymDictionary.java:17-36): a word → synonym
  list map whose get() SELF-SEEDS — a missing key is inserted with a
  list containing the key itself, so every word's list starts with
  the word; addSynonym appends only unseen synonyms.
- SynonymDictionaryCreator.createDictionaryOpenOfficeFormat
  (SynonymDictionaryCreator.java:40-77): the MyThes/OpenOffice .dat
  walk — non-'(' lines set currentWord (replaceAll("\\|.*", "")),
  '('-lines are pipe-split synonym rows whose '('-parts are
  word-type guards (only "(noun)" allowed; a disallowed type BREAKS
  the rest of the line).
- createDictionaryOpenThesaurus (:79-126): per-line — strip
  "\\(.*?\\)" groups, StringHelper.trim, skip empty/'#' lines, skip
  lines whose first char is not uppercase when nounsOnly, lowercase,
  split ';' and emit every ORDERED pair of distinct parts (equality
  tested BEFORE the per-part trim).

The KG use: synonym pairs are same-entity edges — feeding them into
the canonicalization connected-components merges synonym surfaces
into one canonical word per component (lexicographic min), exactly
how gazetteer alias edges merge entity ids (kgp.canonicalize).

Spark shapes: OpenThesaurus lines are line-independent, so the parse
is pure JVM column expressions per line (Java-regex paren strip +
trim, split with Java trailing-empty semantics via one aggregate,
ordered pairs via nested transform + flatten — no Python, no
shuffle until the final distinct).  The OpenOffice format carries
cross-line state (currentWord) over a file-sized input — parsed by
the pure twin, like the other driver-side parity utilities.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp import constants as C
from kgp.canonicalize import connected_components
from kgp.tokenize import _clean_trim, _UNWANTED

# ------------------------------------------------------------ pure twins


class SynonymDictionary(dict):
    """SynonymDictionary.java port — including the self-seeding get."""

    def get(self, key):  # type: ignore[override]
        lst = super().get(key)
        if lst is None:
            lst = [key]
            self[key] = lst
        return lst

    def add_synonym(self, word: str, synonym: str) -> None:
        lst = self.get(word)
        if synonym not in lst:
            lst.append(synonym)


def _java_split(s: str, sep: str) -> list[str]:
    """java.lang.String.split(regex): trailing empty strings removed."""
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def parse_open_office(lines: list[str],
                      allowed_word_types: tuple = ("(noun)",)
                      ) -> SynonymDictionary:
    """createDictionaryOpenOfficeFormat twin (exact walk incl. the
    break-on-disallowed-type rule)."""
    current_word = ""
    dictionary = SynonymDictionary()
    for line in lines:
        if not line.startswith("("):
            current_word = re.sub(r"\|.*", "", line)
        else:
            for part in _java_split(line, "|"):
                if not part.startswith("("):
                    dictionary.add_synonym(current_word.strip(),
                                           part.strip())
                elif part not in allowed_word_types:
                    break
    return dictionary


def parse_open_thesaurus(lines: list[str],
                         nouns_only: bool = True) -> SynonymDictionary:
    """createDictionaryOpenThesaurus twin."""
    dictionary = SynonymDictionary()
    for line in lines:
        line = re.sub(r"\(.*?\)", "", line)
        line = _clean_trim(line, keep="")
        if not line or line[0] == "#":
            continue
        if nouns_only and not line[0].isupper():
            continue
        line = line.lower()
        parts = _java_split(line, ";")
        for p1 in parts:
            for p2 in parts:
                if p1 == p2:  # compared BEFORE the per-part trim
                    continue
                dictionary.add_synonym(p1.strip(), p2.strip())
    return dictionary


def thesaurus_pairs(dictionary: SynonymDictionary
                    ) -> list[tuple[str, str]]:
    """(word, synonym) rows in first-insertion order, skipping the
    self-seed the reference's get() plants at list head."""
    out = []
    for word, lst in dictionary.items():
        out.extend((word, syn) for syn in lst if syn != word)
    return out


# ------------------------------------------------------------ Spark side

# StringHelper.trim's unwanted set (plus whitespace) as a Java regex
# character class, anchored at both ends.
_TRIM_CLASS = "".join("\\" + ch if ch in "\\^]-[" else ch
                      for ch in sorted(_UNWANTED))
TRIM_REGEX_JAVA = f"^[{_TRIM_CLASS}\\s]+|[{_TRIM_CLASS}\\s]+$"
# java.lang.String.trim: chars <= U+0020 at both ends
_JTRIM = "^[\\x00-\\x20]+|[\\x00-\\x20]+$"


def _drop_trailing_empty(parts: Column) -> Column:
    """Java split semantics: remove trailing empty strings (one
    aggregate over the reversed per-line array, no Python)."""
    trailing = F.aggregate(
        F.reverse(parts),
        F.struct(F.lit(0).alias("n"), F.lit(False).alias("done")),
        lambda acc, x: F.struct(
            F.when(~acc["done"] & (x == ""), acc["n"] + 1)
            .otherwise(acc["n"]).alias("n"),
            (acc["done"] | (x != "")).alias("done")),
        lambda acc: acc["n"])
    return F.slice(parts, F.lit(1), F.size(parts) - trailing)


def open_thesaurus_pairs_stage(lines: DataFrame,
                               nouns_only: bool = True,
                               line_col: str = "line") -> DataFrame:
    """Distributed createDictionaryOpenThesaurus: per-line pure JVM
    column expressions (the same Java regex engine the reference
    runs), emitting distinct (word, synonym) rows.  Lines are
    independent — no shuffle before the final distinct."""
    stripped = F.regexp_replace(F.col(line_col), r"\(.*?\)", "")
    trimmed = F.regexp_replace(stripped, TRIM_REGEX_JAVA, "")
    rows = lines.select(trimmed.alias("t")).where(
        (F.length("t") > 0) & (F.substring("t", 1, 1) != "#"))
    if nouns_only:
        rows = rows.where(F.col("t").rlike(r"^\p{Lu}"))
    parts = _drop_trailing_empty(F.split(F.lower(F.col("t")), ";", -1))
    pairs = F.filter(
        F.flatten(F.transform(
            parts,
            lambda p1: F.transform(
                parts, lambda p2: F.struct(p1.alias("w"),
                                           p2.alias("s"))))),
        lambda st: st["w"] != st["s"])  # equality BEFORE part trim
    jt = lambda c: F.regexp_replace(c, _JTRIM, "")  # noqa: E731
    return (rows.select(F.explode(pairs).alias("p"))
            .select(jt(F.col("p.w")).alias("word"),
                    jt(F.col("p.s")).alias("synonym"))
            .distinct())


def synonym_groups(pairs: DataFrame) -> DataFrame:
    """Synonym pairs → (word, canon_word): connected components over
    the word↔synonym edges, canonical = lexicographic min of the
    component (the same CC machinery gazetteer alias edges use)."""
    edges = pairs.select(F.col("word").alias("src"),
                         F.col("synonym").alias("dst"))
    cc = connected_components(edges)
    return cc.select(F.col("entity_id").alias("word"),
                     F.col("canon_id").alias("canon_word"))


# ------------------------------------------------ deterministic corpus


def demo_thesaurus_lines() -> list[str]:
    """OpenThesaurus-format lines synthesized from kgp.constants (the
    same code-defined entities the gazetteer derives from): org/alias
    rows with parenthetical annotations, a chain row linking the
    Acme group transitively, city variants with untrimmed padding, a
    comment, a nouns_only-skipped line, and an all-punctuation line
    that trims to nothing."""
    lines = ["# synthetic OpenThesaurus dump (nouns)"]
    for org, alias in zip(C.ORGS[:len(C.ORG_ALIASES)], C.ORG_ALIASES):
        lines.append(f"{org} (company);{alias}")
    lines.append(f"{C.ORG_CHAIN_NAME};{C.ORG_ALIASES[0]} (intl)")
    for city in C.CITIES:
        lines.append(f"  {city} ; {city} City  ")
    lines.append(f"{C.COUNTRIES[0]};{C.COUNTRIES[0]} Republic")
    lines.append("lowercase;skipped when nounsOnly")
    lines.append("")
    lines.append("???;!!!")
    return lines


def demo_thesaurus_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(ln,) for ln in demo_thesaurus_lines()], "line string")
