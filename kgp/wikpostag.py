"""WiktionaryPosTagger port — dictionary-driven Brown-corpus POS tags.

Reference:
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/pos/WiktionaryPosTagger.java:16-178
 — per token: a hard-coded rule chain (a/the -> AT, the BE* verb
   forms, and/or -> CC, StringHelper.isNumericExpression -> CD, DO*/
   DT*/HV*/MD and the PPO/PPS/PPSS pronoun sets; :66-117), then a
   WordDB lookup of the token and, failing that, its lowercase form
   (:121-135), with the Wiktionary word type mapped to a Brown tag
   through posTagMapping (Article->AT Noun->NN Proper->NNP
   Adjective->JJ Verb->VB Preposition->IN; :32-39, :137-140) and '?'
   when nothing matched; AbstractPosTagger.getAnnotations uppercases
   every emitted tag (AbstractPosTagger.java:41).
 - single-character tokens other than "I"/"a" take a dedicated branch
   (:57-62) whose body is commented out in the reference, so AS
   WRITTEN no tag is appended and the zip in getAnnotations
   (AbstractPosTagger.java:33-45) throws / shifts.  This port
   implements the evident intent preserved in the commented code and
   in the reference's own example output ("./." and "$/$",
   WiktionaryPosTagger.java:160-167): the tag IS the token.
   Documented deviation, same policy as combineAnnotations.
 - StringHelper.isNumericExpression (StringHelper.java:763-801):
   every char in {Nd, Pd, Pc, Sc, Zs} or '%.,:' -> numeric; plus the
   unit branch — a leading RegExp.NUMBER match whose remaining suffix
   normalizes (UnitNormalizer.getNormalizedNumber) to a DIFFERENT
   value is numeric ("5km" -> 5000 != 5); a NumberFormatException
   anywhere returns false for the whole predicate.

Spark shape: the rule chain is ONE pure-JVM CASE WHEN column; the
dictionary is a DataFrame joined twice (exact token, then
lower(token) for the reference's lowercase retry) — broadcast by
default since even full-Wiktionary vocabularies are tens of MB, with
``broadcast_dict=False`` falling back to a shuffle join for bigger
banks; the numeric-expression unit branch (the only part the JVM
cannot express — it needs the unit bank walk) runs as an Arrow batch
over DISTINCT tokens that start with a RegExp.NUMBER match and failed
the char-class regex, a vocabulary-sized set, never the corpus.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.tokenize import iterate_tokens
from kgp.units import NUMBER_RE, get_normalized_number, normalize_number

# posTagMapping (WiktionaryPosTagger.java:32-39)
POS_TAG_MAPPING = {"Article": "AT", "Noun": "NN", "Proper": "NNP",
                   "Adjective": "JJ", "Verb": "VB", "Preposition": "IN"}

# the hard-coded chain (:66-117) in reference order; isNumericExpression
# sits between CC and DO (:88-89).  (words, tag, case_insensitive)
_RULES_BEFORE_CD = [
    (("a", "the"), "AT", True),
    (("be",), "BE", False), (("were",), "BED", False),
    (("was",), "BEDZ", False), (("being",), "BEG", False),
    (("am",), "BEM", False), (("been",), "BEN", False),
    (("are",), "BER", False), (("is",), "BEZ", False),
    (("and", "or"), "CC", False),
]
_RULES_AFTER_CD = [
    (("do",), "DO", False), (("did",), "DOD", False),
    (("does",), "DOZ", False), (("this", "that"), "DT", False),
    (("some", "any"), "DTI", False), (("these", "those"), "DTS", False),
    (("either",), "DTX", False), (("have",), "HV", False),
    (("had",), "HVD", False), (("having",), "HVG", False),
    (("can", "should", "will"), "MD", False),
    (("me", "him", "them"), "PPO", False),
    (("he", "she", "it", "one"), "PPS", False),
    (("I", "we", "they", "you"), "PPSS", False),
]

# Character.getType buckets accepted by isNumericExpression
# (StringHelper.java:772-777; DIRECTIONALITY_WHITESPACE == 12 ==
# SPACE_SEPARATOR, an evident constant mix-up the port keeps).
_NUMERIC_CATEGORIES = frozenset({"Nd", "Pd", "Pc", "Sc", "Zs"})
_NUMERIC_EXTRA = frozenset("%.,:")
# the same char classes as a Java/RE2 regex (both engines accept the
# one/two-letter general-category escapes)
NUMERIC_CHARCLASS_RE = r"^[\p{Nd}\p{Pd}\p{Pc}\p{Sc}\p{Zs}%.,:]+$"


def is_numeric_expression(s: str) -> bool:
    """StringHelper.isNumericExpression:763-801 exact port."""
    if not s:
        return False
    flag = all(unicodedata.category(ch) in _NUMERIC_CATEGORIES
               or ch in _NUMERIC_EXTRA for ch in s)
    m = NUMBER_RE.match(s)
    if m:
        try:
            number = float(normalize_number(m.group()))
            converted = get_normalized_number(number, s[m.end():])
            if number != converted:
                return True
        except ValueError:
            return False
    return flag


def _rule_tag(token: str) -> str | None:
    """The pre-dictionary chain for one token; None = fall through."""
    if len(token) == 1 and token != "I" and token.lower() != "a":
        return token  # evident-intent single-char branch (see header)
    for words, tag, ci in _RULES_BEFORE_CD:
        probe = token.lower() if ci else token
        if probe in words:
            return tag
    if is_numeric_expression(token):
        return "CD"
    for words, tag, _ in _RULES_AFTER_CD:
        if token in words:
            return tag
    return None


def tag_tokens(tokens: list[str], lookup) -> list[str]:
    """getTags(:47-150) + getAnnotations' upper-casing; ``lookup`` maps
    a word to its Wiktionary type or None (WordDB.getWord)."""
    tags = []
    for token in tokens:
        tag = _rule_tag(token)
        if tag is None:
            word_type = lookup(token)
            if word_type is None:
                word_type = lookup(token.lower())
            tag = word_type if word_type is not None else "?"
            tag = POS_TAG_MAPPING.get(tag, tag)
        tags.append(tag.upper())
    return tags


def tag_text(text: str, lookup) -> list[tuple[int, str, str]]:
    """AbstractPosTagger.getAnnotations over the WordTokenizer stream:
    (start, value, TAG) triples."""
    toks = iterate_tokens(text)
    tags = tag_tokens([t.value for t in toks], lookup)
    return [(t.start, t.value, g) for t, g in zip(toks, tags)]


def tagged_string(text: str, lookup) -> str:
    """NerHelper.tag TaggingFormat.SLASHES essentials for the POS
    case: token/TAG joined by spaces (the reference's example format,
    WiktionaryPosTagger.java:160-167)."""
    return " ".join(f"{v}/{g}" for _, v, g in tag_text(text, lookup))


# ------------------------------------------------------------ Spark
def _spark_rule_col(token):
    """The rule chain as one JVM CASE WHEN column (None = NULL)."""
    expr = F.when(
        (F.length(token) == 1) & (token != "I")
        & (F.lower(token) != "a"), token)
    for words, tag, ci in _RULES_BEFORE_CD:
        probe = F.lower(token) if ci else token
        expr = expr.when(probe.isin(*words), F.lit(tag))
    charclass = token.rlike(NUMERIC_CHARCLASS_RE)
    expr = expr.when(charclass | F.col("_unit_numeric"), F.lit("CD"))
    for words, tag, _ in _RULES_AFTER_CD:
        expr = expr.when(token.isin(*words), F.lit(tag))
    return expr


@F.pandas_udf(T.BooleanType())
def _unit_numeric_udf(tokens: pd.Series) -> pd.Series:
    """The unit branch alone (char-class handled JVM-side): leading
    NUMBER whose suffix converts to a different value."""
    def probe(s):
        m = NUMBER_RE.match(s or "")
        if not m:
            return False
        try:
            number = float(normalize_number(m.group()))
            return number != get_normalized_number(number, s[m.end():])
        except ValueError:
            return False
    return tokens.map(probe)


def wiktionary_pos_stage(tokens: DataFrame, words: DataFrame,
                         token_col: str = "token",
                         broadcast_dict: bool = True) -> DataFrame:
    """Tag a token DataFrame against a Wiktionary word table.

    ``tokens``: any columns + ``token_col``; ``words``: (word,
    word_type) with unique ``word`` (WordDB primary key).  Adds
    ``tag``.  Python touches only DISTINCT number-prefixed tokens.
    """
    tok = F.col(token_col)
    dict_df = words.select(F.col("word"), F.col("word_type"))
    if broadcast_dict:
        dict_df = F.broadcast(dict_df)

    # vocabulary-sized Arrow pass: distinct tokens that start with a
    # number but are not pure char-class numerics
    cand = (tokens.select(tok.alias("_tok")).distinct()
            .filter(F.col("_tok").rlike(r"^[0-9]")
                    & ~F.col("_tok").rlike(NUMERIC_CHARCLASS_RE))
            .withColumn("_unit_hit", _unit_numeric_udf(F.col("_tok"))))
    out = tokens.join(F.broadcast(cand), tok == F.col("_tok"), "left") \
        .withColumn("_unit_numeric",
                    F.coalesce(F.col("_unit_hit"), F.lit(False))) \
        .drop("_tok", "_unit_hit")

    out = out.withColumn("_rule", _spark_rule_col(tok))
    exact = dict_df.withColumnRenamed("word", "_w_exact") \
        .withColumnRenamed("word_type", "_t_exact")
    lower = dict_df.withColumnRenamed("word", "_w_lower") \
        .withColumnRenamed("word_type", "_t_lower")
    out = out.join(exact, tok == F.col("_w_exact"), "left") \
        .join(lower, F.lower(tok) == F.col("_w_lower"), "left")

    word_type = F.coalesce(F.col("_t_exact"), F.col("_t_lower"))
    mapped = F.coalesce(
        *[F.when(word_type == k, F.lit(v))
          for k, v in POS_TAG_MAPPING.items()],
        word_type, F.lit("?"))
    return out.withColumn(
        "tag", F.upper(F.coalesce(F.col("_rule"), mapped))).drop(
        "_rule", "_unit_numeric", "_w_exact", "_t_exact",
        "_w_lower", "_t_lower")
