"""Text analysis for training-data curation: token counts, quality
scoring, language ID, document fingerprinting.

Everything in this module is PURE COLUMN EXPRESSIONS (whole-stage
codegen, zero Python) — these run over every document of a 100 TB
corpus, so the JVM-side hot path matters more than anywhere else.
Semantics derived from the reference's text-statistics helpers
(/root/reference/palladian-commons/src/main/java/ws/palladian/helper/nlp/StringHelper.java
— countWhitespaces :?, isCompletelyUppercase, letter/number ratios) and
its dictionary language detector
(/root/reference/palladian-core/src/main/java/ws/palladian/classification/language/PalladianLangDetect.java:29-169),
reduced to a marker-word heuristic that is exactly reproducible in
ANSI SQL (the DuckDB oracle mirrors each formula 1:1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word-piece regex: letter runs, digit runs, or single
# non-space symbol — the standard pre-tokenizer shape (GPT-2 style,
# simplified to be regex-engine portable: Spark and DuckDB and RE2
# all agree on this pattern).
WORDPIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = ["the", "of", "and", "to", "in", "a", "is", "that", "for",
                "it", "was", "on", "with", "as", "at", "by", "an", "be"]

# language marker words (distinctive function words per language)
LANG_MARKERS = {
    "en": ["the", "and", "of", "with", "that"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "dans"],
    "es": ["el", "los", "las", "una", "para"],
}


def _word_matches(col: Column, words: list[str]) -> Column:
    """Count occurrences of any of `words` as whole lowercase words."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pattern))


def token_count_ws(col: Column) -> Column:
    """Whitespace tokenization count (0 for empty)."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def token_count_bpe(col: Column) -> Column:
    """Word-piece (BPE-ish) token count via WORDPIECE_RE."""
    return F.regexp_count(col, F.lit(WORDPIECE_RE))


def quality_columns(col: Column) -> dict[str, Column]:
    """Quality-scoring signals used by web-scale corpus filters:
    length, mean word length, stopword ratio, punctuation ratio,
    uppercase ratio, digit ratio."""
    n_chars = F.length(col)
    n_tokens = token_count_ws(col)
    n_alpha = F.regexp_count(col, F.lit(r"[A-Za-z]"))
    n_upper = F.regexp_count(col, F.lit(r"[A-Z]"))
    n_digit = F.regexp_count(col, F.lit(r"[0-9]"))
    n_punct = F.regexp_count(col, F.lit(r"[^\sA-Za-z0-9]"))
    n_stop = _word_matches(col, STOPWORDS_EN)
    nz = lambda d: F.when(d > 0, d).otherwise(F.lit(1))  # noqa: E731
    return {
        "n_chars": n_chars,
        "n_tokens_ws": n_tokens,
        "n_tokens_bpe": token_count_bpe(col),
        "mean_word_len": F.round(n_alpha / nz(n_tokens).cast("double"), 4),
        "stopword_ratio": F.round(n_stop / nz(n_tokens).cast("double"), 4),
        "punct_ratio": F.round(n_punct / nz(n_chars).cast("double"), 4),
        "upper_ratio": F.round(n_upper / nz(n_alpha).cast("double"), 4),
        "digit_ratio": F.round(n_digit / nz(n_chars).cast("double"), 4),
    }


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1] — deterministic combination of
    the signals (a Gopher-rules-style filter, SQL-reproducible)."""
    q = quality_columns(col)
    ok_len = (q["n_tokens_ws"] >= 10) & (q["n_chars"] >= 50)
    ok_word = (q["mean_word_len"] >= 2.0) & (q["mean_word_len"] <= 12.0)
    ok_stop = q["stopword_ratio"] >= 0.01
    ok_punct = q["punct_ratio"] <= 0.3
    return F.round(
        (ok_len.cast("int") + ok_word.cast("int") + ok_stop.cast("int")
         + ok_punct.cast("int")) / F.lit(4.0), 4)


def lang_id(col: Column) -> Column:
    """Marker-word language ID: argmax of per-language marker counts,
    'und' (undetermined) when all zero; ties break by fixed language
    order (en < de < fr < es) — exactly reproducible in SQL."""
    counts = {lang: _word_matches(col, words)
              for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((counts[lang] > 0) & (counts[lang] == best),
                      F.lit(lang)).otherwise(expr)
    return expr


_LANG_MARKER_RES = None


def lang_id_text(text: str) -> str:
    """Pure-Python twin of lang_id (same LANG_MARKERS, same argmax and
    en < de < fr < es tie order) for use inside other pandas UDFs —
    e.g. the sentence-split language pick in
    kgp.html_text.extract_stage(sentence_lang='auto')."""
    global _LANG_MARKER_RES
    if _LANG_MARKER_RES is None:
        import re as _re
        _LANG_MARKER_RES = {
            lang: _re.compile(r"\b(" + "|".join(ws) + r")\b")
            for lang, ws in LANG_MARKERS.items()}
    low = text.lower()
    counts = {lang: len(pat.findall(low))
              for lang, pat in _LANG_MARKER_RES.items()}
    best = max(counts.values())
    if best == 0:
        return "und"
    for lang in LANG_MARKERS:          # declaration order breaks ties
        if counts[lang] == best:
            return lang
    return "und"


def fingerprint(col: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the
    whitespace-normalized, case-folded text — the exact-dedup key
    (content-defined, layout-insensitive)."""
    normalized = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.xxhash64(normalized)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → per-doc analysis row (all JVM-side)."""
    c = F.col(text_col)
    q = quality_columns(c)
    return docs.select(
        "doc_id",
        *[v.alias(k) for k, v in q.items()],
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )
