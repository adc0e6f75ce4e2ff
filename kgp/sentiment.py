"""Dictionary-based sentiment classification — port of the
reference's SentiWS-backed German classifier
(palladian-core classification/sentiment/GermanSentimentClassifier.java
+ AbstractSentimentClassifier.java), as a broadcast-lexicon Arrow
stage.

Faithful semantics (file:line cites):
  * lexicon load (GermanSentimentClassifier.java:85-117): lines are
    lowercased, tab-split; the POS tag after ``|`` is stripped from
    the main word; the comma-separated synonyms in column 3 inherit
    the value; later lines overwrite earlier entries.
  * per sentence (:136-186): sentences come from Tokenizer
    .getSentences(text) — the ENGLISH, onlyReal=false variant even
    for German text (Tokenizer.java:351-357; ported quirk);
    lowercased, split on single whitespace ``\\s`` (NOT ``\\s+``);
    each token StringHelper-trimmed BEFORE becoming last/before-last
    context; an emphasis word directly before a sentiment word
    multiplies it (bisschen 0.9 ... extrem 3.0); ``nicht`` one or two
    tokens before — or ``ohne``/``kein``/``keine`` directly before —
    negates; positive values add to the sentence's positive sum,
    everything else adds |value| to the negative sum.
  * a sentence is opinionated (:188-196) when the normalized majority
    probability exceeds the confidence threshold (default 0.5,
    AbstractSentimentClassifier.java:12) AND one sum dominates 2x AND
    the positive sum is >= 0.008 or the negative sum is > 0.008 (the
    >= / > asymmetry is the reference's).
  * document polarity (:219-226) = majority vote over opinionated
    sentences. The reference's tie winner follows CategoryEntries map
    order (nondeterministic); this port returns 'positive' on ties —
    the documented deterministic substitute.

Scale shape: the lexicon (SentiWS is ~30k surfaces) is a broadcast
dict; the stage is ONE mapInPandas pass over the docs — no shuffle,
no join, sentiment never touches more than (id, text) columns.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql import types as T

from kgp.tokenize import _clean_trim, get_sentences

# GermanSentimentClassifier.java:45-53
EMPHASIZE = {"bisschen": 0.9, "sehr": 2.0, "deutlich": 2.0,
             "unheimlich": 3.0, "absolut": 3.0, "vollkommen": 3.0,
             "extrem": 3.0}
NEGATE_LAST = {"nicht", "ohne", "kein", "keine"}

CONFIDENCE_THRESHOLD = 0.5   # AbstractSentimentClassifier.java:12


def load_sentiws(lines: Iterable[str]) -> dict[str, float]:
    """SentiWS-format lines -> {word: value}. Format per line:
    ``Word|POS<TAB>value<TAB>syn1,syn2,...`` (synonym column
    optional). GermanSentimentClassifier.loadDictionary semantics."""
    lex: dict[str, float] = {}
    for line in lines:
        parts = line.lower().split("\t")
        if len(parts) < 2 or not parts[0]:
            continue
        main = parts[0].split("|", 1)[0]
        value = float(parts[1])
        if len(parts) > 2 and parts[2]:
            for syn in parts[2].strip().split(","):
                if syn:
                    lex[syn] = value
        lex[main] = value
    return lex


def sentence_sums(sentence: str, lexicon: dict[str, float]) \
        -> tuple[float, float]:
    """(positive_sum, negative_sum) of one sentence —
    GermanSentimentClassifier.java:140-186."""
    pos = neg = 0.0
    before_last = last = ""
    for token in sentence.lower().split():
        token = _clean_trim(token)
        weight = EMPHASIZE.get(last, 1.0)
        if (last == "nicht" or before_last == "nicht"
                or last in NEGATE_LAST):
            weight *= -1
        value = lexicon.get(token)
        if value is not None:
            value *= weight
            if value > 0:
                pos += value
            else:
                neg += abs(value)
        before_last, last = last, token
    return pos, neg


def polarity(text: str, lexicon: dict[str, float],
             confidence_threshold: float = CONFIDENCE_THRESHOLD) \
        -> tuple[str, int, int]:
    """(polarity, n_positive_sentences, n_negative_sentences) for one
    document — the full getPolarity walk. Ties -> 'positive'
    (deterministic; see module docstring)."""
    n_pos = n_neg = 0
    for tok in get_sentences(text, only_real=False, language="en"):
        pos, neg = sentence_sums(tok.value, lexicon)
        total = pos + neg
        if total <= 0:
            continue
        prob = max(pos, neg) / total
        if (prob > confidence_threshold
                and (pos > 2 * neg or neg > 2 * pos)
                and (pos >= 0.008 or neg > 0.008)):
            if pos >= neg:
                n_pos += 1
            else:
                n_neg += 1
    label = "positive" if n_pos >= n_neg else "negative"
    return label, n_pos, n_neg


def sentiment_stage(docs: DataFrame, lexicon: dict[str, float],
                    id_col: str = "doc_id", text_col: str = "text",
                    confidence_threshold: float = CONFIDENCE_THRESHOLD) \
        -> DataFrame:
    """docs -> (id, polarity, n_pos_sentences, n_neg_sentences): one
    Arrow pass with the broadcast lexicon; zero shuffle."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(dict(lexicon))
    schema = T.StructType([
        T.StructField("_id", docs.schema[id_col].dataType),
        T.StructField("polarity", T.StringType()),
        T.StructField("n_pos_sentences", T.IntegerType()),
        T.StructField("n_neg_sentences", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = bc.value
        for pdf in batches:
            out = [polarity(t or "", lex, confidence_threshold)
                   for t in pdf[text_col]]
            yield pd.DataFrame({
                "_id": pdf[id_col],
                "polarity": [o[0] for o in out],
                "n_pos_sentences": [o[1] for o in out],
                "n_neg_sentences": [o[2] for o in out]})

    return (docs.select(id_col, text_col)
            .mapInPandas(run, schema)
            .withColumnRenamed("_id", id_col))
