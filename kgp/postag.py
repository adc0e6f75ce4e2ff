"""PalladianPosTagger port — per-token POS tagging.

Reference:
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/pos/PalladianPosTagger.java:40-186
 — a UniversalClassifier (UniversalClassifier.java:83-95) combining
   (a) the char-1..7-gram TEXT classifier (PalladianTextClassifier,
       DefaultScorer) and
   (b) a NAIVE BAYES over 12 hand-built nominal token features
       (extractFeatures :152-168; Laplace 1e-5 smoothing,
       NaiveBayesClassifier.java:26, NaiveBayesModel.java:81-97),
   CategoryEntries summed and normalized (CategoryEntriesBuilder);
trained from Brown-corpus-format "word/TAG" files
(BrownCorpusIterator :84-135; tags normalized by stripping "-..."
suffixes, AbstractPosTagger.java:72-74); emitted tags uppercased
(AbstractPosTagger.java:41).

Spark-first: training is two hash aggregations over an exploded
(word, tag) DataFrame — (gram, tag) counts for the text model and
(feature, value, tag) counts for the Bayes model — the same shape as
the NER dictionary training in kgp.mentions; tagging is a broadcast
model inside a pandas UDF.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import pandas as pd
import regex
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.textclassifier import DictModel, FeatureSetting, classify, train
from kgp.tokenize import iterate_tokens

# FeatureSettingBuilder.chars(1, 7) (PalladianPosTagger.java:74-77)
POS_FEATURE_SETTING = FeatureSetting(mode="char", min_ngram=1,
                                     max_ngram=7, case_sensitive=False)
LAPLACE = 0.00001  # NaiveBayesClassifier.DEFAULT_LAPLACE_CORRECTOR

_NUMBER_WORDS = {"one", "two", "three", "four", "five", "six", "seven",
                 "eight", "nine", "ten", "eleven", "twelve"}
_NUM_RE = regex.compile(r"-?\d+(?:[.,]\d+)*")


def is_number_or_number_word(s: str) -> bool:
    """StringHelper.isNumberOrNumberWord port (StringHelper.java:
    704-753, digits/derived separators form; number words one..twelve)."""
    if not s:
        return False
    if not s.startswith(".") and not s.endswith(".") \
            and _NUM_RE.fullmatch(s):
        return True
    return s.strip().lower() in _NUMBER_WORDS


def extract_pos_features(word: str) -> dict[str, str]:
    """extractFeatures port (PalladianPosTagger.java:152-168): 12
    nominal features; booleans as 'true'/'false' strings (the Java
    InstanceBuilder stores them as nominal values for the Bayes
    classifier)."""
    n = len(word)

    def b(x: bool) -> str:
        return "true" if x else "false"

    normalized_len = len(regex.sub(r"[^`'\",.:;*()]", "", word))
    return {
        "startsUppercase": b(word[:1].isupper()),
        "length1": b(n == 1),
        "length2": b(n == 2),
        "length3": b(n == 3),
        "length": str(n),
        "number": b(is_number_or_number_word(word)),
        "completelyUppercase": b(bool(word.strip())
                                 and word == word.upper()),
        "normalizedLength": str(normalized_len),
        "lastCharacter": word[-1:] if n else "",
        "firstCharacter": word[:1],
        "lastTwoCharacters": word[-2:] if n > 1 else "",
        "word": word,
    }


def parse_brown(content: str) -> list[tuple[str, str]]:
    """BrownCorpusIterator.createInstances port (:112-133): whitespace
    split, 'word/TAG' pairs, tag suffix after '-' stripped, empties
    skipped."""
    out = []
    for pair in content.split():
        word, _, tag = pair.partition("/")
        if not word or not tag:
            continue
        tag = regex.sub(r"-.*", "", tag)
        if tag:
            out.append((word, tag))
    return out


@dataclass
class PosModel:
    """UniversalClassifierModel counterpart: the char-gram DictModel
    plus the Bayes nominal counts."""
    text_model: DictModel
    # (feature, value) -> {tag: count}
    nominal_counts: dict[tuple[str, str], dict[str, int]]
    tag_counts: Counter = field(default_factory=Counter)
    features: tuple[str, ...] = ()

    @property
    def tags(self) -> list[str]:
        return sorted(self.tag_counts)


def train_pos_model_local(pairs: list[tuple[str, str]]) -> PosModel:
    """Driver-side trainer for small corpora (the reference trains
    in-memory too); the distributed twin is train_pos_model."""
    text_model = train(pairs, POS_FEATURE_SETTING)
    nominal: dict[tuple[str, str], dict[str, int]] = {}
    tag_counts: Counter = Counter()
    feats: tuple[str, ...] = ()
    for word, tag in pairs:
        fv = extract_pos_features(word)
        feats = tuple(fv)
        for name, value in fv.items():
            d = nominal.setdefault((name, value), {})
            d[tag] = d.get(tag, 0) + 1
        tag_counts[tag] += 1
    return PosModel(text_model, nominal, tag_counts, feats)


def train_pos_model(tokens: DataFrame) -> PosModel:
    """Distributed trainer over a (word, tag) DataFrame: char-gram and
    nominal-feature counts as two groupBy aggregations, collected into
    the (small) broadcastable model — the trie the reference keeps
    per-JVM becomes partial+final hash aggregation."""
    from kgp.textclassifier import preprocess

    fs = POS_FEATURE_SETTING

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def gram_udf(w: pd.Series) -> pd.Series:
        return w.map(lambda x: sorted(set(preprocess(x or "", fs))))

    feat_schema = T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType())]))

    @F.pandas_udf(feat_schema)
    def feat_udf(w: pd.Series) -> pd.Series:
        return w.map(lambda x: [{"name": k, "value": v}
                                for k, v in
                                extract_pos_features(x or "").items()])

    gram_rows = (tokens.select("tag",
                               F.explode(gram_udf("word")).alias("gram"))
                 .groupBy("gram", "tag").count().collect())
    feat_rows = (tokens.select("tag",
                               F.explode(feat_udf("word")).alias("f"))
                 .select("tag", "f.name", "f.value")
                 .groupBy("name", "value", "tag").count().collect())
    tag_rows = tokens.groupBy("tag").count().collect()

    text_model = DictModel()
    for r in gram_rows:
        text_model.entries.setdefault(r["gram"], {})[r["tag"]] = \
            r["count"]
    tag_counts = Counter({r["tag"]: r["count"] for r in tag_rows})
    text_model.doc_counts = Counter(tag_counts)
    nominal: dict[tuple[str, str], dict[str, int]] = {}
    feats: set[str] = set()
    for r in feat_rows:
        feats.add(r["name"])
        nominal.setdefault((r["name"], r["value"]), {})[r["tag"]] = \
            r["count"]
    return PosModel(text_model, nominal, tag_counts, tuple(sorted(feats)))


def _normalize(scores: dict[str, float]) -> dict[str, float]:
    total = sum(scores.values())
    if total <= 0:
        return {k: 0.0 for k in scores}
    return {k: v / total for k, v in scores.items()}


def _bayes_classify(word: str, model: PosModel) -> dict[str, float]:
    """NaiveBayesClassifier.classify port (:75-110): prior times the
    Laplace-smoothed nominal likelihoods, normalized."""
    fv = extract_pos_features(word)
    n_total = sum(model.tag_counts.values()) or 1
    n_tags = len(model.tag_counts) or 1
    out: dict[str, float] = {}
    for tag, tag_n in model.tag_counts.items():
        p = tag_n / n_total
        for name in model.features:
            counts = model.nominal_counts.get((name, fv.get(name, "")))
            c = counts.get(tag, 0) if counts else 0
            p *= (c + LAPLACE) / (tag_n + LAPLACE * n_tags)
        out[tag] = p
    return _normalize(out)


def classify_token(word: str, model: PosModel) -> dict[str, float]:
    """UniversalClassifier.classify port (:83-95): sum of the two
    classifiers' normalized CategoryEntries, renormalized
    (CategoryEntriesBuilder semantics)."""
    text_scores = _normalize(classify(word, model.text_model,
                                      POS_FEATURE_SETTING))
    bayes_scores = _bayes_classify(word, model)
    return _normalize({t: text_scores.get(t, 0.0)
                       + bayes_scores.get(t, 0.0)
                       for t in set(text_scores) | set(bayes_scores)})


def pos_tag(text: str, model: PosModel) -> list[dict]:
    """AbstractPosTagger.getAnnotations port (:33-45): tokenize, tag
    each token, uppercase the tag. Returns [{start, value, tag}]."""
    out = []
    for tok in iterate_tokens(text):
        scores = classify_token(tok.value, model)
        tag = max(sorted(scores), key=lambda k: scores[k]) \
            if scores else ""
        out.append({"start": tok.start, "value": tok.value,
                    "tag": tag.upper()})
    return out


_POS_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("start", T.IntegerType()),
    T.StructField("value", T.StringType()),
    T.StructField("tag", T.StringType()),
]))


def pos_tag_stage(docs: DataFrame, model_bc,
                  text_col: str = "text") -> DataFrame:
    """docs + pos column: one pandas UDF with the broadcast model —
    document-local, no shuffle."""
    @F.pandas_udf(_POS_SCHEMA)
    def pos_udf(texts: pd.Series) -> pd.Series:
        m = model_bc.value
        return texts.map(lambda t: pos_tag(t or "", m))

    return docs.withColumn("pos", pos_udf(text_col))
