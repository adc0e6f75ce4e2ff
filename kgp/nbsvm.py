"""NBSVM — linear classifier over naive-Bayes log-count-ratio
features (palladian-external classification/text/nbsvm/
NbSvmLearner.java:61-126, NbSvmClassifier.java:29-37; Wang & Manning
2012, "Baselines and Bigrams").

Reference semantics:

- binary only, categories literally '0' and '1' (other labels throw,
  NbSvmLearner.java:81-88).
- per-token class-count vectors p (category '1') and q ('0')
  initialized to ALPHA = 1, incremented by the VECTORIZER value
  (counts or tf-idf); r_i = log((p_i / sum(p)) / (q_i / sum(q)));
  features become value * r_i, tokens outside the training
  dictionary are DROPPED (transform, :114-126).
- the linear model is liblinear L2R_LR (C=1, eps=0.01). The bundled
  liblinear binary is substituted by pyspark.ml LogisticRegression
  over the same transformed vectors — the repo's standard stand-in
  where the reference wires a packaged native learner (same
  precedent as QuickDt in disambig_ml/contentdates); documented.
- the reference accumulates p/q in sequential float32; the
  distributed fit aggregates in float64 and casts the final r to
  float32 (cross-partition float32 accumulation order is not
  reproducible anywhere; pytest pins the twin agreement).

Spark shape: the fit is ONE explode -> (token, category) aggregation
(map-side combine; vocabulary-sized result to the driver), the
transform a broadcast-dictionary Arrow pass producing sparse
pyspark.ml vectors.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRUE_CATEGORY = "1"
FALSE_CATEGORY = "0"
ALPHA = 1.0


# ------------------------------------------------------------ pure twin

def nb_ratio_local(instances: list[tuple[dict, str]],
                   float32: bool = True) -> tuple[dict, list[float]]:
    """Sequential twin of the r computation (NbSvmLearner.java:66-101):
    returns (dictionary token->index, r). float32 accumulation like
    the Java floats when float32=True."""
    dt = np.float32 if float32 else np.float64
    tokens: list[str] = []
    seen = set()
    for vec, _ in instances:
        for t in vec:
            if t not in seen:
                seen.add(t)
                tokens.append(t)
    dictionary = {t: i for i, t in enumerate(tokens)}
    p = np.full(len(tokens), ALPHA, dtype=dt)
    q = np.full(len(tokens), ALPHA, dtype=dt)
    for vec, cat in instances:
        if cat == TRUE_CATEGORY:
            for t, v in vec.items():
                p[dictionary[t]] += dt(v)
        elif cat == FALSE_CATEGORY:
            for t, v in vec.items():
                q[dictionary[t]] += dt(v)
        else:
            raise ValueError(
                f"Instance must be of category '{FALSE_CATEGORY}' or "
                f"'{TRUE_CATEGORY}'")
    p_sum = dt(0)
    q_sum = dt(0)
    for i in range(len(tokens)):
        p_sum = dt(p_sum + p[i])
        q_sum = dt(q_sum + q[i])
    r = [float(dt(math.log(float(p[i]) / float(p_sum)
                           / (float(q[i]) / float(q_sum)))))
         for i in range(len(tokens))]
    return dictionary, r


def transform_local(dictionary: dict, r: list[float],
                    vec: dict) -> dict:
    """NbSvmLearner.transform (:114-126): value * r, unknown tokens
    dropped."""
    out = {}
    for t, v in vec.items():
        idx = dictionary.get(t)
        if idx is not None:
            out[t] = v * r[idx]
    return out


# --------------------------------------------------------------- stages

def nbsvm_fit_ratios(vectors: DataFrame,
                     tokens_col: str = "tokens",
                     label_col: str = "category"
                     ) -> tuple[dict, list[float]]:
    """Distributed r fit: vectors(doc) carries a map<token, value>;
    ONE explode + (token, class) aggregation; vocabulary-sized
    collect. Labels outside {'0','1'} raise like the reference."""
    bad = vectors.where(~F.col(label_col).isin(TRUE_CATEGORY,
                                               FALSE_CATEGORY)).count()
    if bad:
        raise ValueError(f"Instance must be of category "
                         f"'{FALSE_CATEGORY}' or '{TRUE_CATEGORY}'")
    exploded = vectors.select(
        F.col(label_col).alias("cat"),
        F.explode(F.col(tokens_col)).alias("token", "value"))
    agg = exploded.groupBy("token").agg(
        F.sum(F.when(F.col("cat") == TRUE_CATEGORY, F.col("value"))
              .otherwise(0.0)).alias("p"),
        F.sum(F.when(F.col("cat") == FALSE_CATEGORY, F.col("value"))
              .otherwise(0.0)).alias("q")) \
        .orderBy("token").collect()
    tokens = [row["token"] for row in agg]
    dictionary = {t: i for i, t in enumerate(tokens)}
    p = np.array([row["p"] for row in agg], dtype=np.float64) + ALPHA
    q = np.array([row["q"] for row in agg], dtype=np.float64) + ALPHA
    r = np.log((p / p.sum()) / (q / q.sum())).astype(np.float32)
    return dictionary, [float(v) for v in r]


def nbsvm_transform(vectors: DataFrame, dictionary: dict,
                    r: list[float], tokens_col: str = "tokens",
                    out_col: str = "features") -> DataFrame:
    """Broadcast-dictionary transform into pyspark.ml sparse vectors
    (value * r_i, unknown tokens dropped) — one Arrow pass."""
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql import types as T
    spark = vectors.sparkSession
    b = spark.sparkContext.broadcast((dictionary, list(r)))

    @F.udf(VectorUDT())
    def to_vec(tokens):
        d, rr = b.value
        pairs = {}
        for t, v in (tokens or {}).items():
            idx = d.get(t)
            if idx is not None:
                pairs[idx] = float(v) * rr[idx]
        return SparseVector(len(rr), sorted(pairs.items()))

    return vectors.withColumn(out_col, to_vec(F.col(tokens_col)))


def nbsvm_train(vectors: DataFrame, tokens_col: str = "tokens",
                label_col: str = "category"):
    """Full NBSVM fit: r ratios + LogisticRegression (the documented
    liblinear L2R_LR stand-in; C=1 -> regParam=1/n on the lbfgs
    formulation is NOT identical — kept at a small fixed regParam).
    Returns (dictionary, r, fitted model)."""
    from pyspark.ml.classification import LogisticRegression
    dictionary, r = nbsvm_fit_ratios(vectors, tokens_col, label_col)
    train = nbsvm_transform(vectors, dictionary, r, tokens_col) \
        .select(F.col(label_col).cast("double").alias("label"),
                "features")
    lr = LogisticRegression(maxIter=100, regParam=0.01, tol=1e-4)
    return dictionary, r, lr.fit(train)


def nbsvm_predict(vectors: DataFrame, dictionary: dict,
                  r: list[float], model,
                  tokens_col: str = "tokens") -> DataFrame:
    """Adds `predicted` ('0'/'1') and `p_true` columns."""
    scored = model.transform(
        nbsvm_transform(vectors, dictionary, r, tokens_col))
    from pyspark.ml.functions import vector_to_array
    return scored.withColumn(
        "predicted", F.col("prediction").cast("int").cast("string")) \
        .withColumn("p_true",
                    vector_to_array(F.col("probability"))[1]) \
        .drop("features", "rawPrediction", "probability", "prediction")
