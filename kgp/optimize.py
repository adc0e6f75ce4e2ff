"""Text-classifier hyperparameter optimization — the reference's
feature-setting grid search re-expressed with the grid as the Spark
parallel axis.

Ports:
- FeatureSettingGenerator (classification/text/evaluation/
  FeatureSettingGenerator.java:30-52): every (min, max) n-gram window
  over the char and/or word range; min == max always, wider windows
  only with combinations enabled.
- PruningStrategies.termCount (classification/text/
  PruningStrategies.java:14-33): keep dictionary entries whose TOTAL
  count reaches min_count (none() == min_count 0; the reference's
  none() actually constructs TermCountPruningStrategy(0) against its
  own >0 validation — here 0 is simply a no-op).
- PalladianTextClassifierOptimizer.runOptimization
  (PalladianTextClassifierOptimizer.java:10-44): for every
  (feature setting, pruning, scorer) cell, train on the training
  split, evaluate on the validation split, report metrics +
  numUniqTerms/numEntries.

Spark shape: the reference loops the grid sequentially in one JVM;
here the GRID is the parallel axis — one task per cell via
mapInPandas over a cells DataFrame repartitioned to the grid size,
with the (train, validation) splits BROADCAST once (hyperparameter
search presumes the evaluation sample fits an executor; for
beyond-memory corpora, train each cell with the existing distributed
trainer instead — the grid then parallelizes across jobs, not tasks).
Training a cell's model once and reusing it across that cell's
pruning x scorer combinations mirrors the reference's loop nesting.
"""

from __future__ import annotations

import json
from collections import Counter
from dataclasses import asdict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kgp.textclassifier import (BayesScorer, CategoryEqualizationScorer,
                                DefaultScorer, DictModel, FeatureSetting,
                                classify, most_likely, train)


def generate_feature_settings(chars: tuple[int, int] | None = None,
                              words: tuple[int, int] | None = None,
                              combinations: bool = True
                              ) -> list[FeatureSetting]:
    """FeatureSettingGenerator.create port: insertion-ordered like the
    reference's LinkedHashSet (chars first, then words; per range
    ascending (min, max))."""
    out: list[FeatureSetting] = []
    if chars:
        lo, hi = chars
        for mn in range(lo, hi + 1):
            for mx in range(mn, hi + 1):
                if mn == mx or combinations:
                    out.append(FeatureSetting(mode="char", min_ngram=mn,
                                              max_ngram=mx))
    if words:
        lo, hi = words
        for mn in range(lo, hi + 1):
            for mx in range(mn, hi + 1):
                if mn == mx or combinations:
                    out.append(FeatureSetting(mode="word", min_ngram=mn,
                                              max_ngram=mx))
    return out


def prune_term_count(model: DictModel, min_count: int) -> DictModel:
    """TermCountPruningStrategy: keep entries whose total category
    count >= min_count (0 = keep everything). Returns a new model;
    document counts are unaffected (the reference's
    PruningSimulatedDictionaryModel filters entries only)."""
    if min_count <= 0:
        return model
    kept = {t: cats for t, cats in model.entries.items()
            if sum(cats.values()) >= min_count}
    return DictModel(entries=kept, doc_counts=Counter(model.doc_counts))


_SCORERS = {
    "default": DefaultScorer,
    "equalization": CategoryEqualizationScorer,
    "bayes": BayesScorer,
}


def evaluate_cell(train_instances: list[tuple[str, str]],
                  val_instances: list[tuple[str, str]],
                  fs: FeatureSetting, min_count: int = 0,
                  scorer_name: str = "default",
                  model: DictModel | None = None) -> dict:
    """One grid cell: train (or reuse a pre-trained model for this
    feature setting), prune, classify the validation split, report
    accuracy + macro-F1 + model size (the optimizer's CSV columns)."""
    if model is None:
        model = train(train_instances, fs)
    pruned = prune_term_count(model, min_count)
    scorer = _SCORERS[scorer_name]()
    tp: Counter = Counter()
    fp: Counter = Counter()
    fn: Counter = Counter()
    correct = 0
    for text, actual in val_instances:
        scores = classify(text, pruned, fs, scorer=scorer)
        predicted = most_likely(scores) if scores else None
        if predicted == actual:
            correct += 1
            tp[actual] += 1
        else:
            fp[predicted] += 1
            fn[actual] += 1
    cats = sorted({a for _, a in val_instances})
    f1s = []
    for c in cats:
        p = tp[c] / (tp[c] + fp[c]) if tp[c] + fp[c] else 0.0
        r = tp[c] / (tp[c] + fn[c]) if tp[c] + fn[c] else 0.0
        f1s.append(2 * p * r / (p + r) if p + r else 0.0)
    n_entries = sum(len(cats_) for cats_ in pruned.entries.values())
    return {
        "feature_setting": f"{fs.mode}-{fs.min_ngram}-{fs.max_ngram}",
        "scorer": scorer_name,
        "min_term_count": min_count,
        "accuracy": round(correct / len(val_instances), 6)
        if val_instances else None,
        "macro_f1": round(sum(f1s) / len(f1s), 6) if f1s else None,
        "num_uniq_terms": pruned.num_uniq_terms,
        "num_entries": n_entries,
    }


def optimize_text_classifier(spark: SparkSession,
                             train_instances: list[tuple[str, str]],
                             val_instances: list[tuple[str, str]],
                             settings: list[FeatureSetting],
                             min_counts: tuple[int, ...] = (0,),
                             scorers: tuple[str, ...] = ("default",)
                             ) -> DataFrame:
    """Distributed grid search: one task per FEATURE SETTING (the
    expensive axis — each trains one model, reused across its
    pruning x scorer cells, like the reference's loop nesting); the
    splits broadcast once. Returns the full result grid as a
    DataFrame sorted by macro_f1 desc."""
    sc = spark.sparkContext
    bc = sc.broadcast((train_instances, val_instances))
    cells = spark.createDataFrame(
        [(json.dumps(asdict(fs)),) for fs in settings], "fs string") \
        .repartition(len(settings))

    out_schema = ("feature_setting string, scorer string, "
                  "min_term_count int, accuracy double, "
                  "macro_f1 double, num_uniq_terms int, "
                  "num_entries int")

    mcs, scs = tuple(min_counts), tuple(scorers)

    def run(batches):
        tr, va = bc.value
        for pdf in batches:
            rows = []
            for fs_json in pdf["fs"]:
                fs = FeatureSetting(**json.loads(fs_json))
                model = train(tr, fs)
                for mc in mcs:
                    for sn in scs:
                        rows.append(evaluate_cell(tr, va, fs, mc, sn,
                                                  model=model))
            yield pd.DataFrame(rows)

    return cells.mapInPandas(run, out_schema) \
        .orderBy("macro_f1", ascending=False)
