"""Feature-setting grid search (kgp/optimize.py) — generator port,
pruning semantics, and the distributed grid vs per-cell parity."""

from __future__ import annotations

from kgp.optimize import (evaluate_cell, generate_feature_settings,
                          optimize_text_classifier, prune_term_count)
from kgp.textclassifier import FeatureSetting, train

TRAIN = [
    ("the stock market rallied on strong earnings", "finance"),
    ("shares dropped after the bank reported losses", "finance"),
    ("investors bought bonds and equities today", "finance"),
    ("the team scored twice in the second half", "sports"),
    ("the striker won the match with a late goal", "sports"),
    ("fans cheered as the champions lifted the cup", "sports"),
]
VAL = [
    ("the market fell as the bank cut earnings", "finance"),
    ("equities and bonds rallied for investors", "finance"),
    ("a late goal won the cup for the champions", "sports"),
    ("the striker scored in the second half", "sports"),
]


def test_generate_feature_settings_combinations():
    """FeatureSettingGenerator.create: chars(5,8).words(1,3) with
    combinations = every (min<=max) window; 10 char + 6 word = 16."""
    got = generate_feature_settings(chars=(5, 8), words=(1, 3))
    assert len(got) == 10 + 6
    assert got[0].mode == "char" and got[0].min_ngram == 5
    assert got[0].max_ngram == 5
    assert got[1].max_ngram == 6          # (5,6) follows (5,5)
    words = [fs for fs in got if fs.mode == "word"]
    assert [(f.min_ngram, f.max_ngram) for f in words] == \
        [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)]


def test_generate_feature_settings_no_combinations():
    got = generate_feature_settings(chars=(5, 8), words=(1, 3),
                                    combinations=False)
    assert [(f.mode, f.min_ngram, f.max_ngram) for f in got] == \
        [("char", n, n) for n in range(5, 9)] + \
        [("word", n, n) for n in range(1, 4)]


def test_prune_term_count():
    fs = FeatureSetting(mode="word", min_ngram=1, max_ngram=1,
                        min_term_len=1, max_term_len=100)
    model = train(TRAIN, fs)
    pruned = prune_term_count(model, 2)
    assert pruned.num_uniq_terms < model.num_uniq_terms
    assert all(sum(c.values()) >= 2 for c in pruned.entries.values())
    # doc counts untouched; min_count 0 is identity
    assert pruned.num_docs == model.num_docs
    assert prune_term_count(model, 0) is model


def test_evaluate_cell_separable():
    fs = FeatureSetting(mode="char", min_ngram=4, max_ngram=7)
    r = evaluate_cell(TRAIN, VAL, fs)
    assert r["accuracy"] == 1.0 and r["macro_f1"] == 1.0
    assert r["num_uniq_terms"] > 0
    assert r["num_entries"] >= r["num_uniq_terms"]


def test_optimize_grid_matches_local_cells(spark):
    settings = generate_feature_settings(chars=(4, 5), words=(1, 2))
    got = optimize_text_classifier(
        spark, TRAIN, VAL, settings, min_counts=(0, 2),
        scorers=("default", "bayes")).collect()
    assert len(got) == len(settings) * 2 * 2
    # spot-check three cells against the pure evaluation
    by_key = {(r.feature_setting, r.scorer, r.min_term_count): r
              for r in got}
    for fs in settings[:3]:
        key = (f"{fs.mode}-{fs.min_ngram}-{fs.max_ngram}", "bayes", 2)
        want = evaluate_cell(TRAIN, VAL, fs, 2, "bayes")
        r = by_key[key]
        assert r.accuracy == want["accuracy"]
        assert r.macro_f1 == want["macro_f1"]
        assert r.num_uniq_terms == want["num_uniq_terms"]
    # sorted by macro_f1 desc
    f1s = [r.macro_f1 for r in got]
    assert f1s == sorted(f1s, reverse=True)
