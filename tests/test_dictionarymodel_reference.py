"""Upstream dictionary-model / pruning test vectors, transcribed
mechanically against the kgp.textclassifier DictModel twin.

Sources (assertions copied 1:1):
- AbstractDictionaryModelTest.java:63-95 (model statistics)
- PruningStrategiesTest.java:42-67 (information-gain values + term
  count pruning)
"""

from collections import Counter

from kgp.textclassifier import (DictModel, category_entropy,
                                information_gain,
                                prune_information_gain,
                                prune_term_count)


def _add_doc(model: DictModel, terms, category):
    for t in set(terms):
        model.entries.setdefault(t, {})[category] = \
            model.entries.get(t, {}).get(category, 0) + 1
    model.doc_counts[category] += 1


def _dictionary_model() -> DictModel:
    m = DictModel()
    _add_doc(m, ["word1", "word3"], "category1")
    _add_doc(m, ["word2", "word4"], "category2")
    _add_doc(m, ["word3", "word4"], "category2")
    _add_doc(m, ["word1", "word3"], "category1")
    _add_doc(m, ["word4"], "category2")
    _add_doc(m, ["word3"], "category1")
    return m


def _prob(m: DictModel, term: str, cat: str) -> float:
    cats = m.entries.get(term, {})
    total = sum(cats.values())
    return cats.get(cat, 0) / total if total else 0.0


def test_dictionary_model():
    m = _dictionary_model()
    assert _prob(m, "word1", "category1") == 1.0
    assert m.entries["word1"]["category1"] == 2
    assert _prob(m, "word2", "category2") == 1.0
    assert m.entries["word1"].get("category2", 0) == 0
    assert _prob(m, "word3", "category1") == 0.75
    assert _prob(m, "word3", "category2") == 0.25
    assert sum(m.entries["word3"].values()) == 4
    assert _prob(m, "word4", "category2") == 1.0
    assert _prob(m, "word5", "category1") == 0.0
    assert _prob(m, "word5", "category2") == 0.0
    assert len(m.category_sums) == 2              # getNumCategories
    assert m.num_uniq_terms == 4
    assert m.num_terms == 10
    num_entries = sum(len(c) for c in m.entries.values())
    assert num_entries == 5
    assert m.num_docs == 6
    assert m.doc_counts["category1"] / m.num_docs == 0.5
    assert m.doc_counts["category2"] / m.num_docs == 0.5
    assert m.category_sums["category1"] == 5      # getTermCounts
    assert m.category_sums["category2"] == 5


# ------------------------------------------- PruningStrategiesTest


def _pruning_model() -> DictModel:
    m = DictModel()

    def add(n, cat, *terms):
        for _ in range(n):
            _add_doc(m, terms, cat)

    add(1, "categoryA", "term1", "term2", "term3")
    add(4, "categoryA", "term1", "term3")
    add(1, "categoryB", "term1", "term2", "term3", "term4", "term5")
    add(3, "categoryB", "term1", "term2", "term3", "term5")
    add(1, "categoryB", "term1", "term3", "term5")
    add(10, "categoryC", "term1", "term6")
    return m


def test_info_gain_pruning_strategy():
    m = _pruning_model()
    assert m.num_docs == 20
    assert abs(information_gain(m, "term1") - 0) < 0.01
    assert abs(information_gain(m, "term2") - 0.45) < 0.01
    assert abs(information_gain(m, "term3") - 1) < 0.01
    assert abs(information_gain(m, "term4") - 0.10) < 0.01
    assert abs(information_gain(m, "term5") - 0.81) < 0.01
    assert abs(information_gain(m, "term6") - 1) < 0.01


def test_term_count_pruning_strategy():
    m = _pruning_model()
    pruned = prune_term_count(m, 5)
    assert pruned.num_uniq_terms == 5
    # pruning keeps document statistics intact
    assert pruned.num_docs == 20


def test_info_gain_pruning_transform():
    m = _pruning_model()
    pruned = prune_information_gain(m, 0.5)
    assert set(pruned.entries) == {"term3", "term5", "term6"}


def test_category_entropy():
    # A=5, B=5, C=10 -> 1.5 bits
    assert abs(category_entropy(Counter(A=5, B=5, C=10)) - 1.5) < 1e-9
    assert category_entropy(Counter()) == 0.0
