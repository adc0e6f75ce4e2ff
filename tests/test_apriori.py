"""Apriori parity (AprioriTest.java goldens) + distributed mining."""

from __future__ import annotations

import pytest

from kgp.apriori import (apriori_gen, build_rules, extract_itemsets,
                         extract_itemsets_spark, k_minus_one_subsets,
                         mine_infix_patterns)

fs = frozenset


def test_k_minus_one_subsets():
    got = k_minus_one_subsets(fs([1, 2, 3, 4]))
    assert got == {fs([2, 3, 4]), fs([1, 3, 4]), fs([1, 2, 4]),
                   fs([1, 2, 3])}


def test_apriori_gen():
    l3 = {fs([1, 2, 3]), fs([1, 2, 4]), fs([1, 2, 5]), fs([1, 3, 4]),
          fs([1, 3, 5]), fs([2, 3, 4])}
    assert apriori_gen(l3) == {fs([1, 2, 3, 4])}


def test_extract_itemsets_reference_golden():
    data = [{"a", "b", "c"}, {"a", "b", "c", "d", "e"}, {"a", "c", "d"},
            {"a", "c", "d", "e"}, {"a", "b", "c", "d"}]
    got = extract_itemsets(data, 0.4)
    assert len(got) == 23
    approx = pytest.approx
    assert got[fs("a")] == approx(1.0, abs=0.01)
    assert got[fs("b")] == approx(0.6, abs=0.01)
    assert got[fs(["a", "c"])] == approx(1.0, abs=0.01)
    assert got[fs(["a", "c", "d"])] == approx(0.8, abs=0.01)
    assert got[fs(["a", "b", "c", "d"])] == approx(0.4, abs=0.01)
    assert got[fs(["a", "c", "d", "e"])] == approx(0.4, abs=0.01)


def test_build_rules_reference_golden():
    data = [{1, 2, 5}, {2, 4}, {2, 3, 6}, {1, 2, 4}, {1, 3}, {2, 3},
            {1, 3}, {1, 2, 3, 5}, {1, 2, 3}]
    rules = build_rules(data, 0.1, 0.1)
    approx = pytest.approx

    def conf(x, y):
        return rules[(fs(x), fs(y))].confidence

    assert conf([1, 2], [5]) == approx(0.5, abs=0.01)
    assert conf([1, 5], [2]) == approx(1.0, abs=0.01)
    assert conf([2, 5], [1]) == approx(1.0, abs=0.01)
    assert conf([1], [2, 5]) == approx(0.33, abs=0.01)
    assert conf([2], [1, 5]) == approx(0.29, abs=0.01)
    assert conf([5], [1, 2]) == approx(1.0, abs=0.01)


def test_extract_itemsets_spark_matches_local(spark):
    data = [{"a", "b", "c"}, {"a", "b", "c", "d", "e"}, {"a", "c", "d"},
            {"a", "c", "d", "e"}, {"a", "b", "c", "d"}]
    df = spark.createDataFrame([(sorted(t),) for t in data],
                               "items array<string>")
    got = dict(extract_itemsets_spark(df, 0.4, max_len=5))
    want = extract_itemsets(data, 0.4)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_mine_infix_patterns_learns_predicates(spark):
    rows = []
    for i in range(20):
        s = f"Org{i} is headquartered in City{i}."
        rows.append(("u%d" % i, 0, 0, 4 + len(str(i)), "ORG", 0, s))
        rows.append(("u%d" % i, 0, s.index("City"),
                     s.index("City") + 5 + len(str(i)), "CITY", 0, s))
    links = spark.createDataFrame(
        rows, "url string, sent_idx int, start int, end int, "
              "tag string, sent_start int, sent_text string")
    got = mine_infix_patterns(links, min_support=0.5).collect()
    key = {(r.subj_tag, r.obj_tag): set(r.items) for r in got}
    assert key[("ORG", "CITY")] == {"is", "headquartered", "in"}
