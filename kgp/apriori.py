"""Apriori association mining + relation-pattern induction.

Semantics re-derived from
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/apriori/Apriori.java:29-230
(level-wise candidate generation with subset pruning, one-item-
consequent rules plus ap-genrules expansion, support / confidence /
lift). Two execution paths:

  * the LOCAL functions mirror the reference API exactly (golden-
    tested against AprioriTest's itemset and rule confidences);
  * `extract_itemsets_spark` runs the same level-wise loop with
    DISTRIBUTED support counting — candidate sets are tiny and ride a
    broadcast; each pass over the transactions is one groupBy — the
    shape that survives a 100 TB transaction table (passes = max
    frequent-itemset size, not data size);
  * `mine_infix_patterns` applies it to relation induction: frequent
    infix-token itemsets between co-occurring tagged mention pairs are
    exactly the predicate-pattern candidates the hand-written bank in
    kgp.relations encodes.
"""

from __future__ import annotations

from itertools import combinations
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def k_minus_one_subsets(s: frozenset) -> set[frozenset]:
    """All |s|-1-sized subsets (Apriori.kMinusOneSubsets)."""
    return {frozenset(c) for c in combinations(s, len(s) - 1)}


def apriori_gen(level: set[frozenset]) -> set[frozenset]:
    """Candidate generation (Apriori.aprioriGen): join pairs that
    differ in one item, prune candidates with an infrequent subset."""
    level = {frozenset(s) for s in level}
    if not level:
        return set()
    k = len(next(iter(level)))
    joined = {a | b for a in level for b in level if len(a | b) == k + 1}
    return {c for c in joined
            if all(sub in level for sub in k_minus_one_subsets(c))}


def _support(candidate: frozenset, data: list[frozenset]) -> float:
    return sum(1 for t in data if candidate <= t) / len(data)


def extract_itemsets(data, min_support: float) -> dict[frozenset, float]:
    """Frequent itemsets with support (Apriori.extractItemsets)."""
    data = [frozenset(t) for t in data]
    result: dict[frozenset, float] = {}
    level: set[frozenset] = set()
    for item in {frozenset([x]) for t in data for x in t}:
        s = _support(item, data)
        if s >= min_support:
            level.add(item)
            result[item] = s
    while True:
        nxt = set()
        for c in apriori_gen(level):
            s = _support(c, data)
            if s >= min_support:
                nxt.add(c)
                result[c] = s
        if not nxt:
            break
        level = nxt
    return result


class Rule(NamedTuple):
    antecedent: frozenset
    consequent: frozenset
    support: float
    confidence: float
    lift: float


def build_rules(data, min_support: float,
                min_confidence: float) -> dict[tuple[frozenset, frozenset],
                                               Rule]:
    """Association rules (Apriori.buildRules): one-item consequents
    first, then the ap-genrules expansion that only grows consequents
    whose smaller versions were confident."""
    data = [frozenset(t) for t in data]
    itemsets = extract_itemsets(data, min_support)
    rules: dict[tuple[frozenset, frozenset], Rule] = {}

    def add_if_confident(lk: frozenset, y: frozenset,
                         support: float) -> bool:
        x = lk - y
        sx = _support(x, data)
        conf = _support(lk, data) / sx if sx else 0.0
        if conf >= min_confidence:
            lift = conf / _support(y, data)
            rules[(x, y)] = Rule(x, y, support, conf, lift)
            return True
        return False

    for lk, support in itemsets.items():
        if len(lk) < 2:
            continue
        h_m = {frozenset([x]) for x in lk}
        confident = {y for y in h_m if add_if_confident(lk, y, support)}
        h_m = confident
        for _ in range(1, len(lk) - 1):
            h_next = apriori_gen(h_m)
            h_m = {y for y in h_next if add_if_confident(lk, y, support)}
    return rules


# --------------------------------------------------- distributed path


def extract_itemsets_spark(transactions: DataFrame,
                           min_support: float,
                           items_col: str = "items",
                           max_len: int = 4) -> list[tuple[frozenset,
                                                           float]]:
    """The same level-wise loop with DISTRIBUTED support counting: each
    level explodes the (broadcast-small) candidate list against the
    transaction table and counts subset containment in one groupBy.
    Returns [(itemset, support)]."""
    n = transactions.count()
    if n == 0:
        return []
    singles = (transactions
               .select(F.explode(F.array_distinct(items_col)).alias("i"))
               .groupBy("i").count()
               .where(F.col("count") >= min_support * n).collect())
    level = {frozenset([r["i"]]) for r in singles}
    result = [(s, r["count"] / n)
              for r, s in zip(singles,
                              [frozenset([r["i"]]) for r in singles])]

    k = 1
    while level and k < max_len:
        cands = sorted(apriori_gen(level),
                       key=lambda s: sorted(s))
        if not cands:
            break
        cand_list = [sorted(c) for c in cands]
        spark = transactions.sparkSession
        bc = spark.sparkContext.broadcast(cand_list)

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def contained(items: pd.Series) -> pd.Series:
            cl = bc.value
            def hits(it):
                s = set() if it is None else set(it)
                return [i for i, c in enumerate(cl) if set(c) <= s]
            return items.map(hits)

        counts = (transactions
                  .select(F.explode(contained(items_col)).alias("ci"))
                  .groupBy("ci").count()
                  .where(F.col("count") >= min_support * n).collect())
        level = set()
        for r in counts:
            s = frozenset(cand_list[r["ci"]])
            level.add(s)
            result.append((s, r["count"] / n))
        k += 1
    return result


def mine_infix_patterns(links: DataFrame, min_support: float = 0.05,
                        max_infix_len: int = 60) -> DataFrame:
    """Pattern induction for relation extraction: for every same-
    sentence tagged mention pair, the tokens BETWEEN them form a
    transaction keyed by (subj_tag, obj_tag); frequent token sets are
    the predicate-pattern candidates (the learned counterpart of the
    hand bank in kgp.relations). One self-join per sentence group +
    one grouped count — all relational."""
    m = links.select("url", "sent_idx", "start", "end", "tag",
                     "sent_start", "sent_text")
    a, b = m.alias("a"), m.alias("b")
    pairs = (a.join(b, (F.col("a.url") == F.col("b.url"))
                    & (F.col("a.sent_idx") == F.col("b.sent_idx"))
                    & (F.col("a.end") < F.col("b.start")))
             .select(F.col("a.tag").alias("subj_tag"),
                     F.col("b.tag").alias("obj_tag"),
                     F.expr("substring(a.sent_text, "
                            "a.end - a.sent_start + 1, "
                            "b.start - a.end)").alias("infix")))
    pairs = pairs.where(F.length("infix") <= max_infix_len)
    toks = pairs.withColumn(
        "items",
        F.array_distinct(F.split(F.lower(F.trim(
            F.regexp_replace("infix", r"[^A-Za-z ]", " "))), r"\s+")))
    toks = toks.withColumn("items", F.array_remove("items", ""))
    counts = (toks.groupBy("subj_tag", "obj_tag", "items")
              .agg(F.count("*").alias("n")))
    w = F.sum("n").over(Window.partitionBy("subj_tag", "obj_tag"))
    return (counts.withColumn("support", F.col("n") / w)
            .where(F.col("support") >= min_support)
            .orderBy(F.desc("support")))
