"""Decision-tree / random-forest classifier (quickdt port).

Reference: the quickdt library vendored in palladian-core
(palladian-core/src/main/java/quickdt/) and its Palladian wrappers
(ws/palladian/classification/dt/QuickDtLearner.java,
QuickDtClassifier.java).

Semantics ported:

- ``Scorer1`` (quickdt/scorers/Scorer1.java:30-39): split score =
  sum over classes of |p_in - p_out| * min(n_in, n_out).
- ``TreeBuilder.buildTree`` (quickdt/TreeBuilder.java:81-147): leaf
  when depth == maxDepth or best-class probability >= minProbability
  (default 1.0); training sets of <= 10 instances skip ordinal
  branches; numeric attributes try an ordinal node first and fall
  back to nominal when its score is 0; the best-scoring branch splits
  the data and recursion re-derives the ordinal candidate thresholds
  from each child subset.
- Ordinal candidates (:30-50,52-77): 4 order-statistic thresholds
  ``sorted[(x+1)*n // 6]`` on the initial pass and
  ``sorted[(x+1)*n // 5]`` when re-derived per child — the
  reference's two different divisors are kept verbatim.  The
  reference reservoir-samples at most 1000 values; we keep all
  values when n <= 1000 (identical) and take a deterministic
  every-k-th systematic sample above (documented deviation — the
  reference is RNG-dependent there).
- Nominal node (:216-268): greedy forward selection of the in-set,
  one value at a time, skipping values whose LOWEST per-class count
  is below ``minNominalAttributeValueOccurances`` (default 5).
- ``OrdinalBranch.decide``: value > threshold -> true child;
  ``NominalBranch.decide``: value in in-set.
- ``Leaf``: per-class counts; probability = count/total
  (quickdt/Leaf.java); missing class -> 0.
- ``RandomForestBuilder`` + ``RandomForest`` (quickdt/randomForest/):
  numTrees trees over the FULL training data (no bagging by
  default), randomized via the random-subspace rule
  ``ignoreAttributeAtNodeProbability = 0.7``
  (QuickDtLearner.randomForest, QuickDtLearner.java:44-49);
  forest probability = mean of tree leaf probabilities.

Determinism: Java iterates HashMap/HashSet in salted order, so the
reference's tie-breaks are unpinnable; this port fixes attribute
scans and nominal value scans to sorted order, leaf argmax ties to
the lexicographically smallest class, and the subspace RNG to an
explicit seed — all documented deviations that only matter on exact
ties.

Spark mapping: training data is model-sized (the reference API is an
in-memory instance list) and trains driver-side from a bounded
collect; CLASSIFICATION is the scale path — ``tree_column`` compiles
the learned tree into one nested CASE WHEN column expression per
class, so scoring a 10^12-row table is pure whole-stage-codegen JVM
work with the model inlined into the plan (no broadcast, no Python).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ORDINAL_TEST_SPLITS = 5
RESERVOIR_SIZE = 1000


# ------------------------------------------------------------- model
@dataclass
class Leaf:
    counts: dict[str, float]
    depth: int

    @property
    def total(self) -> float:
        return sum(self.counts.values())

    def probability(self, cls: str) -> float:
        return self.counts.get(cls, 0.0) / self.total

    def best(self) -> str:
        return max(sorted(self.counts), key=lambda c: self.counts[c])


@dataclass
class Branch:
    attribute: str
    true_child: "Leaf | Branch" = None
    false_child: "Leaf | Branch" = None


@dataclass
class OrdinalBranch(Branch):
    threshold: float = 0.0

    def decide(self, attrs: dict) -> bool:
        v = attrs.get(self.attribute)
        return v is not None and float(v) > self.threshold


@dataclass
class NominalBranch(Branch):
    in_set: frozenset = field(default_factory=frozenset)

    def decide(self, attrs: dict) -> bool:
        return str(attrs.get(self.attribute)) in self.in_set


@dataclass
class TreeModel:
    root: Leaf | Branch
    classes: list[str]

    def leaf(self, attrs: dict) -> Leaf:
        node = self.root
        while isinstance(node, Branch):
            node = node.true_child if node.decide(attrs) \
                else node.false_child
        return node

    def probability(self, attrs: dict, cls: str) -> float:
        return self.leaf(attrs).probability(cls)

    def classify(self, attrs: dict) -> str:
        return self.leaf(attrs).best()


@dataclass
class ForestModel:
    trees: list[TreeModel]
    classes: list[str]

    def probability(self, attrs: dict, cls: str) -> float:
        return sum(t.probability(attrs, cls)
                   for t in self.trees) / len(self.trees)

    def classify(self, attrs: dict) -> str:
        return max(sorted(self.classes),
                   key=lambda c: self.probability(attrs, c))


# ---------------------------------------------------------- training
def _score_split(a: dict[str, float], b: dict[str, float]) -> float:
    """Scorer1.scoreSplit."""
    ta, tb = sum(a.values()), sum(b.values())
    if ta == 0 or tb == 0:
        return 0.0
    score = 0.0
    for cls in set(a) | set(b):
        score += abs(a.get(cls, 0.0) / ta - b.get(cls, 0.0) / tb) \
            * min(ta, tb)
    return score


def _counts(rows: list[tuple[dict, str]]) -> dict[str, float]:
    out: dict[str, float] = {}
    for _, label in rows:
        out[label] = out.get(label, 0.0) + 1.0
    return out


def _sampled_sorted(values: list[float]) -> list[float]:
    """Reservoir stand-in: exact when n <= 1000 (matches the
    reference), deterministic every-k-th sample above (the reference
    uses an RNG there)."""
    if len(values) > RESERVOIR_SIZE:
        step = len(values) / RESERVOIR_SIZE
        values = [values[int(i * step)] for i in range(RESERVOIR_SIZE)]
    return sorted(values)


def _ordinal_split(rows, attribute: str, *, initial: bool) -> list[float]:
    """createOrdinalSplit(s): order statistics (x+1)*n // (k+2) on the
    initial pass, (x+1)*n // (k+1) when re-derived for a child."""
    al = _sampled_sorted([
        float(attrs[attribute]) for attrs, _ in rows
        if isinstance(attrs.get(attribute), (int, float))])
    if not al:
        return []
    k = ORDINAL_TEST_SPLITS - 1
    div = k + 2 if initial else k + 1
    return [al[min((x + 1) * len(al) // div, len(al) - 1)]
            for x in range(k)]


def _create_ordinal_node(rows, attribute: str, splits: list[float]):
    best_score, best_threshold = 0.0, 0.0
    last = None
    for threshold in splits:
        if threshold == last:
            continue
        last = threshold
        in_c: dict[str, float] = {}
        out_c: dict[str, float] = {}
        for attrs, label in rows:
            v = attrs.get(attribute)
            tgt = in_c if (isinstance(v, (int, float))
                           and float(v) > threshold) else out_c
            tgt[label] = tgt.get(label, 0.0) + 1.0
        s = _score_split(in_c, out_c)
        if s > best_score:
            best_score, best_threshold = s, threshold
    return OrdinalBranch(attribute, threshold=best_threshold), best_score


def _create_nominal_node(rows, attribute: str, min_occurances: int):
    values = sorted({str(attrs.get(attribute)) for attrs, _ in rows})
    value_counts: dict[str, dict[str, float]] = {}
    out_c: dict[str, float] = {}
    for attrs, label in rows:
        v = str(attrs.get(attribute))
        vc = value_counts.setdefault(v, {})
        vc[label] = vc.get(label, 0.0) + 1.0
        out_c[label] = out_c.get(label, 0.0) + 1.0
    in_c: dict[str, float] = {}
    score = 0.0
    best_so_far: set[str] = set()

    def add(a, b, sign):
        out = dict(a)
        for k, v in b.items():
            out[k] = out.get(k, 0.0) + sign * v
        return out

    while True:
        best_score, best_val = 0.0, None
        for val in values:
            vc = value_counts.get(val)
            if vc is None:
                continue
            if min_occurances > 0 and min(vc.values()) < min_occurances:
                continue
            s = _score_split(add(in_c, vc, 1), add(out_c, vc, -1))
            if s > best_score:
                best_score, best_val = s, val
        if best_score > score and best_val is not None:
            score = best_score
            best_so_far.add(best_val)
            values.remove(best_val)
            in_c = add(in_c, value_counts[best_val], 1)
            out_c = add(out_c, value_counts[best_val], -1)
        else:
            break
    return NominalBranch(attribute,
                         in_set=frozenset(best_so_far)), score


def _build_tree(rows, depth: int, splits: dict[str, list[float]], *,
                max_depth: int, min_probability: float,
                min_occurances: int, ignore_prob: float,
                rng: random.Random | None):
    counts = _counts(rows)
    leaf = Leaf(counts, depth)
    if depth == max_depth or (counts and max(counts.values())
                              / sum(counts.values())
                              >= min_probability):
        return leaf
    # survey: an attribute is numeric iff every value is numeric
    is_number: dict[str, bool] = {}
    for attrs, _ in rows:
        for k, v in attrs.items():
            is_number[k] = is_number.get(k, True) \
                and isinstance(v, (int, float))
    small = len(rows) <= 10
    best_node, best_score = None, 0.0
    for attribute in sorted(is_number):
        if ignore_prob > 0 and rng is not None \
                and rng.random() < ignore_prob:
            continue
        pair = None
        if not small and is_number[attribute]:
            pair = _create_ordinal_node(rows, attribute,
                                        splits.get(attribute, []))
        if pair is None or pair[1] == 0:
            pair = _create_nominal_node(rows, attribute, min_occurances)
        if pair[1] > best_score:
            best_node, best_score = pair
    if best_node is None:
        return leaf
    if isinstance(best_node, OrdinalBranch):
        attr, thr = best_node.attribute, best_node.threshold
        def goes_true(r):
            v = r[0].get(attr)
            return isinstance(v, (int, float)) and float(v) > thr
        true_rows = [r for r in rows if goes_true(r)]
        false_rows = [r for r in rows if not goes_true(r)]
    else:
        attr = best_node.attribute
        true_rows = [r for r in rows
                     if str(r[0].get(attr)) in best_node.in_set]
        false_rows = [r for r in rows
                      if str(r[0].get(attr)) not in best_node.in_set]
    old_split = None
    if isinstance(best_node, OrdinalBranch):
        old_split = splits.get(best_node.attribute)
        splits[best_node.attribute] = _ordinal_split(
            true_rows, best_node.attribute, initial=False)
    kw = dict(max_depth=max_depth, min_probability=min_probability,
              min_occurances=min_occurances, ignore_prob=ignore_prob,
              rng=rng)
    best_node.true_child = _build_tree(true_rows, depth + 1, splits, **kw)
    if isinstance(best_node, OrdinalBranch):
        splits[best_node.attribute] = _ordinal_split(
            false_rows, best_node.attribute, initial=False)
    best_node.false_child = _build_tree(false_rows, depth + 1, splits,
                                        **kw)
    if isinstance(best_node, OrdinalBranch):
        splits[best_node.attribute] = old_split
    return best_node


def train_tree(instances: list[tuple[dict, str]], *,
               max_depth: int = 2 ** 31 - 1,
               min_probability: float = 1.0,
               min_nominal_occurances: int = 5,
               ignore_attribute_probability: float = 0.0,
               seed: int | None = None) -> TreeModel:
    """TreeBuilder.buildPredictiveModel over (attributes, label)
    pairs."""
    rows = list(instances)
    splits = {}
    numeric_attrs = set()
    for attrs, _ in rows:
        for k, v in attrs.items():
            if isinstance(v, (int, float)):
                numeric_attrs.add(k)
    for a in numeric_attrs:
        splits[a] = _ordinal_split(rows, a, initial=True)
    rng = random.Random(seed) if ignore_attribute_probability > 0 \
        else None
    root = _build_tree(rows, 0, splits, max_depth=max_depth,
                       min_probability=min_probability,
                       min_occurances=min_nominal_occurances,
                       ignore_prob=ignore_attribute_probability,
                       rng=rng)
    classes = sorted({label for _, label in rows})
    return TreeModel(root, classes)


def train_forest(instances: list[tuple[dict, str]], *,
                 num_trees: int = 10,
                 ignore_attribute_probability: float = 0.7,
                 seed: int = 13) -> ForestModel:
    """QuickDtLearner.randomForest: numTrees subspace-randomized trees
    over the full data; probability = mean over trees."""
    trees = [train_tree(
        instances,
        ignore_attribute_probability=ignore_attribute_probability,
        seed=seed + i) for i in range(num_trees)]
    classes = sorted({label for _, label in instances})
    return ForestModel(trees, classes)


def collect_instances(df: DataFrame, label_col: str,
                      feature_cols: list[str],
                      max_rows: int = 100_000) -> list[tuple[dict, str]]:
    """Bounded model-set collect: DataFrame -> instance pairs."""
    rows = df.select(*feature_cols, label_col).limit(max_rows).collect()
    return [({c: r[c] for c in feature_cols}, r[label_col])
            for r in rows]


# -------------------------------------------------- JVM compilation
def _node_prob_expr(node, cls: str) -> Column:
    if isinstance(node, Leaf):
        return F.lit(node.probability(cls))
    if isinstance(node, OrdinalBranch):
        cond = F.col(node.attribute).cast("double") > node.threshold
    else:
        cond = F.col(node.attribute).cast("string").isin(
            *node.in_set) if node.in_set else F.lit(False)
    return F.when(cond, _node_prob_expr(node.true_child, cls)) \
        .otherwise(_node_prob_expr(node.false_child, cls))


def tree_column(model: TreeModel | ForestModel, cls: str) -> Column:
    """Compile the learned model into ONE nested CASE WHEN expression
    producing P(cls) — whole-stage-codegen JVM scoring with the model
    inlined into the plan."""
    if isinstance(model, ForestModel):
        total = None
        for t in model.trees:
            e = _node_prob_expr(t.root, cls)
            total = e if total is None else total + e
        return total / F.lit(float(len(model.trees)))
    return _node_prob_expr(model.root, cls)


def classify_stage(df: DataFrame,
                   model: TreeModel | ForestModel) -> DataFrame:
    """Append per-class probability columns p_<cls> and the argmax
    `predicted` (ties -> lexicographically smallest class, like the
    scalar twin)."""
    out = df
    for cls in model.classes:
        out = out.withColumn(f"p_{cls}", tree_column(model, cls))
    pred = None
    best = None
    for cls in sorted(model.classes):
        p = F.col(f"p_{cls}")
        if pred is None:
            pred, best = F.lit(cls), p
        else:
            pred = F.when(p > best, F.lit(cls)).otherwise(pred)
            best = F.greatest(best, p)
    return out.withColumn("predicted", pred)


# -------------------------------------------- SQL twin for oracles
def _node_prob_sql(node, cls: str) -> str:
    if isinstance(node, Leaf):
        return f"CAST({node.probability(cls)!r} AS DOUBLE)"
    if isinstance(node, OrdinalBranch):
        cond = (f"CAST({node.attribute} AS DOUBLE) > "
                f"{node.threshold!r}")
    elif node.in_set:
        vals = ", ".join("'" + v.replace("'", "''") + "'"
                         for v in sorted(node.in_set))
        cond = f"CAST({node.attribute} AS VARCHAR) IN ({vals})"
    else:
        cond = "FALSE"
    t = _node_prob_sql(node.true_child, cls)
    f_ = _node_prob_sql(node.false_child, cls)
    return f"(CASE WHEN {cond} THEN {t} ELSE {f_} END)"


def tree_sql(model: TreeModel | ForestModel, cls: str) -> str:
    """ANSI-SQL rendering of tree_column — lets a DuckDB oracle score
    the same model symbolically."""
    if isinstance(model, ForestModel):
        parts = " + ".join(_node_prob_sql(t.root, cls)
                           for t in model.trees)
        return f"(({parts}) / {float(len(model.trees))!r})"
    return _node_prob_sql(model.root, cls)


# ----------------------------------------------- deterministic corpus
def synth_training(n: int = 400) -> list[tuple[dict, str]]:
    """Deterministic training set from closed-form arithmetic (no RNG
    so the gate oracle can be regenerated bit-identically): two
    numeric features, one nominal, and a mixed rule label."""
    rows = []
    colors = ["red", "green", "blue"]
    for i in range(n):
        x = (i * 37 % 100) / 10.0
        y = (i * 53 % 100) / 10.0
        color = colors[i % 3]
        label = "pos" if (x + y > 10.0 or color == "red") else "neg"
        rows.append(({"x": x, "y": y, "color": color}, label))
    return rows


def gate_model() -> TreeModel:
    """The fixed tree the dt_predictions gate scores with (trained
    once per process; fully deterministic)."""
    return train_tree(synth_training(), max_depth=6,
                      min_probability=0.98)
