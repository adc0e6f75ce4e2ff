"""String similarity metrics — the §2.9 scalar library.

Semantics re-derived from the reference metrics
(/root/reference/palladian-commons/src/main/java/ws/palladian/helper/nlp/
LevenshteinSimilarity.java:25-37, JaroWinklerSimilarity.java,
CharacterNGramSimilarity.java:51-85, JaccardSimilarity.java) with the
reference unit-test values as goldens. Pure Python — usable inside any
pandas UDF (fuzzy blocking verify stages, pagination ranking, record
linkage).
"""

from __future__ import annotations


def levenshtein_distance(s1: str, s2: str) -> int:
    """Classic edit distance (insert/delete/substitute, unit costs)."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def levenshtein_similarity(s1: str, s2: str) -> float:
    """1 - distance / max length (LevenshteinSimilarity.java:25-37)."""
    if s1 == s2:
        return 1.0
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 1.0
    return 1.0 - levenshtein_distance(s1, s2) / max_len


def jaro_similarity(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    window = max(len(s1), len(s2)) // 2 - 1
    window = max(window, 0)
    m1 = [False] * len(s1)
    m2 = [False] * len(s2)
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(len(s2), i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i, c in enumerate(s1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if c != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / len(s1) + matches / len(s2)
            + (matches - t) / matches) / 3.0


def jaro_winkler_similarity(s1: str, s2: str, p: float = 0.1,
                            max_prefix: int = 4) -> float:
    """Jaro with the Winkler common-prefix boost (standard constants
    p=0.1, prefix ≤ 4 — matches the reference's test values)."""
    jaro = jaro_similarity(s1, s2)
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix == max_prefix:
            break
        prefix += 1
    return jaro + prefix * p * (1.0 - jaro)


def _padded_ngrams(s: str, n: int) -> set[str]:
    s = "#" * (n - 1) + s + "#" * (n - 1)
    return {s[i:i + n] for i in range(len(s) - n + 1)}


def ngram_similarity(s1: str, s2: str, n: int = 3,
                     mode: str = "dice") -> float:
    """Padded char-n-gram set similarity, DICE (2|∩|/(|A|+|B|)) or
    JACCARD (CharacterNGramSimilarity.java:51-85)."""
    a, b = s1.lower(), s2.lower()
    if a == b:
        return 1.0
    g1, g2 = _padded_ngrams(a, n), _padded_ngrams(b, n)
    inter = len(g1 & g2)
    if mode == "dice":
        return 2.0 * inter / (len(g1) + len(g2)) if g1 or g2 else 1.0
    union = len(g1 | g2)
    return inter / union if union else 1.0


def permute_regex(regexp: str) -> list[str]:
    """RegexPermuter.permute port (helper/nlp/RegexPermuter.java:
    10-58): expand an alternation regex into its concrete strings —
    between-group literals become groups of their own, `(...)?` adds
    an empty alternative (the `_` placeholder stripped at the end),
    and permutations build recursively in group-then-alternative
    order. Used for query/pattern expansion of learned relation
    patterns."""
    import re as _re
    regexp = _re.sub(r"\)\?([^()]+)\(", r")(\1)(", regexp)
    regexp = _re.sub(r"\)([^?][^()]*)\(", r")(\1)(", regexp)
    brackets = _re.findall(r"\(.*?\)\??", regexp)
    splits: list[list[str]] = []
    for bracket in brackets:
        bracket = bracket.replace("(", "").replace(")", "")
        if bracket.endswith("?"):
            bracket = bracket.replace("?", "").strip() + "|_"
        splits.append(bracket.split("|"))
    out: list[str] = []

    def recurse(rest: list[list[str]], current: str) -> None:
        if not rest:
            out.append(current.replace("_", "").strip())
            return
        for alt in rest[0]:
            recurse(rest[1:], current + alt)

    recurse(splits, "")
    return out


def feature_based_similarity(s1: str, s2: str, feature_setting=None,
                             set_sim: str = "jaccard") -> float:
    """FeatureBasedSimilarity port (helper/nlp/FeatureBasedSimilarity
    .java:13-51): equal strings are 1, otherwise the chosen
    SetSimilarity over the Preprocessor's feature SETS (the same
    n-gram/word extraction the text classifier uses)."""
    from kgp.mathstats import set_similarity
    from kgp.textclassifier import FeatureSetting, preprocess
    if feature_setting is None:
        feature_setting = FeatureSetting(mode="char", min_ngram=3,
                                         max_ngram=3,
                                         case_sensitive=False)
    if s1 == s2:
        return 1.0
    return set_similarity(set_sim, set(preprocess(s1, feature_setting)),
                          set(preprocess(s2, feature_setting)))
