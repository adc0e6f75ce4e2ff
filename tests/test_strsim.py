"""String-similarity parity — goldens from the reference's
LevenshteinSimilarityTest, JaroWinklerDistanceTest and
CharacterNGramSimilarityTest."""

from __future__ import annotations

import pytest

from kgp.strsim import (jaro_winkler_similarity, levenshtein_distance,
                        levenshtein_similarity, ngram_similarity)

approx = pytest.approx


def test_levenshtein_reference_goldens():
    assert levenshtein_similarity("Levenshtein", "Lenvinsten") == \
        approx(0.64, abs=0.01)
    assert levenshtein_similarity("Levenshtein", "Levensthein") == \
        approx(0.82, abs=0.01)
    assert levenshtein_similarity("Levenshtein", "Levenshten") == \
        approx(0.91, abs=0.01)
    assert levenshtein_similarity("Levenshtein", "Levenshtein") == 1.0
    assert levenshtein_similarity("", "") == 1.0
    assert levenshtein_distance("kitten", "sitting") == 3


def test_jaro_winkler_reference_goldens():
    jw = jaro_winkler_similarity
    assert jw("", "") == 1.0
    assert jw("MARHTA", "") == 0.0
    assert jw("MARHTA", "MARHTA") == 1.0
    cases = [
        ("MARTHA", "MARHTA", 0.961), ("DWAYNE", "DUANE", 0.84),
        ("DIXON", "DICKSONX", 0.813),
        ("SHACKLEFORD", "SHACKELFORD", 0.982),
        ("DUNNINGHAM", "CUNNIGHAM", 0.896),
        ("NICHLESON", "NICHULSON", 0.956), ("JONES", "JOHNSON", 0.832),
        ("MASSEY", "MASSIE", 0.933), ("ABROMS", "ABRAMS", 0.922),
        ("JERALDINE", "GERALDINE", 0.926), ("MARHTA", "MARTHA", 0.961),
        ("MICHELLE", "MICHAEL", 0.921), ("JULIES", "JULIUS", 0.933),
        ("TANYA", "TONYA", 0.880), ("SEAN", "SUSAN", 0.805),
        ("JON", "JOHN", 0.933), ("cat", "car", 0.822),
        ("http://movies.yahoo.com/browse/list/q",
         "http://movies.yahoo.com/browse/list/r", 0.989),
    ]
    for s1, s2, want in cases:
        assert jw(s1, s2) == approx(want, abs=0.001), (s1, s2)


def test_ngram_similarity_reference_goldens():
    dice = lambda a, b: ngram_similarity(a, b, 3, "dice")  # noqa: E731
    jac = lambda a, b: ngram_similarity(a, b, 3, "jaccard")  # noqa: E731
    assert dice("", "") == 1.0
    assert dice("", "string") == approx(0.0, abs=0.001)
    assert dice("cat", "cat") == 1.0
    assert dice("cat", "caat") == approx(0.727, abs=0.001)
    assert dice("cat", "dog") == approx(0.0, abs=0.001)
    assert dice("philipp", "philip") == approx(0.824, abs=0.001)
    assert dice("philipp", "p") == approx(0.333, abs=0.001)
    assert dice("word", "wort") == approx(0.5, abs=0.001)
    assert jac("cat", "caat") == approx(0.571, abs=0.001)
    assert jac("philipp", "philip") == approx(0.7, abs=0.001)
    assert jac("philipp", "p") == approx(0.2, abs=0.001)
    assert jac("word", "wort") == approx(0.333, abs=0.001)


def test_permute_regex_goldens():
    """RegexPermuterTest.testPermute."""
    from kgp.strsim import permute_regex
    got = permute_regex("(a|b)(d|e)")
    assert set(got) >= {"ad", "ae", "bd", "be"}
    got = permute_regex("(a|b)?(d|e)")
    assert set(got) >= {"ad", "ae", "bd", "be", "d", "e"}
    assert len(got) == 6
    got = permute_regex("(a|b)?(d|ds|e)")
    assert len(got) == 9
    got = permute_regex("(how|what) (is|are) (you|strange)")
    assert {"what is strange", "how are you", "how is strange"} <= \
        set(got)
    assert len(got) == 8


def test_feature_based_similarity():
    # FeatureBasedSimilarity.java:37-44: equal -> 1, else set sim of
    # preprocessor features
    from kgp.strsim import feature_based_similarity
    from kgp.textclassifier import FeatureSetting
    assert feature_based_similarity("Dresden", "Dresden") == 1.0
    assert feature_based_similarity("abc", "xyz") == 0.0
    ws = FeatureSetting(mode="word", min_ngram=1, max_ngram=1,
                        case_sensitive=False)
    # word features: {the, quick, fox} vs {the, lazy, fox}
    got = feature_based_similarity("the quick fox", "the lazy fox",
                                   feature_setting=ws)
    assert got == 0.5  # jaccard 2/4
