"""German compound splitting — WordTransformerTest.testSplitGermanCompounds
goldens (WordTransformerTest.java:22-51) against the injected demo
lexicon, plus the spell-checker compound gate
(PalladianSpellChecker.java:402-426)."""

from __future__ import annotations

from kgp.germancompound import (GermanNounDb, demo_db, load_noun_db_tsv,
                                split_german_compound_words,
                                word_to_singular_german)
from kgp.spellcheck import SpellChecker


def test_reference_goldens():
    db = demo_db()
    # misspelled head still separates: platouschuhe -> platou + schuh
    assert split_german_compound_words("platouschuhe", db) == \
        ["platou", "schuh"]
    # no suffix match -> the word itself
    assert split_german_compound_words("hadny", db) == ["hadny"]
    # forceSplit ignores the whole-word dictionary hit
    assert split_german_compound_words("Fahrradschlösser", db,
                                       force_split=True) == \
        ["fahrrad", "schloss"]
    assert split_german_compound_words("Teaktische", db) == \
        ["teak", "tisch"]
    assert split_german_compound_words("Kunststofftische", db) == \
        ["kunststoff", "tisch"]


def test_singular_transform_recursive_suffix():
    db = demo_db()
    assert word_to_singular_german("ketten", db) == "kette"
    # suffix fallback: goldketten -> (suffix ketten) -> goldkette
    assert word_to_singular_german("goldketten", db) == "goldkette"
    # unknown word passes through
    assert word_to_singular_german("xyz", db) == "xyz"


def test_tsv_loader_reference_format():
    db = load_noun_db_tsv([
        "die\tKette\tdie\tKetten",
        "das\tHaus\tdie\tHäuser",
        "broken line",                       # <4 cols skipped
        "der\t\tdie\tLeere",                 # empty singular skipped
    ])
    assert db.plural_singular == {"ketten": "kette", "häuser": "haus"}
    # nouns longest-first (StringLengthComparator)
    assert db.nouns[0] in ("häuser", "ketten")
    assert len(db.nouns[0]) >= len(db.nouns[-1])


def test_spellchecker_compound_gate():
    words = {"gold": 5, "kette": 7, "der": 90, "hund": 3}
    sc = SpellChecker(words=words, german_compound_support=True)
    # goldkette: not in dict, parts gold+kette both known -> unchanged
    assert sc.correct_word("goldkette") == "goldkette"
    # plural compound resolves via the singular transform
    assert sc.correct_word("goldketten") == "goldketten"
    # non-compound typo still corrects (edit distance 1)
    assert sc.correct_word("hunt") == "hund"
    # compound gate respects the stop count: a high-count edit-1
    # candidate wins over the compound interpretation
    sc2 = SpellChecker(words={"goldketter": 99, "gold": 5, "kette": 7},
                       german_compound_support=True,
                       german_compound_stop_count=50)
    assert sc2.correct_word("goldkette") == "goldketter"
    # ...but below the stop count the compound stands
    sc3 = SpellChecker(words={"goldketter": 10, "gold": 5, "kette": 7},
                       german_compound_support=True,
                       german_compound_stop_count=50)
    assert sc3.correct_word("goldkette") == "goldkette"


def test_compound_parts_must_all_be_known():
    sc = SpellChecker(words={"gold": 5, "kette": 7},
                      german_compound_support=True)
    # remainder "platou" unknown -> not compound-correct -> word kept
    # only because edit-2 finds nothing either
    assert sc.correct_word("platoukette") == "platoukette"


def test_restart_index_quirk():
    """After a match the reference re-scans from list index 1 — the
    LONGEST word is never re-tested. Pin that behavior."""
    db = GermanNounDb([], words=["aaaabbbb", "bbbb", "aaaa"])
    # length sort: aaaabbbb, then aaaa/bbbb (ci lexicographic)
    assert db.words == ["aaaabbbb", "aaaa", "bbbb"]
    # aaaabbbbaaaabbbb: first match aaaabbbb (suffix), replace-all
    # empties the word in one step
    assert split_german_compound_words("aaaabbbbaaaabbbb", db) == \
        ["aaaabbbb"]
