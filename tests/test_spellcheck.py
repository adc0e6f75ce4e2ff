"""PalladianSpellChecker port (kgp/spellcheck.py) — Norvig-corrector
semantics, the reference's candidate tie behavior, and the Spark
fit/correct stages."""

from __future__ import annotations

import pytest

from kgp.spellcheck import (SpellChecker, edits, fit_spell_model,
                            spellcheck_stage)

CORPUS = """spelling is hard but spelling is learnable
the quick brown fox jumps over the lazy dog
she was walking to the store yesterday
a spelling bee is a spelling competition
correct the word before you publish the word
"""


def _model() -> SpellChecker:
    sc = SpellChecker()
    for line in CORPUS.strip().split("\n"):
        sc.add_text(line)
    return sc


def test_edits_order_and_families():
    """edits() order per PalladianSpellChecker.java:158-223: deletes,
    transpositions, alternations, insertions; umlauts after a-z."""
    e = edits("ab")
    assert e[0] == "b" and e[1] == "a"        # deletes
    assert e[2] == "ba"                       # transposition
    # alternations at position 0: a..z then äöü
    assert e[3] == "ab" and e[3 + 25] == "zb" and e[3 + 26] == "äb"
    # total: n deletes + (n-1) transpositions + 29n + 29(n+1)
    assert len(e) == 2 + 1 + 29 * 2 + 29 * 3
    assert edits("") == []
    assert "" not in edits("a")


def test_correct_word_edit1():
    sc = _model()
    assert sc.correct_word("speling") == "spelling"
    assert sc.correct_word("qick") == "quick"
    assert sc.correct_word("broun") == "brown"
    # dictionary words pass through
    assert sc.correct_word("spelling") == "spelling"
    # unknown with no candidate passes through
    assert sc.correct_word("zzzzqqq") == "zzzzqqq"


def test_correct_word_edit2_first_char_pinned():
    sc = _model()
    # two edits away; candidate must share the first character
    assert sc.correct_word("spelng") == "spelling"


def test_context_boost():
    """Bigram context adds 100x its count to a candidate's score
    (PalladianSpellChecker.java:373-380)."""
    sc = SpellChecker()
    sc.add_text("the cat sat")            # cat: 1, the_cat: 1
    sc.add_text("a cut above")            # cut: 1
    sc.add_text("cut cut cut")            # cut: 4, beats cat on counts
    assert sc.correct_word("cet") == "cut"
    # with left context "the", cat gets 1 + 100 > 4
    assert sc.correct_word("cet", left_context="the") == "cat"


def test_uppercase_handling():
    sc = _model()
    # single leading uppercase survives correction
    assert sc.correct_word("Speling") == "Spelling"
    # >1 uppercase letters -> returned lowercased but uncorrected
    # (PalladianSpellChecker.java:356-359)
    assert sc.correct_word("SPeling") == "speling"


def test_manual_mappings():
    sc = _model()
    sc.add_manual_mapping("cov", "cow")
    sc.add_manual_mapping("i pad", "ipad")
    sc.add_text("buy an ipad now")       # keep surrounding words known
    assert sc.correct_word("cov") == "cow"
    assert sc.auto_correct("buy an i pad now") == "buy an ipad now"


def test_auto_correct_sentence():
    sc = _model()
    assert sc.auto_correct("speling is hard") == "spelling is hard"
    # no-correction classes: digits, special chars, short, long words
    assert sc.auto_correct("x2 speling a-b c")  \
        == "x2 spelling a-b c"
    # punctuation re-attached (OTHER_PUNCTUATION type); "done" stays
    # in the dictionary so only the misspelling moves
    sc.add_text("done and done")
    assert sc.auto_correct("speling, done") == "spelling, done"


def test_candidate_tie_last_in_edits_order_wins():
    """Equal-count candidates overwrite each other in the count-keyed
    map; the reference keeps the LAST in edits order."""
    sc = SpellChecker()
    sc.add_text("bat")
    sc.add_text("bit")
    # 'bet' alternation position 1: a..z -> 'bat' comes before 'bit';
    # both count 1 -> bit (later) wins the shared key
    assert sc.correct_word("bet") == "bit"


def test_german_compound_flag_enables_db():
    sc = SpellChecker(german_compound_support=True)
    assert sc.german_noun_db is not None
    assert sc.german_compound_stop_count == 50


def test_fit_and_stage(spark):
    docs = spark.createDataFrame(
        [(i, line) for i, line in
         enumerate(CORPUS.strip().split("\n"))],
        ["doc_id", "text"])
    model = fit_spell_model(docs)
    local = _model()
    assert model.words == local.words
    assert model.contexts == local.contexts

    bad = spark.createDataFrame(
        [(0, "speling is hard"), (1, None)], ["doc_id", "text"])
    rows = {r["doc_id"]: r["corrected"]
            for r in spellcheck_stage(bad, model).collect()}
    assert rows[0] == "spelling is hard"
    assert rows[1] == ""
