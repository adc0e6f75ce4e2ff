"""Tokenizer / sentence splitter golden tests.

Cases re-derived from the reference's unit tests
(/root/reference/palladian-core/src/test/java/ws/palladian/extraction/token/TokenizerTest.java,
 .../sentence/SentenceDetectorTest.java) — behavioral parity, not copies.
"""

from __future__ import annotations

from kgp.tokenize import (char_ngrams, get_sentences, iterate_tokens,
                          split_sentences, tokenize, word_ngrams)


def test_tokenize_basic():
    assert tokenize("Making the world a better place.") == [
        "Making", "the", "world", "a", "better", "place", "."]


def test_tokenize_abbreviations_and_money():
    toks = tokenize("Mr. Smith paid $3.55 for the U.S. flag.")
    assert "Mr." in toks
    assert "$3.55" in toks
    assert "U.S." in toks


def test_tokenize_compounds():
    assert "domain-specific" in tokenize("It is domain-specific text.")


def test_token_offsets():
    toks = iterate_tokens("Hello world!")
    assert toks[0] == (0, "Hello")
    assert toks[1] == (6, "world")
    assert toks[2] == (11, "!")


def test_sentence_split_simple():
    s = split_sentences("This is one. This is two. And three!")
    assert [t.value for t in s] == [
        "This is one.", "This is two.", "And three!"]
    assert s[1].start == 13


def test_sentence_split_no_break_on_abbrev():
    s = split_sentences("Dr. Smith arrived early. He left late.")
    assert [t.value for t in s] == [
        "Dr. Smith arrived early.", "He left late."]


def test_sentence_split_masks_urls():
    s = split_sentences(
        "See http://www.example.com/page.html for details. Next sentence.")
    assert len(s) == 2
    assert s[0].value.endswith("for details.")


def test_sentence_split_masks_dates():
    s = split_sentences("It happened on 24.12.2024 in town. All good.")
    assert [t.value for t in s] == [
        "It happened on 24.12.2024 in town.", "All good."]


def test_real_sentence_filter_headline_absorption():
    text = "A Headline\n\nThe real sentence is here today."
    real = get_sentences(text, only_real=True)
    assert [t.value for t in real] == ["The real sentence is here today."]
    assert real[0].start == text.index("The real")


def test_real_sentence_filter_drops_short():
    assert get_sentences("Go now!", only_real=True) == []  # <=8 chars/words
    assert [t.value for t in get_sentences("No trailing punctuation here",
                                           only_real=True)] == []


def test_char_ngrams_padding():
    grams = char_ngrams("ab", 2, 3, padding=True)
    # "##ab##": no pure-padding grams
    assert "#a" in grams and "ab" in grams and "b#" in grams
    assert "##" not in grams


def test_char_edge_ngrams_java_semantics():
    # Tokenizer.java:94-120 — only edge-touching grams survive
    from kgp.tokenize import all_char_edge_ngrams, char_edge_ngrams
    assert char_edge_ngrams("protector", 3) == {"pro", "tor"}
    assert "rot" not in char_edge_ngrams("protector", 3)
    assert char_edge_ngrams("sleeve", 2) == {"sl", "ve"}
    assert char_edge_ngrams("ab", 3) == set()          # shorter than n
    assert char_edge_ngrams("abc", 3) == {"abc"}       # n == length
    assert char_edge_ngrams("protector", 3, must_hit_left_edge=True) \
        == {"pro"}
    got = all_char_edge_ngrams("blue sleeve", 2, 3)
    assert {"bl", "ue", "blu", "lue", "sl", "ve", "sle", "eve"} == got


def test_word_ngrams():
    assert word_ngrams(["a", "b", "c"], 2, 2) == ["a b", "b c"]


def test_offsets_reproject_onto_original():
    text = "Visit http://foo.example.com now. Then rest."
    s = split_sentences(text)
    assert s[0].value == "Visit http://foo.example.com now."
    assert text[s[0].start:s[0].start + len(s[0].value)] == s[0].value


def test_compute_starting_word_ngrams_golden():
    # TokenizerTest.testComputeStartingWordNGrams (:33-39)
    from kgp.tokenize import compute_starting_word_ngrams
    got = compute_starting_word_ngrams("This is a test.", 1, 3)
    assert "This" in got and "This is" in got and "This is a" in got
    assert len(got) == 3


def test_compute_splits():
    from kgp.tokenize import compute_splits
    got = compute_splits("a b c", 1, 2, 500)
    assert ("a", "b", "c") in got
    assert ("a b", "c") in got
    assert ("a", "b c") in got
    assert ("a b c",) not in got        # 3-gram exceeds n2=2
    # max_splits caps the search
    assert len(compute_splits("a b c d e f", 1, 3, 2)) <= 2


def test_phrase_helpers():
    from kgp.tokenize import (phrase_from_beginning_of_sentence,
                              phrase_to_end_of_sentence)
    assert phrase_to_end_of_sentence("Costs 30.2% more. Next") == \
        "Costs 30.2% more"
    assert phrase_from_beginning_of_sentence(
        "It rose 30.2% today. The next phrase") == "The next phrase"
    assert phrase_from_beginning_of_sentence("no delimiters here") == \
        "no delimiters here"
