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
    # the delimiter character is kept (Tokenizer.java:515 ++endIndex)
    assert phrase_to_end_of_sentence("Costs 30.2% more. Next") == \
        "Costs 30.2% more."
    assert phrase_from_beginning_of_sentence(
        "It rose 30.2% today. The next phrase") == "The next phrase"
    assert phrase_from_beginning_of_sentence("no delimiters here") == \
        "no delimiters here"


def test_reference_tokenizer_sentence_battery():
    """TokenizerTest.testGetSentence (:123-144) + the German
    one-sentence battery of testGetSentences (:146-200) + the
    testTokenize counts (:86-112), transcribed from the reference's
    own test."""
    from kgp.tokenize import (get_sentence, get_sentences,
                              phrase_from_beginning_of_sentence,
                              phrase_to_end_of_sentence, tokenize)
    assert phrase_to_end_of_sentence(
        "Although, many of them (30.2%) are good. As long as") == \
        "Although, many of them (30.2%) are good."
    assert phrase_from_beginning_of_sentence(
        "...now. Although, many of them (30.2%) are good") == \
        "Although, many of them (30.2%) are good"
    for s, p, exp in [
        ("...now. Although, many of them (30.2%) are good. As long as",
         10, "Although, many of them (30.2%) are good."),
        ("...now. Although, many of them (30.2%) are good. As long as",
         40, "Although, many of them (30.2%) are good."),
        ("What is the largest city in usa, (30.2%) in population. "
         "Yahoo! Answers,", 12,
         "What is the largest city in usa, (30.2%) in population."),
        ("What is the largest city in usa, (30.2%) in population? - "
         "Yahoo! Answers,", 12,
         "What is the largest city in usa, (30.2%) in population?"),
        ("...now. Although, has 234,423,234 sq.miles area many of "
         "them (30.2%) are good. As long as", 10,
         "Although, has 234,423,234 sq.miles area many of them "
         "(30.2%) are good."),
    ]:
        assert get_sentence(s, p) == exp, (s, p)
    for t, n in [
        ("That poster costs $22.40. twenty-one.", 7),
        ("Mr. <MUSICIAN>John Hiatt</MUSICIAN> is awesome.", 8),
        ("Mr. '<MUSICIAN>John Hiatt</MUSICIAN>' is awesome.", 10),
        ("Mr. ^<MUSICIAN>John Hiatt</MUSICIAN>) is awesome!!!", 10),
        ("asp.net is very web 2.0. isn't it? web2.0, .net", 14),
        ("40,000 residents", 2),
        ("The United States of America are often called the USA, the "
         "U.S.A., or simply the U.S. The U.N. has its headquarter in "
         "N.Y.C. on the east coast.", 30),
    ]:
        assert len(tokenize(t)) == n, t
    german_single = [
        "Inkl. Wettervorhersage (Thermometer, Hygrometer) und "
        "Wetterindikator.",
        "Die originale Druckpatrone Nr. 920XL (CD975AE) von HP "
        "liefert professionelle Texte und Grafiken in Laserqualität.",
        "Die SFX Power 2 Serie bietet die perfekte Kombination aus "
        "Qualität, Funktionalität, Effizienz und dem für be quiet! "
        "bekannten zuverlässigen, leisen Betrieb für kompakte "
        "Systeme mit überdurchschnittlicher Leistung.",
        "Kräftige Kontraste und das große ----spektrum sorgen für "
        "eine natürliche Lebendigkeit v.a. bei Fotos und Videos.",
        "Die integrierte GPU läuft mit 350 Mhz (max. 1100 mit Turbo) "
        "und teilt sich den gemeinsamen, 3 MB großen L3-Cache mit "
        "der CPU.",
        "Schlüsselfunktionen des E2500 sind u. a. einen "
        "passwortgeschützten Gastzugang mit separatem Netzwerk zu "
        "erstellen, die Zugangszeit zu begrenzen und Webseiten zu "
        "sperren (Kinderschutz durch die Eltern).",
        "Außerdem bietet die HyperX SSD "
        "Hochgeschwindigkeitsübertragung mit SATA Rev. 3.0 "
        "(6 Gbit/s) für eine größere Band-----e, die Anwender für "
        "leistungshungrige Spiele, Multitasking und schnelle "
        "Multimedia-Nutzung benötigen.",
    ]
    for t in german_single:
        assert len(get_sentences(t, language="de")) == 1, t
    two = get_sentences(
        "Das Leben ist wie eine Schachtel Pralinen - man weiß nie "
        "was man kriegt. Bei uns ist jedoch der Satz am B "
        "abgeschnitten.", language="de")
    assert two[1].value == \
        "Bei uns ist jedoch der Satz am B abgeschnitten."
