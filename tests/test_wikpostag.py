"""WiktionaryPosTagger port tests (WiktionaryPosTagger.java:16-178)."""

import pytest

from kgp.wikpostag import (POS_TAG_MAPPING, is_numeric_expression,
                           tag_tokens, tagged_string,
                           wiktionary_pos_stage)


# ----------------------------------------------- isNumericExpression
@pytest.mark.parametrize("s,expected", [
    ("", False),
    ("1000", True),            # pure digits
    ("3,5", True),             # digits + comma
    ("10%", True),             # % allowed
    ("1:30", True),            # ':' allowed
    ("-12", True),             # dash punctuation
    ("$5", True),              # currency symbol
    ("5km", True),             # unit branch: 5 km -> 5000 != 5
    ("2GB", True),             # digital unit
    ("5xyz", False),           # unknown suffix -> multiplier 1
    ("abc", False),
    ("seven", False),
    ("5'9\"", True),           # feet/inches special format
])
def test_is_numeric_expression(s, expected):
    assert is_numeric_expression(s) is expected


# -------------------------------------------------- local rule chain
def test_hardcoded_chain():
    lookup = {}.get
    toks = ["The", "a", "A", "be", "were", "was", "being", "am",
            "been", "are", "is", "and", "or", "do", "did", "does",
            "this", "that", "some", "any", "these", "those", "either",
            "have", "had", "having", "can", "should", "will", "me",
            "him", "them", "he", "she", "it", "one", "I", "we",
            "they", "you", "unknown"]
    tags = tag_tokens(toks, lookup)
    assert tags == ["AT", "AT", "AT", "BE", "BED", "BEDZ", "BEG",
                    "BEM", "BEN", "BER", "BEZ", "CC", "CC", "DO",
                    "DOD", "DOZ", "DT", "DT", "DTI", "DTI", "DTS",
                    "DTS", "DTX", "HV", "HVD", "HVG", "MD", "MD",
                    "MD", "PPO", "PPO", "PPO", "PPS", "PPS", "PPS",
                    "PPS", "PPSS", "PPSS", "PPSS", "PPSS", "?"]


def test_single_char_is_its_own_tag():
    # evident-intent branch (reference's commented-out body + its own
    # example "./." "$/$", WiktionaryPosTagger.java:57-62,160-167)
    assert tag_tokens([".", "$", ",", "x"], {}.get) == \
        [".", "$", ",", "X"]


def test_dictionary_lookup_and_mapping():
    d = {"quick": "Adjective", "Fox": "Noun", "runs": "Verb",
         "of": "Preposition", "an": "Article", "Rome": "Proper",
         "ouch": "Interjection"}
    tags = tag_tokens(["quick", "Quick", "Fox", "fox", "runs", "of",
                       "an", "Rome", "ouch", "none"], d.get)
    #  'Quick' -> exact miss, lowercase retry hits (:129-135)
    #  'fox'   -> exact miss, lowercase retry misses ('Fox' as written)
    assert tags == ["JJ", "JJ", "NN", "?", "VB", "IN", "AT", "NNP",
                    "INTERJECTION", "?"]


def test_reference_example_sentence():
    """The reference's own expected tagging (WiktionaryPosTagger.java:
    160-167, the 'Wiktionary:' comment line)."""
    d = {"quick": "Adjective", "brown": "Noun", "fox": "Noun",
         "jumps": "Noun", "over": "Adjective", "lazy": "Adjective",
         "dog": "Noun", "as": "Noun", "fast": "Verb",
         "happy": "Adjective", "could": "Verb", "make": "Verb"}
    text = ("The quick brown fox jumps over the lazy dog. I did this "
            "as fast as you and was as happy as 1000$ could make one.")
    expected = ("The/AT quick/JJ brown/NN fox/NN jumps/NN over/JJ "
                "the/AT lazy/JJ dog/NN ./. I/PPSS did/DOD this/DT "
                "as/NN fast/VB as/NN you/PPSS and/CC was/BEDZ as/NN "
                "happy/JJ as/NN 1000/CD $/$ could/VB make/VB one/PPS "
                "./.")
    assert tagged_string(text, d.get) == expected


# -------------------------------------------------------- Spark stage
def test_stage_matches_local(spark):
    toks = ["The", "word1", "Word2", "5km", "1000", "3,5", "5xyz",
            ".", "$", "I", "a", "was", "and", "either", "me", "he",
            "we", "can", "have", "did", "zz9", "2GB", "10%", "ouch"]
    d = {"word1": "Noun", "Word2": "Verb", "ouch": "Interjection"}
    expected = tag_tokens(toks, d.get)
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "pos int, token string")
    wdf = spark.createDataFrame(list(d.items()),
                                "word string, word_type string")
    out = wiktionary_pos_stage(tdf, wdf).orderBy("pos").collect()
    assert [r.tag for r in out] == expected


def test_stage_lowercase_retry(spark):
    # capitalized token, lowercase dictionary word -> retry hits;
    # lowercase token vs capitalized dictionary word -> stays '?'
    tdf = spark.createDataFrame([(0, "Word"), (1, "other")],
                                "pos int, token string")
    wdf = spark.createDataFrame([("word", "Noun"), ("Other", "Verb")],
                                "word string, word_type string")
    rows = {r.token: r.tag
            for r in wiktionary_pos_stage(tdf, wdf).collect()}
    assert rows == {"Word": "NN", "other": "?"}


def test_stage_plan_broadcasts_and_minimal_python(spark):
    tdf = spark.createDataFrame([(0, "word")], "pos int, token string")
    wdf = spark.createDataFrame([("word", "Noun")],
                                "word string, word_type string")
    plan = wiktionary_pos_stage(tdf, wdf) \
        ._jdf.queryExecution().executedPlan().toString()
    # dictionary joins broadcast; the only Python is the Arrow batch
    # over the DISTINCT number-prefixed candidates
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("ArrowEvalPython") <= 1
    assert "BatchEvalPython" not in plan


def test_mapping_table_complete():
    assert POS_TAG_MAPPING == {"Article": "AT", "Noun": "NN",
                               "Proper": "NNP", "Adjective": "JJ",
                               "Verb": "VB", "Preposition": "IN"}
