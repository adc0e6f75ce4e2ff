"""Upstream NER-evaluation test vectors, transcribed mechanically,
run on the reference's OWN fixture files.

Sources (assertions copied 1:1):
- EvaluationResultTest.java:20-135 (goldStandardXml.txt vs
  nerResultXml.txt — every per-tag count, EXACT_MATCH / MUC /
  RECOGNITION precision and recall)
- FileFormatParserTest.java:15-49 (/ner/training.txt column parses,
  token-based and phrase-based, with exact offsets)
"""

from kgp.conll import (annotations_from_xml_text,
                       evaluate_annotations, parse_column)

RES = "/root/reference/palladian-core/src/test/resources"


def _result():
    gold = annotations_from_xml_text(
        open(f"{RES}/ner/evaluation/goldStandardXml.txt").read())
    pred = annotations_from_xml_text(
        open(f"{RES}/ner/evaluation/nerResultXml.txt").read())
    return evaluate_annotations(gold, pred)


def test_evaluation_result():
    r = _result()

    assert r.actual["UNIT"] == 2
    assert r.actual["LANDMARK"] == 2
    assert r.actual["POI"] == 3
    assert r.actual["COUNTRY"] == 6
    assert r.actual["CITY"] == 2

    assert r.possible["UNIT"] == 1
    assert r.possible["LANDMARK"] == 3
    assert r.possible["POI"] == 5
    assert r.possible["COUNTRY"] == 3
    assert r.possible["CITY"] == 2

    assert sum(r.possible.values()) == 14
    assert sum(r.actual.values()) == 15

    assert r.result_type_count("CORRECT") == 5
    assert r.result_type_count("ERROR1") == 3
    assert r.result_type_count("ERROR2") == 2
    assert r.result_type_count("ERROR3") == 1
    assert r.result_type_count("ERROR4") == 2
    assert r.result_type_count("ERROR5") == 4

    expected_per_tag = {
        "CORRECT": dict(UNIT=1, LANDMARK=0, POI=1, COUNTRY=2, CITY=1),
        "ERROR1": dict(UNIT=1, LANDMARK=0, POI=0, COUNTRY=1, CITY=1),
        "ERROR2": dict(UNIT=0, LANDMARK=1, POI=0, COUNTRY=1, CITY=0),
        "ERROR3": dict(UNIT=0, LANDMARK=0, POI=1, COUNTRY=0, CITY=0),
        "ERROR4": dict(UNIT=0, LANDMARK=1, POI=1, COUNTRY=0, CITY=0),
        "ERROR5": dict(UNIT=0, LANDMARK=1, POI=2, COUNTRY=0, CITY=1),
    }
    for rtype, per_tag in expected_per_tag.items():
        for tag, n in per_tag.items():
            assert r.result_type_count(rtype, tag) == n, (rtype, tag)

    # exact match mode
    assert r.precision("EXACT_MATCH") == 5. / 15
    assert r.recall("EXACT_MATCH") == 5. / 14

    assert r.precision_for("UNIT", "EXACT_MATCH") == 1. / 2
    assert r.precision_for("LANDMARK", "EXACT_MATCH") == 0. / 3
    assert r.precision_for("POI", "EXACT_MATCH") == 1. / 3
    assert r.precision_for("COUNTRY", "EXACT_MATCH") == 2. / 6
    assert r.precision_for("CITY", "EXACT_MATCH") == 1. / 2

    assert r.recall_for("UNIT", "EXACT_MATCH") == 1. / 1
    assert r.recall_for("LANDMARK", "EXACT_MATCH") == 0. / 3
    assert r.recall_for("POI", "EXACT_MATCH") == 1. / 5
    assert r.recall_for("COUNTRY", "EXACT_MATCH") == 2. / 3
    assert r.recall_for("CITY", "EXACT_MATCH") == 1. / 2

    # MUC mode
    assert r.precision("MUC") == 13. / 30
    assert r.recall("MUC") == 13. / 28

    assert r.precision_for("UNIT", "MUC") == 2. / 4
    assert r.precision_for("LANDMARK", "MUC") == 1. / 4
    assert r.precision_for("POI", "MUC") == 4. / 6
    assert r.precision_for("COUNTRY", "MUC") == 4. / 12
    assert r.precision_for("CITY", "MUC") == 2. / 4

    assert r.recall_for("UNIT", "MUC") == 2. / 2
    assert r.recall_for("LANDMARK", "MUC") == 1. / 6
    assert r.recall_for("POI", "MUC") == 4. / 10
    assert r.recall_for("COUNTRY", "MUC") == 4. / 6
    assert r.recall_for("CITY", "MUC") == 2. / 4

    # recognition mode
    assert r.precision("RECOGNITION") == 6. / 15
    assert r.recall("RECOGNITION") == 6. / 14
    assert r.precision_for("COUNTRY", "RECOGNITION") == 2. / 6
    assert r.recall_for("COUNTRY", "RECOGNITION") == 2. / 3


# ------------------------------------------- FileFormatParserTest


def test_get_annotations_from_column_token_based():
    lines = open(f"{RES}/ner/training.txt").read().splitlines()
    _, anns = parse_column(lines, token_based=True)
    assert len(anns) == 34860

    assert anns[0].start == 0
    assert len(anns[0].value) == 2
    assert anns[0].value == "EU"

    assert anns[10].start == 54
    assert len(anns[10].value) == 9
    assert anns[10].value == "Blackburn"
    assert anns[10].tag == "PER"


def test_get_annotations_from_column():
    lines = open(f"{RES}/ner/training.txt").read().splitlines()
    _, anns = parse_column(lines)
    assert len(anns) == 4598

    assert anns[0].start == 0
    assert len(anns[0].value) == 2
    assert anns[0].value == "EU"
    assert anns[0].tag == "ORG"

    assert anns[4594].start == 186754
    assert len(anns[4594].value) == 11
    assert anns[4594].value == "Sri Lankans"
    assert anns[4594].tag == "MISC"
