"""AnnotationRuleEngine parity — driven by the reference's own
ruleEngine.rules, golden from AnnotationRuleEngineTest.java:19-46."""

from __future__ import annotations

import os

import pytest

from kgp.mentions import candidate_annotations
from kgp.rules import apply_rules, parse_rules

RULES = ("/root/reference/palladian-core/src/test/resources/"
         "ruleEngine.rules")

SAMPLE = ("English is the language of the world. There is a place called "
          "English Lake in Indiana. Mr. Smith speaks English. It is "
          "common within Great Britain to speak English, Mr. John Smith "
          "commented. John likes marvel cakes. Let's make a trip to "
          "Miami, yes Miami is nice! The incredibly beautiful River "
          "Neckar flows through Stuttgart. And the Neckar also flows "
          "through Heilbronn. USA, US, GB, XY, yeah.")


def test_rule_engine_reference_golden():
    if not os.path.exists(RULES):
        pytest.skip("reference rules file not available")
    with open(RULES, encoding="utf-8") as f:
        rules = parse_rules(f)
    annotations = candidate_annotations(SAMPLE)
    result = apply_rules(rules, SAMPLE, annotations)
    assert len(result) == 17
    want_first_16 = [None, None, None, None, "LOC", None, "LOC", "LOC",
                     None, "LOC", None, None, "LOC", None, None, None]
    assert [r.tag for r in result[:16]] == want_first_16


def test_rule_actions_individually():
    rules = parse_rules([
        "|Bad Thing|\tREMOVE_THIS",
        "near|\tCLASSIFY_THIS\tLOC",
        "|Dr. *|\tREMOVE_FRAGMENTS",
        "|{{[A-Z]{2}}}|\tREMOVE_THIS",
    ])
    text = ("Bad Thing happened near Riverton. Dr. Jones left. "
            "Jones returned. XY said so.")
    anns = candidate_annotations(text)
    got = {r.value: r.tag for r in apply_rules(rules, text, anns)}
    assert "Bad Thing" not in got            # REMOVE_THIS
    assert got.get("Riverton") == "LOC"      # right-context classify
    assert "Dr. Jones" not in got            # REMOVE_FRAGMENTS…
    assert "Jones" not in got                # …removes shared-token anns
    assert "XY" not in got                   # regex entity rule


def test_address_tagger():
    from kgp.rules import tag_addresses
    got = tag_addresses("He lives at 22 Baker Street near the park.")
    kinds = {(r.value, r.tag) for r in got}
    assert ("Baker Street", "STREET") in kinds
    assert ("22", "STREETNR") in kinds
    # the sentence-start candidate includes "Take" — faithful to the
    # reference, whose StringTagger emits the same span
    got2 = tag_addresses("Take Fifth Avenue 101 towards downtown.")
    kinds2 = {(r.value, r.tag) for r in got2}
    assert ("Take Fifth Avenue", "STREET") in kinds2
    assert ("101", "STREETNR") in kinds2
    # non-streets don't tag
    assert not any(r.tag == "STREET"
                   for r in tag_addresses("Acme Corp met John Smith."))
