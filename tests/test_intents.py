"""SearchIntentParser engine tests: pass priority, cascade restarts,
the regex-rewrite lowercase quirk, margin bands, removeTrigger
scrubbing, redirect short-circuit, and the 11-round loop bound."""

from __future__ import annotations

import pytest

from kgp import intents
from kgp.intents import DEFAULT_INTENTS, parse_intents, _compile_bank


def run(query, bank=None):
    return parse_intents(query, _compile_bank(bank or DEFAULT_INTENTS))


def test_contains_definition_fills_and_scrubs():
    acts = run("cheap click")
    assert len(acts) == 1
    a = acts[0]
    assert a["type"] == "DEFINITION" and a["trigger_type"] == "CONTAINS"
    assert a["filters"][0]["min"] == 0.0
    assert a["filters"][0]["max"] == 233.0
    assert a["sorts"][0]["key"] == "cost.PRICE"
    assert a["modified_query"] == "click"


def test_regex_group_fills_max():
    acts = run("under 65 dollars view")
    assert acts[0]["filters"][0]["max"] == 65.0
    assert acts[0]["modified_query"] == "view"


def test_match_rewrite_then_restart_chains():
    # CONTAINS scrubs 'cheap' -> 'best laptop' then MATCH rewrites.
    acts = run("cheap best laptop")
    assert [a["type"] for a in acts] == ["DEFINITION", "REWRITE"]
    assert acts[1]["modified_query"] == "laptop premium"


def test_redirect_short_circuits():
    bank = DEFAULT_INTENTS + [
        {"triggers": [{"type": "REGEX", "text": r"goto (\w+)"}],
         "action": {"type": "DEFINITION",
                    "filters": [{"key": "k", "max": "9"}]}}]
    acts = run("goto error page", bank)
    # redirect returns immediately; the second REGEX intent never runs
    assert len(acts) == 1
    assert acts[0]["redirect"] == "https://shop.example.com/error"
    assert acts[0]["modified_query"] == "goto error page"


def test_pass_priority_match_beats_contains():
    bank = [
        {"triggers": [{"type": "CONTAINS", "text": "best"}],
         "action": {"type": "DEFINITION",
                    "filters": [{"key": "k", "min": "1", "max": "2"}]}},
        {"triggers": [{"type": "MATCH", "text": "best laptop"}],
         "action": {"type": "REWRITE", "rewrite": "exact-hit"}},
    ]
    acts = run("best laptop", bank)
    assert acts[0]["type"] == "REWRITE"   # MATCH pass wins over CONTAINS


def test_regex_rewrite_lowercases_whole_query():
    # SearchIntentParser.java:264-266: matcher.replaceAll().toLowerCase()
    bank = [{"triggers": [{"type": "REGEX", "text": r"(\d+) EUR"}],
             "action": {"type": "REWRITE", "rewrite": "$1 euros"}}]
    acts = run("TV under 300 EUR Deal", bank)
    assert acts[0]["modified_query"] == "tv under 300 euros deal"


def test_phrase_match_needs_word_borders():
    bank = [{"triggers": [{"type": "PHRASE_MATCH", "text": "deal"}],
             "action": {"type": "DEFINITION", "filters": []}}]
    assert run("dealer offers", bank) == []          # no border
    assert run("Deal now", bank) == []               # case sensitive
    acts = run("a deal, yes", bank)                  # comma border ok
    assert len(acts) == 1
    # scrub eats the whole non-space run, comma included
    assert acts[0]["modified_query"] == "a  yes"


def test_margin_band_from_regex_value_group():
    bank = [{"triggers": [{"type": "REGEX",
                           "text": r"size (\w+)"}],
             "action": {"type": "DEFINITION",
                        "filters": [{"key": "size",
                                     "values": ["$1"]}]}}]
    num = run("size 200 shoes", bank)[0]["filters"][0]
    assert num["min"] == pytest.approx(190.0)    # default margin 0.05
    assert num["max"] == pytest.approx(210.0)
    assert num["values"] == []
    txt = run("size XXL shirt", bank)[0]["filters"][0]
    assert txt["values"] == ["XXL"] and txt["min"] is None


def test_explicit_margin():
    bank = [{"triggers": [{"type": "REGEX", "text": r"ca (\d+)"}],
             "action": {"type": "DEFINITION",
                        "filters": [{"key": "k", "values": ["$1"],
                                     "margin": 0.5}]}}]
    f = run("ca 100", bank)[0]["filters"][0]
    assert (f["min"], f["max"]) == (50.0, 150.0)


def test_loop_bound_on_self_feeding_rewrite():
    # 'a' -> 'aa' grows forever; numTries++ < 10 caps at 11 rounds.
    bank = [{"triggers": [{"type": "CONTAINS", "text": "a"}],
             "action": {"type": "REWRITE", "rewrite": "aa"}}]
    acts = run("a", bank)
    assert len(acts) == 11


def test_remove_trigger_false_keeps_query():
    bank = [{"triggers": [{"type": "CONTAINS", "text": "cheap"}],
             "action": {"type": "DEFINITION", "removeTrigger": False,
                        "filters": [{"key": "k", "max": "9"}]}}]
    acts = run("cheap tv", bank)
    # query unchanged -> trigger still matches -> 11-round cap
    assert all(a["modified_query"] == "cheap tv" for a in acts)
    assert len(acts) == 11


def test_stage_rows(spark):
    q = spark.createDataFrame(
        [(1, "cheap click"), (2, "best laptop"), (3, "nothing here")],
        "qid long, query string")
    rows = intents.intent_stage(q, DEFAULT_INTENTS).collect()
    by = {r["qid"]: r for r in rows}
    assert by[1]["filter_max"] == 233.0
    assert by[2]["action_type"] == "REWRITE"
    assert 3 not in by and len(rows) == 2


def test_unit_filter_normalization():
    bank = [{"triggers": [{"type": "REGEX",
                           "text": r"(\d+) (kg|kilogramm)"}],
             "action": {"type": "DEFINITION",
                        "filters": [{"key": "weight",
                                     "values": ["$1"], "unit": "$2"}]}}]
    f = run("parcel 5 kg heavy", bank)[0]["filters"][0]
    assert f["min"] == pytest.approx(5000 * 0.95)
    assert f["max"] == pytest.approx(5000 * 1.05)


def test_unit_filter_german_translation():
    bank = [{"triggers": [{"type": "REGEX", "language": "de",
                           "text": r"(\d+) (kilogramm|pfund)"}],
             "action": {"type": "DEFINITION",
                        "filters": [{"key": "weight",
                                     "values": ["$1"], "unit": "$2"}]}}]
    f = run("paket 5 kilogramm schwer", bank)[0]["filters"][0]
    # kilogramm -> kg -> 5000 g, +-5% margin
    assert f["min"] == pytest.approx(4750.0)
    assert f["max"] == pytest.approx(5250.0)
