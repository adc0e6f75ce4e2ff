"""Upstream IntentParserTest vectors, transcribed mechanically
(IntentParserTest.java:17-180 — every checkThat).

The lookbehind trigger requires Java-regex variable-width
lookbehind; kgp.intents uses the `regex` module for parity.
"""

from kgp.intents import _compile_bank, parse_intents


def _run(bank, query):
    return parse_intents(query, _compile_bank(bank))


def test_regex_definition_with_capture():
    bank = [{"triggers": [{"type": "REGEX",
                           "text": r"under \$(\d+)"}],
             "action": {"filters": [{"key": "price", "max": "$1"}],
                        "type": "DEFINITION",
                        "sorts": [{"key": "price",
                                   "direction": "ASC"}]}}]
    action = _run(bank, "shoes under $101")[0]
    f = action["filters"][0]
    assert f["key"] == "price"
    assert f["min"] is None
    assert f["max"] == 101.0
    assert action["sorts"][0]["key"] == "price"
    assert action["sorts"][0]["direction"] == "ASC"
    assert action["modified_query"] == "shoes"


def test_regex_lookaround_trigger():
    bank = [{"triggers": [{
        "type": "REGEX",
        "text": r"(?<=(?:^|[;. ]))(?:cheap(ish?))(?=($|[;. ]))"}],
        "action": {"filters": [{"key": "price", "min": "50",
                                "max": "100"}],
                   "type": "DEFINITION",
                   "sorts": [{"key": "price",
                              "direction": "DESC"}]}}]
    action = _run(bank, "cheapish shoes")[0]
    assert action["modified_query"] == "shoes"


def test_contains_trigger():
    bank = [{"triggers": [{"type": "CONTAINS", "text": "cheap"}],
             "action": {"filters": [{"key": "price", "min": "50",
                                     "max": "100"}],
                        "type": "DEFINITION",
                        "sorts": [{"key": "price",
                                   "direction": "DESC"}]}}]
    action = _run(bank, "cheapish shoes")[0]
    f = action["filters"][0]
    assert f["key"] == "price"
    assert f["min"] == 50.0
    assert f["max"] == 100.0
    assert action["sorts"][0]["key"] == "price"
    assert action["sorts"][0]["direction"] == "DESC"
    assert action["modified_query"] == "shoes"


def test_redirect_match_vs_phrase_match():
    bank = [{"triggers": [{"type": "MATCH", "text": "delivery"},
                          {"type": "PHRASE_MATCH", "text": "ups"}],
             "action": {"type": "REDIRECT",
                        "redirect": "https://delivery.com"}}]
    assert _run(bank, "what about delivery?") == []
    action = _run(bank, "what about ups?")[0]
    assert action["redirect"] == "https://delivery.com"


def test_rewrite_regex_capture():
    bank = [{"triggers": [{"type": "REGEX", "text": r"gta (\d+)"}],
             "action": {"type": "REWRITE",
                        "rewrite": "grand theft auto $1"}}]
    action = _run(bank, "ps4 gta 6")[0]
    assert action["rewrite"] == "ps4 grand theft auto 6"


def test_rewrite_phrase_match():
    bank = [{"triggers": [{"type": "PHRASE_MATCH", "text": "mtb"}],
             "action": {"type": "REWRITE",
                        "rewrite": "mountain bike"}}]
    action = _run(bank, "mtb shoes")[0]
    assert action["rewrite"] == "mountain bike shoes"


def test_regex_redirect_capture():
    bank = [{"triggers": [{"type": "REGEX",
                           "text": r"ticket ([a-z]\d+)"}],
             "action": {"type": "REDIRECT",
                        "redirect":
                            "https://helpcenter.com/tickets/$1"}}]
    action = _run(bank,
                  "need help with ticket C8788 fast please!!!")[0]
    assert action["redirect"] == "https://helpcenter.com/tickets/C8788"
