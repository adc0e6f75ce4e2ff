"""WiktionaryParser port: DE/EN extraction rules, tag-grab regex,
plural path, namespace filters, and the WordDB merge stage."""

from __future__ import annotations

from kgp.wiktionary import (_grab_tags, parse_wiktionary_page,
                            wiktionary_words_stage)

DE_PAGE = """== Haustier ({{Sprache|Deutsch}}) ==
=== {{Wortart|Substantiv|Deutsch}}, {{n}} ===

{{Silbentrennung}}
Haus·tier, {{Pl.}} Haus·tie·re

{{Synonyme}}
:[1] [[Heimtier]], [[Nutztier]]
}}

{{Oberbegriffe}}
:[1] [[Tier]]
}}

{{Unterbegriffe}}
:[1] [[Hund]], [[Katze]]
}}
"""

EN_PAGE = """==English==

===Etymology===
From somewhere.

===Noun===

# A domesticated [[animal]].

====Synonyms====
* [[companion animal]], [[housepet]]
===Translations===
"""


def test_tag_grab_regex():
    assert _grab_tags(" [[Heimtier]], [[Nutztier]]") \
        == ["Heimtier", "Nutztier"]
    # no separating context -> no match (the lookbehind alternatives)
    assert _grab_tags("x[[Nope]]") == []
    # >30 chars inside brackets -> rejected
    assert _grab_tags(" [[" + "a" * 31 + "]]") == []
    # trailing context must be end/comma/semicolon
    assert _grab_tags(" [[Tier]]!") == []


def test_parse_german_page():
    rec = parse_wiktionary_page("Haustier", DE_PAGE, "de")
    assert rec["language"] == "Deutsch"
    assert rec["word_type"] == "Substantiv"
    assert rec["plural"] == "Haustiere"
    assert rec["synonyms"] == ["Heimtier", "Nutztier"]
    assert rec["hypernyms"] == ["Tier"]
    assert rec["hyponyms"] == ["Hund", "Katze"]


def test_parse_english_page():
    rec = parse_wiktionary_page("pet", EN_PAGE, "en")
    assert rec["language"] == "English"
    assert rec["word_type"] == "Noun"
    # the reference's tag regex only accepts '^ ', '  ' or ', ' before
    # '[[' — the bullet-prefixed first link is MISSED (quirk kept);
    # only the comma-separated second one survives
    assert rec["synonyms"] == ["housepet"]
    assert rec["hypernyms"] == [] and rec["hyponyms"] == []


def test_page_filters():
    assert parse_wiktionary_page("Wiktionary:About", DE_PAGE, "de") \
        is None
    assert parse_wiktionary_page("Hilfe:FAQ", DE_PAGE, "de") is None
    assert parse_wiktionary_page("EWUsersOnly", DE_PAGE, "de") is None
    assert parse_wiktionary_page(None, DE_PAGE, "de") is None


def test_plural_pl1_comma_rule():
    page = ("== W ({{Sprache|Deutsch}}) ==\n"
            "=== {{Wortart|Substantiv|Deutsch}} ===\n"
            "{{Silbentrennung}}\nWort, {{Pl.1}} Wör·ter, {{Pl.2}} x\n")
    rec = parse_wiktionary_page("Wort", page, "de")
    assert rec["plural"] == "Wörter"
    # Pl.1 without a comma -> empty plural (the reference's else)
    page2 = ("== W ({{Sprache|Deutsch}}) ==\n"
             "=== {{Wortart|Substantiv|Deutsch}} ===\n"
             "{{Silbentrennung}}\nWort, {{Pl.1}} Wör·ter\n")
    assert parse_wiktionary_page("Wort", page2, "de")["plural"] == ""


def test_words_stage_merge(spark):
    pages = spark.createDataFrame(
        [(1, "Haustier", DE_PAGE),
         (2, "Haustier",            # later page: fills nothing new,
          "== Haustier ({{Sprache|Bairisch}}) ==\n"   # unions syns
          "{{Synonyme}}\n:[1] [[Stubentiger]]\n}}\n"),
         (3, "Wiktionary:About", DE_PAGE)],
        "ord long, title string, text string")
    out = wiktionary_words_stage(pages, "de", order_col="ord").collect()
    assert len(out) == 1
    r = out[0]
    assert r["word"] == "Haustier"
    assert r["language"] == "Deutsch"        # first non-empty wins
    assert r["plural"] == "Haustiere"
    assert set(r["synonyms"]) == {"Heimtier", "Nutztier", "Stubentiger"}
    assert r["hypernyms"] == ["Tier"]
