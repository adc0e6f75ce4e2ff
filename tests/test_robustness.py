"""Hostile-input behavior of the round-2 parsers: everything degrades
gracefully (empty results or lenient fallbacks), nothing raises."""

from __future__ import annotations

import pytest


def test_wiki_hostile_inputs():
    from kgp.wiki import (extract_template, get_infoboxes,
                          get_named_markup, infobox_triples)
    assert get_named_markup("{{infobox city|name=X", "infobox") == []
    assert get_infoboxes("no templates here") == []
    t = extract_template("{{}}")
    assert t.entries == {"0": ""}
    assert infobox_triples("T", "{{infobox x|broken") == []


def test_warc_truncated_record():
    from kgp.sources import parse_warc_records
    got = list(parse_warc_records(
        b"WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort"))
    assert len(got) == 1 and got[0][1] == b"short"  # truncated payload
    assert list(parse_warc_records(b"")) == []
    assert list(parse_warc_records(b"garbage bytes \xff\xfe")) == []


def test_conll_hostile_lines():
    from kgp.conll import parse_column
    assert parse_column([]) == ("", [])
    assert parse_column(["not-a-two-column-line"]) == ("", [])
    text, anns = parse_column(["a\tO", "weird\textra\tcols"])
    assert "a" in text and isinstance(anns, list)


def test_lists_and_dates_hostile():
    from kgp.dates import find_dates
    from kgp.html_text import parse_html
    from kgp.lists import discover_list_entries, find_pagination_urls
    empty = parse_html("")
    assert find_pagination_urls(empty, "") == []
    assert discover_list_entries(empty) == []
    assert find_dates("") == []
    assert find_dates("a" * 10000 + "1") == []


def test_media_codecs_reject_garbage():
    from kgp.multimodal import decode_bmp, decode_wav
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp")
    with pytest.raises(ValueError):
        decode_wav(b"not a wav")


def test_rules_and_strsim_edges():
    from kgp.rules import apply_rules, parse_rules
    from kgp.strsim import jaro_winkler_similarity, levenshtein_distance
    with pytest.raises(ValueError):
        parse_rules(["no-tab-separator"])
    assert apply_rules([], "text", []) == []
    assert levenshtein_distance("", "") == 0
    assert jaro_winkler_similarity("a", "") == 0.0
