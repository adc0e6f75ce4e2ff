"""List & pagination discovery."""

from __future__ import annotations

from kgp.html_text import parse_html
from kgp.lists import discover_list_entries, find_pagination_urls


def _pagination_page():
    links = "".join(f'<a href="/archive/page{i}.html">{i}</a>'
                    for i in range(1, 6))
    return parse_html(
        "<html><body>"
        '<div class="nav"><a href="/">Home</a>'
        '<a href="/about.html">About this site</a></div>'
        f'<div class="pager">{links}</div>'
        "</body></html>")


def test_find_pagination_urls():
    got = find_pagination_urls(_pagination_page(),
                               "https://x.example.com/a/")
    assert got == [f"https://x.example.com/archive/page{i}.html"
                   for i in range(1, 6)]


def test_pagination_anchor_only_rejected():
    links = "".join(f"<a>{i}</a>" for i in range(1, 6))
    root = parse_html(f"<html><body><div>{links}</div></body></html>")
    assert find_pagination_urls(root) == []


def test_single_next_link_survives():
    root = parse_html('<html><body><p><a href="/p2">next</a></p>'
                      "</body></html>")
    got = find_pagination_urls(root, "https://x.com/")
    assert got == ["https://x.com/p2"]
    # a lone numeric "7" link is not credible pagination
    root2 = parse_html('<html><body><p><a href="/p7">7</a></p>'
                       "</body></html>")
    assert find_pagination_urls(root2, "https://x.com/") == []


def test_discover_list_entries():
    lis = "".join(f"<li>Item number {i}</li>" for i in range(6))
    root = parse_html("<html><body><ul><li>Nav</li></ul>"
                      f"<div><ul>{lis}</ul></div></body></html>")
    got = discover_list_entries(root)
    assert got == [f"Item number {i}" for i in range(6)]
    tiny = parse_html("<html><body><ul><li>a</li><li>b</li></ul>"
                      "</body></html>")
    assert discover_list_entries(tiny) == []


def test_entries_uniform_reference_vectors():
    """ListDiscovererTest.testEntriesUniform (ListDiscovererTest.java:
    32-68) transcribed verbatim."""
    from kgp.lists import entries_uniform
    long_e = "Very Long Entry With More Than 12 Words A B C D!!!"
    assert entries_uniform(
        ["Abc ABC", "12. A", long_e, "Short One", "Yes"], True) is True
    assert entries_uniform(
        ["1.", "2.", long_e, "Short One", "Yes"], True) is False
    assert entries_uniform(
        ["UPPERCASE", "LoWeRcAsE", "UPPERCASE", "Short One", "Yes"],
        True) is False
    assert entries_uniform(
        [long_e, long_e, long_e, long_e + " " + long_e,
         "Short but still not too short"], True) is False
    assert entries_uniform(
        ["UPPER CASE", "LoWeR cAsE", "d", "SHORT", "ONE"],
        True) is False
