"""Arc90 Readability port — parity vs the reference's own expected
result files, plus semantics unit tests.

The reference test (ReadabilityContentExtractorTest.java) asserts md5
hashes of getResultText() and ships the expected TEXT files under
pageContentExtractor/result/. We assert BYTE EQUALITY against those
files directly — every case the reference test actually runs (test002/
003/007 are commented out there and their result files are stale
against the reference's own code; we skip them the same way).
"""

import hashlib
import os

import pytest

from kgp.readability import extract_readability, get_article_title
from kgp.html_text import parse_html

RESDIR = "/root/reference/palladian-core/src/test/resources"
FIXDIR = os.path.join(RESDIR, "pageContentExtractor")

# every fixture the reference test asserts on (testReadability...:28-50)
# that has a shipped result file (website100-102/test208 have hashes
# but no result text in the repo snapshot)
ACTIVE = ["test001", "test004", "test005", "test006", "test008",
          "test009", "test010", "test011", "test012", "test013",
          "test014", "test015", "test018"]

# the reference test's own md5 assertions, verbatim
# (ReadabilityContentExtractorTest.java:28-50) — ALL 17 active cases
REFERENCE_MD5 = {
    "pageContentExtractor/test001.html":
        "a078a28fd8d1a59d9364b53c4818539b",
    "pageContentExtractor/test004.html":
        "39a5fb4526d7ab362b21384a86902665",
    "pageContentExtractor/test005.html":
        "12eb1af518752d13d9af10bb7b4da3f9",
    "pageContentExtractor/test006.html":
        "797e0ebf8d89e9c93762a888f0b4bd64",
    "pageContentExtractor/test008.html":
        "d0d155ebd785848a27509257e8fe2726",
    "pageContentExtractor/test009.html":
        "11b3f8cbd9bc774588da6327f280a1ab",
    "pageContentExtractor/test010.html":
        "829687fa8a170b3971db50f76d41a8ca",
    "pageContentExtractor/test011.html":
        "b17d23137b7693a92e02646c0e83dd12",
    "pageContentExtractor/test012.html":
        "3f8eb27a5bc33d2d71f1314595e7594b",
    "pageContentExtractor/test013.html":
        "af25ba7317e8df1aca75fc1956372d54",
    "pageContentExtractor/test014.html":
        "afeabbbfb8c3f1c3943a05ba772da59f",
    "pageContentExtractor/test015.html":
        "1788005daaedfcb997c64802f5c42a46",
    "pageContentExtractor/test018.html":
        "70bf83d80e0757a8f99fe4331a5244a6",
    "webPages/website100.html": "ef16a6defb01319914dabb2a2816a52d",
    "webPages/website101.html": "7dd8bce48bb8a98653d4554ec4aac31a",
    "webPages/website102.html": "812ad4ee50f5d6f21c8f9634f45e3585",
    "pageContentExtractor/test208.html":
        "fbd37860a4cb2b68144b092a7c2e0c31",
}


@pytest.mark.parametrize("rel", sorted(REFERENCE_MD5))
def test_reference_md5_exact(rel):
    """The reference test's own assertion, reproduced: md5 of
    getResultText() matches hash-for-hash on every ACTIVE case
    (including the four real-website pages with no result file)."""
    page = os.path.join(RESDIR, rel)
    if not os.path.exists(page):
        pytest.skip("reference fixtures not available")
    text = extract_readability(open(page, "rb").read())["text"]
    got = hashlib.md5(text.encode("utf-8")).hexdigest()
    assert got == REFERENCE_MD5[rel], rel


@pytest.mark.parametrize("name", ACTIVE)
def test_reference_result_byte_exact(name):
    page = os.path.join(FIXDIR, f"{name}.html")
    expected = os.path.join(FIXDIR, "result", f"{name}.txt")
    if not (os.path.exists(page) and os.path.exists(expected)):
        pytest.skip("reference fixtures not available")
    got = extract_readability(open(page, "rb").read())["text"]
    want = open(expected, encoding="utf-8", errors="replace").read()
    assert got == want, name


# ------------------------------------------------------------- title


def _title(html: str) -> str:
    return get_article_title(parse_html(html))


def test_title_pipe_split_short_falls_back_to_original():
    # "<=4 words -> use the original title" (:333-335)
    t = _title("<html><head><title>Acme Corp update 42 | Example News"
               "</title></head><body></body></html>")
    assert t == "Acme Corp update 42 | Example News"


def test_title_pipe_split_keeps_long_headline():
    t = _title("<html><head><title>Five word headline goes here | Site"
               "</title></head><body></body></html>")
    assert t == "Five word headline goes here"


def test_title_short_title_uses_single_h1():
    t = _title("<html><head><title>short</title></head><body>"
               "<h1>The actual long headline of the page</h1>"
               "</body></html>")
    assert t == "The actual long headline of the page"


# --------------------------------------------------------- semantics

ARTICLE_P = ("Readability scores paragraphs by their commas, length, "
             "and link density, then picks the best-scoring parent "
             "container as the article node for the final output.")


def _page(body: str) -> str:
    return ("<html><head><title>A Reasonably Long Page Title Here"
            "</title></head><body>" + body + "</body></html>")


def test_unlikely_candidates_stripped():
    html = _page(
        f'<div class="content"><p>{ARTICLE_P}</p><p>{ARTICLE_P}</p></div>'
        '<div class="sidebar"><p>Subscribe to our newsletter today, '
        'please, thanks, regards, yours, truly and sincerely.</p></div>')
    text = extract_readability(html)["text"]
    assert ARTICLE_P in text
    assert "Subscribe" not in text


def test_ok_maybe_keeps_article_named_containers():
    # class contains both "comment"-ish and "article" -> kept (:479)
    html = _page(
        f'<div class="comment-article"><p>{ARTICLE_P}</p>'
        f'<p>{ARTICLE_P}</p></div>')
    assert ARTICLE_P in extract_readability(html)["text"]


def test_retry_cascade_recovers_stripped_content():
    # the only content sits in an "unlikely" container; first pass
    # strips it and yields <250 chars, the re-run without stripping
    # recovers it (:249-273)
    html = _page(
        f'<div class="comments"><p>{ARTICLE_P}</p></div>')
    assert ARTICLE_P in extract_readability(html)["text"]


def test_div_without_block_children_becomes_paragraph():
    html = _page(f"<div>{ARTICLE_P}</div><div>{ARTICLE_P}</div>")
    text = extract_readability(html)["text"]
    assert text.count(ARTICLE_P[:30]) == 2


def test_link_farm_div_cleaned_conditionally():
    links = "".join(f'<a href="/{i}">read more about topic {i}</a> '
                    for i in range(20))
    html = _page(
        f'<div class="content"><p>{ARTICLE_P}</p><p>{ARTICLE_P}</p>'
        f"<div>{links}</div></div>")
    text = extract_readability(html)["text"]
    assert ARTICLE_P in text
    assert "read more" not in text


def test_h1_removed_from_article():
    html = _page(
        f'<div class="content"><h1>Headline Words</h1>'
        f"<p>{ARTICLE_P}</p><p>{ARTICLE_P}</p></div>")
    text = extract_readability(html)["text"]
    assert "Headline Words" not in text
    assert ARTICLE_P in text


def test_sibling_paragraph_appended():
    # a >80-char zero-link p NEXT TO the top candidate joins the
    # result (:648-657)
    html = _page(
        f"<p>{ARTICLE_P}</p>"
        f'<div class="content"><p>{ARTICLE_P}</p><p>{ARTICLE_P}</p>'
        "</div>")
    text = extract_readability(html)["text"]
    assert text.count(ARTICLE_P[:30]) == 3


def test_fragment_and_tagless_inputs():
    # the reference's HTML5 parser always synthesizes <body>, so its
    # body-as-last-resort never returns null; our document-node
    # stand-in preserves that behavior for fragments
    assert extract_readability(b"")["text"] == ""
    assert (extract_readability(b"plain text, no tags at all.")["text"]
            == "plain text, no tags at all.")
    assert "unclosed" in extract_readability(
        b"<div><b><i>misnested</b></i><p>unclosed")["text"]


def test_crlf_normalized_before_line_cleanup():
    html = _page('<div class="content"><p>' + ARTICLE_P + " \r\n"
                 + ARTICLE_P + "</p><p>" + ARTICLE_P + "</p></div>")
    text = extract_readability(html)["text"]
    assert "\r" not in text
    assert " \n" not in text      # trailing space removed per line
