"""HTML → text extraction: hand-derived unit goldens + corpus byte-identity.

Unit expectations hand-computed from the reference rules
(HtmlHelper.documentToText — skip set, block-entry newline, >=2-space-run
deletion; /root/reference/palladian-commons/.../html/HtmlHelper.java:694-728).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kgp.corpus import synth_pages
from kgp.html_text import (clean_dom, detect_language, document_to_text,
                           extract_main_content, extract_stage, find_main_node,
                           parse_html)

# ------------------------------------------------- documentToText unit


def test_doc_to_text_skips_script_style_head():
    html = ("<html><head><title>T</title></head><body>"
            "<script>var x;</script><style>.a{}</style>"
            "<p>Hello</p></body></html>")
    # html(not block) > body(not block) > p(block): "\n" then "Hello"
    assert document_to_text(parse_html(html)) == "\nHello"


def test_doc_to_text_block_newline_before_content():
    html = "<div>a</div><div>b</div>"
    assert document_to_text(parse_html(html)) == "\na\nb"


def test_doc_to_text_space_run_deletion():
    # the reference DELETES runs of >=2 spaces (replaceAll("[ ]{2,}", ""))
    assert document_to_text(parse_html("<p>a  b   c</p>")) == "\nabc"
    assert document_to_text(parse_html("<p>a  b</p>")) == "\nab"
    assert document_to_text(parse_html("<p>a b</p>")) == "\na b"


def test_doc_to_text_space_run_deletion_is_per_node():
    # HtmlHelper.java:727 applies the deletion at EVERY recursive call:
    # the leaf pass collapses "a  " to "a" BEFORE the sibling's " b" is
    # concatenated, so the runs never merge — the answer is "a b", not
    # the "ab" a single global pass over the concatenation would give.
    assert document_to_text(parse_html("a  <span></span> b")) == "a b"
    # leaf-level run deletion, then clean single-space junction
    assert document_to_text(parse_html("a <span></span>b")) == "a b"
    # junction run of exactly two (1 trailing + 1 leading) is deleted
    # at the parent level
    assert document_to_text(parse_html("a <span></span> b")) == "ab"
    # all-space text node between siblings merges runs at parent level
    assert document_to_text(parse_html("a <b>&#32;</b> c")) == "ac"


def test_doc_to_text_option_and_comment_skipped():
    html = ("<p>x<!-- hidden --><select><option>opt</option></select>y</p>")
    out = document_to_text(parse_html(html))
    assert "hidden" not in out and "opt" not in out
    assert "x" in out and "y" in out


def test_doc_to_text_inline_vs_block():
    html = "<p>one <b>two</b> three</p><br>four"
    out = document_to_text(parse_html(html))
    assert out == "\none two three\nfour"


def test_unclosed_p_tags_implied_close():
    a = parse_html("<div><p>one<p>two</div>")
    b = parse_html("<div><p>one</p><p>two</p></div>")
    assert document_to_text(a) == document_to_text(b) == "\n\none\ntwo"


def test_nested_table_adversarial():
    html = ("<table><tr><td>a</td><td>b<table><tr><td>c</td></tr></table>"
            "</td></tr></table>")
    out = document_to_text(parse_html(html))
    for ch in "abc":
        assert ch in out


# ------------------------------------------------- main content / lang


def test_main_content_hint_path():
    html = ('<html><body><nav>Menu Home</nav>'
            '<div class="article-body"><h1>Title</h1>'
            "<p>First real sentence is long enough. Second one also here.</p>"
            "<p>Third paragraph sentence for density.</p></div>"
            "<footer>(c) foot</footer></body></html>")
    r = extract_main_content(html)
    assert r["text"] == ("Title\n\nFirst real sentence is long enough. "
                         "Second one also here.\n\n"
                         "Third paragraph sentence for density.\n\n")
    assert r["title"] == "Title"


def test_main_content_density_path_without_hint():
    html = ('<html><body><div class="zone-a">'
            "<p>This is the main article text with value. "
            "It has several proper sentences inside. "
            "Density scoring should find this division.</p></div>"
            '<div class="other"><p>tiny bit</p></div></body></html>')
    root = clean_dom(parse_html(html))
    main = find_main_node(root)
    assert main is not None and main.attrs.get("class") == "zone-a"


def test_main_content_fallback_small():
    html = "<html><body><p>Too small.</p></body></html>"
    r = extract_main_content(html)
    assert r["text"] == "\nToo small."  # full documentToText fallback


def test_detect_language():
    assert detect_language(parse_html('<html lang="de"><body>x</body>')) == "de"
    assert detect_language(
        parse_html('<html><head><meta http-equiv="content-language" '
                   'content="fr-FR"></head>')) == "fr"
    assert detect_language(parse_html("<html>"),
                           "https://x.example.de/a") == "de"


# --------------------------------------- corpus-wide byte identity


def test_corpus_byte_identity(spark, sf_dir):
    """THE invariant: extractor output == golden text for every url."""
    pages = synth_pages(spark, sf_dir)
    docs = extract_stage(pages)
    joined = docs.alias("d").join(pages.alias("p"), "url").select(
        "url", F.col("d.text").alias("got"), F.col("p.text").alias("want"),
        F.col("d.lang").alias("got_lang"), F.col("p.lang").alias("want_lang"))
    bad = joined.where("got <> want").count()
    assert bad == 0, joined.where("got <> want").first()
    assert joined.where("got_lang <> want_lang").count() == 0


def test_corpus_sentences(spark, sf_dir):
    docs = extract_stage(synth_pages(spark, sf_dir, with_doc_id=False))
    row = docs.where(F.col("url").contains("/0.html")).first()
    sents = [s.text for s in row.sentences]
    assert sents[0].startswith("John Smith, the chief executive officer")
    assert any(s.startswith("Springfield is the capital of") for s in sents)
    assert sents[-1].endswith("river bank.")
    # headline is not a real sentence
    assert not any("update" in s for s in sents)


# ------------------------------------------------ adversarial inputs


def test_extract_survives_hostile_inputs():
    from kgp.html_text import extract_main_content
    cases = [
        b"",
        b"\xff\xfe<p>caf\xc3\xa9</p>",                       # bad utf-8
        b"just plain text, no markup at all.",
        ("<div>" * 5000 + "x" + "</div>" * 5000).encode(),   # deep nesting
        b"<table><tr><td>a<td>b<tr><td>c</table>",           # implied closes
        b"<script>var x = '<p>not text</p>';</script>",
    ]
    for html in cases:
        r = extract_main_content(html, "https://x.example.com/a")
        assert isinstance(r["text"], str)


def test_deep_nesting_no_recursion_error():
    from kgp.html_text import document_to_text, parse_html
    root = parse_html("<div>" * 5000 + "hello" + "</div>" * 5000)
    assert "hello" in document_to_text(root)
    assert root.text_content().strip() == "hello"
