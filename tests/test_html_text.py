"""HTML → text extraction: hand-derived unit goldens + corpus byte-identity.

Unit expectations hand-computed from the reference rules
(HtmlHelper.documentToText — skip set, block-entry newline, >=2-space-run
deletion; /root/reference/palladian-commons/.../html/HtmlHelper.java:694-728).
"""

from __future__ import annotations

import pytest
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


# ---------------- XPath-density extraction on reference fixture pages

import os

FIXDIR = ("/root/reference/palladian-core/src/test/resources/"
          "pageContentExtractor")

# (fixture, phrase that MUST be in the main text, boilerplate phrase
# that is on the page but MUST be excluded from the main text)
FIXTURES = [
    ("test001.html", "Was wollte Google mit den WLAN-Daten?",
     "Hauptnavigation"),
    ("test002.html", "Earth's Frontiers explores the conflict",
     "Most Popular"),
    ("test003.html", "beste TV-Serie nach Twin Peaks", "Impressum"),
    ("test004.html", "Stadtplanungsamt veranstaltet", "Impressum"),
    ("test005.html", "i read on my kindle", "Comments"),
    ("test015.html", "working remotely from home", "Subscribe"),
    ("test020.html", "US heatwave raises climate", "Terms of Use"),
    # round 3: widened to every result-backed reference fixture; the
    # article phrase comes from the result/ expected-content file
    # (where the density extractor finds the article) or pins current
    # main-block selection on comment-heavy pages (005/011)
    ("test006.html",
     "At least one spot will show a mother and daughter", "Subscribe"),
    ("test007.html",
     "Flame is a brilliant JavaScript painting tool", "Advertisement"),
    ("test008.html",
     "I attended a panel called", "Copyright"),
    ("test009.html",
     "quietly re-launching our ReadWriteEnterprise channel", "Subscribe"),
    ("test010.html",
     "I tried to use the BinaryLMClassifier", "Subscribe"),
    ("test011.html",
     "there is plenty to like about BlackBerry", "All rights reserved"),
    ("test012.html",
     "particularly enthusiastic about is suppo", "Subscribe"),
    ("test013.html",
     "The quandary for Obama, however, is that", "Copyright"),
    ("test014.html",
     "news that the XB in XBMC won't mean Xbox any more", "Related"),
    ("test018.html",
     "the workers are angry that about 320 te", "Most Popular"),
]


@pytest.mark.parametrize("name,want,boiler", FIXTURES)
def test_parse_document_reference_fixture(name, want, boiler):
    """Full parseDocument port on the reference's own fixture pages:
    the main article text is found by sentence-xpath density and the
    page chrome is excluded."""
    from kgp.html_text import parse_document
    path = os.path.join(FIXDIR, name)
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    r = parse_document(open(path, "rb").read())
    assert want in r["text"], name
    assert boiler in r["full_text"], name         # it IS on the page
    assert boiler not in r["text"], name          # ...but not extracted
    assert len(r["text"]) < len(r["full_text"])


def test_construct_xpath_and_indices():
    from kgp.html_text import (_parent_index_map, construct_all_xpaths,
                               remove_last_index)
    root = parse_html("<html><body><div>a</div><div><p>long sentence "
                      "here</p><p>two</p></div></body></html>")
    pmap = _parent_index_map(root)
    xps = construct_all_xpaths(root, "long sentence here", pmap)
    assert xps == ["/html/body/div[2]/p[1]"]
    assert remove_last_index(xps[0]) == "/html/body/div[2]/p"
    # paths INTO scripts are dropped (the body ancestor remains — its
    # textContent contains the keyword, same as the reference DOM)
    sroot = parse_html("<html><body><script>var kw = 1;</script>"
                       "</body></html>")
    got = construct_all_xpaths(sroot, "kw")
    assert all("script" not in x for x in got)


def test_find_last_box_section_and_headline_siblings():
    from kgp.html_text import add_headline_siblings, find_last_box_section
    assert find_last_box_section("/html/body/div[2]/p/strong") == \
        "/html/body/div[2]/p"
    assert find_last_box_section("/html/body/span") == "/html/body/span"
    widened = add_headline_siblings("/html/body/div[2]/p")
    assert widened.startswith("/html/body/div[2]/*[(self::p)")
    assert "(self::h1)" in widened and "(self::blockquote)" in widened


def test_xpath_nodes_evaluator():
    from kgp.html_text import add_headline_siblings, xpath_nodes
    root = parse_html("<html><body><div><h1>T</h1><p>a</p><p>b</p>"
                      "<ul><li>x</li></ul></div></body></html>")
    ps = xpath_nodes(root, "/html/body/div/p")
    assert [p.text_content() for p in ps] == ["a", "b"]
    assert len(xpath_nodes(root, "/html/body/div/p[2]")) == 1
    sel = xpath_nodes(root, add_headline_siblings("/html/body/div/p"))
    assert [n.tag for n in sel] == ["h1", "p", "p", "ul"]
    assert [n.tag for n in xpath_nodes(root, "//li")] == ["li"]


def test_document_to_readable_text():
    from kgp.html_text import document_to_readable_text
    root = parse_html("<div><p>one</p><script>skip()</script>"
                      "<p>two</p></div>")
    out = document_to_readable_text(root)
    assert "one" in out and "two" in out and "skip" not in out
    # block elements newline on enter AND leave
    assert "\none\n" in out


def test_get_entire_text_content():
    from kgp.html_text import get_entire_text_content
    full = ("Nav\n\tHome\nA proper long line of article text that "
            "survives the short-line filter easily.\nok\n\n\n\nEnd of "
            "the document with another long enough line to keep here.")
    out = get_entire_text_content(full)
    assert "article text" in out
    assert "\t" not in out
    assert "Nav" not in out          # ≤40-char lines blanked
    assert "\n\n\n" not in out       # newline runs collapsed


def test_get_result_title_paths():
    from kgp.html_text import get_result_title
    root = parse_html("<html><body><header><h1>Site</h1></header>"
                      "<h1>First</h1><div><h1>Real Article Title</h1>"
                      "</div></body></html>")
    assert get_result_title(root) == "Real Article Title"  # last, no chrome
    root2 = parse_html("<html><head><title>Page Title | Site</title>"
                       "</head><body><p>x</p></body></html>")
    assert get_result_title(root2) == "Page Title"
    root3 = parse_html("<div><p>x</p></div>")
    words = " ".join(f"w{i}" for i in range(30))
    assert get_result_title(root3, words) == \
        " ".join(f"w{i}" for i in range(20))


def test_parse_xml_strict_and_fallback():
    from kgp.html_text import document_to_text, parse_xml
    xml = ('<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/'
           'xhtml"><body><div><p>strict xhtml text</p></div></body>'
           '</html>')
    root = parse_xml(xml)
    assert "strict xhtml text" in document_to_text(root)
    # namespaces stripped, attributes preserved
    div = next(n for n in root.iter() if n.tag == "div")
    assert div.tag == "div"
    # malformed input falls back to the lenient HTML parser
    bad = "<div><p>unclosed"
    assert "unclosed" in document_to_text(parse_xml(bad))


def test_get_images_and_dominant_image():
    from kgp.html_text import get_dominant_image, get_images
    html = ('<html><head><base href="https://cdn.ex.com/"></head><body>'
            '<header><img src="logo.png" width="40" height="40"></header>'
            '<img src="icon-small.png" width="16" height="16">'
            '<img src="article/big.jpg" width="640" height="480" '
            'alt="Hero">'
            '</body></html>')
    root = parse_html(html)
    imgs = get_images(root, "https://site.ex.com/a/")
    assert [i["url"] for i in imgs] == [
        "https://cdn.ex.com/logo.png",
        "https://cdn.ex.com/icon-small.png",
        "https://cdn.ex.com/article/big.jpg"]
    dom = get_dominant_image(root, "https://site.ex.com/a/")
    assert dom["url"].endswith("article/big.jpg")   # header+icon excluded

    og = parse_html('<html><head><meta property="og:image" '
                    'content="https://x.com/hero.jpg"></head>'
                    '<body><img src="a.jpg"></body></html>')
    assert get_dominant_image(og)["url"] == "https://x.com/hero.jpg"

    ip = parse_html('<html><body><div itemprop="image">'
                    '<img src="https://x.com/item.jpg"></div>'
                    "</body></html>")
    assert get_dominant_image(ip)["url"] == "https://x.com/item.jpg"


# -------------------- HTML5 tree-construction cases (round 3)


def _txt(html):
    from kgp.html_text import document_to_text, parse_html
    return document_to_text(parse_html(html))


def test_foster_parenting_div_in_table():
    # WHATWG "in table": a <div> between table rows is inserted BEFORE
    # the table, not inside it
    out = _txt("<body><table><div>hoisted</div>"
               "<tr><td>cell</td></tr></table></body>")
    assert out.index("hoisted") < out.index("cell")
    from kgp.html_text import parse_html
    root = parse_html("<body><table><div>h</div><tr><td>c</td></tr>"
                      "</table></body>")
    body = next(n for n in root.iter() if n.tag == "body")
    assert [c.tag for c in body.children] == ["div", "table"]


def test_foster_parenting_stray_text_in_table():
    out = _txt("<body><table>stray<tr><td>cell</td></tr></table></body>")
    assert out.index("stray") < out.index("cell")


def test_whitespace_in_table_not_fostered():
    from kgp.html_text import parse_html
    root = parse_html("<body><table> <tr><td>c</td></tr></table></body>")
    body = next(n for n in root.iter() if n.tag == "body")
    assert [c.tag for c in body.children] == ["table"]


def test_end_tag_br_acts_as_br():
    # WHATWG: </br> is treated as a <br> start tag -> block newline in
    # documentToText (br is in HtmlHelper.BLOCK_ELEMENTS)
    assert _txt("<body>a</br>b</body>") == "a\nb"


def test_nested_table_start_closes_open_table():
    from kgp.html_text import parse_html
    root = parse_html("<body><table><tr><td>a</td><table><tr><td>b"
                      "</td></tr></table></body>")
    body = next(n for n in root.iter() if n.tag == "body")
    assert [c.tag for c in body.children] == ["table", "table"]


def test_charset_sniffing():
    from kgp.html_text import sniff_decode
    # meta prescan: latin-1 label decodes as windows-1252
    raw = ('<html><head><meta http-equiv="content-type" '
           'content="text/html; charset=iso-8859-1"></head>'
           '<body>f\xfcr</body></html>').encode("iso-8859-1")
    assert "für" in sniff_decode(raw)
    # BOM wins
    assert sniff_decode("﻿café".encode("utf-8")) == "café"
    # unlabelled valid utf-8 stays utf-8
    assert "café" in sniff_decode("<p>café</p>".encode("utf-8"))
    # unlabelled invalid utf-8 falls back to windows-1252
    assert "\x80" not in sniff_decode(b"<p>caf\xe9</p>")
    assert "café" in sniff_decode(b"<p>caf\xe9</p>")


def test_extract_stage_auto_german_sentences(spark):
    # auto mode: content-based lang-ID routes German prose through the
    # DE sentence regex, whose abbreviation lookbehinds (z. B., bzw.,
    # Nr. — SENTENCE_SPLIT_REGEX_DE, Tokenizer.java:31) must NOT split
    de_body = ("Die Stadt hat z. B. nicht nur einen Bahnhof gebaut. "
               "Das Projekt kostete ca. zehn Millionen Euro und wurde "
               "bzw. wird von der Stadt getragen. "
               "Die Nr. 7 der Liste ist nicht das Ende der Geschichte.")
    html = ('<html lang="en"><body><div class="article-body"><p>'
            + de_body + "</p></div></body></html>").encode()
    pages = spark.createDataFrame([("https://x.example.de/a", html)],
                                  "url string, html binary")
    row = extract_stage(pages.withColumn(
        "warc_ts", F.current_timestamp())).first()
    sents = [s.text for s in row.sentences]
    # three sentences — none split at the abbreviation dots
    assert len(sents) == 3, sents
    assert sents[0].startswith("Die Stadt hat z. B.")
    assert "ca. zehn Millionen" in sents[1]
    assert sents[2].startswith("Die Nr. 7")

    # same prose through the EN regex splits differently ("z. B." is
    # not in the EN lookbehind list) — pinning that auto picked DE
    from kgp.tokenize import get_sentences
    en_sents = get_sentences(de_body, only_real=True, language="en")
    assert len(en_sents) != 3


def test_extract_stage_auto_english_unaffected(spark):
    html = ('<html lang="de"><body><div class="article-body"><p>'
            "The committee was not convinced by the proposal. "
            "It asked for more time and for more evidence of the plan."
            "</p></div></body></html>").encode()
    pages = spark.createDataFrame([("https://x.example.de/a", html)],
                                  "url string, html binary")
    row = extract_stage(pages.withColumn(
        "warc_ts", F.current_timestamp())).first()
    # declared lang is de, but the content is English -> EN split
    assert len(row.sentences) == 2


def test_adoption_agency_formatting_end_keeps_block_open():
    """</b> across an open <div> removes the formatting entry but must
    NOT close the div (the adoption-agency outcome for text placement):
    text after the end tag stays inside the block."""
    from kgp.html_text import parse_html
    root = parse_html("<body><b>one<div>two</b>three</div>after</body>")
    div = next(n for n in root.iter() if n.tag == "div")
    assert "three" in div.text_content()
    body = next(n for n in root.iter() if n.tag == "body")
    # "after" is a direct child of body, not swallowed by <b>
    assert any(c.tag == "#text" and "after" in (c.data or "")
               for c in body.children)


def test_misnested_special_end_tag_ignored():
    """WHATWG 'any other end tag': </span> with an open <div> in the
    way is ignored — the div stays open and the span swallows the
    following content (matching browser trees)."""
    from kgp.html_text import parse_html
    root = parse_html("<body><span><div>x</span>y</div>z</body></html>")
    div = next(n for n in root.iter() if n.tag == "div")
    assert "y" in div.text_content()
    span = next(n for n in root.iter() if n.tag == "span")
    assert "z" in span.text_content()


def test_ul_end_closes_unclosed_li():
    """</ul> with unclosed <li> children pops through them (generate
    implied end tags) — the codinghorror fixture case: content after
    the list must not nest inside the last <li>."""
    from kgp.html_text import parse_html
    root = parse_html("<body><ul><li>a<li>b</ul><p>after</p></body>")
    ul = next(n for n in root.iter() if n.tag == "ul")
    assert "after" not in ul.text_content()
    assert len([c for c in ul.children if c.tag == "li"]) == 2


def test_block_end_tag_not_in_scope_ignored():
    """</div> inside a table cell must not close a div outside the
    table (scope barrier), and an implied </p> is likewise bounded."""
    from kgp.html_text import parse_html
    root = parse_html("<body><div>out<table><tr><td>in</div>still"
                      "</td></tr></table>tail</div></body>")
    td = next(n for n in root.iter() if n.tag == "td")
    assert "still" in td.text_content()
    # the outer div survives until its real end tag
    div = next(n for n in root.iter() if n.tag == "div")
    assert "tail" in div.text_content()


def test_table_closes_p_and_td_p_is_scoped():
    """<table> start closes an open <p> (standards mode); a <p> opened
    inside a td is closed by a block start WITHIN the cell, not by
    anything outside (button scope bounded at the cell)."""
    from kgp.html_text import parse_html
    root = parse_html("<body><p>before<table><tr><td><p>inner<div>d"
                      "</div></td></tr></table>after</body>")
    body = next(n for n in root.iter() if n.tag == "body")
    assert [c.tag for c in body.children
            if not c.tag.startswith("#")] == ["p", "table"]
    outer_p = next(n for n in root.iter() if n.tag == "p")
    assert outer_p.text_content() == "before"
    td = next(n for n in root.iter() if n.tag == "td")
    inner_p = next(n for n in td.iter() if n.tag == "p")
    assert "d" not in inner_p.text_content()   # div closed it
    assert "d" in td.text_content()


# ----------------- content-scoped image extraction (reference getImages)


def test_content_images_reference_fixtures():
    """PalladianContentExtractorTest.testImageExtraction — the
    result-scoped getImages: test015 -> 2 images, first has no
    declared width (-1); test020 -> 4 images, images[1].width ==
    624."""
    from kgp.html_text import get_content_images, parse_document
    p15 = os.path.join(FIXDIR, "test015.html")
    p20 = os.path.join(FIXDIR, "test020.html")
    if not os.path.exists(p15):
        pytest.skip("reference fixtures not available")
    r = parse_document(open(p15, "rb").read())
    images = get_content_images(r["root"], r["node"])
    assert len(images) == 2
    assert images[0]["width"] == -1
    r = parse_document(open(p20, "rb").read())
    images = get_content_images(r["root"], r["node"])
    assert len(images) == 4
    assert images[1]["width"] == 624


def test_content_images_semantics():
    from kgp.html_text import get_content_images, parse_html
    html = ('<html><head><base href="http://cdn.ex.com/"></head><body>'
            '<header><img src="logo.png"></header>'
            '<div id="main">'
            '<img src="a.jpg" width="50%">'
            '<img src="b.jpg" style="width:120.5px;height:80px">'
            '<img src="bad.jpg" width="wide">'
            '<img alt="no src">'
            '</div>'
            '<div id="footer"><img src="f.png"></div>'
            '</body></html>')
    root = parse_html(html)
    main = next(n for n in root.iter()
                if n.attrs.get("id") == "main")
    images = get_content_images(root, main)
    urls = [i["url"] for i in images]
    # header/footer chrome removed, srcless skipped, bad width SKIPS
    # the whole image (the reference's NumberFormatException catch)
    assert urls == ["http://cdn.ex.com/a.jpg", "http://cdn.ex.com/b.jpg"]
    # 50% of the 500px default container; inline-style floats truncate
    assert images[0]["width"] == 250
    assert images[1]["width"] == 120 and images[1]["height"] == 80


def test_content_images_parent_climb():
    from kgp.html_text import get_content_images, parse_html
    # no img under the main node -> climb to the parent (reference's
    # while-empty loop)
    html = ('<html><body><div><img src="http://x.com/up.jpg">'
            '<div id="main"><p>text only</p></div></div></body></html>')
    root = parse_html(html)
    main = next(n for n in root.iter()
                if n.attrs.get("id") == "main")
    images = get_content_images(root, main)
    assert [i["url"] for i in images] == ["http://x.com/up.jpg"]
    assert get_content_images(root, None) == []


# ---------------- adoption agency (WHATWG 13.2.6.4.7)

def _tree(html):
    from kgp.html_text import parse_html

    def dump(n):
        if n.tag == "#text":
            return repr(n.data)
        kids = ",".join(dump(c) for c in n.children)
        return f"{n.tag}({kids})" if kids else n.tag
    root = parse_html(html)
    return ",".join(dump(c) for c in root.children)


def test_aaa_b_p_misnest():
    # <b> spans a <p> boundary: reconstruction re-opens it in the new
    # paragraph, </b> closes the clone (browser-verified shape)
    assert _tree("<p>1<b>2<p>3</b>4") == \
        "p('1',b('2')),p(b('3'),'4')"


def test_aaa_classic_bi():
    assert _tree("<p><b><i>bi</b>i-only</i>plain</p>") == \
        "p(b(i('bi')),i('i-only'),'plain')"


def test_aaa_a_reopen():
    # WHATWG: a second <a> adopts the first out of the way
    assert _tree("<a>one<a>two</a>") == "a('one'),a('two')"


def test_aaa_furthest_block_rewrap():
    # text after </b> inside the still-open block is NOT bold; the
    # block's earlier content is re-wrapped in a clone of <b>
    assert _tree("<b>bold<div>still bold</b>not bold</div>") == \
        "b('bold'),div(b('still bold'),'not bold')"


def test_aaa_reconstruct_after_block_close():
    assert _tree("<div><b>x</div>y") == "div(b('x')),b('y')"


def test_aaa_noahs_ark():
    # the active-formatting LIST keeps at most 3 identical entries,
    # so the reconstructed run inside the div is capped at 3 (the 5
    # original sibling <b>s stay in the DOM untouched)
    out = _tree("<p>" + "<b>" * 5 + "x<div>y")
    assert out == "p(b(b(b(b(b('x')))))),div(b(b(b('y'))))"


def test_aaa_ignores_unopened_formatting_end():
    assert _tree("<p>x</b>y</p>") == "p('x','y')"


def test_aaa_text_output_stable():
    # document_to_text must see identical text regardless of the
    # inline re-wrapping the algorithm performs
    from kgp.html_text import document_to_text, parse_html
    t = document_to_text(parse_html(
        "<p>1<b>2<p>3</b>4<div><i>5</div>6"))
    for ch in "123456":
        assert ch in t


# ---------------- full reference fixture sweep (all ~30 pages)

# every remaining pageContentExtractor page: the parse must complete,
# the known article/page phrase must be present, and where the page
# has chrome the extraction must be a strict subset of the full text
FIXTURES_SWEEP = [
    ("test016.html", "Eine gebannte Menschenmenge", True),
    ("test017.html", "Apple unveils iPad tablet computer", True),
    ("test101.html", "UPBH-5004", False),           # chrome-free page
    ("test201.html", "Sin and Punishment", True),
    ("test202.html", "Was nun, Frau Kraft?", True),
    ("test203.html", "Zotac GeForce GTX 470", True),
    ("test204.html", "Klose oder Cacau?", True),
    ("test205.html", "Red Dead Redemption", True),
    ("test206.html", "Collier County Sheriff", True),
    ("test207.html", "Twittley Karma", True),
    ("test5.html", "längerer Absatz", False),       # MacRoman XML decl
    ("test6.html", "längerer Absatz", False),
    ("test7.html", "without specified encoding", False),
    ("test8.html", "ISO-8859-1", False),
]


@pytest.mark.parametrize("name,phrase,has_chrome", FIXTURES_SWEEP)
def test_parse_document_fixture_sweep(name, phrase, has_chrome):
    from kgp.html_text import parse_document
    path = os.path.join(FIXDIR, name)
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    r = parse_document(open(path, "rb").read())
    assert phrase in r["full_text"], name
    assert r["text"].strip(), name
    if has_chrome:
        assert len(r["text"]) < len(r["full_text"]), name


def test_parse_document_fixture_readability_208():
    # Readability-era page (that extractor is superseded in the
    # reference); we only pin robustness + full-text fidelity
    from kgp.html_text import parse_document
    path = os.path.join(FIXDIR, "test208.html")
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    r = parse_document(open(path, "rb").read())
    assert "Business Insider" in r["full_text"]
    assert len(r["text"]) < len(r["full_text"])


def test_get_links_fixture_base_href():
    # PageAnalyzerTest.java:208-217: getLinks resolves against the
    # <base> tag (test9) and the document URL (test10)
    from kgp.html_text import parse_html, sniff_decode
    from kgp.webgraph import get_links
    for name in ("test9.html", "test10.html"):
        path = os.path.join(FIXDIR, name)
        if not os.path.exists(path):
            pytest.skip("reference fixtures not available")
        root = parse_html(sniff_decode(open(path, "rb").read()))
        links = get_links(root, "http://www.example.com/", True, True)
        assert links[0]["url"] == "http://www.example.com/test.html", name
