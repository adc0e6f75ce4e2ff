"""Stage 1 — HTML → text / title / lang / sentences.

Document-local work, zero shuffles: one vectorized pandas UDF over Arrow
batches of pages. Semantics re-derived from the reference:

  * `document_to_text`  — recursive DOM walk: skip script/style/#comment/
    option/meta/head; emit text nodes; append "\\n" on ENTERING each block
    element; delete runs of >=2 spaces.
    (/root/reference/palladian-commons/src/main/java/ws/palladian/helper/html/HtmlHelper.java:694-728,
     BLOCK_ELEMENTS :51-52)
  * main-content extraction — class/itemprop/id hints, then sentence-
    density scoring of candidate containers, content = concat of child
    block nodes' textContent + "\\n\\n", fallback to the full-document
    text when < 100 chars.
    (/root/reference/palladian-core/src/main/java/ws/palladian/extraction/content/PalladianContentExtractor.java:218-370,433-461)
  * language detection — <html lang>, meta content-language, TLD.
    (PalladianContentExtractor.java:817-886)

The HTML parser is a small stdlib-based DOM (html5lib is unavailable in
this environment); it handles void elements, implied </p>/<li>/… closes,
and unclosed tags at EOF — enough for web-page text extraction, and
golden-tested byte-for-byte against the corpus `text` column.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.tokenize import get_sentences

# ------------------------------------------------------------------ DOM


class Node:
    __slots__ = ("tag", "attrs", "children", "data")

    def __init__(self, tag: str, attrs: dict | None = None,
                 data: str = "") -> None:
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.data = data

    def text_content(self) -> str:
        """DOM textContent: all descendant text, comments excluded.
        Iterative — adversarially deep pages must not blow the Python
        recursion limit inside a worker."""
        parts: list[str] = []
        stack = [self]
        while stack:
            n = stack.pop()
            if n.tag == "#text":
                parts.append(n.data)
            elif n.tag != "#comment":
                stack.extend(reversed(n.children))
        return "".join(parts)

    def iter(self):
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed(n.children))


VOID_ELEMENTS = {"area", "base", "br", "col", "embed", "hr", "img",
                 "input", "link", "meta", "param", "source", "track",
                 "wbr"}
# HTML5: these start tags imply </p> when a <p> is open
P_CLOSERS = {"address", "article", "aside", "blockquote", "div", "dl",
             "fieldset", "footer", "form", "h1", "h2", "h3", "h4", "h5",
             "h6", "header", "hr", "main", "nav", "ol", "p", "pre",
             "section", "table", "ul"}
_SELF_CLOSERS = {"li": {"li"}, "dd": {"dd", "dt"}, "dt": {"dd", "dt"},
                 "tr": {"tr", "td", "th"}, "td": {"td", "th"},
                 "th": {"td", "th"}, "option": {"option"}}


class _DomParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def _open_tags(self) -> list[str]:
        return [n.tag for n in self.stack]

    def handle_starttag(self, tag, attrs):
        if tag in P_CLOSERS and "p" in self._open_tags():
            self._pop_to("p")
        implied = _SELF_CLOSERS.get(tag)
        if implied and self.stack[-1].tag in implied:
            self.stack.pop()
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        self._pop_to(tag)

    def _pop_to(self, tag: str) -> None:
        if tag not in self._open_tags():
            return
        while len(self.stack) > 1:
            if self.stack.pop().tag == tag:
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(Node("#text", data=data))

    def handle_comment(self, data):
        self.stack[-1].children.append(Node("#comment", data=data))


def parse_html(html: str | bytes) -> Node:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _DomParser()
    p.feed(html)
    p.close()
    return p.root


# ------------------------------------------------- documentToText port

SKIP_NODES = {"script", "style", "#comment", "option", "meta", "head"}
BLOCK_ELEMENTS = {
    "address", "blockquote", "div", "dl", "fieldset", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "hr", "noscript", "ol", "p", "pre", "table",
    "ul", "dd", "dt", "li", "tbody", "td", "tfoot", "th", "thead", "tr",
    "button", "del", "ins", "map", "object", "script", "br",
}
_MULTISPACE = re.compile(" {2,}")


def document_to_text(node: Node) -> str:
    """HtmlHelper.documentToText port — per-recursion-exact. The
    reference applies `replaceAll("[ ]{2,}", "")` to the ACCUMULATED
    string of every recursive call (HtmlHelper.java:727), including
    each #text leaf; a single global pass is NOT equivalent: text node
    "a  " followed by sibling " b" yields "a b" in the reference (leaf
    pass deletes the trailing run first) but "ab" under one global
    pass (the runs merge before deletion). So the deletion is applied
    bottom-up per node here, exactly like the recursion — iteratively
    (reversed preorder = children-before-parents), so adversarially
    deep markup can't blow the worker's Python recursion limit."""
    if node.tag in SKIP_NODES:
        return ""
    order: list[Node] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if n.tag in SKIP_NODES:
            continue
        order.append(n)
        stack.extend(c for c in n.children if c.tag not in SKIP_NODES)
    results: dict[int, str] = {}
    for n in reversed(order):
        parts: list[str] = []
        if n.tag == "#text":
            parts.append(n.data)
        if n.tag in BLOCK_ELEMENTS:
            parts.append("\n")
        parts.extend(results.pop(id(c)) for c in n.children
                     if c.tag not in SKIP_NODES)
        results[id(n)] = _MULTISPACE.sub("", "".join(parts))
    return results[id(node)]


# ------------------------------------------- main-content extraction

MAIN_HINTS = ["articletext", "article_body", "article-body", "articlebody",
              "hfeed", "st_text_c"]
CONTAINER_TAGS = {"div", "article", "section", "main", "body", "td",
                  "blockquote", "li"}
CONTENT_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "ul", "ol",
                "blockquote", "pre"}
REMOVE_TAGS = {"script", "style", "iframe", "noscript", "nav", "header",
               "footer", "aside"}
REMOVE_CLASS_HINTS = ("comment", "sidebar", "nav", "footer", "header")
MIN_MAIN_LEN = 100


def _class_id(node: Node) -> str:
    return " ".join(
        str(node.attrs.get(k, "") or "") for k in ("class", "id", "itemprop")
    ).lower()


def clean_dom(root: Node) -> Node:
    """cleanDom port: drop comments, script/style/iframe, nav/header/
    footer/sidebar/comment sections (PalladianContentExtractor.java:391-431)."""

    def keep(n: Node) -> bool:
        if n.tag == "#comment" or n.tag in REMOVE_TAGS:
            return False
        ci = _class_id(n)
        return not any(h in ci for h in REMOVE_CLASS_HINTS)

    stack = [root]
    while stack:
        n = stack.pop()
        n.children = [c for c in n.children if keep(c)]
        stack.extend(n.children)
    return root


def _sentence_density(node: Node, language: str) -> int:
    score = 0
    for c in node.children:
        if c.tag in CONTENT_TAGS:
            score += len(get_sentences(c.text_content(), only_real=True,
                                       language=language))
    return score


def find_main_node(root: Node, language: str = "en") -> Node | None:
    """Hinted node wins; else the container with the highest direct-child
    sentence density (the XPath-density scheme reduced to containers —
    PalladianContentExtractor.java:245-306)."""
    for n in root.iter():
        if n.tag not in ("#text", "#comment") and any(
                h in _class_id(n) for h in MAIN_HINTS):
            return n
    best, best_score = None, 0
    for n in root.iter():
        if n.tag not in CONTAINER_TAGS:
            continue
        score = _sentence_density(n, language)
        if score > best_score:
            best, best_score = n, score
    return best


def extract_main_content(html: str | bytes, url: str = "") -> dict:
    """Full extraction: returns dict(text, title, lang, full_text)."""
    root = parse_html(html)
    lang = detect_language(root, url)
    sent_lang = "de" if lang == "de" else "en"
    full_text = document_to_text(root)
    title = _extract_title(root)
    clean_dom(root)
    main = find_main_node(root, sent_lang)
    text = ""
    if main is not None:
        pieces = [c.text_content() + "\n\n" for c in main.children
                  if c.tag in CONTENT_TAGS]
        text = "".join(pieces)
    if len(text) < MIN_MAIN_LEN:  # fallback (:364-369)
        text = full_text
    return {"text": text, "title": title, "lang": lang,
            "full_text": full_text}


def _extract_title(root: Node) -> str:
    h1 = next((n for n in root.iter() if n.tag == "h1"), None)
    if h1 is not None:
        t = h1.text_content().strip()
        if t:
            return t
    title = next((n for n in root.iter() if n.tag == "title"), None)
    if title is not None:
        return title.text_content().split("|")[0].strip()
    return ""


_TLD_LANG = {".de": "de", ".at": "de", ".ch": "de", ".fr": "fr",
             ".es": "es", ".it": "it", ".nl": "nl", ".se": "sv",
             ".cn": "zh", ".uk": "en", ".com": "en", ".org": "en",
             ".net": "en"}


def detect_language(root: Node, url: str = "") -> str:
    for n in root.iter():
        if n.tag == "html" and n.attrs.get("lang"):
            return str(n.attrs["lang"]).split("-")[0].lower()
    for n in root.iter():
        if n.tag == "meta":
            he = str(n.attrs.get("http-equiv", "")).lower()
            nm = str(n.attrs.get("name", "")).lower()
            if he == "content-language" or nm in ("language", "lang"):
                c = str(n.attrs.get("content", ""))
                if c:
                    return c.split("-")[0].split(",")[0].lower()
    host = url.split("://")[-1].split("/")[0]
    for tld, lang in _TLD_LANG.items():
        if host.endswith(tld):
            return lang
    return "en"


# ------------------------------------------------------- Spark stage

EXTRACT_SCHEMA = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("sentences", T.ArrayType(T.StructType([
        T.StructField("start", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]))),
])


def extract_stage(pages: DataFrame, sentence_lang: str = "en") -> DataFrame:
    """pages -> docs(url, warc_ts, lang, title, text, sentences).

    Per-document work only: Catalyst keeps this a single ArrowEvalPython
    stage over the parquet scan — no shuffle.

    sentence_lang: "en"/"de" force that split regex; "auto" keys off the
    page's detected language. Default is "en": the <html lang> attribute
    describes the page, not necessarily the prose, and the reference's DE
    regex has aggressive abbreviation lookbehinds (e.g. `[mM]s` for "Ms."
    suppresses any split after a word ending in "ms"); content-based
    language ID (kgp.textstats) is the scale-path input for "auto".
    """

    @F.pandas_udf(EXTRACT_SCHEMA)
    def _extract_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
        texts, titles, langs, sents = [], [], [], []
        for h, u in zip(html, url):
            r = extract_main_content(h, u or "")
            if sentence_lang == "auto":
                sl = "de" if r["lang"] == "de" else "en"
            else:
                sl = sentence_lang
            ss = get_sentences(r["text"], only_real=True, language=sl)
            texts.append(r["text"])
            titles.append(r["title"])
            langs.append(r["lang"])
            sents.append([{"start": s.start, "text": s.value} for s in ss])
        return pd.DataFrame({"text": texts, "title": titles, "lang": langs,
                             "sentences": sents})

    ex = _extract_udf(F.col("html"), F.col("url")).alias("ex")
    return pages.select("url", "warc_ts", ex).select(
        "url", "warc_ts",
        F.col("ex.lang").alias("lang"),
        F.col("ex.title").alias("title"),
        F.col("ex.text").alias("text"),
        F.col("ex.sentences").alias("sentences"),
    )
