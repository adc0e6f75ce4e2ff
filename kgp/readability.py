"""Arc90 "Readability" content extractor — the reference's alternative
boilerplate-removal scorer, ported faithfully.

Semantics re-derived from
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/content/ReadabilityContentExtractor.java
(the reference's port of the Arc90 JavaScript bookmarklet, SVN r152):

  * regexes and score tables           :71-81, :429-448
  * init / retry-flag cascade (<250)   :229-296
  * getArticleTitle                    :303-338
  * prepDocument / cleanStyles         :346-360, :725-746
  * grabArticle main loop (live "*"
    NodeList semantics incl. the
    div->p rename REVISIT double-add)  :457-693
  * prepArticle / clean /
    cleanConditionally / cleanHeaders  :370-420, :816-944
  * getInnerText / getLinkDensity /
    getClassIdWeight                   :701-715, :755-807
  * getResultText = documentToReadableText + cleanup regexes
    (HtmlHelper.java:310-378)

Deliberate deviation: scores are Python doubles, not Java float32
round-tripped through a DOM attribute string; differences only matter
within float32 epsilon of the sibling threshold.

Spark-side this is document-local work: one vectorized pandas UDF
stage (readability_stage), zero shuffles, column-pruned to (url, html).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.html_text import Node, document_to_readable_text, parse_html

# ------------------------------------------------------------ regexes
# ReadabilityContentExtractor.java:71-81 (verbatim, case-insensitive)

UNLIKELY_CANDIDATES_RE = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|legal|menu|remark"
    r"|rss|shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager"
    r"|popup", re.I)
OK_MAYBE_ITS_A_CANDIDATE_RE = re.compile(
    r"and|article|body|column|main|shadow", re.I)
POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text"
    r"|blog|story", re.I)
NEGATIVE_RE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|link|masthead"
    r"|media|meta|outbrain|promo|related|scroll|shoutbox|sidebar"
    r"|sponsor|shopping|tags|tool|widget", re.I)
# matched against "<tag ..." — i.e. fires when a descendant element's
# tag STARTS WITH one of the alternatives (the Java regex runs over
# serialized inner XML, so "<abbr" matches the "a" alternative too)
DIV_TO_P_ELEMENTS_RE = re.compile(
    r"a|blockquote|dl|div|img|ol|p|pre|table|ul", re.I)
# Java \s == [ \t\n\x0B\f\r]
_NORMALIZE_RE = re.compile(r"[ \t\n\x0b\f\r]{2,}")
VIDEO_RE = re.compile(r"http:\/\/(www\.)?(youtube|vimeo)\.com", re.I)
_NORMALIZE_LINES = re.compile(r"^\s+$|^[ \t]+|[ \t]+$", re.M)
_SENTENCE_END_RE = re.compile(r"\.( |$)")
_TITLE_SEP_RE = re.compile(r" [\|\-] ")


# ---------------------------------------------------- mutable DOM view


class _RNode:
    """Element/text node with parent pointer + readability score
    (the Java port stores the score in a DOM attribute,
    ReadabilityContentExtractor.java:953-966; we keep it as a slot).
    Duck-types html_text.Node for document_to_readable_text."""

    __slots__ = ("tag", "attrs", "children", "data", "parent",
                 "score", "scored")

    def __init__(self, tag: str, attrs: dict | None = None,
                 data: str = "", parent: "_RNode | None" = None):
        self.tag = tag
        self.attrs = dict(attrs) if attrs else {}
        self.children: list[_RNode] = []
        self.data = data
        self.parent = parent
        self.score = 0.0
        self.scored = False


def _clone(src, parent: _RNode | None = None) -> _RNode:
    """Deep copy (importNode(deep) — copies the readability score the
    way importing the attribute string does, :682)."""
    out = _RNode(src.tag, getattr(src, "attrs", None), src.data, parent)
    if isinstance(src, _RNode):
        out.score, out.scored = src.score, src.scored
    stack = [(src, out)]
    while stack:
        s, d = stack.pop()
        for c in s.children:
            cc = _RNode(c.tag, getattr(c, "attrs", None), c.data, d)
            if isinstance(c, _RNode):
                cc.score, cc.scored = c.score, c.scored
            d.children.append(cc)
            stack.append((c, cc))
    return out


def _iter(root: _RNode):
    stack = [root]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(reversed(n.children))


def _elements(root: _RNode) -> list[_RNode]:
    """Document-order element list == getElementsByTagName("*")
    snapshot; the caller re-snapshots after mutations to emulate the
    live NodeList."""
    return [n for n in _iter(root) if not n.tag.startswith("#")]


def _descendant_elements(e: _RNode, tag: str) -> list[_RNode]:
    """Element.getElementsByTagName(tag): STRICT descendants."""
    out = []
    stack = list(reversed(e.children))
    while stack:
        n = stack.pop()
        if n.tag == tag:
            out.append(n)
        stack.extend(reversed(n.children))
    return out


def _remove(node: _RNode) -> None:
    if node.parent is not None:
        node.parent.children.remove(node)
        node.parent = None


def _attr(e: _RNode, name: str) -> str:
    v = e.attrs.get(name)
    return v if isinstance(v, str) else ""


def _text_content(n: _RNode) -> str:
    parts, stack = [], [n]
    while stack:
        c = stack.pop()
        if c.tag == "#text":
            parts.append(c.data)
        elif c.tag != "#comment":
            stack.extend(reversed(c.children))
    return "".join(parts)


def _jtrim(s: str) -> str:
    """Java String.trim(): strip leading/trailing chars <= U+0020."""
    i, j = 0, len(s)
    while i < j and s[i] <= " ":
        i += 1
    while j > i and s[j - 1] <= " ":
        j -= 1
    return s[i:j]


def _java_split_space(s: str) -> list[str]:
    """Java split(" "): trailing empty strings removed; a no-match
    input returns [input]."""
    if " " not in s:
        return [s]
    parts = s.split(" ")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _inner_text(e: _RNode, normalize_spaces: bool = True) -> str:
    """getInnerText (:705-715): textContent.trim(), optional Java
    \\s{2,} -> ' '."""
    t = _jtrim(_text_content(e))
    if normalize_spaces:
        t = _NORMALIZE_RE.sub(" ", t)
    return t


def _link_density(e: _RNode) -> float:
    """getLinkDensity (:755-767)."""
    text_len = len(_inner_text(e))
    if text_len == 0:
        return 0.0
    link_len = sum(len(_inner_text(a))
                   for a in _descendant_elements(e, "a"))
    return link_len / text_len


def _class_id_weight(e: _RNode, weight_classes: bool) -> int:
    """getClassIdWeight (:775-807)."""
    if not weight_classes:
        return 0
    weight = 0
    if "class" in e.attrs:
        cls = _attr(e, "class")
        if NEGATIVE_RE.search(cls):
            weight -= 25
        if POSITIVE_RE.search(cls):
            weight += 25
    if "id" in e.attrs:
        eid = _attr(e, "id")
        if NEGATIVE_RE.search(eid):
            weight -= 25
        if POSITIVE_RE.search(eid):
            weight += 25
    return weight


def _initialize_node(e: _RNode, weight_classes: bool) -> None:
    """initializeNode (:429-448)."""
    tag = e.tag
    score = 0
    if tag == "div":
        score += 5
    elif tag in ("pre", "td", "blockquote"):
        score += 3
    elif tag in ("address", "ol", "ul", "dl", "dd", "dt", "li", "form"):
        score -= 3
    elif tag in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
        score -= 5
    score += _class_id_weight(e, weight_classes)
    e.score = float(score)
    e.scored = True


# --------------------------------------------------------- prep stages


def _prep_document(root: _RNode) -> None:
    """prepDocument (:346-360): drop script/style elements and
    comments; strip style attributes."""
    for tag in ("script", "style"):
        for e in [n for n in _iter(root) if n.tag == tag]:
            _remove(e)
    for c in [n for n in _iter(root) if n.tag == "#comment"]:
        _remove(c)
    _clean_styles(root)


def _clean_styles(e: _RNode) -> None:
    """cleanStyles (:725-746) — including the reference quirk that a
    childless top-level element keeps its style attribute (the null
    first-child check precedes the removeAttribute)."""
    if not e.children:
        return
    e.attrs.pop("style", None)
    for cur in e.children:
        if not cur.tag.startswith("#"):
            cur.attrs.pop("style", None)
            _clean_styles(cur)


def _clean(e: _RNode, tag: str) -> None:
    """clean (:816-845): remove descendant elements of `tag`, keeping
    youtube/vimeo objects/embeds."""
    targets = _descendant_elements(e, tag)
    is_embed = tag in ("object", "embed")
    for item in reversed(targets):
        if is_embed:
            attr_values = "".join(
                (v if isinstance(v, str) else "") + "|"
                for v in item.attrs.values())
            if VIDEO_RE.search(attr_values):
                continue
            if VIDEO_RE.search(_text_content(item)):
                continue
        _remove(item)


def _clean_conditionally(e: _RNode, tag: str, weight_classes: bool,
                         enabled: bool) -> None:
    """cleanConditionally (:854-926)."""
    if not enabled:
        return
    for element in reversed(_descendant_elements(e, tag)):
        weight = _class_id_weight(element, weight_classes)
        content_score = element.score if element.scored else 0.0
        if weight + content_score < 0:
            _remove(element)
        elif _text_content(element).count(",") < 10:
            p = len(_descendant_elements(element, "p"))
            img = len(_descendant_elements(element, "img"))
            li = len(_descendant_elements(element, "li")) - 100
            inp = len(_descendant_elements(element, "input"))
            embed_count = sum(
                1 for em in _descendant_elements(element, "embed")
                if VIDEO_RE.search(_attr(em, "src")))
            link_density = _link_density(element)
            content_length = len(_inner_text(element))
            to_remove = (
                img > p
                or (li > p and tag not in ("ul", "ol"))
                or inp > math.floor(p / 3)
                or (content_length < 25 and (img == 0 or img > 2))
                or (weight < 25 and link_density > 0.2)
                or (weight >= 25 and link_density > 0.5)
                or (embed_count == 1 and content_length < 75)
                or embed_count > 1
            )
            if to_remove:
                _remove(element)


def _clean_headers(e: _RNode, weight_classes: bool) -> None:
    """cleanHeaders (:934-944)."""
    for level in range(1, 7):
        for h in reversed(_descendant_elements(e, f"h{level}")):
            if (_class_id_weight(h, weight_classes) < 0
                    or _link_density(h) > 0.33):
                _remove(h)


def _prep_article(article: _RNode, weight_classes: bool,
                  clean_cond: bool) -> None:
    """prepArticle (:370-420)."""
    _clean_conditionally(article, "form", weight_classes, clean_cond)
    _clean(article, "object")
    _clean(article, "h1")
    _clean(article, "noscript")
    if len(_descendant_elements(article, "h2")) == 1:
        _clean(article, "h2")
    _clean(article, "iframe")
    _clean_headers(article, weight_classes)
    _clean_conditionally(article, "table", weight_classes, clean_cond)
    _clean_conditionally(article, "ul", weight_classes, clean_cond)
    _clean_conditionally(article, "div", weight_classes, clean_cond)
    for par in reversed(_descendant_elements(article, "p")):
        if (not _descendant_elements(par, "img")
                and not _descendant_elements(par, "embed")
                and not _descendant_elements(par, "object")
                and len(_inner_text(par, False)) == 0):
            _remove(par)


# --------------------------------------------------------- grabArticle


def _has_div_to_p_child(node: _RNode) -> bool:
    """DIV_TO_P_ELEMENTS_RE over inner XML == any strict-descendant
    element whose tag starts with one of the alternatives (:493-494)."""
    stack = list(reversed(node.children))
    while stack:
        c = stack.pop()
        if not c.tag.startswith("#") and DIV_TO_P_ELEMENTS_RE.match(c.tag):
            return True
        stack.extend(reversed(c.children))
    return False


def _grab_article(root: _RNode, strip_unlikely: bool,
                  weight_classes: bool, clean_cond: bool) -> _RNode | None:
    """grabArticle (:457-693). Returns the result tree's html root."""
    _prep_document(root)

    nodes_to_score: list[_RNode] = []
    elems = _elements(root)
    i = 0
    while i < len(elems):
        node = elems[i]
        if strip_unlikely:
            unlikely = _attr(node, "class") + _attr(node, "id")
            if (UNLIKELY_CANDIDATES_RE.search(unlikely)
                    and not OK_MAYBE_ITS_A_CANDIDATE_RE.search(unlikely)
                    and node.tag != "body"):
                _remove(node)
                # live NodeList: the subtree vanishes, the next element
                # slides into this index (Java nodeIndex-- + loop ++)
                elems = _elements(root)
                continue

        if node.tag in ("p", "td"):
            nodes_to_score.append(node)

        if node.tag == "div":
            if not _has_div_to_p_child(node):
                # rename div -> p; Java decrements nodeIndex so the
                # SAME node is revisited and double-added via the p
                # branch above (live-list semantics, :493-498)
                node.tag = "p"
                nodes_to_score.append(node)
                continue
            # EXPERIMENTAL (:500-513): bare text children of content
            # divs become <p style="display:inline">
            changed = False
            for idx, child in enumerate(node.children):
                if child.tag == "#text" and child.data.strip():
                    p = _RNode("p", {"style": "display:inline"},
                               parent=node)
                    t = _RNode("#text", data=child.data, parent=p)
                    p.children.append(t)
                    node.children[idx] = p
                    changed = True
            if changed:
                elems = _elements(root)
        i += 1

    candidates: list[_RNode] = []
    for node in nodes_to_score:
        parent = node.parent
        if parent is None:
            continue
        grand = parent.parent
        inner = _inner_text(node)
        if len(inner) < 25:
            continue
        content_score = 1
        content_score += len(_java_split_space_sep(inner, ","))
        content_score += min(math.floor(len(inner) / 100), 3)
        if not parent.tag.startswith("#"):
            if not parent.scored:
                _initialize_node(parent, weight_classes)
                candidates.append(parent)
            parent.score += content_score
        if grand is not None and not grand.tag.startswith("#"):
            if not grand.scored:
                _initialize_node(grand, weight_classes)
                candidates.append(grand)
            grand.score += content_score / 2.0

    top = None
    for cand in candidates:
        cand.score = cand.score * (1 - _link_density(cand))
        if top is None or cand.score > top.score:
            top = cand

    if top is None:
        bodies = [n for n in _iter(root) if n.tag == "body"]
        # body-as-last-resort (:599-607). The reference's HTML5 parser
        # ALWAYS synthesizes a <body> (so its null return is
        # unreachable); our parser keeps fragments bare — the document
        # node stands in, preserving the reference's behavior of
        # returning the page text for tagless/fragment input.
        top = bodies[0] if bodies else root
        top.tag = "div"

    result_html = _RNode("html")
    article = _RNode("body", parent=result_html)
    result_html.children.append(article)

    sibling_threshold = max(10.0, top.score * 0.2)
    parent = top.parent
    siblings = parent.children if parent is not None else [top]
    for sib in siblings:
        if sib.tag.startswith("#"):
            continue
        append = sib is top
        content_bonus = 0
        top_class = _attr(top, "class")
        if top_class and _attr(sib, "class") == top_class:
            # Java `int contentBonus += float` truncates toward zero
            content_bonus += int(top.score * 0.2)
        if sib.scored and sib.score + content_bonus >= sibling_threshold:
            append = True
        if sib.tag == "p":
            link_density = _link_density(sib)
            node_content = _inner_text(sib)
            node_length = len(node_content)
            if node_length > 80 and link_density < 0.25:
                append = True
            elif (node_length < 80 and link_density == 0
                  and _SENTENCE_END_RE.search(node_content)):
                append = True
        if append:
            if sib.tag not in ("div", "p"):
                sib.tag = "div"  # renamed in the source doc (:671)
            imported = _clone(sib, parent=article)
            article.children.append(imported)

    _prep_article(article, weight_classes, clean_cond)
    return result_html


def _java_split_space_sep(s: str, sep: str) -> list[str]:
    """Java split(sep) for a literal separator: trailing empties
    removed, no-match returns [input]."""
    if sep not in s:
        return [s]
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


# ----------------------------------------------------------- init/title


def _init(original: Node) -> _RNode | None:
    """init (:229-296): run grabArticle; on a <250-char result re-run
    from the ORIGINAL document with the retry flags cascading off;
    then post-process display:inline p's and strip bookkeeping."""
    strip_unlikely, weight_classes, clean_cond = True, True, True
    result = _grab_article(_clone(original), strip_unlikely,
                           weight_classes, clean_cond)
    while result is None or len(_inner_text(result, False)) < 250:
        if strip_unlikely:
            strip_unlikely = False
        elif weight_classes:
            weight_classes = False
        elif clean_cond:
            clean_cond = False
        else:
            break
        result = _grab_article(_clone(original), strip_unlikely,
                               weight_classes, clean_cond)

    if result is not None:
        for p in reversed(
                [n for n in _iter(result) if n.tag == "p"]):
            if _attr(p, "style") == "display:inline":
                t = _RNode("#text", data=_text_content(p),
                           parent=p.parent)
                idx = p.parent.children.index(p)
                p.parent.children[idx] = t
        for e in _elements(result):
            e.attrs.pop("class", None)
            e.score, e.scored = 0.0, False
    return result


def get_article_title(root: Node) -> str:
    """getArticleTitle (:303-338), over the ORIGINAL document."""
    cur = orig = ""
    titles = [n for n in root.iter() if n.tag == "title"]
    if len(titles) == 1:
        t = _jtrim(titles[0].text_content())
        cur = orig = _NORMALIZE_RE.sub(" ", t)

    if _TITLE_SEP_RE.search(cur):
        cur = re.sub(r"(.*)[\|\-] .*", r"\1", orig)
        if len(_java_split_space(cur)) < 3:
            cur = re.sub(r"[^\|\-]*[\|\-](.*)", r"\1", orig)
    elif ": " in cur:
        cur = re.sub(r".*:/(.*)", r"\1", orig)
        if len(_java_split_space(cur)) < 3:
            cur = re.sub(r"[^:]*[:](.*)", r"\1", orig)
    elif len(cur) > 150 or len(cur) < 15:
        h_ones = [n for n in root.iter() if n.tag == "h1"]
        if len(h_ones) == 1:
            cur = _NORMALIZE_RE.sub(" ", _jtrim(h_ones[0].text_content()))

    cur = _jtrim(cur)
    if len(_java_split_space(cur)) <= 4:
        cur = orig
    return cur


def _readable_text(node: _RNode | None) -> str:
    """getResultText == HtmlHelper.documentToReadableText INCLUDING its
    cleanup regexes (HtmlHelper.java:361-377)."""
    if node is None:
        return ""
    result = document_to_readable_text(node)
    if not result:
        result = _text_content(node)
    result = _NORMALIZE_LINES.sub("", result)
    result = re.sub(r"\n{3,}", "\n\n", result)
    result = re.sub(r" {2,}", " ", result)
    return _jtrim(result)


def extract_readability(html: str | bytes) -> dict:
    """Full extractor: parse -> init -> result text + title."""
    root = parse_html(html)
    result = _init(root)
    return {
        "text": _readable_text(result),
        "title": get_article_title(root),
    }


# ---------------------------------------------------------- Spark stage

READABILITY_SCHEMA = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
])


def readability_stage(pages: DataFrame) -> DataFrame:
    """pages -> (url, title, text) via the Arc90 scorer. Document-local:
    one ArrowEvalPython over the scan, no shuffle; only (url, html)
    columns are read."""

    @F.pandas_udf(READABILITY_SCHEMA)
    def _udf(html: pd.Series) -> pd.DataFrame:
        titles, texts = [], []
        for h in html:
            r = extract_readability(h)
            titles.append(r["title"])
            texts.append(r["text"])
        return pd.DataFrame({"title": titles, "text": texts})

    r = _udf(F.col("html")).alias("r")
    return pages.select("url", r).select(
        "url", F.col("r.title").alias("title"),
        F.col("r.text").alias("text"))
