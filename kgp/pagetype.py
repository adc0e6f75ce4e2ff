"""Rule-based page-type classification — port of the reference's
crawl-curation classifier (palladian-core classification/webpage/
RuleBasedPageClassifier.java + ContentTypeClassifier.java): label every
crawled page CONTENT / OVERVIEW / SEARCH_RESULTS / SPAM before the
extraction pipeline spends work on it.

Feature extraction (RuleBasedPageClassifier.java:59-159):
  * page title = first <title> (PageAnalyzer.extractTitle:1263-1273);
  * headline texts of h1..h6 (all levels, document order per level);
  * <a> links split ingoing/outgoing: ingoing when the link's
    scheme://host equals the page's, or the href is relative
    (doesn't start with "http");
  * images with declared dimensions (size = |w|*|h|,
    BasicWebImage.getSize:150-152 — undeclared dims give size 1);
  * sentences = the real sentences of the CLEANED-dom text (the
    content extractor's sentence list, PalladianContentExtractor
    .java:243), joined with trailing spaces for the sentence string;
  * highest number of consecutive sentences: walk the sentence list
    against the cleaned text with control chars (<33, incl. newlines)
    replaced by spaces (StringHelper.removeControlCharacters:1039),
    counting runs whose found position is within +-2 of the predicted
    `pos + len + 1` (RuleBasedPageClassifier.java:163-193);
  * pagination URLs via the ListDiscoverer port (kgp.lists).

Rule cascade (ContentTypeClassifier.java:34-99, in order): title
contains "suche" or a headline carries a search trigger ->
SEARCH_RESULTS; >=4 consecutive sentences -> CONTENT; >=7 read-more
link titles or >=10 images larger than 10000 or >3 pagination links
-> OVERVIEW; short/garbled/syndicated text -> SPAM; else CONTENT.

Scale shape: one mapInPandas pass per page (all features are
per-document; the DOM parse dominates and is already paid by the
extraction stage at the same scan).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T

from kgp.html_text import clean_dom_reference, document_to_text, parse_html
from kgp.lists import find_pagination_urls
from kgp.tokenize import get_sentences

SEARCH_TRIGGERS = ("suchergebnis", "suchergebnisse", "search result",
                   "search results")
READ_MORE = ("mehr", "weiterlesen", "artikel lesen", "[...]")
SPAM_MARKERS = ("read the rest here:", "read the original post:",
                "continued here:", "see the rest here:")

_DOMAIN_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)")


def _domain(url: str) -> str:
    """scheme://host, lowercased — UrlHelper.getDomain(url) shape
    ('' for relative/malformed URLs)."""
    m = _DOMAIN_RE.match(url or "")
    return f"{m.group(1).lower()}://{m.group(2).lower()}" if m else ""


def _remove_control_characters(s: str) -> str:
    """StringHelper.removeControlCharacters port: \\u2028 and &#10 to
    newline first, then every char < 33 becomes a space."""
    s = s.replace("\u2028", "\n").replace("&#10", "\n")
    return "".join(" " if ord(c) < 33 else c for c in s)


def consecutive_sentences(sentences: list[str], text: str) -> int:
    """Longest run of sentences found back-to-back in the text
    (RuleBasedPageClassifier.java:163-193): a run continues while each
    sentence is found within +-2 of the previous end + 1."""
    text = _remove_control_characters(text)
    highest = run = 0
    predicted = -1
    for s in sentences:
        pos = text.find(s)
        if predicted == -1 or abs(pos - predicted) <= 2:
            run += 1
            predicted = pos + len(s) + 1
        else:
            highest = max(highest, run)
            run = 0
            predicted = -1
    return max(highest, run)


def page_features(html: str | bytes, url: str = "",
                  language: str = "en") -> dict:
    """The RuleBasedPageClassifier feature vector for one page."""
    root = parse_html(html)
    title = ""
    headlines: list[str] = []
    links: list[tuple[str, str]] = []
    images: list[int] = []
    for level in ("h1", "h2", "h3", "h4", "h5", "h6"):
        for n in root.iter():
            if n.tag == level:
                headlines.append(n.text_content())
    for n in root.iter():
        if n.tag == "title" and not title:
            title = n.text_content()
        elif n.tag == "a":
            links.append((n.text_content(),
                          str(n.attrs.get("href") or "")))
        elif n.tag == "img":
            def dim(v):
                try:
                    return int(str(v).rstrip("px"))
                except (TypeError, ValueError):
                    return -1
            images.append(abs(dim(n.attrs.get("width")))
                          * abs(dim(n.attrs.get("height"))))
    pagination = find_pagination_urls(root, url)

    page_domain = _domain(url)
    ingoing, outgoing = [], []
    for text, href in links:
        if _domain(href).lower() == page_domain.lower() \
                or not href.startswith("http"):
            ingoing.append(text)
        else:
            outgoing.append(text)

    clean_dom_reference(root)
    content = document_to_text(root)
    sentences = [t.value for t in
                 get_sentences(content, only_real=True,
                               language=language)]
    return {
        "title": title,
        "headlines": headlines,
        "ingoing": ingoing,
        "outgoing": outgoing,
        "image_sizes": images,
        "pagination_count": len(pagination),
        "sentences": sentences,
        "sentences_string": "".join(s + " " for s in sentences),
        "consecutive": consecutive_sentences(sentences, content),
    }


def _headline_search_trigger(headlines: list[str]) -> bool:
    for headline in headlines:
        h = headline.lower()
        for trigger in SEARCH_TRIGGERS:
            if h == trigger or (trigger + " ") in h or \
                    (trigger + ":") in h:
                return True
    return False


def classify_content_type(feat: dict) -> str:
    """ContentTypeClassifier.classify rule cascade, verbatim order."""
    if "suche" in feat["title"].lower() \
            or _headline_search_trigger(feat["headlines"]):
        return "SEARCH_RESULTS"
    if feat["consecutive"] >= 4:
        return "CONTENT"
    more = 0
    for link_title in feat["ingoing"] + feat["outgoing"]:
        lt = link_title.lower()
        for word in READ_MORE:
            if word in lt:
                more += 1
            if more >= 7:
                return "OVERVIEW"
    big = 0
    for size in feat["image_sizes"]:
        if size > 10000:
            big += 1
        if big >= 10:
            return "OVERVIEW"
    if feat["pagination_count"] > 3:
        return "OVERVIEW"
    s = feat["sentences_string"].lower()
    if feat["consecutive"] < 4 or len(feat["sentences_string"]) < 1000 \
            or any(m in s for m in SPAM_MARKERS):
        return "SPAM"
    return "CONTENT"


def content_type_stage(pages: DataFrame, html_col: str = "html",
                       url_col: str = "url",
                       language: str = "en") -> DataFrame:
    """pages -> (url, content_type, consecutive_sentences): one Arrow
    pass, zero shuffle."""
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("consecutive_sentences", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types, consec = [], []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                feat = page_features(html or b"", url or "", language)
                types.append(classify_content_type(feat))
                consec.append(feat["consecutive"])
            yield pd.DataFrame({"url": pdf[url_col],
                                "content_type": types,
                                "consecutive_sentences": consec})

    return pages.select(url_col, html_col).mapInPandas(run, schema)


# ------------------------------------------- PageTypeClassifier
# BLOG / FORUM / GENERIC from page metadata
# (PageTypeClassifier.java:30-67): the "generator" meta tag (wordpress/
# blogger -> BLOG, vbulletin/phpbb -> FORUM), a phpbb "copyright" meta,
# a phpbb-titled <link rel>, or "google groups" in the title.

def extract_meta_tags(root) -> dict[str, str]:
    """name -> content of every <meta> with both attributes, names
    lowercased (PageAnalyzer.extractMetaInformation:1330-1346)."""
    tags: dict[str, str] = {}
    for n in root.iter():
        if n.tag == "meta" and n.attrs.get("name") is not None \
                and n.attrs.get("content") is not None:
            tags[str(n.attrs["name"]).lower()] = str(n.attrs["content"])
    return tags


def classify_page_type(html: str | bytes) -> str:
    """PageTypeClassifier.classify rule order, verbatim."""
    root = parse_html(html)
    meta = extract_meta_tags(root)
    generator = meta.get("generator")
    if generator is not None:
        g = generator.lower()
        if "wordpress" in g or "blogger" in g:
            return "BLOG"
        if "vbulletin" in g or "phpbb" in g:
            return "FORUM"
    if "phpbb" in (meta.get("copyright") or "").lower():
        return "FORUM"
    for n in root.iter():
        if n.tag == "link" and n.attrs.get("rel") is not None \
                and "phpbb" in str(n.attrs.get("title") or "").lower():
            return "FORUM"
    title = ""
    for n in root.iter():
        if n.tag == "title":
            title = n.text_content()
            break
    if "google groups" in title.lower():
        return "FORUM"
    return "GENERIC"


def page_type_stage(pages: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """pages -> (url, page_type): one Arrow pass, zero shuffle."""
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("page_type", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf[url_col],
                "page_type": [classify_page_type(h or b"")
                              for h in pdf[html_col]]})

    return pages.select(url_col, html_col).mapInPandas(run, schema)
