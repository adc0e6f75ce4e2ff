"""List & pagination discovery on web pages — ListDiscoverer (light).

Semantics re-derived from
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/ListDiscoverer.java:97-215:
pagination anchors are short numeric / single-uppercase / "next"
texts; their xpaths (sibling indices stripped for a/tr/td/p/span/li)
are counted, candidate paths are ranked by the Jaro-Winkler similarity
of their deduplicated hrefs (> 0.8), and single-link paths survive
only for "next"/"1" texts. The uniform-list detector keeps the same
index-stripped-xpath counting idea over li/td entry nodes.

Deviation noted: the reference averages href similarity over pairs in
HashSet iteration order (JVM-unstable); here pairs are consecutive in
sorted order, which is deterministic and measures the same
cluster-uniformity signal.

Pure Python over the shared DOM; runs inside extraction UDFs.
"""

from __future__ import annotations

from urllib.parse import urljoin

from kgp.html_text import (Node, _parent_index_map, construct_xpath,
                           xpath_nodes)
from kgp.strsim import jaro_winkler_similarity

_STRIP_INDEX_ELEMENTS = ("a", "tr", "td", "p", "span", "li")


def _strip_indices(xpath: str,
                   elements=_STRIP_INDEX_ELEMENTS) -> str:
    import re
    for el in elements:
        xpath = re.sub(el + r"\[\d+\]", el, xpath)
    return xpath


def _is_pagination_text(text: str) -> bool:
    t = text.strip().replace("[", "").replace("]", "")
    if not t:
        return False
    if len(t) <= 3 and t.isdigit():
        return True
    if len(t) == 1 and t.isupper():
        return True
    return "next" in t.lower() and len(t) < 8


def find_pagination_urls(root: Node, base_url: str = "") -> list[str]:
    """URLs of the page's pagination links, or [] when no credible
    pagination block exists."""
    pmap = _parent_index_map(root)
    counts: dict[str, int] = {}
    for n in root.iter():
        if n.tag == "a" and _is_pagination_text(n.text_content()):
            xp = _strip_indices(construct_xpath(n, pmap))
            if xp:
                counts[xp] = counts.get(xp, 0) + 1
    if not counts:
        return []

    by_similarity: dict[str, float] = {}
    for xp in counts:
        nodes = xpath_nodes(root, xp)
        hrefs = []
        same_page = 0
        for a in nodes:
            if a.tag != "a":
                continue
            href = str(a.attrs.get("href") or "").split("#")[0]
            if not href:
                same_page += 1
                continue
            hrefs.append(href)
        if nodes and same_page / len(nodes) > 0.5:
            return []  # anchor-only pagination — nothing to follow
        distinct = sorted(set(hrefs))
        if len(distinct) < 2:
            continue
        sims = [jaro_winkler_similarity(a, b)
                for a, b in zip(distinct, distinct[1:])]
        avg = sum(sims) / len(sims)
        if avg > 0.8:
            by_similarity[xp] = avg
    if by_similarity:
        best = max(by_similarity, key=by_similarity.get)
    else:
        best = max(counts, key=counts.get)
        if counts[best] == 1:
            text = " ".join(n.text_content()
                            for n in xpath_nodes(root, best)).strip()
            if "next" not in text.lower() and text != "1":
                return []
    out: list[str] = []
    seen: set[str] = set()
    for a in xpath_nodes(root, best):
        href = str(a.attrs.get("href") or "").split("#")[0]
        if href:
            full = urljoin(base_url, href)
            if full not in seen:
                seen.add(full)
                out.append(full)
    return out


def discover_list_entries(root: Node,
                          min_entries: int = 3) -> list[str]:
    """The page's dominant uniform list: the index-stripped xpath with
    the most li/td entry nodes carrying text; returns their texts in
    document order."""
    pmap = _parent_index_map(root)
    counts: dict[str, int] = {}
    for n in root.iter():
        if n.tag in ("li", "td") and n.text_content().strip():
            xp = _strip_indices(construct_xpath(n, pmap))
            if xp:
                counts[xp] = counts.get(xp, 0) + 1
    if not counts:
        return []
    best = max(counts, key=lambda k: counts[k])
    if counts[best] < min_entries:
        return []
    return [n.text_content().strip() for n in xpath_nodes(root, best)
            if n.text_content().strip()]
