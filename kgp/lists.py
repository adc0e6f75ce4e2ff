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


def entries_uniform(entries: list[str],
                    table_duplicate_check: bool) -> bool:
    """ListDiscoverer.entriesUniform (ListDiscoverer.java:602-674),
    exact port: numeric/time-expression share > 0.15, completely-
    uppercase share > 0.5, average word count > 12, or (table mode)
    duplicate share > 0.1 / (non-table) duplicate-word ratio > 0.6
    each reject the list.  Entries longer than 200 chars count only
    toward the word-length average (the continue sits AFTER the
    length sum, as written)."""
    from kgp.mentions import is_completely_uppercase
    from kgp.tokenize import _clean_trim
    from kgp.wikpostag import is_numeric_expression

    total = len(entries)
    numeric = capitalized = total_words = 0
    dup_set: set[str] = set()
    dup_word_set: set[str] = set()
    dup_count = dup_word_count = 0
    for entry in entries:
        entry = _clean_trim(entry, keep="")
        total_words += len(entry.split(" "))
        if len(entry) > 200:
            continue
        if is_numeric_expression(entry) or _is_time_expression(entry):
            numeric += 1
        if is_completely_uppercase(entry):
            capitalized += 1
        if len(entry) == 0:
            pass
        elif entry in dup_set:
            dup_count += 1
            if entry not in dup_word_set:
                dup_word_set.add(entry)
                dup_word_count += 1
        else:
            dup_set.add(entry)
    if numeric / total > 0.15:
        return False
    if capitalized / total > 0.5:
        return False
    if total_words / total > 12:
        return False
    if table_duplicate_check and dup_count / total > 0.1:
        return False
    if not table_duplicate_check and dup_set \
            and dup_word_count / len(dup_set) > 0.6:
        return False
    return True


def _is_time_expression(s: str) -> bool:
    """StringHelper.isTimeExpression (StringHelper.java:809-811)."""
    import re as _re
    return bool(_re.fullmatch(r"(\d){1,2}:(\d){1,2}(\s)?(am|pm)", s))
