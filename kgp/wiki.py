"""MediaWiki infobox / template extraction → KG triples.

Semantics re-derived from
/root/reference/palladian-core/src/main/java/ws/palladian/retrieval/wiki/MediaWikiUtil.java:430-512,624-655
(brace-balanced named-template scan, top-level | splitting with
bracket balance, key=value with bracket/tag-balanced keys, positional
parameter numbering) and WikiPage.java:223-260 (infobox = templates
named infobox/geobox; categories; redirects). Infoboxes are the
highest-precision triple source a web KG pipeline has — every
(page, key, value) row is an assertion — so this feeds the relation
stage next to the sentence pattern bank.

Pure Python parsing; `wiki_infobox_triples` is the Spark stage (one
Arrow pass, document-local → zero shuffles).
"""

from __future__ import annotations

import re
from typing import NamedTuple

import pandas as pd

_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_OPEN_TAG = re.compile(r"<\w+[^>/]*>")
_CLOSE_TAG = re.compile(r"</\w+[^>]*>")
_CATEGORY = re.compile(
    r"\[\[(?:Category|Kategorie):([^|\]]*)(?:\|[^|\]]*)?\]\]")
_REDIRECT = re.compile(r"#REDIRECT\s*\[\[([^\]|]+)", re.IGNORECASE)


class WikiTemplate(NamedTuple):
    name: str | None
    entries: dict[str, str]


def _count(s: str, sub: str) -> int:
    return s.count(sub)


def _bracket_balanced(markup: str) -> bool:
    """MediaWikiUtil.isBracketBalanced (:490-505): {{/}}, [/], </>
    counts must match."""
    return (_count(markup, "{{") == _count(markup, "}}")
            and _count(markup, "[") == _count(markup, "]")
            and _count(markup, "<") == _count(markup, ">"))


def _tag_balanced(markup: str) -> bool:
    return len(_OPEN_TAG.findall(markup)) == \
        len(_CLOSE_TAG.findall(markup))


def get_named_markup(markup: str, *names: str) -> list[str]:
    """Brace-balanced {{name ...}} spans (getNamedMarkup, :624-655);
    HTML comments are stripped first."""
    clean = _COMMENT.sub("", markup)
    pattern = re.compile(
        r"\{\{(?:" + "|".join(re.escape(n) for n in names)
        + r")(?:\s|\|)", re.IGNORECASE)
    out: list[str] = []
    for m in pattern.finditer(clean):
        start = m.start()
        brackets = 0
        end = start
        while end < len(clean):
            ch = clean[end]
            if ch == "{":
                brackets += 1
            elif ch == "}":
                brackets -= 1
            if brackets == 0:
                break
            end += 1
        if end < len(clean):
            out.append(clean[start:end + 1])
    return out


def _template_name(content: str) -> str | None:
    """Template display name (getTemplateName + WikiTemplate.getName,
    WikiTemplate.java:43-48: the infobox/geobox prefix is stripped)."""
    m = re.search(r"(?:geobox\|)?[^|<}]+", content.lower())
    if not m:
        return None
    return re.sub(r"^(?:infobox\s+|geobox\|)", "",
                  m.group().strip()).lower()


def _split_template(content: str) -> list[str]:
    """Top-level | splitting (splitTemplateMarkup, :469-482): a | only
    separates when everything before it is bracket-balanced."""
    out: list[str] = []
    start = content.find("|") + 1
    idx = start
    while idx < len(content):
        if content[idx] == "|" and _bracket_balanced(content[:idx]):
            out.append(content[start:idx])
            start = idx + 1
        idx += 1
    out.append(content[start:])
    return out


def extract_template(markup: str) -> WikiTemplate:
    """extractTemplate port (:430-460): named parameters keep their
    key when it is bracket/tag balanced, positional parameters are
    numbered from 0."""
    content = markup[2:-2]
    name = _template_name(content)
    if markup.lower().startswith("{{geobox"):
        content = markup[markup.index("|") + 1:-2]
    entries: dict[str, str] = {}
    i = 0
    for part in _split_template(content):
        key = str(i)
        i += 1
        eq = part.find("=")
        if eq > 0:
            potential = part[:eq]
            if _bracket_balanced(potential) and _tag_balanced(potential):
                key = potential.strip()
            else:
                eq = -1
        entries[key] = part[eq + 1:].strip()
    return WikiTemplate(name, entries)


def get_infoboxes(markup: str) -> list[WikiTemplate]:
    """WikiPage.getInfoboxes port (:223-245)."""
    return [extract_template(m)
            for m in get_named_markup(markup, "infobox", "geobox")]


def get_categories(markup: str) -> list[str]:
    return [m.group(1).strip() for m in _CATEGORY.finditer(markup)]


_HEADING = re.compile(r"^={1,6}\s*([^=]*)\s*={1,6}", re.MULTILINE)


def get_sections(markup: str) -> list[str]:
    """WikiPage.getSections port (WikiPage.java:72-83): the page split
    at every heading (each section starts with its heading)."""
    out: list[str] = []
    start = 0
    for m in _HEADING.finditer(markup):
        out.append(markup[start:m.start()])
        start = m.start()
    out.append(markup[start:])
    return out


def get_redirect_title(markup: str) -> str | None:
    m = _REDIRECT.search(markup)
    return m.group(1).strip() if m else None


_LINK = re.compile(r"\[\[(?:[^|\]]*\|)?([^|\]]*)\]\]")
_QUOTES = re.compile(r"'''''|'''|''")
_REF = re.compile(r"<ref[^>]*>.*?</ref>|<ref[^>]*/>", re.DOTALL)
_TEMPLATE = re.compile(r"\{\{[^{}]*\}\}")


def clean_value(value: str) -> str:
    """Light value cleanup for triple objects: refs and nested
    templates dropped, [[A|B]] → B, quote markup removed."""
    v = _REF.sub("", value)
    for _ in range(4):
        v2 = _TEMPLATE.sub("", v)
        if v2 == v:
            break
        v = v2
    v = _LINK.sub(r"\1", v)
    v = _QUOTES.sub("", v)
    return " ".join(v.split())


def infobox_triples(title: str, markup: str) -> list[tuple[str, str, str]]:
    """(page title, infobox key, cleaned value) triples from every
    infobox — positional and empty values skipped."""
    out = []
    for box in get_infoboxes(markup):
        for key, raw in box.entries.items():
            if key.isdigit():
                continue
            value = clean_value(raw)
            if value:
                out.append((title, key, value))
    return out


def wiki_infobox_triples(pages, title_col: str = "title",
                         markup_col: str = "wikitext"):
    """Spark stage: (title, wikitext) → exploded (subj, pred, obj)
    rows. Document-local Arrow pass, no shuffle."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.ArrayType(T.StructType([
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
    ]))

    @F.pandas_udf(schema)
    def tri(titles: pd.Series, markups: pd.Series) -> pd.Series:
        return pd.Series([
            [{"subj": s, "pred": p, "obj": o}
             for s, p, o in infobox_triples(t or "", m or "")]
            for t, m in zip(titles, markups)])

    return (pages
            .select(F.explode(tri(F.col(title_col),
                                  F.col(markup_col))).alias("t"))
            .select("t.subj", "t.pred", "t.obj"))


# -------------------------------------------------- full markup strip

_REF_STRIP = re.compile(r"<ref(?:\s[^>]*)?>[^<]*</ref>|<ref[^/>]*/>",
                        re.MULTILINE)
_GALLERY = re.compile(r"<gallery(?:\s[^>]*)?>[^<]*</gallery>")
_STRIP_ALL_TAGS = re.compile(
    r"<!--.*?-->|<script.*?>.*?</script>|<style.*?>.*?</style>|<[^<]*?>",
    re.DOTALL | re.IGNORECASE)
_QUOTES_MARKUP = re.compile(r"'''''|'''|''")
_CONVERT = re.compile(r"\{\{convert\|([\d.]+)\|([\w°]+)(\|[^}]*)?\}\}")
_LANG_TPL = re.compile(r"\{\{(?:lang\|[^|]*|lang-\w{2})\|([^|]*)\}\}")
_INTERNAL_LINK = re.compile(r"\[\[([^|\]]*)(?:\|([^|\]]*))?\]\]")
_EXTERNAL_LINK = re.compile(r"\[http([^\s]+)(?:\s([^\]]+))\]")
_LEFTOVER_LINK = re.compile(r"\[\[[^]]*\]\]")
_SINGLE_BREAK = re.compile(r"(?<!\n)\n(?![*\n])")
_MULTI_WS = re.compile(r"[ ]{2,}")
_MULTI_NL = re.compile(r"\n{2,}")


def _process_links(string: str, pattern: "re.Pattern") -> str:
    """processLinks port (:149-164): keep the label (or target);
    category links vanish entirely."""
    def repl(m):
        target, text = m.group(1), m.group(2)
        if target.lower().startswith("category:"):
            return ""
        return text if text is not None else target
    return pattern.sub(repl, string)


def _remove_between(string: str, b1: str, b2: str,
                    e1: str, e2: str) -> str:
    """removeBetween port (:177-207): drop text between doubled
    opening/closing characters ({{..}}, {|..|}) with a space
    placeholder, nested-aware via a character stack."""
    if len(string) < 2:
        return string
    stack: list[str] = [string[0]]
    idx = 1
    while idx < len(string):
        prev, cur = string[idx - 1], string[idx]
        if cur == e2 and prev == e1:
            while len(stack) > 1:
                if stack.pop() == b2 and stack and stack[-1] == b1:
                    stack.pop()
                    if idx < len(string) - 1 and string[idx + 1] == e1:
                        idx += 1
                    break
            stack.append(" ")
        else:
            stack.append(cur)
        idx += 1
    return "".join(stack)


def strip_markup(markup: str) -> str:
    """stripMediaWikiMarkup port (MediaWikiUtil.java:87-137): refs and
    galleries dropped, entities resolved, HTML tags stripped, headings
    flattened, quote markup and convert/lang templates replaced, links
    reduced to their labels, leftover template/table blocks removed,
    single line breaks joined (lists kept), whitespace normalized."""
    import html as _html
    r = _REF_STRIP.sub("", markup)
    r = _GALLERY.sub("", r)
    r = _html.unescape(r)
    r = _STRIP_ALL_TAGS.sub("", r)
    r = _HEADING.sub(r"\1\n", r)
    r = _QUOTES_MARKUP.sub("", r)
    r = _CONVERT.sub(r"\1 \2", r)
    r = _LANG_TPL.sub(r"\1", r)
    r = _process_links(r, _INTERNAL_LINK)
    r = _process_links(r, _EXTERNAL_LINK)
    r = _remove_between(r, "{", "{", "}", "}")
    r = _remove_between(r, "{", "|", "|", "}")
    r = _LEFTOVER_LINK.sub("", r)
    r = _SINGLE_BREAK.sub(" ", r)
    r = _MULTI_WS.sub(" ", r)
    r = _MULTI_NL.sub("\n\n", r)
    return r.strip()
