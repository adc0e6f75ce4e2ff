"""WikipediaDatasetCreator port — distant-supervision NER training
data mined from a wiki corpus.

Reference:
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/entity/dataset/WikipediaDatasetCreator.java:65-262
 — per article: collect internal links (WikiPage.getLinks:275-296,
   fragment-stripped, category: skipped), keep those whose
   caption-or-destination has >= 50% upper-case-initial tokens
   (getUcTokenPercentage:159-175; 0/0 -> NaN -> kept), RETRIEVE each
   linked article and map its infobox type through InfoboxTypeMapper
   to a CoNLL tag (resolveLinkedEntities:176-222 — unresolvable
   destinations become *IGNORE*; resolvable ones add destination,
   caption, and the linked page's bold alternative titles), add the
   article's OWN titles when its own infobox maps (:89-102), generate
   PER surname / first+last variants (cleanPersonName:149-153), ORG
   '[,] Inc.' strips and LOC comma splits (:104-131), then tag the
   clean text with a CASE-SENSITIVE DictionaryTagger and emit
   XML-tagged text with *IGNORE* annotations dropped AFTER nested
   removal (:140-147 — an ignored entity still shadows overlapping
   real matches, kept faithfully).

Spark-first re-expression: ``retrieveArticle`` (live MediaWiki HTTP +
an LruMap cache, :229-260) becomes a corpus SELF-JOIN — links join
the article table on the destination title (redirects resolved by one
more join hop; the reference loops until a non-redirect page and
would spin on redirect cycles, this port follows a bounded number of
hops, documented). Per-article parsing and the final dictionary-build
+ tagging are two Arrow batch passes; everything between them
(explode, UC filter result, first-occurrence-per-destination dedup,
the join itself, re-grouping) is pure JVM. At corpus scale the join
shuffles on the destination/title key; the per-page link lists and
alt-title arrays are page-sized.

Deviations (documented): the reference accumulates PER/ORG/LOC
variants in a java.util.HashMap whose iteration order is undefined
before merging (:104-135) — this port applies them in first-insertion
order, deterministic under any partitioning; redirect hops bounded.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.automaton import AhoCorasick
from kgp.conll import Ann, tag_text
from kgp.infobox_types import INFOBOX_CONLL
from kgp.mentions import remove_nested
from kgp.wiki import get_named_markup, get_redirect_title, strip_markup
from kgp.wikilocations import alternative_titles

IGNORE_TAG = "*IGNORE*"  # WikipediaDatasetCreator.java:71

_INTERNAL_LINK = re.compile(r"\[\[([^|\]]*)(?:\|([^|\]]*))?\]\]")
_INFOBOX_TYPE = re.compile(r"(?:infobox|geobox)[\s|]([^|<}]+)")
_PAREN = re.compile(r"\s\([^)]*\)")
_JR_SR = re.compile(r",?\s(Jr|Sr)\.")
_WS = re.compile(r"\s")


def get_links(markup: str) -> list[tuple[str, str | None]]:
    """WikiPage.getLinks (:275-296): (destination, caption) for every
    internal link, '#fragment' stripped, 'category:' skipped."""
    out = []
    for m in _INTERNAL_LINK.finditer(markup or ""):
        target = m.group(1)
        idx = target.find("#")
        if idx >= 0:
            target = target[:idx]
        if target.lower().startswith("category:"):
            continue
        out.append((target, m.group(2)))
    return out


def get_infobox_type(markup: str) -> str | None:
    """WikiPage.getInfoboxMarkup + getInfoboxType (:182-217): the
    first 'infobox' named template, matched lowercased against
    (?:infobox|geobox)[\\s|]([^|<}]+)."""
    try:
        boxes = get_named_markup(markup or "", "infobox")
    except Exception:
        return None
    if not boxes:
        return None
    m = _INFOBOX_TYPE.search(boxes[0].lower())
    return m.group(1).strip() if m else None


def clean_wiki_title(title: str) -> str:
    """WikiPageReference.getCleanTitle (:68-72): parenthesis suffix
    and everything after a comma removed."""
    clean = _PAREN.sub("", title)
    return re.sub(r",.*", "", clean)


def clean_person_name(title: str) -> str:
    """cleanPersonName (:149-153)."""
    title = _PAREN.sub("", title)
    return _JR_SR.sub("", title).strip()


def uc_token_percentage(s: str) -> float:
    """getUcTokenPercentage (:159-175): share of tokens starting
    upper-case; 0/0 is Java NaN (comparisons with .5 then keep)."""
    upper = lower = 0
    for part in _WS.split(s):
        if part:
            ch = part[0]
            if ch.isupper():
                upper += 1
            elif ch.islower():
                lower += 1
    if upper + lower == 0:
        return float("nan")
    return upper / (upper + lower)


def resolve_linked_entities(links, resolve) -> dict[str, str]:
    """resolveLinkedEntities (:176-222). ``resolve(dest)`` returns
    (infobox_type, alt_titles) for an existing article or None."""
    mapping: dict[str, str] = {}
    for dest, caption in links:
        if dest in mapping or dest == "" or dest.startswith("file"):
            continue
        title = caption if caption else dest
        if uc_token_percentage(title) < 0.5:
            continue
        article = resolve(dest)
        if article is None:
            mapping[dest] = IGNORE_TAG
            continue
        infobox_type, alt_titles = article
        if infobox_type is not None:
            mapped = INFOBOX_CONLL.get(infobox_type) or IGNORE_TAG
            mapping[dest] = mapped
            if caption:
                mapping[caption] = mapped
            for alt in alt_titles:
                if len(alt) > 1:
                    mapping[alt] = mapped
    return mapping


def _apply_variants(mapping: dict[str, str]) -> dict[str, str]:
    """process (:104-137): PER surname / first+last, ORG '[,] Inc.'
    strip, LOC comma split (original removed), empty key dropped.
    Applied in first-insertion order (the reference's HashMap order is
    undefined; documented deviation)."""
    additional: dict[str, str] = {}
    to_remove: set[str] = set()
    for t, ty in mapping.items():
        if ty == "PER":
            t2 = clean_person_name(t)
            additional[t2[t2.rfind(" ") + 1:]] = ty
            split = _WS.split(t2)
            if len(split) == 3:  # variant without middle name
                additional[split[0] + " " + split[2]] = ty
        if ty == "ORG":
            additional[re.sub(r",? Inc.", "", t)] = ty
        if ty == "LOC" and ", " in t:
            parts = t.split(", ")
            additional[parts[0]] = ty
            additional[parts[1]] = ty
            to_remove.add(t)
    mapping.update(additional)
    for t in to_remove:
        mapping.pop(t, None)
    mapping.pop("", None)
    return mapping


def _own_title_entries(mapping: dict[str, str], title: str,
                       infobox_type: str | None,
                       alt_titles: list[str]) -> None:
    """process (:89-102): the page's own titles when its own infobox
    maps."""
    if infobox_type:
        article_type = INFOBOX_CONLL.get(infobox_type)
        if article_type:
            for t in alt_titles:
                mapping[re.sub(r",$", "", t)] = article_type
            mapping[title] = article_type
            mapping[clean_wiki_title(title)] = article_type


def build_page_dictionary(title: str, markup: str,
                          resolve) -> dict[str, str]:
    """process (:83-137) up to the tagger: the page's entity
    dictionary (surface -> CoNLL tag, *IGNORE* kept)."""
    mapping = resolve_linked_entities(get_links(markup), resolve)
    _own_title_entries(mapping, title, get_infobox_type(markup),
                       alternative_titles(markup))
    return _apply_variants(mapping)


def tag_clean_text(clean_text: str, mapping: dict[str, str]) -> str:
    """process (:140-147): case-sensitive dictionary tagging, nested
    removal FIRST, then *IGNORE* annotations dropped, XML format."""
    automaton = AhoCorasick(mapping.items(), case_sensitive=True)
    found = [(s, e, tag) for s, e, tag in automaton.find_all(clean_text)]
    kept = remove_nested([(s, e) for s, e, _ in found])
    anns = [Ann(found[i][0], clean_text[found[i][0]:found[i][1]],
                found[i][2])
            for i in kept if found[i][2] != IGNORE_TAG]
    return tag_text(clean_text, anns, fmt="XML")


# ------------------------------------------------------------ Spark
_PARSE_SCHEMA = T.StructType([
    T.StructField("clean_text", T.StringType()),
    T.StructField("infobox_type", T.StringType()),
    T.StructField("alt_titles", T.ArrayType(T.StringType())),
    T.StructField("redirect", T.StringType()),
    T.StructField("links", T.ArrayType(T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("dest", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("uc_ok", T.BooleanType()),
    ]))),
])


@F.pandas_udf(_PARSE_SCHEMA)
def _parse_udf(markups: pd.Series) -> pd.DataFrame:
    rows = []
    for markup in markups:
        markup = markup or ""
        links = []
        for i, (dest, caption) in enumerate(get_links(markup)):
            probe = caption if caption else dest
            pct = uc_token_percentage(probe)
            links.append({"i": i, "dest": dest, "caption": caption,
                          "uc_ok": not pct < 0.5})
        rows.append({
            "clean_text": strip_markup(markup),
            "infobox_type": get_infobox_type(markup),
            "alt_titles": alternative_titles(markup),
            "redirect": get_redirect_title(markup),
            "links": links,
        })
    return pd.DataFrame(rows)


_TAG_SCHEMA = T.StructType([
    T.StructField("tagged_xml", T.StringType()),
    T.StructField("dictionary", T.ArrayType(T.StructType([
        T.StructField("surface", T.StringType()),
        T.StructField("tag", T.StringType()),
    ]))),
])


def wikipedia_ner_dataset(pages: DataFrame, *,
                          id_col: str = "page_id",
                          title_col: str = "title",
                          markup_col: str = "markup",
                          redirect_hops: int = 1) -> DataFrame:
    """(page_id, title, tagged_xml, dictionary) per article.

    Stage shape: Arrow parse pass -> JVM explode + first-per-dest
    dedup -> shuffle join on the destination title (redirects
    pre-resolved on the ARTICLE side by ``redirect_hops`` extra
    joins) -> JVM regroup ordered by link index -> Arrow
    dictionary+tagging pass.
    """
    parsed = pages.select(
        F.col(id_col).alias("page_id"), F.col(title_col).alias("title"),
        _parse_udf(F.col(markup_col)).alias("p"))
    parsed = parsed.select(
        "page_id", "title", "p.clean_text", "p.infobox_type",
        "p.alt_titles", "p.redirect", "p.links")

    # the resolvable-article view; redirects forward to their target's
    # content (retrieveArticleFollowRedirects:248-260, bounded hops)
    art = parsed.select(F.col("title").alias("a_title"),
                        F.col("infobox_type").alias("a_type"),
                        F.col("alt_titles").alias("a_alts"),
                        F.col("redirect").alias("a_redirect"))
    for _ in range(redirect_hops):
        nxt = art.select(F.col("a_title").alias("r_title"),
                         F.col("a_type").alias("r_type"),
                         F.col("a_alts").alias("r_alts"))
        art = (art.join(nxt, art.a_redirect == nxt.r_title, "left")
               .select("a_title",
                       F.when(F.col("a_redirect").isNotNull(),
                              F.col("r_type")).otherwise(
                           F.col("a_type")).alias("a_type"),
                       F.when(F.col("a_redirect").isNotNull(),
                              F.col("r_alts")).otherwise(
                           F.col("a_alts")).alias("a_alts"),
                       F.lit(None).cast("string").alias("a_redirect")))
    art = art.drop("a_redirect")

    links = (parsed.select("page_id", F.explode("links").alias("l"))
             .select("page_id", "l.i", "l.dest", "l.caption", "l.uc_ok")
             .where(F.col("uc_ok")))
    first = (links.groupBy("page_id", "dest")
             .agg(F.min("i").alias("i"),
                  F.min_by("caption", "i").alias("caption")))
    resolved = (first.join(art, first.dest == art.a_title, "left")
                .select("page_id", "i", "dest", "caption",
                        F.col("a_title").isNotNull().alias("exists"),
                        F.col("a_type").alias("linked_type"),
                        F.col("a_alts").alias("linked_alts")))
    regrouped = (resolved.groupBy("page_id")
                 .agg(F.array_sort(F.collect_list(F.struct(
                     "i", "dest", "caption", "exists",
                     "linked_type", "linked_alts"))).alias("rlinks")))

    joined = parsed.join(regrouped, "page_id", "left")

    @F.pandas_udf(_TAG_SCHEMA)
    def _tag_udf(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in batch.iterrows():
            rlinks = row["rlinks"] if row["rlinks"] is not None else []
            by_dest = {r["dest"]: r for r in rlinks}

            def resolve(dest):
                r = by_dest.get(dest)
                if r is None or not r["exists"]:
                    return None
                alts = list(r["linked_alts"] or [])
                return (r["linked_type"], alts)

            links = [(r["dest"], r["caption"]) for r in rlinks]
            mapping = resolve_linked_entities(links, resolve)
            _own_title_entries(mapping, row["title"],
                               row["infobox_type"],
                               list(row["alt_titles"] or []))
            mapping = _apply_variants(mapping)
            out.append({
                "tagged_xml": tag_clean_text(row["clean_text"],
                                             mapping),
                "dictionary": [{"surface": k, "tag": v}
                               for k, v in mapping.items()],
            })
        return pd.DataFrame(out)

    cols = F.struct("title", "clean_text", "infobox_type",
                    "alt_titles", "rlinks")
    result = joined.withColumn("_r", _tag_udf(cols))
    return result.select("page_id", "title",
                         F.col("_r.tagged_xml").alias("tagged_xml"),
                         F.col("_r.dictionary").alias("dictionary"))
