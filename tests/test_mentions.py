"""NER stage: StringTagger parity, fix-up passes, corpus golden mentions.

Span expectations re-derived from the reference's unit tests
(/root/reference/palladian-core/src/test/java/ws/palladian/extraction/entity/StringTaggerTest.java:14-80,
 .../tagger/PalladianNerTest.java:19-51).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgp import constants as C
from kgp.corpus import seed_dictionary, synth_pages
from kgp.html_text import extract_stage
from kgp.mentions import (candidate_annotations, detect_mentions,
                          is_date_fragment, remove_date_fragment,
                          remove_nested, train_ner_model)


def values(text):
    return [c.value for c in candidate_annotations(text)]


# ------------------------------------------- StringTagger parity cases


def test_tagger_abbreviations():
    text = ("the United States of America (USA) are often called the USA, "
            "the U.S.A., or simply the U.S., the U.S.S. Enterprise is a "
            "space ship.")
    assert values(text) == ["United States of America", "USA", "USA",
                            "U.S.A.", "U.S.", "U.S.S. Enterprise"]


def test_tagger_llc():
    text = ("The outfit that stages the festival, Black Rock City LLC, is "
            "now a $23 million-per-year concern with 40 full-time "
            "employees, hundreds of volunteers, and a non-profit arts "
            "foundation that doles out grants.")
    got = values(text)
    assert len(got) == 2
    assert got[1] == "Black Rock City LLC"


def test_tagger_names():
    text = ("Mr. Yakomoto, John J. Smith, and Bill Drody cooperate with "
            "T. Shéff, L.Carding, T.O'Brian, Harry O'Sullivan and O'Brody.")
    got = values(text)
    for want in ["Mr. Yakomoto", "John J. Smith", "Bill Drody", "T. Shéff",
                 "L.Carding", "T.O'Brian", "Harry O'Sullivan", "O'Brody"]:
        assert want in got, (want, got)


def test_tagger_long_names():
    got = values("Mayor Bobby E. Horton called the Special Council Meeting "
                 "of the West Columbia Council to order on Monday.")
    assert got[0] == "Mayor Bobby E. Horton"


def test_tagger_composites():
    assert values("Dolce & Gabana as well as S&P are companies.") == [
        "Dolce & Gabana", "S&P"]


def test_tagger_corpus_sentence():
    got = values("John Smith, the chief executive officer of Acme Corp, "
                 "spoke in Springfield on Monday.")
    assert got == ["John Smith", "Acme Corp", "Springfield", "Monday"]


def test_tagger_offsets():
    anns = candidate_annotations("met Acme Corp today")
    assert anns[0].start == 4
    assert anns[0].value == "Acme Corp"


# ------------------------------------------------------ fix-up passes


def test_date_fragments():
    assert is_date_fragment("Monday")
    assert is_date_fragment("June")
    assert not is_date_fragment("John Smith")
    assert remove_date_fragment(0, "June John Hiatt") == (5, "John Hiatt")
    assert remove_date_fragment(10, "John Hiatt") is None


def test_remove_nested():
    # (start, end): second is nested in first; third overlaps -> kept
    spans = [(0, 10), (2, 6), (8, 14)]
    assert remove_nested(spans) == [0, 2]


# --------------------------------------------------- corpus golden NER


@pytest.fixture(scope="module")
def mention_rows(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    docs = extract_stage(pages).cache()
    model = train_ner_model(spark, docs, seed_dictionary(spark))
    bc = spark.sparkContext.broadcast(model)
    rows = detect_mentions(docs, bc).collect()
    docs.unpersist()
    return rows


def golden_mentions(doc_id: int) -> set[tuple[str, str]]:
    per = C.PERSONS[doc_id % 17]
    per2 = C.PERSONS[(doc_id + 5) % 17]
    org = C.ORGS[doc_id % 13]
    city = C.CITIES[doc_id % 11]
    city2 = C.CITIES[(doc_id + 3) % 11]
    country = C.COUNTRIES[doc_id % 7]
    alias = (doc_id % 9 == 5) and (doc_id % 13 < 3)
    out = {(per, "PER"), (org, "ORG"), (city, "CITY"), (city2, "CITY")}
    if alias:
        out.add((C.ORG_ALIASES[doc_id % 13], "ORG"))
    if doc_id % 3 == 0:
        out.add((country, "COUNTRY"))
    if doc_id % 4 == 1:
        out.add((per2, "PER"))
        # S5 puts org at sentence end; the StringTagger suffix rule
        # (StringTagger.java:76) keeps the trailing dot after
        # Inc/Corp/Co/Ave, so such orgs yield an extra dotted surface
        if org.endswith(("Inc", "Corp", "Co", "Ave")):
            out.add((org + ".", "ORG"))
    return out


def test_corpus_mentions_match_golden(mention_rows):
    got: dict[int, set] = {}
    for r in mention_rows:
        doc_id = int(r.url.rsplit("/", 1)[1].split(".")[0])
        got.setdefault(doc_id, set()).add((r.surface, r.tag))
    assert len(got) == 500
    mismatches = []
    for doc_id in range(500):
        want = golden_mentions(doc_id)
        have = got.get(doc_id, set())
        if want != have:
            mismatches.append((doc_id, want - have, have - want))
    assert not mismatches, mismatches[:5]


def test_mention_offsets_slice_text(spark, sf_dir, mention_rows):
    texts = {r.url: r.text for r in
             extract_stage(synth_pages(spark, sf_dir))
             .select("url", "text").collect()}
    for r in mention_rows[:200]:
        assert texts[r.url][r.start:r.end] == r.surface
