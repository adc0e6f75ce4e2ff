"""WikipediaDatasetCreator port tests (WikipediaDatasetCreator.java:
65-262)."""

import math

import pytest

from kgp.wikidataset import (IGNORE_TAG, build_page_dictionary,
                             clean_person_name, clean_wiki_title,
                             get_infobox_type, get_links,
                             resolve_linked_entities, tag_clean_text,
                             uc_token_percentage,
                             wikipedia_ner_dataset)

B = "'''"


def test_get_links():
    m = ("See [[New York]] and [[Paris|the city]] and "
         "[[Berlin#History]] and [[Category:Cities]] and [[]].")
    assert get_links(m) == [("New York", None), ("Paris", "the city"),
                            ("Berlin", None), ("", None)]


def test_uc_token_percentage():
    assert uc_token_percentage("New York City") == 1.0
    assert uc_token_percentage("the Big Apple") == pytest.approx(2 / 3)
    assert math.isnan(uc_token_percentage("123 456"))
    # NaN < 0.5 is False -> such links are KEPT (:187)


def test_clean_helpers():
    assert clean_wiki_title("Paris (France)") == "Paris"
    assert clean_wiki_title("Paris, Texas") == "Paris"
    assert clean_person_name("Jasper Johns, Jr.") == "Jasper Johns"
    assert clean_person_name("William King (artist)") == "William King"


def test_get_infobox_type():
    m = "{{Infobox airport\n| name = X\n}}\ntext"
    assert get_infobox_type(m) == "airport"
    assert get_infobox_type("no box here") is None


def test_resolve_linked_entities_rules():
    corpus = {"Airport A": ("airport", ["Alpha Field"]),
              "Painter P": ("artist", []),
              "lowercase t": ("airport", [])}

    def resolve(d):
        return corpus.get(d)

    links = [("Airport A", None), ("Missing B", None),
             ("Airport A", "Dup skipped"), ("file:X.png", None),
             ("", None), ("lowercase t", None),
             ("Painter P", "The Painter")]
    m = resolve_linked_entities(links, resolve)
    assert m == {"Airport A": "LOC", "Alpha Field": "LOC",
                 "Missing B": IGNORE_TAG, "Painter P": "PER",
                 "The Painter": "PER"}


def test_variants_per_org_loc():
    def resolve(d):
        return {"John Fitzgerald Kennedy": ("artist", []),
                "Acme, Inc.": ("airline", []),
                "Paris, Texas": ("airport", [])}.get(d)

    links = [("John Fitzgerald Kennedy", None), ("Acme, Inc.", None),
             ("Paris, Texas", None)]
    m = build_page_dictionary("T", "[[John Fitzgerald Kennedy]] "
                              "[[Acme, Inc.]] [[Paris, Texas]]",
                              resolve)
    assert m["Kennedy"] == "PER"
    assert m["John Kennedy"] == "PER"          # 3-token middle drop
    assert m["Acme"] == "ORG"
    assert m["Paris"] == "LOC" and m["Texas"] == "LOC"
    assert "Paris, Texas" not in m             # LOC original removed
    assert m["Acme, Inc."] == "ORG"            # ORG original kept


def test_own_title_and_tagging():
    markup = ("{{Infobox airport\n| name = Big Apple Airport\n}}\n"
              f"{B}Big Apple Airport{B} is near [[New York]] and "
              "[[Nowhere]].")

    def resolve(d):
        return {"New York": ("settlement", [])}.get(d)

    m = build_page_dictionary("Big Apple Airport", markup, resolve)
    assert m["Big Apple Airport"] == "LOC"
    assert m["New York"] == "LOC"
    assert m["Nowhere"] == IGNORE_TAG
    tagged = tag_clean_text(
        "Big Apple Airport is near New York and Nowhere.", m)
    # *IGNORE* dropped from the OUTPUT but tagged surfaces survive
    assert tagged == ("<LOC>Big Apple Airport</LOC> is near "
                      "<LOC>New York</LOC> and Nowhere.")


def test_ignore_shadows_nested_real_match():
    # faithful :140-147 order — nested removal runs BEFORE the ignore
    # filter, so an *IGNORE* span swallows a real nested match
    m = {"New York City Hall": IGNORE_TAG, "New York": "LOC"}
    tagged = tag_clean_text("Visit New York City Hall today.", m)
    assert tagged == "Visit New York City Hall today."


def test_case_sensitive_tagging():
    m = {"Apple": "ORG"}
    assert tag_clean_text("Apple sells apple pie.", m) == \
        "<ORG>Apple</ORG> sells apple pie."


# ------------------------------------------------------- Spark stage
def _corpus_rows():
    rows = []
    for i in range(12):
        box = ["airport", "artist", "airline", "nosuchbox", None][i % 5]
        box_markup = f"{{{{Infobox {box}\n| name = x\n}}}}\n" if box \
            else ""
        dest1 = f"Page {(i + 1) % 12}"
        dest2 = f"Page {(i + 2) % 12}"
        markup = (box_markup
                  + f"{B}Alt {i}{B} is a page. See [[{dest1}]] and "
                  + f"[[{dest2}|Cap {i}]] and [[Ghost {i}]].")
        rows.append((i, f"Page {i}", markup))
    return rows


def test_stage_matches_local(spark):
    rows = _corpus_rows()
    by_title = {t: m for _, t, m in rows}

    def resolve(dest):
        m = by_title.get(dest)
        if m is None:
            return None
        from kgp.wikidataset import get_infobox_type as git
        from kgp.wikilocations import alternative_titles as alts
        return (git(m), alts(m))

    expected = {}
    for pid, title, markup in rows:
        expected[pid] = build_page_dictionary(title, markup, resolve)

    df = spark.createDataFrame(rows,
                               "page_id int, title string, "
                               "markup string")
    out = wikipedia_ner_dataset(df).collect()
    assert len(out) == 12
    for r in out:
        got = {d["surface"]: d["tag"] for d in r.dictionary}
        assert got == expected[r.page_id], r.page_id
        assert "<" in r.tagged_xml or r.tagged_xml  # tagged text built
