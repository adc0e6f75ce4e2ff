"""Wikipedia scope-dataset reader (kgp.wikiscope) — coordinate
selection goldens, null-scope retention, file-surface end-to-end."""

from __future__ import annotations

from kgp.wikiscope import (parse_scope_page, read_wikipedia_scope,
                           wikiscope_stage)

M_DMS = ("Dresden is a city.\n"
         "{{Coord|51|3|N|13|44|E|display=title}}\n"
         "More text here.")
M_INFOBOX = ("{{Infobox settlement\n| name = Paris\n"
             "| coordinates_display = inline,title\n"
             "| latd = 48.8566\n| longd = 2.3522\n}}\n"
             "Paris is the capital of [[France]].")
M_INLINE = ("Plain article with [[links]] and no coordinate. "
            "{{Coord|1|2|display=inline}}")


def test_parse_scope_page_goldens():
    r = parse_scope_page("a.mediawiki", M_DMS)
    assert r["clean_text"] == "Dresden is a city. More text here."
    assert r["lat"] == 51 + 3 / 60.0 and r["lon"] == 13 + 44 / 60.0
    r = parse_scope_page("b.mediawiki", M_INFOBOX)
    assert (r["lat"], r["lon"]) == (48.8566, 2.3522)
    assert r["clean_text"] == "Paris is the capital of France."
    # inline-only display -> null scope, document KEPT
    r = parse_scope_page("c.mediawiki", M_INLINE)
    assert r["lat"] is None and r["lon"] is None
    assert "links" in r["clean_text"]


def test_read_wikipedia_scope(tmp_path, spark):
    (tmp_path / "dresden.mediawiki").write_text(M_DMS)
    (tmp_path / "paris.mediawiki").write_text(M_INFOBOX)
    (tmp_path / "plain.mediawiki").write_text(M_INLINE)
    (tmp_path / "ignored.txt").write_text("not a wiki page")
    out = {r["file_name"]: r for r in
           read_wikipedia_scope(spark, str(tmp_path)).collect()}
    assert set(out) == {"dresden.mediawiki", "paris.mediawiki",
                        "plain.mediawiki"}
    assert out["dresden.mediawiki"]["lat"] == 51 + 3 / 60.0
    assert out["plain.mediawiki"]["lat"] is None
    assert out["paris.mediawiki"]["clean_text"] == \
        "Paris is the capital of France."


def test_stage_matches_twin(spark):
    rows = [("x", M_DMS), ("y", M_INFOBOX), ("z", M_INLINE)]
    df = spark.createDataFrame(rows, "file_name string, markup string")
    got = sorted(map(tuple, wikiscope_stage(df).collect()))
    want = sorted(tuple(parse_scope_page(n, m).values())
                  for n, m in rows)
    assert got == want
