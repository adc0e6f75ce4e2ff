"""TUD-Loc-2013 reader (kgp.tudloc) — format goldens, Java hashCode
twin, coordinate join, and the JVM clean-text path."""

from __future__ import annotations

from kgp.tudloc import (java_string_hash, main_location_idx,
                        map_location_type, parse_tudloc_document,
                        read_tudloc2013, tudloc_documents)

DOC1 = ('Trip to <CITY role="main">Dresden</CITY> in '
        '<COUNTRY>Germany</COUNTRY>.')
DOC2 = "Hello <FOO>Bar</FOO> world"


def test_java_string_hash_goldens():
    # the classic published collision pair + known values
    assert java_string_hash("Aa") == 2112
    assert java_string_hash("BB") == 2112
    assert java_string_hash("a") == 97
    assert java_string_hash("abc") == 96354
    assert java_string_hash("") == 0
    # int32 wraparound stays in range
    h = java_string_hash("z" * 100)
    assert -(2 ** 31) <= h < 2 ** 31


def test_map_location_type():
    assert map_location_type("city") == "CITY"
    assert map_location_type("LANDMARK") == "LANDMARK"
    assert map_location_type("FOO") == "UNDETERMINED"
    assert map_location_type(None) == "UNDETERMINED"


def test_main_location_idx():
    assert main_location_idx(DOC1) == 0
    assert main_location_idx(
        '<CITY>A</CITY> <POI role="main">B</POI>') == 1
    assert main_location_idx(DOC2) == -1


def test_parse_document_golden():
    rows = parse_tudloc_document("doc1.text", DOC1)
    assert [(r["idx"], r["offset"], r["value"], r["loc_type"],
             r["is_main"]) for r in rows] == [
        (0, 8, "Dresden", "CITY", True),
        (1, 19, "Germany", "COUNTRY", False)]
    assert rows[0]["loc_id"] == java_string_hash("Dresden")
    assert [(r["loc_type"], r["is_main"]) for r in
            parse_tudloc_document("doc2.text", DOC2)] == [
        ("UNDETERMINED", False)]


def _write_dataset(tmp_path):
    (tmp_path / "doc1.text").write_text(DOC1)
    (tmp_path / "doc2.text").write_text(DOC2)
    (tmp_path / "coordinates.csv").write_text(
        "docId;idx;offset;latitude;longitude;sourceId\n"
        "doc1.text;0;8;51.05;13.74;1234\n"
        "doc1.text;1;19;;;5678\n")
    return str(tmp_path)


def test_read_tudloc2013(tmp_path, spark):
    out = {(r["file_name"], r["idx"]): r
           for r in read_tudloc2013(spark, _write_dataset(tmp_path))
           .collect()}
    dresden = out[("doc1.text", 0)]
    assert (dresden["value"], dresden["lat"], dresden["lon"],
            dresden["is_main"]) == ("Dresden", 51.05, 13.74, True)
    germany = out[("doc1.text", 1)]
    assert germany["lat"] is None and germany["lon"] is None
    assert out[("doc2.text", 0)]["loc_type"] == "UNDETERMINED"
    assert len(out) == 3


def test_tudloc_documents_clean_text(tmp_path, spark):
    docs = {r["file_name"]: r["clean_text"]
            for r in tudloc_documents(
                spark, _write_dataset(tmp_path)).collect()}
    assert docs["doc1.text"] == "Trip to Dresden in Germany."
    assert docs["doc2.text"] == "Hello Bar world"
