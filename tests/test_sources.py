"""WARC / JSONL page sources: round-trip + extraction compatibility."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from kgp.sources import (pages_from_jsonl, pages_from_warc,
                         parse_warc_records, write_warc)


def _sample_pages():
    return [
        {"url": "https://a.example.com/1.html", "warc_ts": None,
         "html": b"<html><body><p>Alpha page body.</p></body></html>"},
        {"url": "https://b.example.com/2.html", "warc_ts": None,
         "html": "<html><body><p>café üml</p></body></html>"
                 .encode("utf-8")},
    ]


def test_warc_roundtrip_plain_and_gzip(tmp_path, spark):
    pages = _sample_pages()
    raw = write_warc(pages)
    (tmp_path / "w").mkdir()
    (tmp_path / "w" / "a.warc").write_bytes(raw)
    (tmp_path / "w" / "b.warc.gz").write_bytes(gzip.compress(raw))
    got = pages_from_warc(spark, str(tmp_path / "w")).collect()
    assert len(got) == 2 * len(pages)  # both files parsed
    by_url = {}
    for r in got:
        by_url.setdefault(r.url, []).append(bytes(r.html))
    for p in pages:
        assert by_url[p["url"]] == [p["html"], p["html"]]  # byte-exact


def test_warc_record_parser_skips_non_response():
    raw = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
           b"\r\ninfo\r\n\r\n") + write_warc(_sample_pages()[:1])
    records = list(parse_warc_records(raw))
    assert len(records) == 2
    assert records[0][0]["warc-type"] == "warcinfo"
    assert records[1][0]["warc-type"] == "response"
    assert records[1][1].startswith(b"HTTP/1.1 200 OK")


def test_warc_pages_feed_extraction(tmp_path, spark):
    from kgp.html_text import extract_stage
    pages = [{"url": "https://x.example.com/a.html", "warc_ts": None,
              "html": (b"<html lang=\"en\"><body><div>"
                       b"<h1>Title</h1><p>A first proper sentence "
                       b"lives here. And a second one too.</p>"
                       b"</div></body></html>")}]
    (tmp_path / "w2").mkdir()
    (tmp_path / "w2" / "c.warc").write_bytes(write_warc(pages))
    df = pages_from_warc(spark, str(tmp_path / "w2"))
    docs = extract_stage(df.withColumn("warc_ts", F.current_timestamp()))
    row = docs.first()
    assert "first proper sentence" in row.text


def test_pages_from_jsonl(tmp_path, spark):
    rows = [{"url": "https://j.example.com/1.html",
             "warc_ts": "2024-01-01T00:00:00Z",
             "html": "<p>json page</p>"}]
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    got = pages_from_jsonl(spark, str(p)).collect()
    assert got[0].url == rows[0]["url"]
    assert bytes(got[0].html) == b"<p>json page</p>"


def test_jpath_translation():
    from kgp.sources import jpath_to_jsonpath
    assert jpath_to_jsonpath("/a/b/c") == "$.a.b.c"
    assert jpath_to_jsonpath("a/b[2]/c") == "$.a.b[2].c"
    assert jpath_to_jsonpath("//a") == "$.a"
    assert jpath_to_jsonpath("[0]/name") == "$[0].name"


def test_json_query(spark):
    from kgp.sources import json_query
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [('{"meta":{"authors":[{"name":"Ada"},{"name":"Bob"}],'
          '"year":2020}}',)], "j string")
    got = df.select(
        json_query(F.col("j"), "/meta/authors[1]/name").alias("a"),
        json_query(F.col("j"), "meta/year").alias("y"),
        json_query(F.col("j"), "/meta/missing").alias("m")).collect()[0]
    assert (got.a, got.y, got.m) == ("Bob", "2020", None)


def test_csv_dataset_writer_line_format(tmp_path, spark):
    """CsvDatasetWriter.java:33-67: header + targetClass, empty cells
    for nulls, Java Double.toString values (decimal/scientific
    switch via the JVM cast)."""
    import glob
    from kgp.sources import write_csv_dataset
    df = spark.createDataFrame(
        [(1.5, True, "a", "pos"),
         (10000000.0, False, None, "neg"),
         (0.0001, None, "xy", "pos")],
        "f1 double, f2 boolean, f3 string, category string")
    out = str(tmp_path / "ds")
    write_csv_dataset(df.coalesce(1), out)
    files = sorted(glob.glob(out + "/part-*"))
    lines = open(files[0]).read().splitlines()
    assert lines[0] == "f1;f2;f3;targetClass"
    body = sorted(lines[1:])
    assert body == sorted([
        "1.5;true;a;pos",
        "1.0E7;false;;neg",       # Java scientific form >= 1e7
        "1.0E-4;;xy;pos",         # < 1e-3 scientific form
    ])


def test_csv_dataset_writer_roundtrip(tmp_path, spark):
    from kgp.sources import read_csv_dataset, write_csv_dataset
    df = spark.createDataFrame(
        [(1.5, True, "hello", "pos"), (2.0, False, "world", "neg"),
         (-3.25, True, "again", "pos")],
        "f1 double, f2 boolean, f3 string, category string")
    out = str(tmp_path / "ds")
    write_csv_dataset(df.repartition(3), out)
    back = read_csv_dataset(spark, out)
    assert dict(back.dtypes) == {"f1": "double", "f2": "boolean",
                                 "f3": "string", "category": "string"}
    assert (sorted(map(tuple, back.collect()))
            == sorted(map(tuple, df.collect())))


def test_csv_dataset_writer_no_category(tmp_path, spark):
    import glob
    from kgp.sources import write_csv_dataset
    df = spark.createDataFrame([(1.0, "pos")],
                               "f1 double, category string")
    out = str(tmp_path / "ds")
    write_csv_dataset(df.coalesce(1), out, write_category=False)
    files = sorted(glob.glob(out + "/part-*"))
    assert open(files[0]).read().splitlines() == ["f1", "1.0"]
