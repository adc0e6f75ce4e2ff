"""Page sources beyond the synthetic corpus: WARC and JSONL readers.

The north-star input is an Iceberg/parquet table of Common-Crawl-style
pages (url, warc_ts, html, text, lang). Real Common Crawl data arrives
as WARC files; this module is the ingest edge that turns them into the
input-table shape (the reference's DocumentRetriever counterpart —
/root/reference/palladian-retrieval/src/main/java/ws/palladian/retrieval/DocumentRetriever.java
fetches pages one-by-one; at corpus scale ingest is a distributed scan
of crawl archives instead).

Execution shape: `spark.read.format("binaryFile")` hands each WARC
file to one task (WARC files are the natural unit of parallelism —
Common Crawl ships ~1 GB segments, tens of thousands per crawl, far
more files than executors); record parsing is pure Python per
partition. Per-record gzip members (the Common-Crawl layout) and plain
concatenated-record files both decompress with the stdlib.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
])


def parse_warc_records(data: bytes):
    """Iterate (headers: dict, payload: bytes) over WARC/1.x records in
    a (possibly gzipped) buffer. Handles the Common-Crawl layout (each
    record its own gzip member — stdlib gzip reads concatenated
    members transparently) and uncompressed archives."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos = 0
    n = len(data)
    while pos < n:
        # skip record separators
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos:pos + 5] == b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].decode(
                "utf-8", errors="replace").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        payload = data[head_end + 4:head_end + 4 + length]
        yield headers, payload
        pos = head_end + 4 + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response head from a WARC response payload."""
    if payload[:5] == b"HTTP/":
        i = payload.find(b"\r\n\r\n")
        if i >= 0:
            return payload[i + 4:]
    return payload


def _warc_date(value: str):
    try:
        return datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ") \
            .replace(tzinfo=timezone.utc)
    except (ValueError, TypeError):
        return None


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archives → (url, warc_ts, html). One task per file via the
    binaryFile source; only `response` (and `resource`) records with a
    target URI are emitted."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def extract(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for headers, payload in parse_warc_records(bytes(content)):
                    if headers.get("warc-type") not in ("response",
                                                        "resource"):
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    rows.append({
                        "url": url,
                        "warc_ts": _warc_date(headers.get("warc-date")),
                        "html": _http_body(payload),
                    })
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.mapInPandas(extract, WARC_PAGE_SCHEMA)


def write_warc(pages: list[dict]) -> bytes:
    """Serialize (url, warc_ts, html) dicts as a WARC/1.0 byte stream —
    the test fixture generator (and a valid archive writer)."""
    out = io.BytesIO()
    for p in pages:
        ts = p.get("warc_ts")
        date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts
                else "2024-01-01T00:00:00Z")
        body = p["html"] if isinstance(p["html"], (bytes, bytearray)) \
            else str(p["html"]).encode("utf-8")
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Target-URI: {p['url']}\r\n"
                f"WARC-Date: {date}\r\n"
                f"Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
        out.write(head + http + b"\r\n\r\n")
    return out.getvalue()


def pages_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines crawl dumps → (url, warc_ts, html). Spark's native
    JSON source (distributed, schema projected at the scan)."""
    df = spark.read.schema(
        "url string, warc_ts timestamp, html string").json(path)
    return df.select("url", "warc_ts",
                     F.encode(F.col("html"), "UTF-8").alias("html"))


# ------------------------------------------------------ JSON / JPath
# The reference ships its own JSON DOM with an XPath-inspired "JPath"
# query syntax (palladian-retrieval/.../parser/json/JsonObject.java:
# 490-510, JsonUtil.splitJPath:300-320): '/key/sub[2]/name' digs into
# objects by key and arrays by [index]. Spark's JVM-side JSON path
# (`get_json_object`) covers the same reach, so the port is a pure
# plan-time translation — the hot path never leaves codegen.


def jpath_to_jsonpath(jpath: str) -> str:
    """JPath ('/a/b[2]/c', leading slashes optional) → Spark/SQL
    JSONPath ('$.a.b[2].c'). Pure string translation mirroring
    JsonUtil.splitJPath: segments split on '/', '[n]' suffixes kept
    as array indexing."""
    out = "$"
    for seg in jpath.strip("/").split("/"):
        if not seg:
            continue
        key, bracket = seg, ""
        if "[" in seg:
            key, bracket = seg[:seg.index("[")], seg[seg.index("["):]
        if key:
            out += "." + key
        out += bracket
    return out


def json_query(col, jpath: str):
    """Column: the value at `jpath` inside a JSON string column
    (string result, null on missing path — the tryQuery* behavior)."""
    return F.get_json_object(col, jpath_to_jsonpath(jpath))


# ------------------------------------------------- CSV dataset reader
def _java_double_ok(s: str) -> bool:
    """Double.parseDouble acceptance (whitespace-trimmed, Infinity/
    NaN, optional trailing d/D/f/F type suffix)."""
    t = s.strip()
    if t and t[-1] in "dDfF" and any(c.isdigit() for c in t[:-1]):
        t = t[:-1]
    try:
        float(t)
        return True
    except ValueError:
        return False


def detect_csv_types(first_row: list[str],
                     null_values: tuple[str, ...] = ("?",)
                     ) -> list[str]:
    """CsvDatasetReader's per-column auto-detection from the FIRST
    data line (CsvDatasetReader.java:45-52,172-186 with the default
    parser chain Boolean -> Double -> String,
    CsvDatasetReaderConfig.Builder.DEFAULT_PARSERS). A null cell
    ('?') detects as String — the reference only consults the parsers
    it can run."""
    types = []
    for cell in first_row:
        if cell in null_values:
            types.append("string")
        elif cell.lower() in ("true", "false"):
            types.append("boolean")
        elif _java_double_ok(cell):
            types.append("double")
        else:
            types.append("string")
    return types


def read_csv_dataset(spark: SparkSession, path: str, *,
                     field_separator: str = ";",
                     read_header: bool = True,
                     null_values: tuple[str, ...] = ("?",),
                     trim: bool = False,
                     skip_columns: tuple[str, ...] = (),
                     limit: int | None = None,
                     read_class_from_last_column: bool = True,
                     class_col: str = "category") -> DataFrame:
    """CsvDatasetReader port (CsvDatasetReader.java:53-240 +
    CsvDatasetReaderConfig defaults: ';' separator, header line,
    '?' -> null, class = LAST column, per-column types auto-detected
    from the first data line with the Boolean -> Double -> String
    parser chain, optional trim / column skip / row limit).

    Spark-first: ONE ``spark.read.csv`` scan (splittable, predicate/
    column pruning intact); only the one-line type probe touches the
    data driver-side. Unparseable cells in later rows become null
    (Spark cast) where the reference throws — documented deviation;
    quoting defaults OFF like the reference's NUL quoteCharacter.
    """
    df = (spark.read
          .option("header", str(read_header).lower())
          .option("sep", field_separator)
          .option("quote", "")
          .option("inferSchema", "false")
          .csv(path))
    if read_header is False:
        df = df.toDF(*[f"c{i}" for i in range(len(df.columns))])
    if limit is not None:
        df = df.limit(limit)

    cols = [c for c in df.columns if c not in set(skip_columns)]
    df = df.select(*cols)

    first = df.limit(1).collect()
    first_row = [("" if first[0][c] is None else str(first[0][c]))
                 for c in cols] if first else ["" for _ in cols]
    types = detect_csv_types(first_row, null_values)

    out = []
    for c, t in zip(cols, types):
        col = F.col(c)
        if trim:
            col = F.trim(col)
        isnull = col.isin(*null_values)
        col = F.when(~isnull, col)
        if t == "boolean":
            col = F.lower(col) == "true"
        elif t == "double":
            col = F.regexp_replace(
                F.trim(col), "([0-9.])[dDfF]$", "$1").cast("double")
        out.append(col.alias(c))
    df = df.select(*out)
    if read_class_from_last_column and cols:
        df = df.withColumnRenamed(cols[-1], class_col)
    return df


def write_csv_dataset(df: DataFrame, path: str, *,
                      field_separator: str = ";",
                      write_category: bool = True,
                      class_col: str = "category",
                      overwrite: bool = False) -> None:
    """CsvDatasetWriter port (core/dataset/csv/CsvDatasetWriter.java:
    33-67 + CsvDatasetWriterConfig defaults: ';' separator, category
    written, no overwrite): header = feature names + ``targetClass``,
    NullValue cells empty, values via Value.toString — Java's
    Double.toString comes for free from Spark's JVM-side
    cast(double AS string) (decimal/scientific switch included), so
    the sink is zero-Python end-to-end.

    Spark-first: a distributed ``df.write.csv`` (per-part files, each
    with the header — the directory round-trips through
    read_csv_dataset's splittable scan).  Deviation, documented: a
    string value CONTAINING the separator is appended raw by the
    reference (corrupting the line — GIGO); Spark's sink instead
    NUL-quotes it to protect line structure.  Clean values are
    byte-identical (pinned in tests/test_sources.py).
    """
    feats = [c for c in df.columns if c != class_col]
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c)
            for c in feats]
    if write_category:
        cols.append(F.coalesce(F.col(class_col).cast("string"),
                               F.lit("")).alias("targetClass"))
    (df.select(*cols).write
     .mode("overwrite" if overwrite else "error")
     .option("header", "true")
     .option("sep", field_separator)
     .option("quote", "")
     .option("emptyValue", "")
     .option("nullValue", "")
     .csv(path))
