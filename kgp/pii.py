"""PII scrubbing — the redaction pass a web-scale training pipeline
runs between quality filtering (kgp.curation) and packing
(kgp.packing): emails, IPv4 addresses and phone numbers are replaced
with stable placeholder tokens and counted per document (the counts
feed corpus-level PII-rate telemetry and per-domain drop rules).

The three pattern classes follow the public BigScience / FineWeb PII
pipelines (email + IP + phone as the high-precision core); patterns
deliberately avoid lookarounds so the SAME regex runs identically
under Java's engine (Spark), RE2 (DuckDB oracle) and Python `re`
(tests).

Scale notes:
- Pure JVM column expressions (`regexp_replace` / `regexp_extract_all`
  inside whole-stage codegen) — zero Python, zero shuffle; the pass
  pipelines with any other per-document stage over the same scan.
- Replacement order is emails → IPs → phones: inserted placeholder
  tokens contain no digits or '@', so later passes can never match
  inside an earlier replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# local-part @ domain . tld — the conservative high-precision shape
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"

# dotted quad with word boundaries; octet ranges are NOT validated
# (matching 999.1.1.1 beats the regex-size cost at corpus scale, and
# any engine disagreement would show up in the oracle hash)
IPV4_RE = r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b"

# optional +CC, optional (area), then 2-4 digit groups separated by
# space/dot/dash — at least three groups so bare years/ids don't match
PHONE_RE = (r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]\d{2,4}[-. ]\d{2,4}"
            r"(?:[-. ]\d{2,4})?")

EMAIL_TOKEN = "<EMAIL_ADDRESS>"
IP_TOKEN = "<IP_ADDRESS>"
PHONE_TOKEN = "<PHONE_NUMBER>"


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """docs -> (id, clean_text, n_emails, n_ips, n_phones).

    Counts are taken on the ORIGINAL text, then the three replacement
    passes run in the documented order. One projection over the scan —
    whole-stage codegen, no Python, no shuffle."""
    c = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN),
            IPV4_RE, IP_TOKEN),
        PHONE_RE, PHONE_TOKEN)
    return docs.select(
        id_col,
        scrubbed.alias("clean_text"),
        _count(c, EMAIL_RE).cast("int").alias("n_emails"),
        _count(c, IPV4_RE).cast("int").alias("n_ips"),
        _count(c, PHONE_RE).cast("int").alias("n_phones"),
    )
