"""kgp — a from-scratch PySpark-native knowledge-graph construction pipeline.

Re-expresses the information-extraction capabilities of the reference
(fpistorius/palladian, a per-document Java library) as a distributed,
Spark-first dataflow:

    pages(url, warc_ts, html, text, lang)          [Iceberg/parquet corpus]
      -> docs(url, text, lang, title, sentences)    stage 1: html_text
      -> mentions(url, sent_idx, start, end, ...)   stage 2: mentions (NER)
      -> links(url, ..., entity_id, canon_id)       stage 3: linker
      -> triples(subj, pred, obj, url, conf)        stage 4: relations
      partitioned by pred, with lineage manifests   stage 5: materialize

Design notes (Spark-first, NOT a port):
  * per-document text semantics live in vectorized pandas/Arrow UDFs;
  * cross-document work (dictionary training, gazetteer linking,
    connected-components canonicalization) is DataFrame joins/aggregations
    that Catalyst/AQE plan and optimize;
  * every stage boundary is a materialized table => checkpoint-resume.
"""

__version__ = "0.1.0"
