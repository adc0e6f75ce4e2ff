"""Sequence packing for training-data pipelines: the GPT-style
concat-and-chunk layout.

Documents are conceptually concatenated in ``doc_id`` order and cut
into fixed-length windows of ``seq_len`` tokens; each document's
placement is fully described by its global token OFFSET (exclusive
prefix sum of token counts in id order). The offset is the only hard
part at scale — a naive ``sum() over (order by id)`` window with no
partition key collapses the whole table into ONE task. This module
implements the textbook two-phase distributed scan instead:

1. range-repartition by id + sort within partitions (global order
   across ordered partitions);
2. per-partition token totals — one tiny aggregation, collected to the
   driver (#partitions rows) and turned into exclusive per-partition
   base offsets;
3. one mapInPandas pass that adds the broadcast base offset to a
   running within-partition cumulative sum.

Every row is touched exactly twice, nothing ever concentrates on one
executor, and the result is identical to the single-partition window
(oracle-checked). Offsets use integer arithmetic throughout — at
100 T tokens a double's 53-bit mantissa would silently round.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.textstats import token_count_ws


def token_offsets(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  num_partitions: int | None = None) -> DataFrame:
    """(id, n_tokens, offset): global exclusive prefix sum of
    whitespace token counts in id order, via the two-phase scan."""
    counts = docs.select(
        F.col(id_col),
        token_count_ws(F.col(text_col)).cast("long").alias("n_tokens"))
    p = num_partitions or counts.sparkSession.sparkContext \
        .defaultParallelism
    parted = (counts.repartitionByRange(p, id_col)
              .sortWithinPartitions(id_col)
              .withColumn("_pid", F.spark_partition_id()))
    parted.persist()
    # phase 1: per-partition totals -> exclusive base offsets
    totals = {r._pid: r.total for r in
              parted.groupBy("_pid")
              .agg(F.sum("n_tokens").alias("total")).collect()}
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += totals[pid]
    bases = counts.sparkSession.sparkContext.broadcast(base)

    # phase 2: running cumsum within each (already sorted) partition,
    # seeded by the partition's base offset; batches of one partition
    # arrive in order through the iterator
    out_schema = f"{id_col} long, n_tokens long, offset long"

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if running is None:
                running = bases.value.get(int(pdf["_pid"].iloc[0]), 0)
            csum = pdf["n_tokens"].cumsum()
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "offset": csum - pdf["n_tokens"] + running})
            running += int(csum.iloc[-1])

    return parted.mapInPandas(scan, out_schema)


def pack_sequences(docs: DataFrame, seq_len: int,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, n_tokens, offset, chunk_first, chunk_last): which
    fixed-length training windows each document lands in under
    concat-and-chunk at seq_len tokens. A document spans
    chunk_first..chunk_last inclusive (empty docs occupy zero tokens
    at their offset: chunk_last == chunk_first)."""
    off = token_offsets(docs, id_col=id_col, text_col=text_col)
    first = F.expr(f"offset div {int(seq_len)}")
    last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(offset + n_tokens - 1) div {int(seq_len)}")) \
        .otherwise(first)
    return off.select(
        id_col, "n_tokens", "offset",
        first.alias("chunk_first"), last.alias("chunk_last"))


def chunk_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """(chunk_id, n_docs): how many documents touch each training
    window — the packing-quality diagnostic (high n_docs => many
    cross-document attention boundaries). Sequence-explodes only the
    chunk RANGE (a few ids per doc), never the text."""
    return (packed
            .select(F.explode(F.sequence("chunk_first", "chunk_last"))
                    .alias("chunk_id"))
            .groupBy("chunk_id")
            .agg(F.count("*").alias("n_docs")))
