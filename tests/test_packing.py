from __future__ import annotations

from pyspark.sql import functions as F

from kgp.packing import chunk_stats, pack_sequences, token_offsets


def _docs(spark, n=200):
    # token counts vary 0..9 as a function of id; includes empty docs
    rows = [(i, " ".join(["tok"] * (i % 10))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_offsets_match_serial_scan(spark):
    docs = _docs(spark)
    got = {r.doc_id: (r.n_tokens, r.offset) for r in
           token_offsets(docs, num_partitions=8).collect()}
    acc = 0
    for i in range(200):
        n = i % 10
        assert got[i] == (n, acc), i
        acc += n
    assert len(got) == 200


def test_offsets_independent_of_partitioning(spark):
    docs = _docs(spark, 150)
    a = sorted(map(tuple, token_offsets(docs, num_partitions=2)
                   .collect()))
    b = sorted(map(tuple, token_offsets(docs, num_partitions=13)
                   .collect()))
    assert a == b


def test_pack_sequences(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g"), (3, ""), (4, "h i j k l m")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in pack_sequences(docs, seq_len=5).collect()}
    assert (got[1].offset, got[1].chunk_first, got[1].chunk_last) \
        == (0, 0, 0)
    # doc 2 spans tokens 4..6 -> windows 0 and 1
    assert (got[2].offset, got[2].chunk_first, got[2].chunk_last) \
        == (4, 0, 1)
    assert (got[3].n_tokens, got[3].chunk_first, got[3].chunk_last) \
        == (0, 1, 1)
    assert (got[4].offset, got[4].chunk_first, got[4].chunk_last) \
        == (7, 1, 2)


def test_chunk_stats(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g"), (4, "h i j k l m")],
        "doc_id long, text string")
    got = {r.chunk_id: r.n_docs for r in
           chunk_stats(pack_sequences(docs, 5), 5).collect()}
    assert got == {0: 2, 1: 2, 2: 1}


def test_no_single_partition_exchange(spark):
    """The scan must NOT use a global-order window (which Spark plans
    as Exchange SinglePartition)."""
    plan = token_offsets(_docs(spark), num_partitions=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
