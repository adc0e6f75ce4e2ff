"""Bloom filter (palladian-commons collection/BloomFilter.java:42-247)
— the candidate pre-filter primitive for web-scale "seen before?"
checks (URL frontier dedup, decontamination probes, gazetteer
pre-screens).

Reference semantics kept exactly:

- sizing: vectorSize = ceil(n * ln(1/fp) / ln(2)^2);
  numHashFunctions = ceil((vectorSize / numElements) * ln 2) with the
  reference's INT division vectorSize/numElements (:76-82);
  fpProbability = 2^(-(vectorSize * ln 2) / numElements).
- hashing: the bundled 32-bit murmur2 (m=0x5bd1e995, r=24,
  seed = i for hash function i, little-endian 4-byte blocks,
  tail switch with fall-through) over the UTF-8 of str(item);
  position = ((hash % size) + size) % size (:118-158, :227-238).
- test(null) is false; add counts duplicates (:161-195).

Spark shape: the filter BUILD is distributed — ONE Arrow pass turns
values into bit positions (ints), a distinct aggregation collapses
them (at most vectorSize rows survive, independent of input size),
and only those positions reach the driver. The PROBE broadcasts the
packed bit vector (numpy uint8 array, vectorSize/8 bytes) into a
single Arrow pass. The full value set never sits on one machine.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 0x5BD1E995
_MASK = 0xFFFFFFFF


def murmur32(data: bytes, seed: int) -> int:
    """The reference's murmur2 (BloomFilter.java:118-158) with Java
    32-bit int wrap-around; returns a SIGNED 32-bit value."""
    length = len(data)
    h = (seed ^ length) & _MASK
    for i in range(length // 4):
        i4 = i * 4
        k = (data[i4] + (data[i4 + 1] << 8) + (data[i4 + 2] << 16)
             + (data[i4 + 3] << 24)) & _MASK
        k = (k * _M) & _MASK
        k ^= k >> 24
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
    rem = length % 4
    base = length & ~3
    if rem == 3:
        h ^= (data[base + 2] << 16)
    if rem >= 2:
        h ^= (data[base + 1] << 8)
    if rem >= 1:
        h ^= data[base]
        h = (h * _M) & _MASK
    h &= _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h - 0x100000000 if h >= 0x80000000 else h


def _positions(value, vector_size: int, num_hashes: int) -> list[int]:
    """createHashes (:227-238): seeds 0..k-1, shifted modulus."""
    data = str(value).encode("utf-8")
    return [((murmur32(data, i) % vector_size) + vector_size)
            % vector_size for i in range(num_hashes)]


class BloomFilter:
    """Pure twin of the reference class."""

    def __init__(self, num_elements: int, vector_size: int | None = None,
                 fp_prob: float | None = None):
        if fp_prob is not None:
            vector_size = int(math.ceil(
                num_elements * math.log(1 / fp_prob)
                / math.log(2) ** 2))
        if num_elements <= 0 or not vector_size or vector_size <= 0:
            raise ValueError("numElements/vectorSize must be > 0")
        self.vector_size = vector_size
        self.bits = np.zeros((vector_size + 7) // 8, dtype=np.uint8)
        # Java int division BEFORE the ln(2) multiply — kept
        self.num_hash_functions = int(math.ceil(
            (vector_size // num_elements) * math.log(2)))
        self.false_positive_probability = 2 ** (
            -(vector_size * math.log(2)) / num_elements)
        self.num_added_items = 0

    def _idx(self, value) -> list[int]:
        return _positions(value, self.vector_size,
                          self.num_hash_functions)

    def add(self, value) -> None:
        if value is None:
            raise ValueError("item must not be null")
        for p in self._idx(value):
            self.bits[p >> 3] |= 1 << (p & 7)
        self.num_added_items += 1

    def add_all(self, values) -> None:
        for v in values:
            self.add(v)

    def test(self, value) -> bool:
        if value is None:
            return False
        return all(self.bits[p >> 3] & (1 << (p & 7))
                   for p in self._idx(value))

    __contains__ = test

    def __repr__(self) -> str:
        return (f"BloomFilter [vectorSize={self.vector_size}, "
                f"fpProbability={self.false_positive_probability}, "
                f"hashFunctions={self.num_hash_functions}, "
                f"addedItems={self.num_added_items}]")


# ------------------------------------------------------------- stages

def bloom_build(df: DataFrame, col: str, num_elements: int,
                fp_prob: float = 0.01) -> BloomFilter:
    """Distributed build: Arrow pass -> positions, distinct (bounded
    by vectorSize), driver sets bits. num_added_items is the distinct
    VALUE count (one count aggregation), not per-duplicate like the
    sequential twin."""
    proto = BloomFilter(num_elements, fp_prob=fp_prob)
    size, k = proto.vector_size, proto.num_hash_functions
    src = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = set()
            for v in pdf["v"]:
                out.update(_positions(v, size, k))
            yield pd.DataFrame({"pos": sorted(out)})

    positions = src.mapInPandas(run, "pos long").distinct()
    n_values = src.distinct().count()
    for r in positions.collect():
        p = int(r["pos"])
        proto.bits[p >> 3] |= 1 << (p & 7)
    proto.num_added_items = n_values
    return proto


def bloom_probe(df: DataFrame, col: str, bf: BloomFilter,
                out_col: str = "maybe_seen") -> DataFrame:
    """Broadcast probe: adds a boolean column `out_col` ('potentially
    in set' true / 'for sure not in set' false) in one Arrow pass over
    the packed bit vector."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(
        (bytes(bf.bits), bf.vector_size, bf.num_hash_functions))
    from pyspark.sql import types as T
    fields = df.schema.fieldNames()
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.BooleanType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits, size, k = b.value
        arr = np.frombuffer(bits, dtype=np.uint8)
        for pdf in batches:
            flags = []
            for v in pdf[col]:
                if v is None:
                    flags.append(False)
                    continue
                flags.append(all(
                    arr[p >> 3] & (1 << (p & 7))
                    for p in _positions(v, size, k)))
            pdf = pdf.copy()
            pdf[out_col] = flags
            yield pdf[[*fields, out_col]]

    return df.mapInPandas(run, schema)
