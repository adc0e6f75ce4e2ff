"""Byte-pair-encoding tokenizer TRAINING over a corpus — the
Sennrich/Haddow/Birch 2016 subword algorithm ("Neural Machine
Translation of Rare Words with Subword Units", public), shaped for
100 TB:

- the only corpus-scale operation is ONE (word, count) aggregation
  (map-side combine; the result is vocabulary-sized, Zipf-bounded);
- the merge loop runs over that compact weighted vocabulary on the
  driver, exactly like the reference algorithm runs over its word
  frequency dict — no per-iteration corpus scans;
- pair-frequency ties break deterministically (count DESC, pair
  lexicographic) so the learned merge table is engine- and
  partitioning-independent;
- encoding applies the ranked merge list in one Arrow pass
  (greedy lowest-rank-first, the standard BPE apply rule).

The end-of-word marker '</w>' keeps word boundaries reversible like
the original formulation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text",
                lowercase: bool = True) -> DataFrame:
    """(word, count) — the single corpus-scale shuffle; whitespace
    words, empty strings dropped, optional lowercasing."""
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (docs
            .select(F.explode(F.split(t, r"\s+")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("count")))


def learn_bpe_from_counts(counts: list[tuple[str, int]],
                          num_merges: int) -> list[tuple[str, str]]:
    """The reference merge loop over a weighted word-frequency dict:
    each word starts as characters + EOW; per iteration the most
    frequent adjacent symbol pair merges everywhere. Ties: count
    DESC, then pair lexicographic (deterministic substitute for the
    arbitrary dict-order max)."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, c in vocab.items():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats; further merges are noise
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab = {}
        for symbols, c in vocab.items():
            out = []
            i = 0
            while i < len(symbols):
                if (i < len(symbols) - 1 and symbols[i] == a
                        and symbols[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def learn_bpe(docs: DataFrame, num_merges: int,
              text_col: str = "text",
              lowercase: bool = True) -> list[tuple[str, str]]:
    """Distributed fit: the (word, count) aggregation feeds the
    driver-side merge loop (the collect is vocabulary-sized). Counts
    are collected in (count DESC, word ASC) order purely for
    reproducible logs — the merge result only depends on the
    multiset."""
    rows = word_counts(docs, text_col, lowercase) \
        .orderBy(F.desc("count"), "word").collect()
    return learn_bpe_from_counts(
        [(r["word"], r["count"]) for r in rows], num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> list[str]:
    """Greedy BPE apply: repeatedly merge the LOWEST-rank adjacent
    pair (the standard apply rule matching the learn order)."""
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i:best_i + 2] = [symbols[best_i]
                                      + symbols[best_i + 1]]
    return symbols


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               lowercase: bool = True) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) — one Arrow pass with
    the broadcast merge ranks and a per-batch word cache (Zipf makes
    the cache hit rate high)."""
    spark = docs.sparkSession
    b = spark.sparkContext.broadcast(list(merges))
    src = docs.select(F.col(id_col).alias("doc_id"),
                      (F.lower(F.col(text_col)) if lowercase
                       else F.col(text_col)).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = {tuple(p): i for i, p in enumerate(b.value)}
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                out: list[str] = []
                for w in (text or "").split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(int(did))
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({"doc_id": ids, "tokens": toks,
                                "n_tokens": ns})

    return src.mapInPandas(
        run, "doc_id long, tokens array<string>, n_tokens int")
