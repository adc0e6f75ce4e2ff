"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir and
compares it against ``oracle_sql()`` via DuckDB: row count, column-name
set, and an order-insensitive value hash. The DEFAULT mode mimics the
DRIVER's canonicalizer: pandas ``sort_values`` over name-sorted columns
(so a list/array cell raises TypeError exactly like the driver's gate
does) and sign-preserving float formatting (``-0.0`` != ``0.0``). Any
failure mode the driver can hit should reproduce here first. Pass
``--loose`` for the older forgiving hasher (list-recursive,
zero-sign-folding).

``--cores N`` / ``--partitions N`` set the Spark parallelism (defaults
32/64 — DRIVER-LIKE, wider than the old 8/16 default: the r4
``phrase_probs`` red was a summation-order float flip that only
reproduced at local[32], so green-at-8 does not imply green-at-32).

Usage: python bench/verify_queries.py [--loose] [--cores N]
           [--partitions N] [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

STRICT = True


def _canon_loose(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_loose(x) for x in v) + "]"
    return str(v)


def _canon_strict(v) -> str:
    """Driver-style scalar canonicalization: signed zero is preserved
    (the r3 ``image_feature_stats`` hash-fail was a ``-0.0``), Decimal
    is NOT folded to int (the r3 ``intent_actions`` mismatch was a
    DuckDB DECIMAL literal), lists are rejected upstream by the pandas
    sort."""
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_strict(x) for x in v) + "]"
    return str(v)


def _hash_strict(rows, cols) -> str:
    """Driver-shaped hash: pandas frame, columns sorted by name,
    ``sort_values`` over ALL columns — raises TypeError on list cells,
    exactly like the r3 driver err on wiktionary_words/wiki_locations."""
    import pandas as pd
    order = sorted(cols)
    pdf = pd.DataFrame(list(rows), columns=list(cols))[order]
    if len(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
    canon = ["\x1f".join(_canon_strict(v) for v in row)
             for row in pdf.itertuples(index=False, name=None)]
    canon.sort()
    return hashlib.md5("\x1e".join(canon).encode()).hexdigest()


def _hash(rows, cols) -> str:
    if STRICT:
        return _hash_strict(rows, cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("\x1f".join(_canon_loose(r[i]) for i in order)
                   for r in rows)
    return hashlib.md5("\x1e".join(canon).encode()).hexdigest()


def main() -> None:
    global STRICT
    argv = [a for a in sys.argv[1:] if a != "--loose"]
    if len(argv) != len(sys.argv) - 1:
        STRICT = False
    cores, partitions = 32, 64
    if "--cores" in argv:
        i = argv.index("--cores")
        cores = int(argv[i + 1])
        del argv[i:i + 2]
    if "--partitions" in argv:
        i = argv.index("--partitions")
        partitions = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entry
    from kgp.session import get_spark

    spark = get_spark("verify-queries", cores=cores,
                      shuffle_partitions=partitions)

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{path}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            rec = {"spark_rows": len(s_rows)}
            if name in oracles:
                res = con.execute(oracles[name])
                o_cols = [d[0] for d in res.description]
                o_rows = res.fetchall()
                rec.update(
                    oracle_rows=len(o_rows),
                    rows_match=len(s_rows) == len(o_rows),
                    schema_match=sorted(s_cols) == sorted(o_cols),
                    hash_match=(_hash(s_rows, s_cols)
                                == _hash(o_rows, o_cols)),
                )
            else:
                rec["err"] = "no_oracle"
        except Exception as exc:  # driver records err: <traceback>
            rec = {"err": f"{type(exc).__name__}: {exc}",
                   "rows_match": False}
        report[name] = rec
        flag = ("OK" if rec.get("hash_match")
                else ("rows-only" if "err" in rec else "MISMATCH"))
        print(f"{name:24s} {flag:9s} {json.dumps(rec)}", flush=True)

    bad = [n for n, r in report.items()
           if r.get("hash_match") is False or r.get("rows_match") is False]
    print("FAILED:" if bad else "ALL GREEN", ",".join(bad))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
