#!/usr/bin/env python
"""Driver-gate rehearsal on a STOCK session.

Replicates what the per-round correctness gate does, with none of this
repo's session conveniences: a plain ``SparkSession`` (stock confs —
200 shuffle partitions, no fourmc registration beyond what the queries
do themselves), the first ``--window`` queries of
``__spark_entry__.queries()`` in window order, DuckDB oracles at
sf0.01, and the gate's canonicalization (pandas ``sort_values`` over
every output column — the operation raw list cells crash).

    python scripts/gate_sim.py [--window 50] [--master local[32]]
        [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf):
    cols = sorted(pdf.columns)
    out = pdf[cols].sort_values(cols).reset_index(drop=True)
    rows = []
    for row in out.itertuples(index=False):
        r = []
        for v in row:
            if isinstance(v, float):
                r.append("NaN" if math.isnan(v) else round(v, 9))
            elif hasattr(v, "isoformat"):
                r.append(v.isoformat())
            else:
                r.append(v)
        rows.append(tuple(r))
    return cols, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query-name substrings: run only matching "
        "queries from the window (targeted re-verification)",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(args.master)
        .appName("gate-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    window = list(qs)[: args.window]
    if args.only:
        pats = [p for p in args.only.split(",") if p]
        window = [n for n in window if any(p in n for p in pats)]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    fails = []
    for i, name in enumerate(window):
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            if name not in osql:
                print(f"{i:2d} {name}: rows-only {len(sdf)}")
                continue
            ddf = con.execute(osql[name]).df()
            sc, sr = _canon(sdf)
            dc, dr = _canon(ddf)
            ok = sc == dc and len(sr) == len(dr) and sr == dr
            print(
                f"{i:2d} {name}: {'OK' if ok else 'MISMATCH'} "
                f"({len(sr)} rows, {time.perf_counter() - t0:.1f}s)"
            )
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — a gate sim must not stop
            print(f"{i:2d} {name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
            fails.append(name)
    print("FAILS:", fails if fails else f"none — {len(window)}/{len(window)} green")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
