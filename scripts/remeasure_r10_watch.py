#!/usr/bin/env python
"""Round-10 interleaved re-earn of the mid-capture watch items.

The r10 mid capture (plans/r10/BENCH_DETAIL_mid.json) moved three
queries UP on code no r10 commit touched, against a window where the
pinned controls moved DOWN:

  - ann_ivf_topk        1.19 -> 1.32  (also the r9 VERDICT flag #4)
  - ann_ivf_kmeans_topk 3.02 -> 3.29
  - graph_pagerank      2.09 -> 2.28

Method (the COVERAGE.md drift-re-earn pattern): min-of-N with every
candidate and its pinned control INTERLEAVED per rep, so host CPU
steal lands on the same noise distribution for all legs:

  - ann_cosine_topk       — control for both ANN legs (same embedding
    parse + Arrow matmul substrate, none of the IVF/k-means code)
  - q08_multijoin_revenue — control for graph_pagerank (pure JVM
    joins+aggregation over the same parquet inputs)

A real regression shows a candidate/control RATIO above its committed
basis; uniform host noise moves both legs together. Prints one JSON
dict; does NOT touch BENCH_DETAIL.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPS = int(os.environ.get("REMEASURE_REPS", "5"))

CANDIDATES = ["ann_ivf_topk", "ann_ivf_kmeans_topk", "graph_pagerank"]
CONTROLS = ["ann_cosine_topk", "q08_multijoin_revenue"]


def main() -> None:
    from fourmc_spark.queries import QUERIES
    from fourmc_spark.session import get_spark

    spark = get_spark("remeasure-r10-watch", master=f"local[{bench.CPUS}]")
    sf = bench.SF_DIR
    legs = {n: QUERIES[n] for n in CANDIDATES + CONTROLS}
    # warm every leg (JIT, file listing, broadcast)
    for fn in legs.values():
        bench._force(fn(spark, sf))
        spark.catalog.clearCache()
    best = {k: float("inf") for k in legs}
    for _ in range(REPS):
        for name, fn in legs.items():  # interleaved per rep
            t0 = time.perf_counter()
            bench._force(fn(spark, sf))
            best[name] = min(best[name], time.perf_counter() - t0)
            spark.catalog.clearCache()
    out = {f"{k}_sec_min_of_{REPS}": round(v, 3) for k, v in best.items()}
    out["ratio_ivf_over_brute"] = round(
        best["ann_ivf_topk"] / best["ann_cosine_topk"], 3
    )
    out["ratio_kmeans_over_brute"] = round(
        best["ann_ivf_kmeans_topk"] / best["ann_cosine_topk"], 3
    )
    out["ratio_pagerank_over_q08"] = round(
        best["graph_pagerank"] / best["q08_multijoin_revenue"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
