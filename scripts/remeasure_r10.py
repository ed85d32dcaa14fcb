#!/usr/bin/env python
"""Round-10 interleaved re-measure of the r9-flagged ann_ivf_topk drift.

Flagged by the r9 verdict: the driver's official r9 capture recorded
ann_ivf_topk at 2.56 s (2.35x the r8 value of 1.09 s) on code no r9
commit touched, while the builder's committed same-code capture
(d47b051) recorded 1.17 s — the same capture-basis pattern as the r8
roundtrip flag, which an interleaved re-measure resolved as host noise.

Method (the COVERAGE.md drift-re-earn pattern): min-of-N with the
candidate and a pinned control INTERLEAVED per rep so host CPU steal
lands on the same noise distribution for both:

  - candidate: ann_ivf_topk (IVF coarse quantizer + probed matmul)
  - control:   ann_cosine_topk (brute-force matmul) — shares the
    embedding parse + Arrow matmul substrate but none of the IVF
    training/probe code, and its r9 driver capture moved <1.2x.

A real regression shows the candidate/control RATIO above its committed
basis (r9 builder capture: 1.17 s / 0.62 s ~ 1.9); uniform host noise
moves both legs together. Prints one JSON dict; does NOT touch
BENCH_DETAIL.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPS = int(os.environ.get("REMEASURE_REPS", "5"))


def main() -> None:
    from fourmc_spark.queries import QUERIES

    from fourmc_spark.session import get_spark

    spark = get_spark("remeasure-r10", master=f"local[{bench.CPUS}]")
    sf = bench.SF_DIR
    legs = {"ann_ivf_topk": QUERIES["ann_ivf_topk"],
            "ann_cosine_topk": QUERIES["ann_cosine_topk"]}
    # warm both (JIT, file listing, broadcast)
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
