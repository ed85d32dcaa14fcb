#!/usr/bin/env python
"""Round-11 interleaved re-earn / spot measurement.

Runs the named queries min-of-REMEASURE_REPS (default 5) with every leg
INTERLEAVED per rep (the COVERAGE.md drift-re-earn pattern), so host
CPU steal lands on the same noise distribution for all legs. Evidence
reads as candidate/control RATIOS against the committed capture basis,
never absolute seconds.

    REMEASURE_REPS=5 python scripts/remeasure_r11.py q1 q2 ...
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
    names = sys.argv[1:]
    from fourmc_spark.queries import QUERIES
    from fourmc_spark.session import get_spark

    spark = get_spark("remeasure-r11", master=f"local[{bench.CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    legs = {n: QUERIES[n] for n in names}
    for fn in legs.values():  # warm every leg (JIT, listing, broadcast)
        bench._force(fn(spark, bench.SF_DIR))
        spark.catalog.clearCache()
    best = {k: float("inf") for k in legs}
    for _ in range(REPS):
        for name, fn in legs.items():  # interleaved per rep
            t0 = time.perf_counter()
            bench._force(fn(spark, bench.SF_DIR))
            best[name] = min(best[name], time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(json.dumps(
        {f"{k}_sec_min_of_{REPS}": round(v, 3) for k, v in best.items()}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
