#!/usr/bin/env python
"""One interleaved A/B rep: run the named queries (warm + min-of-2 noop
sink) in THIS process's PYTHONPATH tree and print one JSON dict.
Driven by an outer loop that alternates PYTHONPATH between HEAD and a
worktree at the r11 baseline commit, so host steal lands on both trees'
samples alike (the r10 pagerank-diagnosis pattern)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1:]
    from fourmc_spark.queries import QUERIES
    from fourmc_spark.session import get_spark

    spark = get_spark("ab-r11", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for n in names:
        fn = QUERIES[n]
        force(fn(spark, SF_DIR))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        out[n] = round(best, 3)
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
