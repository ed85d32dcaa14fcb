"""Measure propagation vs star-contraction connected components on the
two regimes that matter for dedup:

* dense clusters (the near-dup norm: LSH pairs form cliques/stars of
  diameter 1-2) at growing cluster counts;
* long chains (the adversarial regime: overlapping shingle drift makes
  a path; propagation needs diameter rounds, star O(log^2 n)).

Decides canonicalize's default method from data, not intuition. Run:
    python scripts/measure_components_crossover.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from fourmc_spark.operators.graph import (
    connected_components,
    connected_components_star,
)
from fourmc_spark.session import get_spark


def dense_edges(spark, n_clusters: int, size: int):
    """Star-shaped clusters (hub = min id) — what minhash_pairs emits
    after the a_id < b_id ordering: each cluster contributes size-1
    pairs to its minimum member. Diameter 2."""
    return (
        spark.range(n_clusters * (size - 1))
        .select(
            (F.col("id") % n_clusters * size).alias("a_id"),
            (F.col("id") % n_clusters * size + F.col("id") / n_clusters + 1
             ).cast("long").alias("b_id"),
        )
    )


def chain_edges(spark, length: int):
    return spark.range(length - 1).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )


def timed(fn, edges, max_iter):
    t0 = time.perf_counter()
    try:
        n = fn(edges, src="a_id", dst="b_id", max_iter=max_iter).count()
        return time.perf_counter() - t0, n
    except RuntimeError as e:
        return float("inf"), str(e)[:60]


def main() -> None:
    spark = get_spark("cc-crossover")
    print("regime,params,propagation_s,star_s,rows")
    for n_clusters, size in [(1000, 10), (10000, 10), (50000, 10)]:
        e = dense_edges(spark, n_clusters, size).persist()
        e.count()
        tp, n1 = timed(connected_components, e, 30)
        ts, n2 = timed(connected_components_star, e, 30)
        assert n1 == n2, (n1, n2)
        print(f"dense,{n_clusters}x{size},{tp:.2f},{ts:.2f},{n1}")
        e.unpersist()
    for length in [50, 200, 1000]:
        e = chain_edges(spark, length).persist()
        e.count()
        tp, n1 = timed(connected_components, e, 30)
        ts, n2 = timed(connected_components_star, e, 30)
        print(f"chain,{length},{tp:.2f},{ts:.2f},{n2}")
        e.unpersist()


if __name__ == "__main__":
    main()
