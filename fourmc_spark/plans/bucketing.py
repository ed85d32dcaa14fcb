"""Bucketed (co-located) tables: pre-shuffle once, join forever free.

A table written with ``bucketBy(n, key)`` is physically hash-partitioned
into n buckets by the key at WRITE time. Joining two tables bucketed the
same way on the same key needs NO Exchange at read time — Spark knows the
partitioning and plans a SortMergeJoin straight over the bucket files.
At 100 TB this converts the daily fact⋈fact join from "shuffle 100 TB
twice, every day" into "shuffle once at ingest, never again" — the same
economics as the reference's compress-once-scan-many codec guidance
(BASELINE.md), applied to partitioning.

Bucketed tables require the session catalog (``saveAsTable``; plain
``.save(path)`` silently drops bucket metadata — Spark writes the files
but no table spec, so readers re-shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 32,
                   sort: bool = True, path: str | None = None) -> None:
    """Materialize df as a bucketed (and by default sorted) catalog table.

    ``sort=True`` additionally sorts within buckets by the key, which lets
    the join skip its per-task sort too (plan shows SortMergeJoin with no
    Sort child). n_buckets should match downstream parallelism — at 100 TB
    pick buckets so one bucket ≈ one task's worth (hundreds of MB).
    ``path`` makes it an external table (the warehouse dir is a static
    conf, so tests point tables at a temp path instead)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, key: str,
                  how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned with
    zero Exchange (verify with plans.audit.exchange_count == 0)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on=key, how=how)
