"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H Q5-shaped multi-join revenue) on
               /root/testdata/sf0.001.
queries()    — every implemented operator from SURVEY.md §2: the Q1-Q38
               relational corpus (incl. salted skew join, deterministic
               hash + stratified sampling, exact + approx percentiles,
               ROWS + RANGE window frames, session windows, EXISTS
               subqueries, sorted array aggregation),
               the LLM-pipeline extensions (dedup x5 plus
               connected-components cluster labeling, brute-force / LSH /
               IVF similarity search, text analysis x4, multimodal
               feature/resize/frame-sample, as-of join, range join,
               end-to-end curation pipeline), the UDTF / UDAF /
               grouped-map (applyInPandas) extension points, and the Structured
               Streaming surface (tumbling, sliding, and session windows,
               watermark dedup, stream-stream interval join,
               stream-static broadcast enrichment, stateful
               sessionization) run as real micro-batch queries.
oracle_sql() — DuckDB-equivalent SQL for every query (hashes are
               stabilized by pinned aliases, explicit BIGINT casts, and
               rounding on exact decimal lattices). Only
               stream_sessionize_stateful omits an oracle — custom
               stateful streaming is not SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fourmc_spark.queries import QUERIES

    return QUERIES["q08_multijoin_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fourmc_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fourmc_spark.queries import ORACLE

    return dict(ORACLE)
