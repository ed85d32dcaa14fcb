"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H Q5-shaped multi-join revenue) on
               /root/testdata/sf0.001.
queries()    — every implemented operator from SURVEY.md §2: the Q1-Q44
               relational corpus (incl. salted skew join, deterministic
               hash + stratified sampling, exact + approx percentiles,
               ROWS + RANGE window frames, session windows, EXISTS
               subqueries, correlated LATERAL top-n, recursive CTEs, VARIANT
               extraction, statistical moments, sorted array
               aggregation) and TPC-H Q2-Q22, the LLM-pipeline
               extensions (dedup x7 plus connected-components cluster
               labeling + canonicalization + C4-style span dedup,
               brute-force / LSH / IVF / quantized similarity search,
               nearest-centroid assignment, text analysis incl. BM25 /
               TF-IDF / RRF retrieval, unigram+bigram LM fluency,
               token-budget and mixture sampling, multimodal
               feature/resize/frame-sample, as-of join, range join,
               PageRank, funnels, end-to-end curation pipeline), the
               UDTF / UDAF / grouped-map (applyInPandas) extension
               points, and the Structured Streaming surface (tumbling,
               sliding, and session windows, watermark dedup,
               stream-stream interval join, stream-static broadcast
               enrichment, chained stateful ops, CDC apply, stateful
               sessionization) run as real micro-batch queries.
oracle_sql() — DuckDB-equivalent SQL for every query (hashes are
               stabilized by pinned aliases, explicit BIGINT casts, and
               rounding on exact decimal lattices). Only
               stream_sessionize_stateful (custom stateful streaming)
               and ann_ivf_kmeans_topk (iterative k-means) omit oracles
               — not SQL-expressible; the driver records rows-only.
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
