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
               feature/resize/frame-sample with REAL PPM/BMP decode
               (pure-numpy codecs; the oracle recomputes every pixel),
               as-of join, range join,
               PageRank, funnels, end-to-end curation pipeline), the
               UDTF / UDAF / grouped-map (applyInPandas) extension
               points, and the Structured Streaming surface (tumbling,
               sliding, and session windows, watermark dedup,
               stream-stream interval join, stream-static broadcast
               enrichment, chained stateful ops, CDC apply, stateful
               sessionization) run as real micro-batch queries.
oracle_sql() — DuckDB-equivalent SQL for every query (hashes are
               stabilized by pinned aliases, explicit BIGINT casts, and
               rounding on exact decimal lattices). Since round 3 NO
               query is rows-only: the formerly oracle-less trio
               (stream_sessionize_stateful, ann_ivf_kmeans_topk,
               text_bpe_learn) carries full hash oracles via batch-twin
               / integer-exact unrolled reformulations, and round 4's
               array-valued outputs are stringified in the gate
               projections so the driver canonicalizer can hash them.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

# The driver's correctness gate runs queries in dict order and caps the
# number it checks per round. Queries already driver-verified in a prior
# round (verified_queries.json, updated from each CORRECTNESS_r*.json)
# rotate to the BACK so every round's window lands on still-unverified
# surface. _PRIORITY pins this round's most important unverified queries
# to the very front.
_PRIORITY: list[str] = [
    # round 9: 163/170 driver-verified (CORRECTNESS_r01-r08 union, all
    # green); the round-9 additions (stream_4mc_ordered_multibatch,
    # maintenance_compact_4mc, text_heavy_hitters, sql_4mc_zonemap_scan,
    # sql_4mc_zonemap_blocks_scan, maintenance_compact_zonemap,
    # sql_4mc_sinkstats_scan) are the only unverified queries and sort
    # ahead of verified ones
    # automatically via _ordered(), so nothing needs pinning. The
    # rotation gives the driver's 50-slot window a regression
    # re-confirmation pass over long-verified queries each round.
]


def _ordered(mapping: dict) -> dict:
    try:
        with open(os.path.join(_HERE, "verified_queries.json")) as f:
            verified = set(json.load(f)["verified"])
    except (OSError, ValueError, KeyError):
        verified = set()
    pri = [n for n in _PRIORITY if n in mapping]
    rest = [n for n in mapping if n not in verified and n not in set(pri)]
    back = [n for n in mapping if n in verified and n not in set(pri)]
    return {n: mapping[n] for n in pri + rest + back}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fourmc_spark.queries import QUERIES

    return QUERIES["q08_multijoin_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fourmc_spark.queries import QUERIES

    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fourmc_spark.queries import ORACLE

    return _ordered(ORACLE)
