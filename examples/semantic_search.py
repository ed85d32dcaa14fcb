#!/usr/bin/env python
"""End-to-end semantic search over an embedding column — the similarity
surface of the engine, composed the way a retrieval deployment uses it.

Pipeline (every stage a real operator from fourmc_spark.operators):

    embeddings table (array<float> column)
      -> train an IVF coarse quantizer        (distributed Lloyd's)
      -> ANN top-k for a query batch          (cell-pruned probe)
      -> exact brute-force top-k as control   (recall measurement)
      -> SemDeDup semantic dedup on clusters  (drop near-identical vectors)
      -> BM25 keyword top-k + RRF fusion      (hybrid lexical/vector rank)

Scale shape: the quantizer is k x dim values trained with map-only
Arrow assignment + one k-row aggregate per round; queries broadcast;
candidates never shuffle. At 100 TB the same plan holds — only the
partition count grows.

Usage:
    python examples/semantic_search.py [sf_dir]

Defaults to /root/testdata/sf0.001 so the example runs out of the box.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from pyspark.sql import functions as F

    from fourmc_spark.operators import similarity, text
    from fourmc_spark.session import get_spark

    spark = get_spark("semantic-search-example")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    queries = emb.where(F.col("vec_id") < 3)

    # --- trained-quantizer ANN vs exact control ---------------------------
    approx = similarity.ivf_kmeans_topk(
        emb, queries, k=5, centroid_stride=101, nprobe=2, n_iter=2
    )
    exact = similarity.cosine_topk(emb, queries, k=5)
    hits = approx.join(exact, ["query_id", "neighbor_id"], "inner").count()
    total = exact.count()
    recall = hits / total if total else 0.0
    print(f"ANN recall@5 vs exact: {recall:.2f} ({hits}/{total})")

    # --- semantic dedup within label clusters -----------------------------
    # inject exact-copy vectors under new ids so the drop rule has real
    # work (random embeddings almost never cosine >= 0.995); returns the
    # KEPT rows (near-identical vectors within a label cluster dropped)
    dupes = emb.where(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    with_dupes = emb.unionByName(dupes)
    n_kept = similarity.semantic_dedup(with_dupes, threshold=0.995).count()
    n_total = with_dupes.count()
    print(f"SemDeDup keeps {n_kept}/{n_total} vectors at 0.995 "
          f"(5 planted copies dropped)")

    # --- hybrid retrieval: BM25 keyword + vector, fused by RRF ------------
    sample_terms = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .where(F.length("t") > 4)
        .groupBy("t").count().orderBy(F.desc("count")).limit(2)
    )
    terms = [r["t"] for r in sample_terms.collect()]
    bm25 = text.bm25_topk(docs, terms, k=5)
    print(f"BM25 top-5 for {terms}: {bm25.count()} rows")
    fused = similarity.hybrid_rrf_topk(docs, emb, terms, query_vec_id=0, k=5)
    n_fused = fused.count()
    print(f"hybrid RRF rows: {n_fused}")

    return {
        "recall": recall,
        "kept": n_kept,
        "total": n_total,
        "bm25_rows": bm25.count(),
        "fused_rows": n_fused,
    }


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
