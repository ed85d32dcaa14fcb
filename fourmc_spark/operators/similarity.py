"""Similarity search over embedding columns (array<float>).

Two paths, matching the blueprint's scale ladder:

* brute-force cosine top-k — the correctness baseline; the query set is
  broadcast, candidate scoring is a JVM-side higher-order-function dot
  product (no Python UDF), and top-k is a per-query window. At scale the
  scoring stage is embarrassingly parallel over candidate partitions and
  only k rows per (query, partition) survive the aggregation.
* LSH-bucketed ANN — random-hyperplane signs bucket candidates; only
  same-bucket pairs are scored. Recall < 1 by construction (reported
  alongside), shuffle volume drops by the bucket fanout.

Cosine is computed in float64 via zip_with + aggregate — deterministic,
sequential summation order (index order), so results are reproducible
across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["with_norm", "cosine_topk", "lsh_ann_topk", "cosine_pairs"]


def _dot(a: str, b: str) -> "F.Column":
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return df.withColumn("_norm", norm)


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank).

    `queries` is expected to be small — it is broadcast, so scoring is a
    map-only stage over the candidate table; the only shuffle is the
    per-query top-k (k rows per partition survive the partial sort).
    """
    cand = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cnorm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    scored = (
        cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", _dot("_cvec", "_qvec") / (F.col("_cnorm") * F.col("_qnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def lsh_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                 n_planes: int = 8, seed: int = 97,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Vectors hash to a sign-pattern bucket; queries probe only their own
    bucket. Deterministic planes from a seeded RNG. Returns the same
    (query_id, neighbor_id, rank) shape as :func:`cosine_topk` — rank is
    within the probed bucket, so recall vs exact is < 1 (the scale/latency
    trade)."""
    import random

    dim = len(embeddings.select(vec_col).first()[0])
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]

    def bucket_col(vec: str) -> "F.Column":
        bits = []
        for j, p in enumerate(planes):
            arr = F.array(*[F.lit(x) for x in p])
            d = F.aggregate(
                F.zip_with(F.col(vec), arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    cand = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cnorm"),
        bucket_col(vec_col).alias("bucket"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
        bucket_col(vec_col).alias("bucket"),
    )
    scored = (
        cand.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", _dot("_cvec", "_qvec") / (F.col("_cnorm") * F.col("_qnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def cosine_pairs(embeddings: DataFrame, threshold: float,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, ids only.

    Quadratic scoring — correct baseline for modest N; the 100 TB path is
    :func:`lsh_ann_topk`-style bucketing first. Output (a_id, b_id)."""
    e = with_norm(embeddings, vec_col)
    a = e.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na")
    )
    b = e.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb")
    )
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("sim", _dot("_va", "_vb") / (F.col("_na") * F.col("_nb")))
        .where(F.col("sim") >= threshold)
        .select("a_id", "b_id")
    )
