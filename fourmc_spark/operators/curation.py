"""Corpus-curation operators: benchmark decontamination and per-source
corpus statistics.

Decontamination is the standard training-data hygiene step: flag documents
whose word n-grams overlap a held-out benchmark set. The benchmark shingle
set is tiny relative to the corpus, so it broadcasts — the 100 TB corpus is
scanned once, map-side, with no shuffle of the corpus itself (the only
shuffle is the per-doc hit count, keyed by doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fourmc_spark.functions import shingles_spark, tokens_spark

__all__ = ["contamination", "source_stats"]


def contamination(
    df: DataFrame,
    bench_mod: int = 50,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """n-gram overlap of each corpus document against a benchmark set.

    The benchmark here is the deterministic slice ``doc_id % bench_mod == 0``
    (stand-in for an eval suite); every other document is scored by the
    fraction of its distinct word ``n``-grams that appear in any benchmark
    document. Plan shape: benchmark shingles deduped then **broadcast**; the
    corpus explodes its distinct shingles map-side, inner-joins the broadcast
    set, and aggregates hits per document."""
    toks = tokens_spark(text_col)
    sh = shingles_spark(toks, n)
    is_bench = (F.col(id_col) % bench_mod) == 0

    bench_shingles = (
        df.where(is_bench)
        .select(F.explode(F.expr(sh)).alias("sh"))
        .distinct()
    )
    base = df.where(~is_bench).select(
        F.col(id_col), F.expr(f"array_distinct({sh})").alias("shs")
    )
    hits = (
        base.select(F.col(id_col), F.explode("shs").alias("sh"))
        .join(F.broadcast(bench_shingles), "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.size("shs").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0))
                / F.greatest(F.size("shs"), F.lit(1)),
                4,
            ).alias("contamination_frac"),
        )
    )


def source_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus statistics: document count, char volume, average
    length, language spread. One partial+final hash aggregation — the shape
    that scales linearly with executor count."""
    return df.groupBy("source").agg(
        F.count("*").cast("long").alias("docs"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.round(F.avg(F.length(text_col)), 4).alias("avg_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )
