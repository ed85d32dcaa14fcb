#!/usr/bin/env python
"""End-to-end corpus curation over the 4mc format — the engine's twin of
the reference's runnable `examples` module (java/examples: text + protobuf
M/R and Spark jobs; Readme.md "Java examples").

Pipeline (every stage a real operator from fourmc_spark.operators):

    raw text (.4mc, splittable scan)
      -> C4-style line cleaning            (curation rules)
      -> quality classifier gate           (feature-hashed linear model)
      -> exact dedup                       (content-hash groups)
      -> MinHash-LSH near-dedup            (banded candidates + confirm)
      -> chunk + pack into sequences       (training-window prep)
      -> BPE tokenizer: learn + encode     (merge-table training, apply)
      -> pack token streams into 512-token training sequences
      -> write curated corpus (.4mz)       (splittable sink)
      -> per-source stats to stdout

Usage:
    python examples/curate_corpus.py [input_dir] [output_dir]

With no args, synthesizes a small corpus into a temp dir first so the
example is runnable out of the box.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_input(spark, path: str, n_docs: int = 2000) -> None:
    """Write a demo corpus as splittable .4mc (tab-separated id/source/text,
    with some exact and near duplicates to give dedup something to do)."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 5).cast("string")).alias("source"),
        F.concat(
            F.lit("Document number "), F.col("id").cast("string"),
            F.lit(" talks about topic "), (F.col("id") % 37).cast("string"),
            F.lit(". It has several sentences of body text. "),
            F.lit("The quick brown fox jumps over the lazy dog "),
            (F.col("id") % 11).cast("string"), F.lit(" times."),
        ).alias("text"),
    )
    # exact copies (content-hash dedup) and lightly-edited copies
    # (MinHash near-dedup) so both stages have work to do
    dupes = base.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    near = (
        base.where(F.col("doc_id") % 50 == 25)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" Slightly edited copy.")))
    )
    base = base.unionByName(near)
    (
        base.unionByName(dupes)
        .select(F.concat_ws("\t", "doc_id", "source", "text").alias("value"))
        .write.format("fourmc")
        .option("codec", "lz4").option("level", "fast")
        .mode("overwrite").save(path)
    )


def curate(spark, input_dir: str, output_dir: str) -> dict:
    from pyspark.sql import functions as F

    from fourmc_spark.operators import curation, dedup, text as T

    # splittable scan + schema-on-read
    raw = (
        spark.read.format("fourmc").load(input_dir)
        .select(F.split("value", "\t").alias("f"))
        .select(
            F.col("f")[0].cast("long").alias("doc_id"),
            F.col("f")[1].alias("source"),
            F.col("f")[2].alias("text"),
        )
    )

    # line-level cleaning (multi-line view: sentence breaks -> newlines)
    cleaned = T.c4_line_clean(
        raw.withColumn(
            "text", F.expr("replace(text, '. ', concat('.', char(10)))")
        ),
        min_words=3,
    ).select("doc_id", F.col("clean_text").alias("text"))
    cleaned = cleaned.join(raw.select("doc_id", "source"), "doc_id")

    # model-based quality gate
    scored = T.hashed_classifier_score(cleaned)
    kept = cleaned.join(
        scored.where(F.col("keep")).select("doc_id"), "doc_id"
    )

    # exact dedup: drop every copy but the keeper
    groups = dedup.exact_dedup(kept)
    kept = kept.join(
        groups.select(F.col("keep_id").alias("doc_id")).union(
            kept.select(F.md5("text").alias("h"), "doc_id")
            .join(groups.select(F.col("content_hash").alias("h")), "h", "left_anti")
            .select("doc_id")
        ).distinct(),
        "doc_id",
    )

    # near-dedup (drop the larger id of each confirmed pair)
    pairs = dedup.minhash_lsh_pairs(kept, threshold=0.8)
    kept = kept.join(
        pairs.select(F.col("b_id").alias("doc_id")).distinct(),
        "doc_id", "left_anti",
    )

    # chunk + pack into fixed-budget sequences
    chunks = curation.chunk_documents(kept, chunk_chars=512, overlap=64)
    packed = curation.pack_sequences(kept, capacity=2048)

    # tokenize: train a BPE merge table on the CURATED corpus, encode it,
    # and pack the token streams into fixed-length training sequences —
    # the terminal step a pretraining pipeline feeds to the trainer
    merges = T.bpe_learn(kept, n_merges=32)
    encoded = T.bpe_encode(kept, merges)
    token_seqs = curation.pack_token_sequences(
        encoded.join(kept.select("doc_id", "source"), "doc_id"), seq_len=512
    )

    # write the curated corpus as splittable 4mz. The sink is
    # line-oriented: embedded newlines (from the line cleaner) must be
    # collapsed or each document would read back as several records.
    (
        kept.withColumn("text", F.regexp_replace("text", "\n", " "))
        .select(F.concat_ws("\t", "doc_id", "source", "text").alias("value"))
        .write.format("fourmc")
        .option("codec", "zstd").option("level", "medium")
        .mode("overwrite").save(output_dir)
    )

    stats = {
        "input_docs": raw.count(),
        "after_clean": cleaned.count(),
        "after_quality_gate": scored.where(F.col("keep")).count(),
        "near_dup_dropped": pairs.select("b_id").distinct().count(),
        "curated_docs": kept.count(),
        "chunks": chunks.count(),
        "packed_sequences": packed.count(),
        "bpe_merges": merges.count(),
        "token_sequences": token_seqs.count(),
        "output_files": len(
            [f for f in os.listdir(output_dir) if f.endswith(".4mz")]
        ),
    }
    return stats


def main() -> None:
    from fourmc_spark.session import get_spark

    spark = get_spark("curate-corpus-example", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = None
    if len(sys.argv) >= 3:
        input_dir, output_dir = sys.argv[1], sys.argv[2]
    else:
        tmp = tempfile.mkdtemp(prefix="fourmc-example-")
        input_dir = os.path.join(tmp, "raw")
        output_dir = os.path.join(tmp, "curated")
        print(f"no args: synthesizing demo corpus under {tmp}")
        synthesize_input(spark, input_dir)
    try:
        stats = curate(spark, input_dir, output_dir)
        for k, v in stats.items():
            print(f"{k}: {v}")
    finally:
        spark.stop()
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
