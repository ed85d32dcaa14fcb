"""Dataset maintenance: small-file compaction and layout stats.

The small-files problem is the death of 100 TB pipelines: a streaming
ingest that seals a 4mc file per micro-batch per task leaves millions of
KB-sized files, and every downstream scan pays one task + one footer read
per file. Compaction rewrites them into few, large, still-splittable
files — planning cost drops from O(files) to O(bytes / target_size),
and the write amplification is paid once (the same compress-once-scan-many
economics as the reference's codec-level guidance, Readme.md:98-101).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

from fourmc_spark.sources.datasource import _list_files

__all__ = ["compact", "compact_partitioned", "layout_stats"]


def layout_stats(path: str) -> dict:
    """File-layout health of a 4mc/4mz/zst dataset directory: counts,
    bytes, and block counts straight from the footers (one ranged read per
    file — the same metadata the split planner touches, no data bytes)."""
    from fourmc_spark.format import scan_file_info

    files = _list_files(path)
    sizes = [os.path.getsize(f) for f in files]
    blocks = 0
    for f in files:
        if f.endswith(".zst"):
            blocks += 1  # no index; planned as one partition
        else:
            _, _, offsets = scan_file_info(f)
            blocks += len(offsets)
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes, default=0),
        "max_bytes": max(sizes, default=0),
        "n_blocks": blocks,
    }


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    codec: str = "zstd",
    level: str = "high",
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Rewrite many small files into ~``target_file_bytes`` sealed files.

    Returns the number of output partitions (= files). Scale shape:

    * the scan plans block-aligned partitions as usual (parallel read);
    * `coalesce` merges read partitions WITHOUT a shuffle — each output
      task streams several input partitions end-to-end;
    * the sink writes one sealed file per output task with atomic commit.

    ``target_file_bytes`` is compared against the INPUT's compressed size;
    recompression at a different level changes output sizes proportionally
    (compact is the natural place to raise the codec level: these files
    are written once and scanned forever after).
    """
    stats = layout_stats(in_path)
    if stats["n_files"] == 0:
        raise ValueError(f"no 4mc/4mz/zst files under {in_path!r}")
    n_out = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    df = spark.read.format("fourmc").load(in_path)
    (
        df.select("value")
        .coalesce(n_out)
        .write.format("fourmc")
        .option("codec", codec)
        .option("level", level)
        .mode("overwrite")
        .save(out_path)
    )
    return n_out


def compact_partitioned(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    partition_cols: list[str],
    codec: str = "zstd",
    level: str = "high",
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Partition-preserving compaction of a hive-layout dataset.

    Reads with `partitioncolumns` (values rebuilt from paths), repartitions
    by the partition columns so each output task holds whole partitions,
    and writes back with `partitionby` — the `key=value/` layout survives,
    small files per partition collapse. One shuffle, keyed by the partition
    columns; AQE coalesces the output to ~target-size tasks.
    """
    stats = layout_stats(in_path)
    if stats["n_files"] == 0:
        raise ValueError(f"no 4mc/4mz/zst files under {in_path!r}")
    n_out = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    df = spark.read.format("fourmc").option(
        "partitioncolumns", ",".join(partition_cols)
    ).load(in_path)
    (
        df.select("value", *partition_cols)
        .repartition(n_out, *partition_cols)
        .write.format("fourmc")
        .option("codec", codec)
        .option("level", level)
        .option("partitionby", ",".join(partition_cols))
        .mode("overwrite")
        .save(out_path)
    )
    return n_out
