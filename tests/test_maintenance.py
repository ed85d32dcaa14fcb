"""Compaction: many small sealed files -> few large splittable ones,
content-preserving, reference-CLI-conformant output."""

import os
import subprocess

from pyspark.sql import functions as F

REF_CLI = "/root/reference/tool/linux/amd64/4mc"


def test_compact_small_files(spark, tmp_path):
    from fourmc_spark.operators.maintenance import compact, layout_stats

    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    df = spark.range(50_000).select(
        F.concat(F.lit("row-"), F.col("id")).alias("value")
    )
    # simulate a streaming ingest's droppings: one file per partition x 16
    df.repartition(16).write.format("fourmc").option("codec", "lz4") \
        .option("level", "fast").mode("overwrite").save(small)
    before = layout_stats(small)
    assert before["n_files"] == 16

    n_out = compact(spark, small, big, codec="zstd", level="high",
                    target_file_bytes=before["total_bytes"])  # -> 1 file
    after = layout_stats(big)
    assert n_out == 1
    assert after["n_files"] == 1
    assert after["max_bytes"] < before["total_bytes"]  # recompressed smaller

    # content multiset preserved
    a = spark.read.format("fourmc").load(small).select("value")
    b = spark.read.format("fourmc").load(big).select("value")
    assert b.count() == 50_000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # compacted output verifies under the reference binary (zstd -> -z -t)
    if os.path.exists(REF_CLI):
        for f in os.listdir(big):
            if f.endswith(".4mz"):
                p = subprocess.run([REF_CLI, "-f", "-z", "-t", os.path.join(big, f)],
                                   capture_output=True)
                assert p.returncode == 0, p.stderr.decode()


def test_layout_stats_counts_blocks(spark, tmp_path):
    from fourmc_spark.format import write_file
    from fourmc_spark.operators.maintenance import layout_stats

    d = tmp_path / "ds"
    d.mkdir()
    data = b"x" * 300_000
    write_file(str(d / "a.4mc"), data, codec="lz4", block_size=65536)
    write_file(str(d / "b.4mz"), data, codec="zstd", block_size=65536)
    s = layout_stats(str(d))
    assert s["n_files"] == 2
    # ceil(300000/65536) = 5 blocks each
    assert s["n_blocks"] == 10


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    from fourmc_spark.operators.maintenance import compact_partitioned, layout_stats

    small = str(tmp_path / "psmall")
    big = str(tmp_path / "pbig")
    df = spark.range(8_000).select(
        F.concat(F.lit("r"), F.col("id")).alias("value"),
        (F.col("id") % 3).cast("string").alias("part"),
    )
    # 8 tasks x 3 partitions = up to 24 small files
    df.repartition(8).write.format("fourmc").option("codec", "lz4") \
        .option("partitionby", "part").mode("overwrite").save(small)
    assert layout_stats(small)["n_files"] > 3

    compact_partitioned(spark, small, big, ["part"],
                        target_file_bytes=1 << 30)
    after = layout_stats(big)
    assert after["n_files"] == 3  # one file per partition value
    import os as _os
    assert sorted(
        d for d in _os.listdir(big) if d.startswith("part=")
    ) == ["part=0", "part=1", "part=2"]

    a = spark.read.format("fourmc").option("partitioncolumns", "part").load(small)
    b = spark.read.format("fourmc").option("partitioncolumns", "part").load(big)
    assert b.count() == 8_000
    assert a.select("value", "part").exceptAll(b.select("value", "part")).count() == 0
