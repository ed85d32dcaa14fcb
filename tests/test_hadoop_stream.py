"""Straight block-codec containers (Hadoop BlockCompressorStream — the
reference's Lz4Codec/ZstdCodec M/R intermediate format) through the
format layer and the Spark DataSource."""

import os
import struct

import pytest

from fourmc_spark.format.hadoop_stream import (
    HADOOP_EXTS,
    iter_hadoop_blocks,
    read_hadoop_file,
    write_hadoop_file,
)
from fourmc_spark.format.native import lz4_compress_raw
from fourmc_spark.format.writer import HadoopBlockWriter


TEXT = ("\n".join(f"row-{i} payload {'x' * (i % 37)}" for i in range(20000)) + "\n").encode()


@pytest.mark.parametrize("ext", sorted(HADOOP_EXTS))
def test_roundtrip_every_extension(tmp_path, ext):
    codec, level = HADOOP_EXTS[ext]
    p = str(tmp_path / f"data.{ext}")
    write_hadoop_file(p, TEXT, codec, level)
    assert read_hadoop_file(p) == TEXT
    # header sanity: first block frames its original length
    with open(p, "rb") as f:
        orig_len, chunk_len = struct.unpack(">ii", f.read(8))
    assert 0 < orig_len <= len(TEXT)
    assert 0 < chunk_len <= os.path.getsize(p)


def test_streaming_writer_matches_oneshot(tmp_path):
    p1 = str(tmp_path / "a.lz4_fast")
    p2 = str(tmp_path / "b.lz4_fast")
    write_hadoop_file(p1, TEXT, "lz4", "fast")
    with open(p2, "wb") as f:
        with HadoopBlockWriter(f, codec="lz4", level="fast") as w:
            for off in range(0, len(TEXT), 9973):  # ragged writes
                w.write(TEXT[off : off + 9973])
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_multi_chunk_block_decodes(tmp_path):
    # hand-craft a block whose original length spans TWO chunks — the
    # shape BlockCompressorStream emits for writes larger than its buffer
    a, b = b"alpha" * 1000, b"beta" * 1500
    ca, cb = lz4_compress_raw(a, 0), lz4_compress_raw(b, 0)
    p = str(tmp_path / "multi.lz4_fast")
    with open(p, "wb") as f:
        f.write(struct.pack(">i", len(a) + len(b)))
        f.write(struct.pack(">i", len(ca)) + ca)
        f.write(struct.pack(">i", len(cb)) + cb)
    assert read_hadoop_file(p) == a + b


@pytest.mark.parametrize("mutilate", ["header", "chunk_header", "payload"])
def test_truncation_detected(tmp_path, mutilate):
    p = str(tmp_path / "t.zstd_fast")
    write_hadoop_file(p, TEXT, "zstd", "fast")
    data = open(p, "rb").read()
    cut = {"header": 2, "chunk_header": 6, "payload": 100}[mutilate]
    open(p, "wb").write(data[:cut])
    with pytest.raises(ValueError):
        read_hadoop_file(p)


def test_implausible_sizes_rejected(tmp_path):
    p = str(tmp_path / "bad.lz4_fast")
    with open(p, "wb") as f:
        f.write(struct.pack(">i", 1 << 30))  # 1 GiB block claim
        f.write(struct.pack(">i", 4) + b"zzzz")
    with pytest.raises(ValueError):
        with open(p, "rb") as f:
            list(iter_hadoop_blocks(f, "lz4"))


def test_spark_scan_and_sink(spark, tmp_path):
    # sink writes the container, scan reads it back — both directions of
    # the M/R interop surface, including line reassembly across blocks
    from pyspark.sql import functions as F

    df = spark.range(30000).select(
        F.concat(F.lit("r"), F.col("id"), F.lit("-"), F.md5(F.col("id").cast("string"))).alias("value")
    )
    out = str(tmp_path / "hsink")
    (
        df.write.format("fourmc").option("codec", "zstd_mc")
        .mode("overwrite").save(out)
    )
    names = [n for n in os.listdir(out) if n.endswith(".zstd_mc")]
    assert names, os.listdir(out)
    back = spark.read.format("fourmc").load(out)
    assert back.count() == 30000
    assert df.select("value").exceptAll(back.select("value")).count() == 0

    # small-block file exercises block-boundary line carry on scan
    p = str(tmp_path / "tiny.lz4_hc")
    with open(p, "wb") as f:
        with HadoopBlockWriter(f, codec="lz4", level="high", block_size=512) as w:
            w.write(TEXT)
    got = spark.read.format("fourmc").load(p)
    assert got.count() == TEXT.decode().count("\n")
    first = got.orderBy("offset").first()
    assert first["value"] == "row-0 payload "
