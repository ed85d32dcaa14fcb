"""Golden cross-validation against the reference's prebuilt CLI binary
(`/root/reference/tool/linux/amd64/4mc`): our writer's output must verify
and decode with the reference tool, and our reader must decode files the
reference tool produced (SURVEY.md §5 item 3)."""

import os
import shutil
import subprocess

import pytest

from fourmc_spark.format import reader, writer

CLI = "/root/reference/tool/linux/amd64/4mc"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CLI) and os.access(CLI, os.X_OK)),
    reason="reference CLI binary not available",
)

DATA = b"".join(f"line {i} repeated words lorem ipsum dolor\n".encode() for i in range(30000))


def _run(*args):
    return subprocess.run(list(args), capture_output=True, timeout=120)


@pytest.mark.parametrize("codec,zflag", [("lz4", []), ("zstd", ["-z"])])
@pytest.mark.parametrize("level", ["fast", "high"])
def test_reference_cli_verifies_our_files(tmp_path, codec, zflag, level):
    ext = ".4mc" if codec == "lz4" else ".4mz"
    path = str(tmp_path / f"ours{ext}")
    writer.write_file(path, DATA, codec=codec, level=level, block_size=1 << 20)
    # -t decompresses to the null device verifying every checksum + footer
    r = _run(CLI, "-f", *zflag, "-t", path)
    assert r.returncode == 0, r.stderr.decode()
    # full decode must reproduce the original bytes
    out = str(tmp_path / "rt.txt")
    r = _run(CLI, "-f", *zflag, "-d", path, out)
    assert r.returncode == 0, r.stderr.decode()
    assert open(out, "rb").read() == DATA


def test_reference_cli_verifies_stream_sink_files(spark, tmp_path):
    """The STREAMING sink's sealed files (stream_4mc_sink's write leg:
    per-task seal, staged rename on commit) must verify with the
    reference's prebuilt binary — the same K1 byte-compat claim the
    batch-writer tests pin, extended to the writeStream path."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(20_000).select(
        F.concat(F.lit("streamed row "), F.col("id")).alias("value")
    ).write.mode("overwrite").parquet(src)
    sdf = spark.readStream.schema(
        StructType([StructField("value", StringType())])
    ).parquet(src)
    q = (
        sdf.writeStream.format("fourmc")
        .option("codec", "zstd").option("level", "medium")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    sealed = [fn for fn in os.listdir(out) if fn.endswith(".4mz")]
    assert sealed, "stream sink sealed no files"
    total = b""
    for fn in sorted(sealed):
        p = os.path.join(out, fn)
        r = _run(CLI, "-f", "-z", "-t", p)
        assert r.returncode == 0, r.stderr.decode()
        total += reader.decompress_file(p)
    assert sorted(total.decode().splitlines()) == sorted(
        f"streamed row {i}" for i in range(20_000)
    )


@pytest.mark.parametrize("codec,zflag", [("lz4", []), ("zstd", ["-z"])])
def test_we_read_reference_cli_files(tmp_path, codec, zflag):
    plain = str(tmp_path / "plain.txt")
    open(plain, "wb").write(DATA)
    ext = ".4mc" if codec == "lz4" else ".4mz"
    made = str(tmp_path / f"ref{ext}")
    r = _run(CLI, "-f", *zflag, plain, made)
    assert r.returncode == 0, r.stderr.decode()
    assert reader.decompress_file(made) == DATA
