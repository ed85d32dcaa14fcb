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


@pytest.mark.parametrize("codec,zflag", [("lz4", []), ("zstd", ["-z"])])
def test_we_read_reference_cli_files(tmp_path, codec, zflag):
    plain = str(tmp_path / "plain.txt")
    open(plain, "wb").write(DATA)
    ext = ".4mc" if codec == "lz4" else ".4mz"
    made = str(tmp_path / f"ref{ext}")
    r = _run(CLI, "-f", *zflag, plain, made)
    assert r.returncode == 0, r.stderr.decode()
    assert reader.decompress_file(made) == DATA
