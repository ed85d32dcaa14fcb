"""CLI parity tests (reference: native/4mccli.c + native/4mc.c T1/T2).

Round-trips through our CLI, cross-validates against the reference's
prebuilt binary, and exercises the error paths (-f gating, corrupt
files, footer mismatch detection).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from fourmc_spark.cli import main

REF_CLI = "/root/reference/tool/linux/amd64/4mc"
DATA = (b"the quick brown fox jumps over the lazy dog\n" * 5000
        + os.urandom(64 * 1024))  # compressible + incompressible mix


def run_cli(*args: str) -> int:
    return main(list(args))


@pytest.fixture()
def sample(tmp_path):
    p = str(tmp_path / "in.bin")
    with open(p, "wb") as f:
        f.write(DATA)
    return p


@pytest.mark.parametrize("codec_flag,ext", [((), ".4mc"), (("-z",), ".4mz")])
@pytest.mark.parametrize("level", ["-1", "-2", "-3", "-4"])
def test_roundtrip_all_levels(sample, tmp_path, codec_flag, ext, level):
    comp = sample + ext
    assert run_cli(*codec_flag, level, sample, comp) == 0
    assert run_cli("-t", comp) == 0
    out = str(tmp_path / "out.bin")
    assert run_cli("-d", comp, out) == 0
    assert open(out, "rb").read() == DATA


def test_default_output_names(sample, tmp_path):
    assert run_cli(sample) == 0
    assert os.path.exists(sample + ".4mc")
    # decompress derives name by stripping the extension; original still
    # present → needs -f
    assert run_cli("-d", sample + ".4mc") == 1
    assert run_cli("-d", "-f", sample + ".4mc") == 0
    assert open(sample, "rb").read() == DATA


def test_overwrite_gate(sample):
    assert run_cli(sample) == 0
    assert run_cli(sample) == 1          # exists, no -f
    assert run_cli("-f", sample) == 0    # -f overwrites


def test_stdin_stdout_pipe(sample, tmp_path, capfdbinary):
    """Pipe mode: compress stdin→stdout via a subprocess, then verify."""
    comp = str(tmp_path / "piped.4mz")
    with open(sample, "rb") as fin, open(comp, "wb") as fout:
        rc = subprocess.run(
            [sys.executable, "-m", "fourmc_spark", "-z", "-2", "-", "-"],
            stdin=fin, stdout=fout, stderr=subprocess.DEVNULL,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).returncode
    assert rc == 0
    assert run_cli("-t", comp) == 0
    with open(comp, "rb") as f:
        head = f.read(4)
    assert head == b"4MZ\0"


@pytest.mark.skipif(not os.path.exists(REF_CLI), reason="reference CLI absent")
def test_reference_cli_reads_ours(sample, tmp_path):
    for flags, ext, ref_flags in [((), ".4mc", []), (("-z",), ".4mz", ["-z"])]:
        comp = sample + ext
        assert run_cli(*flags, "-3", sample, comp) == 0
        rc = subprocess.run(
            [REF_CLI, "-f", *ref_flags, "-t", comp],
            capture_output=True,
        ).returncode
        assert rc == 0, f"reference CLI rejected {comp}"


@pytest.mark.skipif(not os.path.exists(REF_CLI), reason="reference CLI absent")
def test_we_read_reference_cli_output(sample, tmp_path):
    for ref_flags, ext in [([], ".4mc"), (["-z"], ".4mz")]:
        comp = str(tmp_path / ("ref" + ext))
        rc = subprocess.run(
            [REF_CLI, "-f", *ref_flags, "-2", sample, comp],
            capture_output=True,
        ).returncode
        assert rc == 0
        out = str(tmp_path / ("back" + ext + ".bin"))
        assert run_cli("-d", "-f", comp, out) == 0
        assert open(out, "rb").read() == DATA
        assert run_cli("-t", comp) == 0


def test_detects_corrupt_block(sample, tmp_path):
    comp = sample + ".4mc"
    assert run_cli(sample) == 0
    blob = bytearray(open(comp, "rb").read())
    blob[len(blob) // 2] ^= 0xFF  # flip a byte mid-stream
    bad = str(tmp_path / "bad.4mc")
    open(bad, "wb").write(bytes(blob))
    assert run_cli("-t", bad) == 1


def test_detects_truncated_footer(sample, tmp_path):
    comp = sample + ".4mz"
    assert run_cli("-z", sample, comp) == 0
    blob = open(comp, "rb").read()
    bad = str(tmp_path / "trunc.4mz")
    open(bad, "wb").write(blob[:-7])
    assert run_cli("-t", bad) == 1


def test_usage_errors(tmp_path):
    assert run_cli() == 2
    assert run_cli("-x", "whatever") == 2
    assert run_cli(str(tmp_path / "missing.bin")) == 1


def test_cli_version_flag():
    from fourmc_spark.cli import main

    assert main(["-V"]) == 0


def test_cli_extension_infers_decompress(tmp_path):
    from fourmc_spark.cli import main
    from fourmc_spark.format import write_file

    data = b"one\ntwo\nthree\n" * 100
    p = str(tmp_path / "x.4mc")
    write_file(p, data, codec="lz4")
    out = str(tmp_path / "x")
    # no -d: the .4mc extension selects decompression (reference
    # 4mccli.c:145 default)
    assert main([p, out]) == 0
    assert open(out, "rb").read() == data
    # explicit output avoids prompting; verbose/quiet accepted
    assert main(["-v", "-q", "-f", p, out]) == 0
