"""Parallel block codec paths (format/parallel.py, writer workers=).

The invariant under test: parallelism is an execution detail — the
parallel writer must produce *byte-identical* files to the serial one,
and every parallel decode path must return exactly the serial bytes.
Corruption must still fail fast (the checksum / extent chain of
`native/4mc.c:560-707` is preserved).
"""

from __future__ import annotations

import io
import os

import pytest

from fourmc_spark.format import (
    compress_bytes,
    core,
    decompress_file,
    decompress_file_parallel,
    iter_decoded_windows,
    write_file,
)

BLOBS = {
    "empty": b"",
    "tiny": b"x",
    "one_line": b"hello world\n",
    "text": b"the quick brown fox jumps over the lazy dog 0123456789\n" * 9000,
    "incompressible": os.urandom(600_000),
    "mixed": (b"abc\n" * 200_000) + os.urandom(300_000) + (b"tail\n" * 50_000),
}


@pytest.mark.parametrize("codec", ["lz4", "zstd"])
@pytest.mark.parametrize("name", sorted(BLOBS))
def test_parallel_writer_byte_identical(tmp_path, codec, name):
    data = BLOBS[name]
    ps = tmp_path / "serial"
    pp = tmp_path / "parallel"
    write_file(str(ps), data, codec=codec, level="fast", block_size=65536)
    write_file(str(pp), data, codec=codec, level="fast", block_size=65536, workers=8)
    assert ps.read_bytes() == pp.read_bytes()


@pytest.mark.parametrize("codec", ["lz4", "zstd"])
@pytest.mark.parametrize("name", sorted(BLOBS))
def test_parallel_decode_matches_serial(tmp_path, codec, name):
    data = BLOBS[name]
    p = tmp_path / "f"
    write_file(str(p), data, codec=codec, level="medium", block_size=65536, workers=4)
    assert bytes(decompress_file(str(p))) == data
    assert bytes(decompress_file_parallel(str(p), threads=8)) == data
    # threads= passthrough on the public helper
    assert bytes(decompress_file(str(p), threads=8)) == data


@pytest.mark.parametrize("window", [1, 100_000, 1 << 26])
def test_windowed_decode_all_window_sizes(tmp_path, window):
    data = BLOBS["mixed"]
    p = tmp_path / "f"
    write_file(str(p), data, codec="lz4", block_size=65536)
    with open(p, "rb") as f:
        got = b"".join(bytes(w) for w in iter_decoded_windows(f, threads=4, window_bytes=window))
    assert got == data


def test_parallel_decode_detects_corruption(tmp_path):
    data = BLOBS["text"]
    p = tmp_path / "f"
    write_file(str(p), data, codec="lz4", block_size=65536)
    raw = bytearray(p.read_bytes())
    # flip one payload byte in the middle of the file
    raw[len(raw) // 2] ^= 0xFF
    p.write_bytes(bytes(raw))
    with pytest.raises(core.FourMcFormatError):
        decompress_file_parallel(str(p), threads=4)


def test_parallel_decode_detects_footer_stream_mismatch(tmp_path):
    data = BLOBS["text"]
    p = tmp_path / "f"
    write_file(str(p), data, codec="lz4", block_size=65536)
    raw = bytearray(p.read_bytes())
    # corrupt the first block's compressedSize field: the footer-derived
    # extent no longer matches the framed size
    csize_off = core.HEADER_SIZE + 4
    raw[csize_off : csize_off + 4] = (999999).to_bytes(4, "big")
    p.write_bytes(bytes(raw))
    with pytest.raises(core.FourMcFormatError):
        decompress_file_parallel(str(p), threads=4, verify=False)


def test_parallel_writer_streaming_write_pattern(tmp_path):
    """Many small writes through the pipelined writer == one big write."""
    from fourmc_spark.format.writer import FourMcWriter

    data = BLOBS["mixed"]
    buf_a, buf_b = io.BytesIO(), io.BytesIO()
    with FourMcWriter(buf_a, codec="zstd", block_size=65536, workers=6) as w:
        for i in range(0, len(data), 7919):
            w.write(data[i : i + 7919])
    with FourMcWriter(buf_b, codec="zstd", block_size=65536) as w:
        w.write(data)
    assert buf_a.getvalue() == buf_b.getvalue()
    assert compress_bytes(data, codec="zstd", block_size=65536) == buf_b.getvalue()


def test_cli_parallel_roundtrip(tmp_path, capsys):
    from fourmc_spark.cli import main

    src = tmp_path / "in.bin"
    src.write_bytes(BLOBS["mixed"])
    out = tmp_path / "out.4mz"
    back = tmp_path / "back.bin"
    assert main(["-z", "-2", "-p4", "-f", str(src), str(out)]) == 0
    assert main(["-t", "-p4", str(out)]) == 0
    assert main(["-d", "-p4", "-f", str(out), str(back)]) == 0
    assert back.read_bytes() == BLOBS["mixed"]
    # -p output identical to serial output
    out2 = tmp_path / "out2.4mz"
    assert main(["-z", "-2", "-f", str(src), str(out2)]) == 0
    assert out.read_bytes() == out2.read_bytes()
