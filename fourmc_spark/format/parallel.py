"""Parallel block codec paths for 4mc/4mz files.

Every block in the container is independently compressed and framed
(`4mc-format-spec:23-27`) — the same property that makes a file splittable
across executors (SURVEY.md §2.1 S1) lets a single node decode or encode
one file on all cores with no format change.  The reference keeps its CLI
single-threaded (`native/4mc.c:220-389` is one read→compress→write loop);
this module is the multicore twin: identical bytes out, N× the speed.

The C codec calls release the GIL (ctypes), so a plain thread pool scales
near-linearly; the output buffer is preallocated once and every worker
writes its slice in place via the zero-copy ``*_at`` bindings in
:mod:`.native`.
"""

from __future__ import annotations

import os
import struct
from concurrent.futures import ThreadPoolExecutor
from typing import BinaryIO, Iterator

from . import core
from .native import lz4_decompress_at, xxh32_at, zstd_decompress_at

__all__ = [
    "decompress_file_parallel",
    "iter_decoded_windows",
    "default_threads",
]

_DEFAULT_WINDOW = 64 << 20  # compressed bytes per bounded-memory window


def default_threads() -> int:
    return os.cpu_count() or 4


def _block_extents(offsets: list[int], file_size: int) -> list[int]:
    """End offset of every block, derived from the footer index alone.

    Block *i* ends where block *i+1* starts; the last block ends at the
    EOS marker, whose position follows from the footer size
    (``footerSize = 20 + 4*nblocks``, `4mc-format-spec:29-35`).
    """
    footer_size = 20 + 4 * len(offsets)
    eos_start = file_size - footer_size - core.BLOCK_HEADER_SIZE
    return offsets[1:] + [eos_start]


def _parse_blocks(
    buf, offsets: list[int], ends: list[int], base: int
) -> list[tuple[int, int, int, int, bool]]:
    """Parse block headers inside *buf* (file bytes starting at *base*).

    Returns ``(payload_off, usize, csize, checksum, stored_raw)`` per block
    and cross-checks each block's framed size against the footer-derived
    extent — the decoder's index/stream consistency check
    (`native/4mc.c:560-707`).
    """
    blocks = []
    for off, end in zip(offsets, ends):
        rel = off - base
        usize, csize, checksum = struct.unpack_from(">III", buf, rel)
        if usize > core.MAX_BLOCK_SIZE:
            raise core.BadBlockError(
                f"block uncompressed size {usize} exceeds 4 MiB cap"
            )
        if csize > core.MAX_BLOCK_SIZE:
            raise core.BadBlockError(f"block compressed size {csize} exceeds cap")
        if off + core.BLOCK_HEADER_SIZE + csize != end:
            raise core.BadFooterError(
                f"block at {off} frames {csize} payload bytes but the footer "
                f"index places the next block at {end}"
            )
        blocks.append((rel + core.BLOCK_HEADER_SIZE, usize, csize, checksum, csize == usize))
    return blocks


def _decode_blocks_into(
    src,
    blocks: list[tuple[int, int, int, int, bool]],
    out: bytearray,
    out_offs: list[int],
    codec: str,
    pool: ThreadPoolExecutor,
    verify: bool,
) -> None:
    def work(i: int) -> None:
        poff, usize, csize, checksum, raw = blocks[i]
        if verify and xxh32_at(src, poff, csize) != checksum:
            raise core.BadBlockError("block checksum mismatch")
        ooff = out_offs[i]
        try:
            if raw:
                out[ooff : ooff + usize] = memoryview(src)[poff : poff + csize]
            elif codec == "lz4":
                lz4_decompress_at(src, poff, csize, out, ooff, usize)
            else:
                zstd_decompress_at(src, poff, csize, out, ooff, usize)
        except core.FourMcFormatError:
            raise
        except ValueError as e:
            raise core.BadBlockError(str(e)) from e

    # pool.map propagates the first worker exception
    list(pool.map(work, range(len(blocks))))


def decompress_file_parallel(
    path: str, threads: int | None = None, verify: bool = True
) -> bytearray:
    """Whole-file decode on *threads* cores (default: all).

    Single-shot: reads the compressed file once, preallocates the exact
    output size from the block headers, and decodes every block in place
    concurrently.  Peak memory = compressed + uncompressed size; use
    :func:`iter_decoded_windows` for bounded-memory streaming.
    """
    threads = threads or default_threads()
    with open(path, "rb") as f:
        data = f.read()
    size = len(data)
    magic = core.decode_header(data[:core.HEADER_SIZE])
    codec = core.codec_for_magic(magic)
    offsets = core.decode_footer(data, magic, size)
    ends = _block_extents(offsets, size)
    if offsets and offsets[0] != core.HEADER_SIZE:
        raise core.BadFooterError(f"first block at {offsets[0]}, expected 12")
    eos_start = ends[-1] if offsets else core.HEADER_SIZE
    if data[eos_start : eos_start + core.BLOCK_HEADER_SIZE] != core.EOS_MARKER:
        raise core.BadBlockError("missing EOS marker before footer")
    blocks = _parse_blocks(data, offsets, ends, base=0)
    out_offs = [0] * len(blocks)
    total = 0
    for i, b in enumerate(blocks):
        out_offs[i] = total
        total += b[1]
    # uninitialized output buffer: every byte is written by exactly one
    # block decode, so bytearray's mandatory zero-fill is a pure second
    # pass over the whole output (~35% of single-thread decode time)
    try:
        import numpy as _np

        out = _np.empty(total, dtype=_np.uint8)
    except ImportError:  # pragma: no cover
        out = bytearray(total)
    if blocks:
        if threads <= 1:
            # sequential twin of the pool path — same zero-copy decode
            # into the preallocated buffer, no executor dispatch
            for i in range(len(blocks)):
                poff, usize, csize, checksum, raw = blocks[i]
                if verify and xxh32_at(data, poff, csize) != checksum:
                    raise core.BadBlockError("block checksum mismatch")
                ooff = out_offs[i]
                try:
                    if raw:
                        out[ooff : ooff + usize] = memoryview(data)[
                            poff : poff + csize
                        ]
                    elif codec == "lz4":
                        lz4_decompress_at(data, poff, csize, out, ooff, usize)
                    else:
                        zstd_decompress_at(data, poff, csize, out, ooff, usize)
                except core.FourMcFormatError:
                    raise
                except ValueError as e:
                    raise core.BadBlockError(str(e)) from e
        else:
            with ThreadPoolExecutor(max_workers=min(threads, len(blocks))) as pool:
                _decode_blocks_into(data, blocks, out, out_offs, codec, pool, verify)
    # memoryview: bytes-like (len/slice/== bytes) without copying; callers
    # needing an owned copy take bytes(result)
    return memoryview(out) if not isinstance(out, bytearray) else out


def iter_decoded_windows(
    f: BinaryIO,
    threads: int | None = None,
    verify: bool = True,
    window_bytes: int = _DEFAULT_WINDOW,
) -> Iterator[bytearray]:
    """Bounded-memory parallel decode: yields decompressed spans in file
    order, reading at most ~*window_bytes* of compressed data at a time.

    The footer index alone determines every block's extent, so windows are
    planned without touching block headers (one tail read, then strictly
    sequential forward reads — object-store friendly).
    """
    threads = threads or default_threads()
    from .reader import read_index

    f.seek(0, os.SEEK_END)
    size = f.tell()
    magic, index = read_index(f, size)
    codec = core.codec_for_magic(magic)
    offsets = index.offsets
    if not offsets:
        return
    ends = _block_extents(offsets, size)
    with ThreadPoolExecutor(max_workers=threads) as pool:
        i = 0
        n = len(offsets)
        while i < n:
            j = i + 1
            while j < n and ends[j - 1] - offsets[i] < window_bytes:
                j += 1
            start, stop = offsets[i], ends[j - 1]
            f.seek(start)
            buf = f.read(stop - start)
            if len(buf) != stop - start:
                raise core.BadBlockError("truncated block span")
            blocks = _parse_blocks(buf, offsets[i:j], ends[i:j], base=start)
            out_offs = [0] * len(blocks)
            total = 0
            for k, b in enumerate(blocks):
                out_offs[k] = total
                total += b[1]
            try:
                import numpy as _np

                out = _np.empty(total, dtype=_np.uint8)  # no zero-fill pass
            except ImportError:  # pragma: no cover
                out = bytearray(total)
            _decode_blocks_into(buf, blocks, out, out_offs, codec, pool, verify)
            yield memoryview(out) if not isinstance(out, bytearray) else out
            i = j
