"""4mc/4mz container format: constants, framing, and the block index.

Byte layout re-implemented from the public format specs
(`/root/reference/4mc-format-spec`, `4mz-format-spec`) and pinned against
the reference writer (`FourMcOutputStream.java:69-137`, `native/4mc.c:300-365`):

    SIGN+HEADER   magic(4, BE) | version(4, BE=1) | xxh32(first 8 bytes, seed 0)
    BLOCK         uncompressedSize(4) | compressedSize(4) | xxh32(payload) | payload
                  (compressedSize == uncompressedSize => payload stored raw)
    EOS           12 zero bytes
    FOOTER        footerSize(4) | version(4) | delta offsets(4 each) |
                  footerSize(4) | magic(4) | xxh32(footer[:-4])

All integers big-endian.  Block offsets in the footer are deltas between
consecutive *absolute* block start positions; the first delta is the header
size (12).  Max uncompressed block size is 4 MiB (`FourMcCodec.java:86`).
"""

from __future__ import annotations

import struct
from bisect import bisect_left, bisect_right
from dataclasses import dataclass

from .native import xxh32

__all__ = [
    "MAGIC_4MC",
    "MAGIC_4MZ",
    "VERSION",
    "HEADER_SIZE",
    "BLOCK_HEADER_SIZE",
    "MAX_BLOCK_SIZE",
    "FourMcFormatError",
    "BadHeaderError",
    "BadFooterError",
    "BadBlockError",
    "BlockIndex",
    "NOT_FOUND",
    "encode_header",
    "decode_header",
    "encode_block",
    "encode_eos",
    "encode_footer",
    "decode_footer",
    "codec_for_magic",
    "extension_for_codec",
]

MAGIC_4MC = 0x344D4300  # "4MC\0"  (FourMcCodec.java:84)
MAGIC_4MZ = 0x344D5A00  # "4MZ\0"  (FourMzCodec.java:50)
VERSION = 1
HEADER_SIZE = 12
BLOCK_HEADER_SIZE = 12
EOS_MARKER = b"\x00" * 12
MAX_BLOCK_SIZE = 4 * 1024 * 1024  # FourMcCodec.java:86
NOT_FOUND = -1

_U32 = struct.Struct(">I")


class FourMcFormatError(ValueError):
    """Base error for malformed 4mc/4mz containers."""


class BadHeaderError(FourMcFormatError):
    pass


class BadFooterError(FourMcFormatError):
    pass


class BadBlockError(FourMcFormatError):
    pass


def codec_for_magic(magic: int) -> str:
    if magic == MAGIC_4MC:
        return "lz4"
    if magic == MAGIC_4MZ:
        return "zstd"
    raise BadHeaderError(f"unknown magic 0x{magic:08X}")


def extension_for_codec(codec: str) -> str:
    return ".4mc" if codec == "lz4" else ".4mz"


def magic_for_codec(codec: str) -> int:
    if codec == "lz4":
        return MAGIC_4MC
    if codec == "zstd":
        return MAGIC_4MZ
    raise ValueError(f"unknown codec {codec!r} (expected lz4|zstd)")


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------


def encode_header(magic: int) -> bytes:
    body = _U32.pack(magic) + _U32.pack(VERSION)
    return body + _U32.pack(xxh32(body))


def decode_header(buf: bytes) -> int:
    """Validate a 12-byte header; returns the magic (selects the codec)."""
    if len(buf) < HEADER_SIZE:
        raise BadHeaderError("file shorter than 4mc header")
    magic, version, checksum = struct.unpack(">III", buf[:HEADER_SIZE])
    if magic not in (MAGIC_4MC, MAGIC_4MZ):
        raise BadHeaderError(f"bad magic 0x{magic:08X}")
    if version != VERSION:
        raise BadHeaderError(f"unsupported version {version}")
    if xxh32(buf[:8]) != checksum:
        raise BadHeaderError("header checksum mismatch")
    return magic


def encode_block(uncompressed_size: int, payload: bytes, compressed: bool) -> bytes:
    """Frame one block. *payload* is the stored bytes (compressed or raw)."""
    stored_size = len(payload) if compressed else uncompressed_size
    return (
        _U32.pack(uncompressed_size)
        + _U32.pack(stored_size)
        + _U32.pack(xxh32(payload))
        + payload
    )


def encode_eos() -> bytes:
    return EOS_MARKER


def encode_footer(magic: int, block_offsets: list[int]) -> bytes:
    """Delta-encoded footer (FourMcOutputStream.java:112-129)."""
    footer_size = 20 + 4 * len(block_offsets)
    parts = [_U32.pack(footer_size), _U32.pack(VERSION)]
    prev = 0
    for off in block_offsets:
        parts.append(_U32.pack(off - prev))
        prev = off
    parts.append(_U32.pack(footer_size))
    parts.append(_U32.pack(magic))
    body = b"".join(parts)
    return body + _U32.pack(xxh32(body))


def decode_footer(tail: bytes, magic: int, file_size: int) -> list[int]:
    """Decode the footer from the file tail; returns absolute block offsets.

    *tail* must contain at least the whole footer (callers read 4 KiB from
    the end and retry bigger, like ``FourMcInputStream.readIndex``,
    ``FourMcInputStream.java:183-213``).
    """
    if len(tail) < 20:
        raise BadFooterError("file too short for 4mc footer")
    footer_size, file_magic, checksum = struct.unpack(">III", tail[-12:])
    if file_magic != magic:
        raise BadFooterError(
            f"bad footer magic 0x{file_magic:08X} (expected 0x{magic:08X})"
        )
    if footer_size > file_size or footer_size > len(tail):
        raise BadFooterError(
            f"footer size {footer_size} larger than available tail"
        )
    if footer_size < 20 or (footer_size - 20) % 4 != 0:
        raise BadFooterError(f"implausible footer size {footer_size}")
    footer = tail[-footer_size:]
    if xxh32(footer[:-4]) != checksum:
        raise BadFooterError("footer checksum mismatch")
    head_size, version = struct.unpack(">II", footer[:8])
    if head_size != footer_size:
        raise BadFooterError("footer size fields disagree")
    if version != VERSION:
        raise BadFooterError(f"unsupported footer version {version}")
    n_blocks = (footer_size - 20) // 4
    offsets: list[int] = []
    pos = 0
    for i in range(n_blocks):
        (delta,) = _U32.unpack_from(footer, 8 + 4 * i)
        pos += delta
        offsets.append(pos)
    return offsets


# ---------------------------------------------------------------------------
# block index (split planning arithmetic)
# ---------------------------------------------------------------------------


@dataclass
class BlockIndex:
    """Absolute block offsets + the reference's alignment arithmetic.

    Semantics pinned verbatim to ``FourMcBlockIndex.java:92-173`` and its
    unit vectors (``TestFourMcBlockIndex.java:41-84`` / FIXTURES.md F4).
    """

    offsets: list[int]

    def __len__(self) -> int:
        return len(self.offsets)

    def is_empty(self) -> bool:
        return not self.offsets

    def find_next_position(self, pos: int) -> int:
        """Smallest block offset >= pos, or NOT_FOUND."""
        i = bisect_left(self.offsets, pos)
        if i >= len(self.offsets):
            return NOT_FOUND
        return self.offsets[i]

    def find_belonging_block_index(self, pos: int) -> int:
        """Index of the block containing pos, or NOT_FOUND."""
        i = bisect_right(self.offsets, pos) - 1
        if i < 0 or i > len(self.offsets) - 1:
            return NOT_FOUND
        return i

    def align_slice_start(self, start: int, end: int) -> int:
        """Nudge a slice start forward to a block boundary in [start, end).

        start == 0 is left untouched (the file header precedes block 0);
        NOT_FOUND drops the slice entirely (FourMcBlockIndex.java:142-153).
        """
        if start != 0:
            new_start = self.find_next_position(start)
            if new_start == NOT_FOUND or new_start >= end:
                return NOT_FOUND
            return new_start
        return start

    def align_slice_end(self, end: int, file_size: int) -> int:
        """Nudge a slice end to the next block start, else file size."""
        new_end = self.find_next_position(end)
        return new_end if new_end != NOT_FOUND else file_size
