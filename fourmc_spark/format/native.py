"""Native compression/hash primitives for the 4mc/4mz formats.

Binds the *same* C libraries the reference uses through JNI
(`/root/reference/native/jniCompressor.c`, `jniDecompressor.c`):

* LZ4 raw-block compress/decompress (``LZ4_compress_default`` /
  ``LZ4_compress_HC`` / ``LZ4_decompress_safe``) via ``liblz4``.
* ZSTD single-frame compress/decompress (``ZSTD_compress`` /
  ``ZSTD_decompress``) via ``libzstd``.
* XXH32 checksums via ``libxxhash`` (reference seed is always 0:
  ``native/4mc.c:311``, ``FourMcOutputStream.java:74``).

When a shared library is unavailable we fall back to ``pyarrow``
codecs (``lz4_raw``/``zstd``) and a pure-Python XXH32 — slower but
bit-identical.  Level semantics mirror ``native/4mc.c:243-253`` and
the zstd level table in ``Readme.md:30-33``:

* lz4:  fast = LZ4 default, medium = LZ4HC-2 (the reference's custom
  LZ4MC mode is an unreleased lz4 fork; reading is unaffected since
  all modes emit standard LZ4 blocks — see SURVEY.md §7 risk 2),
  high = LZ4HC-4, ultra = LZ4HC-8.
* zstd: fast = 1, medium = 3, high = 6, ultra = 12.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import threading

__all__ = [
    "xxh32",
    "xxh32_at",
    "xxh64",
    "lz4_compress",
    "lz4_decompress",
    "lz4_decompress_at",
    "zstd_compress",
    "zstd_decompress",
    "zstd_decompress_at",
    "ZstdStreamCompressor",
    "LZ4_LEVELS",
    "ZSTD_LEVELS",
    "HAVE_NATIVE_XXHASH",
    "HAVE_NATIVE_LZ4",
    "HAVE_NATIVE_ZSTD",
]

# codec level names -> native parameter (reference: native/4mc.c:243-253,
# ZstdCompressor.java:55 / ZstdMediumCompressor.java:45 / ZstdHighCompressor.java:45
# / ZstdUltraCompressor.java:45)
LZ4_LEVELS = {"fast": 0, "medium": 2, "high": 4, "ultra": 8}
ZSTD_LEVELS = {"fast": 1, "medium": 3, "high": 6, "ultra": 12}


_tls = threading.local()


def _scratch(cap: int):
    """Thread-local reusable compress destination buffer.

    One ≤4 MiB allocation per *thread*, not per block — under a
    multi-worker encode (writer ``workers=N``, ``parallel.py``) per-block
    ``create_string_buffer`` calls serialize on the allocator and fault in
    fresh pages every time, which caps fast-LZ4 throughput below the
    single-thread rate.
    """
    buf = getattr(_tls, "buf", None)
    if buf is None or ctypes.sizeof(buf) < cap:
        buf = ctypes.create_string_buffer(cap)
        _tls.buf = buf
    return buf


def _load(*names: str):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_xxh = _load("libxxhash.so.0", "libxxhash.so", "libxxhash.dylib")
_lz4 = _load("liblz4.so.1", "liblz4.so", "liblz4.dylib")
_zstd = _load("libzstd.so.1", "libzstd.so", "libzstd.dylib")

HAVE_NATIVE_XXHASH = _xxh is not None
HAVE_NATIVE_LZ4 = _lz4 is not None
HAVE_NATIVE_ZSTD = _zstd is not None


def _addr_at(buf, off: int) -> tuple[int, object]:
    """(address of buf[off], keep-alive object) without copying.

    `buf` is ``bytes`` (read-only OK — ``c_char_p`` shares the buffer) or a
    writable buffer (``bytearray``/``memoryview``). The keep-alive object
    must stay referenced until the C call returns.
    """
    if isinstance(buf, bytes):
        p = ctypes.c_char_p(buf)
        return ctypes.cast(p, ctypes.c_void_p).value + off, p
    arr = (ctypes.c_char * 1).from_buffer(buf, off)
    return ctypes.addressof(arr), arr

# ---------------------------------------------------------------------------
# XXH32
# ---------------------------------------------------------------------------

if _xxh is not None:
    _xxh.XXH32.restype = ctypes.c_uint32
    _xxh.XXH32.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint32]

    def xxh32(data: bytes, seed: int = 0) -> int:
        """32-bit xxHash of *data* (reference checksum primitive)."""
        return int(_xxh.XXH32(bytes(data), len(data), seed))

    def xxh32_at(buf, off: int, n: int, seed: int = 0) -> int:
        """Zero-copy XXH32 of ``buf[off:off+n]`` (bytes or writable buffer)."""
        if n == 0:
            return xxh32(b"", seed)
        addr, keep = _addr_at(buf, off)
        h = int(_xxh.XXH32(addr, n, seed))
        del keep
        return h

else:  # pragma: no cover - exercised only without libxxhash
    xxh32 = None  # assigned below after the pure-Python impl

    def xxh32_at(buf, off: int, n: int, seed: int = 0) -> int:
        return xxh32(bytes(memoryview(buf)[off : off + n]), seed)

# Pure-Python XXH32 (reference algorithm; kept for environments without
# libxxhash and as a cross-check in tests).
_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32_py(data: bytes, seed: int = 0) -> int:
    """Pure-Python XXH32; bit-identical to ``XXH32`` from libxxhash."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        mv = memoryview(data)
        while i <= limit:
            w1 = int.from_bytes(mv[i : i + 4], "little")
            w2 = int.from_bytes(mv[i + 4 : i + 8], "little")
            w3 = int.from_bytes(mv[i + 8 : i + 12], "little")
            w4 = int.from_bytes(mv[i + 12 : i + 16], "little")
            v1 = (_rotl32((v1 + w1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + w2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + w3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + w4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (h + int.from_bytes(data[i : i + 4], "little") * _P3) & _M32
        h = (_rotl32(h, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M32
        h = (_rotl32(h, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


if xxh32 is None:  # pragma: no cover
    xxh32 = xxh32_py

# ---------------------------------------------------------------------------
# XXH64 — the hash behind Spark's JVM-side `xxhash64` expression (seed 42),
# verified bit-identical in tests/test_native.py. The bloom sidecar tier
# (operators/maintenance.analyze_bloom) builds bitmaps with the JVM
# expression at scan speed; the planner (sources/datasource.py) reproduces
# the same hash here to probe membership at pruning time.
# ---------------------------------------------------------------------------

if _xxh is not None:
    _xxh.XXH64.restype = ctypes.c_uint64
    _xxh.XXH64.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64]

    def xxh64(data: bytes, seed: int = 0) -> int:
        """64-bit xxHash of *data* (unsigned)."""
        return int(_xxh.XXH64(bytes(data), len(data), seed))

else:  # pragma: no cover - exercised only without libxxhash
    xxh64 = None  # assigned below after the pure-Python impl

# Pure-Python XXH64 (same public reference algorithm as XXH32 above; kept
# for environments without libxxhash and as a cross-check in tests).
_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, inp: int) -> int:
    return (_rotl64((acc + inp * _P64_2) & _M64, 31) * _P64_1) & _M64


def xxh64_py(data: bytes, seed: int = 0) -> int:
    """Pure-Python XXH64; bit-identical to ``XXH64`` from libxxhash."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        mv = memoryview(data)
        limit = n - 32
        while i <= limit:
            v1 = _xxh64_round(v1, int.from_bytes(mv[i : i + 8], "little"))
            v2 = _xxh64_round(v2, int.from_bytes(mv[i + 8 : i + 16], "little"))
            v3 = _xxh64_round(v3, int.from_bytes(mv[i + 16 : i + 24], "little"))
            v4 = _xxh64_round(v4, int.from_bytes(mv[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xxh64_round(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xxh64_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


if xxh64 is None:  # pragma: no cover
    xxh64 = xxh64_py

# ---------------------------------------------------------------------------
# LZ4 raw blocks
# ---------------------------------------------------------------------------

if _lz4 is not None:
    _lz4.LZ4_compress_default.restype = ctypes.c_int
    _lz4.LZ4_compress_default.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lz4.LZ4_compress_HC.restype = ctypes.c_int
    _lz4.LZ4_compress_HC.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lz4.LZ4_decompress_safe.restype = ctypes.c_int
    _lz4.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    # second binding with pointer args for the zero-copy *_at path
    _lz4_dec_ptr = ctypes.CFUNCTYPE(
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
    )(("LZ4_decompress_safe", _lz4))

    def lz4_compress(data: bytes, level: int = 0) -> bytes | None:
        """Raw LZ4 block compress.

        Returns ``None`` when the payload cannot be shrunk by at least one
        byte — the caller then stores the block uncompressed, mirroring the
        reference's passthrough rule (``native/4mc.c:305-331``,
        ``FourMcOutputStream.java:204-215``).
        """
        if not data:
            return None
        cap = len(data) - 1
        if cap <= 0:
            return None
        dst = _scratch(cap)
        if level <= 0:
            n = _lz4.LZ4_compress_default(data, dst, len(data), cap)
        else:
            n = _lz4.LZ4_compress_HC(data, dst, len(data), cap, level)
        if n <= 0:
            return None
        return ctypes.string_at(ctypes.addressof(dst), n)

    def lz4_decompress(data: bytes, uncompressed_size: int) -> bytes:
        out = bytearray(uncompressed_size)
        dst = (ctypes.c_char * uncompressed_size).from_buffer(out)
        n = _lz4.LZ4_decompress_safe(data, dst, len(data), uncompressed_size)
        del dst  # release the exported buffer before returning
        if n != uncompressed_size:
            raise ValueError(
                f"corrupt LZ4 block: decoded {n} bytes, expected {uncompressed_size}"
            )
        return out

    def lz4_decompress_at(src, src_off, csize, dst, dst_off, usize) -> None:
        """Zero-copy decode of ``src[src_off:src_off+csize]`` into
        ``dst[dst_off:dst_off+usize]`` (dst must be writable)."""
        saddr, skeep = _addr_at(src, src_off)
        daddr, dkeep = _addr_at(dst, dst_off)
        n = _lz4_dec_ptr(saddr, daddr, csize, usize)
        del skeep, dkeep
        if n != usize:
            raise ValueError(
                f"corrupt LZ4 block: decoded {n} bytes, expected {usize}"
            )

else:  # pragma: no cover - pyarrow fallback
    import pyarrow as _pa

    _lz4_codec = _pa.Codec("lz4_raw")

    def lz4_compress(data: bytes, level: int = 0) -> bytes | None:
        if not data:
            return None
        out = _lz4_codec.compress(data).to_pybytes()
        return out if len(out) < len(data) else None

    def lz4_decompress(data: bytes, uncompressed_size: int) -> bytes:
        out = _lz4_codec.decompress(data, uncompressed_size).to_pybytes()
        if len(out) != uncompressed_size:
            raise ValueError("corrupt LZ4 block")
        return out

    def lz4_decompress_at(src, src_off, csize, dst, dst_off, usize) -> None:
        chunk = bytes(memoryview(src)[src_off : src_off + csize])
        memoryview(dst)[dst_off : dst_off + usize] = lz4_decompress(chunk, usize)


# ---------------------------------------------------------------------------
# ZSTD frames
# ---------------------------------------------------------------------------

if _zstd is not None:
    _zstd.ZSTD_compress.restype = ctypes.c_size_t
    _zstd.ZSTD_compress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
    ]
    _zstd.ZSTD_decompress.restype = ctypes.c_size_t
    _zstd.ZSTD_decompress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    _zstd.ZSTD_isError.restype = ctypes.c_uint
    _zstd.ZSTD_isError.argtypes = [ctypes.c_size_t]
    _zstd_dec_ptr = ctypes.CFUNCTYPE(
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.c_size_t,
    )(("ZSTD_decompress", _zstd))

    def zstd_compress(data: bytes, level: int = 1) -> bytes | None:
        """ZSTD frame compress; ``None`` when not shrinkable (passthrough)."""
        if not data:
            return None
        cap = len(data) - 1
        if cap <= 0:
            return None
        dst = _scratch(cap)
        n = _zstd.ZSTD_compress(dst, cap, data, len(data), level)
        if _zstd.ZSTD_isError(n):
            return None  # dstSize_tooSmall -> store raw
        return ctypes.string_at(ctypes.addressof(dst), n)

    def zstd_decompress(data: bytes, uncompressed_size: int) -> bytes:
        out = bytearray(uncompressed_size)
        dst = (ctypes.c_char * uncompressed_size).from_buffer(out)
        n = _zstd.ZSTD_decompress(dst, uncompressed_size, data, len(data))
        del dst
        if _zstd.ZSTD_isError(n) or n != uncompressed_size:
            raise ValueError(
                f"corrupt ZSTD block: expected {uncompressed_size} bytes"
            )
        return out

    def zstd_decompress_at(src, src_off, csize, dst, dst_off, usize) -> None:
        """Zero-copy decode of ``src[src_off:src_off+csize]`` into
        ``dst[dst_off:dst_off+usize]`` (dst must be writable)."""
        saddr, skeep = _addr_at(src, src_off)
        daddr, dkeep = _addr_at(dst, dst_off)
        n = _zstd_dec_ptr(daddr, usize, saddr, csize)
        del skeep, dkeep
        if _zstd.ZSTD_isError(n) or n != usize:
            raise ValueError(
                f"corrupt ZSTD block: expected {usize} bytes"
            )

else:  # pragma: no cover - pyarrow fallback
    import pyarrow as _pa

    def zstd_compress(data: bytes, level: int = 1) -> bytes | None:
        if not data:
            return None
        out = _pa.Codec("zstd", compression_level=level).compress(data).to_pybytes()
        return out if len(out) < len(data) else None

    def zstd_decompress(data: bytes, uncompressed_size: int) -> bytes:
        out = _pa.Codec("zstd").decompress(data, uncompressed_size).to_pybytes()
        if len(out) != uncompressed_size:
            raise ValueError("corrupt ZSTD block")
        return out

    def zstd_decompress_at(src, src_off, csize, dst, dst_off, usize) -> None:
        chunk = bytes(memoryview(src)[src_off : src_off + csize])
        memoryview(dst)[dst_off : dst_off + usize] = zstd_decompress(chunk, usize)


# ---------------------------------------------------------------------------
# Streaming ZSTD decode (standard .zst files, reference ZstCodec.java):
# frames from streaming writers carry no content size, so one-shot
# ZSTD_decompress cannot size its buffer — use the DStream API.
# ---------------------------------------------------------------------------

if _zstd is not None and hasattr(_zstd, "ZSTD_createDStream"):

    class _ZstdBuffer(ctypes.Structure):
        _fields_ = [
            ("dst", ctypes.c_void_p),
            ("size", ctypes.c_size_t),
            ("pos", ctypes.c_size_t),
        ]

    _zstd.ZSTD_createDStream.restype = ctypes.c_void_p
    _zstd.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
    _zstd.ZSTD_decompressStream.restype = ctypes.c_size_t
    _zstd.ZSTD_decompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(_ZstdBuffer),
        ctypes.POINTER(_ZstdBuffer),
    ]
    _HAS_DCTX_PARAM = hasattr(_zstd, "ZSTD_DCtx_setParameter")
    if _HAS_DCTX_PARAM:
        _zstd.ZSTD_DCtx_setParameter.restype = ctypes.c_size_t
        _zstd.ZSTD_DCtx_setParameter.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
    _ZSTD_D_WINDOWLOGMAX = 100  # enum ZSTD_d_windowLogMax (zstd.h)
    # Frames from `zstd --long=N` piped input declare the FULL long-mode
    # window (content size unknown), and libzstd's default decode limit
    # (2^27) rejects them as if corrupt — the stock CLI needs an explicit
    # --long on decode too. A cluster reader shouldn't: accept up to
    # 2^30 (1 GiB window, an executor-sized bound against tiny frames
    # demanding huge windows) by default, env-overridable — but grant it
    # LAZILY: streams start at libzstd's own 2^27 limit, and only a
    # frame that actually declares a larger window escalates the cap
    # (header replay), so benign multi-stream readers never authorize
    # 1 GiB allocations up front (ADVICE r6).
    _WINDOW_LOG_MAX = int(os.environ.get("FOURMC_ZSTD_WINDOW_LOG_MAX", 30))
    _WINDOW_LOG_DEFAULT = 27  # libzstd's built-in decode limit

    if hasattr(_zstd, "ZSTD_getErrorCode"):
        _zstd.ZSTD_getErrorCode.restype = ctypes.c_int
        _zstd.ZSTD_getErrorCode.argtypes = [ctypes.c_size_t]
    _ZSTD_ERROR_WINDOW_TOO_LARGE = 16  # zstd_errors.h, stable enum

    def _zstd_errname(rc) -> str:
        if hasattr(_zstd, "ZSTD_getErrorName"):
            _zstd.ZSTD_getErrorName.restype = ctypes.c_char_p
            return _zstd.ZSTD_getErrorName(rc).decode("ascii", "replace")
        return ""

    def _mk_dstream(window_log_max: int):
        ds = _zstd.ZSTD_createDStream()
        if not ds:
            raise MemoryError("ZSTD_createDStream failed")
        if _HAS_DCTX_PARAM:
            rc = _zstd.ZSTD_DCtx_setParameter(
                ds, _ZSTD_D_WINDOWLOGMAX, window_log_max
            )
            if _zstd.ZSTD_isError(rc):
                # an out-of-range env override would otherwise silently
                # leave the library default (2^27) in place — the
                # opposite of what the knob promised
                _zstd.ZSTD_freeDStream(ds)
                raise ValueError(
                    "FOURMC_ZSTD_WINDOW_LOG_MAX="
                    f"{window_log_max} rejected by libzstd "
                    "(valid range is 10..31)"
                )
        return ds

    _max_validated: list = []  # last escalation target checked loudly

    def _is_window_err(rc) -> bool:
        if hasattr(_zstd, "ZSTD_getErrorCode"):
            return (_zstd.ZSTD_getErrorCode(rc)
                    == _ZSTD_ERROR_WINDOW_TOO_LARGE)
        return "too much memory" in _zstd_errname(rc)

    def zstd_stream_decompress_chunks(chunks) -> "Iterator[bytes]":
        """Decode an iterable of compressed byte chunks into decompressed
        chunks (handles multi-frame concatenation; O(chunk) memory)."""
        cap = min(_WINDOW_LOG_DEFAULT, _WINDOW_LOG_MAX)
        if (_WINDOW_LOG_MAX > _WINDOW_LOG_DEFAULT
                and _max_validated != [_WINDOW_LOG_MAX]):
            # validate the (possibly env-overridden) escalation target
            # loudly at first open, not on first long-window frame
            _zstd.ZSTD_freeDStream(_mk_dstream(_WINDOW_LOG_MAX))
            _max_validated[:] = [_WINDOW_LOG_MAX]
        ds = _mk_dstream(cap)
        # consumed prefix of the current frame, kept while it could
        # still be the (<= ~18 byte) header so a window-too-large
        # escalation can replay it into a fresh context
        hdr = bytearray()
        try:
            out_cap = 1 << 20
            out_raw = ctypes.create_string_buffer(out_cap)
            for chunk in chunks:
                if not chunk:
                    continue
                src = ctypes.create_string_buffer(chunk, len(chunk))
                inb = _ZstdBuffer(
                    ctypes.cast(src, ctypes.c_void_p), len(chunk), 0
                )
                while inb.pos < inb.size:
                    prev = inb.pos
                    outb = _ZstdBuffer(
                        ctypes.cast(out_raw, ctypes.c_void_p), out_cap, 0
                    )
                    rc = _zstd.ZSTD_decompressStream(
                        ds, ctypes.byref(outb), ctypes.byref(inb)
                    )
                    if _zstd.ZSTD_isError(rc):
                        if (cap < _WINDOW_LOG_MAX and _HAS_DCTX_PARAM
                                and _is_window_err(rc)):
                            # this frame really declares a long window:
                            # escalate for THIS stream and replay the
                            # frame header into a fresh context
                            _zstd.ZSTD_freeDStream(ds)
                            ds = None
                            cap = _WINDOW_LOG_MAX
                            ds = _mk_dstream(cap)
                            chunk = bytes(hdr) + chunk[prev:]
                            hdr.clear()
                            src = ctypes.create_string_buffer(
                                chunk, len(chunk))
                            inb = _ZstdBuffer(
                                ctypes.cast(src, ctypes.c_void_p),
                                len(chunk), 0,
                            )
                            continue
                        raise ValueError(
                            "corrupt .zst stream (%s)" % _zstd_errname(rc))
                    if inb.pos > prev and len(hdr) < 64:
                        # keep only a header-sized prefix: escalation can
                        # fire only while consumption is still inside the
                        # <= ~18-byte frame header, so bytes past 64 can
                        # never need replay (and an untruncated append
                        # would pin up to a whole chunk per frame)
                        hdr += chunk[prev:inb.pos][:64 - len(hdr)]
                    if rc == 0:  # frame fully decoded: next bytes = header
                        hdr.clear()
                    if outb.pos:
                        yield out_raw.raw[: outb.pos]
        finally:
            if ds is not None:
                _zstd.ZSTD_freeDStream(ds)

else:  # pragma: no cover - pyarrow fallback (frames with content size only)
    def zstd_stream_decompress_chunks(chunks) -> "Iterator[bytes]":
        import pyarrow as _pa2

        data = b"".join(chunks)
        if not data:
            return
        yield _pa2.Codec("zstd").decompress(data).to_pybytes()


# ---------------------------------------------------------------------------
# Streaming ZSTD encode (standard .zst sink, reference ZstCodec.java:47-169 +
# ZstdStreamCompressor.java:41-331): one frame for the whole stream, bounded
# buffers, level clamped like the reference (invalid conf level -> 3,
# ZstCodec.java:118-122).
# ---------------------------------------------------------------------------

if _zstd is not None and hasattr(_zstd, "ZSTD_createCStream"):
    _zstd.ZSTD_createCStream.restype = ctypes.c_void_p
    _zstd.ZSTD_freeCStream.argtypes = [ctypes.c_void_p]
    _zstd.ZSTD_initCStream.restype = ctypes.c_size_t
    _zstd.ZSTD_initCStream.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _zstd.ZSTD_compressStream.restype = ctypes.c_size_t
    _zstd.ZSTD_compressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(_ZstdBuffer),
        ctypes.POINTER(_ZstdBuffer),
    ]
    _zstd.ZSTD_endStream.restype = ctypes.c_size_t
    _zstd.ZSTD_endStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(_ZstdBuffer),
    ]

    class ZstdStreamCompressor:
        """Incremental single-frame zstd encoder (CStream API).

        ``compress(data)`` returns whatever compressed bytes are ready
        (possibly empty — zstd buffers internally); ``finish()`` flushes
        the epilogue. O(buffer) memory for streams of any length.
        """

        def __init__(self, level: int = 1) -> None:
            self._cs = _zstd.ZSTD_createCStream()
            if not self._cs:
                raise MemoryError("ZSTD_createCStream failed")
            rc = _zstd.ZSTD_initCStream(self._cs, int(level))
            if _zstd.ZSTD_isError(rc):
                raise ValueError(f"bad zstd level {level}")
            self._out_cap = 1 << 19  # 512 KiB output granule
            self._out_raw = ctypes.create_string_buffer(self._out_cap)
            self._done = False

        def compress(self, data: bytes) -> bytes:
            if self._done:
                raise ValueError("compressor finished")
            if not data:
                return b""
            src = ctypes.create_string_buffer(data, len(data))
            inb = _ZstdBuffer(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
            parts = []
            while inb.pos < inb.size:
                outb = _ZstdBuffer(
                    ctypes.cast(self._out_raw, ctypes.c_void_p), self._out_cap, 0
                )
                rc = _zstd.ZSTD_compressStream(
                    self._cs, ctypes.byref(outb), ctypes.byref(inb)
                )
                if _zstd.ZSTD_isError(rc):
                    raise ValueError("zstd stream compress failed")
                if outb.pos:
                    parts.append(self._out_raw.raw[: outb.pos])
            return b"".join(parts)

        def finish(self) -> bytes:
            if self._done:
                return b""
            parts = []
            while True:
                outb = _ZstdBuffer(
                    ctypes.cast(self._out_raw, ctypes.c_void_p), self._out_cap, 0
                )
                rc = _zstd.ZSTD_endStream(self._cs, ctypes.byref(outb))
                if _zstd.ZSTD_isError(rc):
                    raise ValueError("zstd stream finish failed")
                if outb.pos:
                    parts.append(self._out_raw.raw[: outb.pos])
                if rc == 0:
                    break
            self._done = True
            _zstd.ZSTD_freeCStream(self._cs)
            self._cs = None
            return b"".join(parts)

else:  # pragma: no cover - pyarrow fallback (buffers the whole stream)
    class ZstdStreamCompressor:  # type: ignore[no-redef]
        def __init__(self, level: int = 1) -> None:
            self._level = int(level)
            self._buf = bytearray()
            self._done = False

        def compress(self, data: bytes) -> bytes:
            if self._done:
                raise ValueError("compressor finished")
            self._buf.extend(data)
            return b""

        def finish(self) -> bytes:
            import pyarrow as _pa3

            self._done = True
            return _pa3.Codec("zstd", self._level).compress(
                bytes(self._buf)
            ).to_pybytes()


# ---------------------------------------------------------------------------
# Raw one-shot codec calls for Hadoop BlockCompressorStream containers
# (reference Lz4Codec/ZstdCodec M/R intermediate files): unlike the 4mc
# block path there is NO passthrough rule — the stream stores whatever the
# compressor emits, so these always return output (worst case slightly
# larger than the input), and decompression trusts the frame/stream to
# yield AT MOST the caller's bound (the block's remaining original size).
# ---------------------------------------------------------------------------

if _lz4 is not None:

    def lz4_compress_raw(data: bytes, level: int = 0) -> bytes:
        """LZ4 block compress at full compressBound capacity (never None)."""
        cap = len(data) + len(data) // 255 + 16
        dst = _scratch(cap)
        if level <= 0:
            n = _lz4.LZ4_compress_default(data, dst, len(data), cap)
        else:
            n = _lz4.LZ4_compress_HC(data, dst, len(data), cap, level)
        if n <= 0:
            raise ValueError("LZ4 compress failed")
        return ctypes.string_at(ctypes.addressof(dst), n)

    def lz4_decompress_raw(data: bytes, max_size: int) -> bytes:
        """Decode into a *max_size*-capacity buffer; returns the actual
        decoded bytes (may be fewer — multi-chunk Hadoop blocks)."""
        out = bytearray(max_size)
        dst = (ctypes.c_char * max_size).from_buffer(out) if max_size else None
        n = _lz4.LZ4_decompress_safe(data, dst, len(data), max_size)
        del dst
        if n < 0:
            raise ValueError(f"corrupt LZ4 chunk (rc={n})")
        return bytes(out[:n])

else:  # pragma: no cover - pyarrow fallback

    def lz4_compress_raw(data: bytes, level: int = 0) -> bytes:
        import pyarrow as _pa4

        return _pa4.Codec("lz4_raw").compress(data).to_pybytes()

    def lz4_decompress_raw(data: bytes, max_size: int) -> bytes:
        # pyarrow needs the exact decompressed size; Hadoop blocks our
        # writer (and the reference's 4 MiB-buffer compressors) produce
        # are single-chunk, so max_size is exact for them. Multi-chunk
        # blocks (one write larger than the buffer) decode to LESS than
        # the remaining-block bound — surface a clear error instead of
        # pyarrow's, since only native liblz4 can size those chunks.
        import pyarrow as _pa4

        try:
            return _pa4.Codec("lz4_raw").decompress(data, max_size).to_pybytes()
        except Exception as e:
            raise ValueError(
                "LZ4 chunk did not decode to the expected size; multi-chunk "
                "Hadoop blocks need native liblz4 (pyarrow fallback cannot "
                f"decode chunks of unknown size): {e}"
            ) from e


if _zstd is not None:

    def zstd_compress_raw(data: bytes, level: int = 1) -> bytes:
        cap = len(data) + len(data) // 100 + 1024
        dst = _scratch(cap)
        n = _zstd.ZSTD_compress(dst, cap, data, len(data), level)
        if _zstd.ZSTD_isError(n):
            raise ValueError("ZSTD compress failed")
        return ctypes.string_at(ctypes.addressof(dst), n)

    def zstd_decompress_raw(data: bytes, max_size: int) -> bytes:
        out = bytearray(max_size)
        dst = (ctypes.c_char * max_size).from_buffer(out) if max_size else None
        n = _zstd.ZSTD_decompress(dst, max_size, data, len(data))
        del dst
        if _zstd.ZSTD_isError(n):
            raise ValueError("corrupt ZSTD chunk")
        return bytes(out[:n])

else:  # pragma: no cover - pyarrow fallback

    def zstd_compress_raw(data: bytes, level: int = 1) -> bytes:
        import pyarrow as _pa5

        return _pa5.Codec("zstd", compression_level=level).compress(
            data
        ).to_pybytes()

    def zstd_decompress_raw(data: bytes, max_size: int) -> bytes:
        import pyarrow as _pa5

        return _pa5.Codec("zstd").decompress(data, max_size).to_pybytes()


__all__ += [
    "lz4_compress_raw",
    "lz4_decompress_raw",
    "zstd_compress_raw",
    "zstd_decompress_raw",
]
