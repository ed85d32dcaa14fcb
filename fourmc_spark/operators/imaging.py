"""Dependency-free raster image codecs: PPM/PGM (netpbm) and BMP.

Pure numpy + struct — no pillow/libjpeg in the container, but these are
REAL formats with real parsers, so the multimodal pipeline
(:mod:`.multimodal`) can decode actual image bytes end-to-end instead of
stubbing. Anything a camera/tool can export as P6/P5, 24-bit BMP,
baseline OR progressive JPEG (the pure-numpy decoder in :mod:`.jpeg`),
or PNG (the stdlib-zlib decoder in :mod:`.png`) flows through the
engine's decode → feature-extract → resize path unchanged; only
arithmetic/lossless JPEG still needs an external decoder and raises
``UnsupportedImageError`` with a clear message.

Formats:

* **PPM (P6)** — binary RGB, ``P6\\n<w> <h>\\n<maxval>\\n`` + raw
  ``h*w*3`` bytes (netpbm spec). Comments (``#``) allowed in the header.
* **PGM (P5)** — same header shape, 1 channel.
* **BMP** — BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, BI_RGB
  (uncompressed), bottom-up row order, rows padded to 4 bytes — the
  standard Windows bitmap every screenshot tool writes.

All decoders return ``uint8`` arrays shaped ``(h, w, channels)``; all
encoders accept the same. Deterministic byte-for-byte output (fixed
header rendering), so encoded payloads are content-addressable.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedImageError",
    "decode_bmp",
    "decode_image",
    "decode_pnm",
    "encode_bmp",
    "encode_pgm",
    "encode_ppm",
    "resize_nearest",
    "sniff_format",
]


class UnsupportedImageError(ValueError):
    """Payload is not a format this dependency-free decoder handles."""


# ---------------------------------------------------------------- netpbm

def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"PPM wants (h, w, 3), got {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, 1) -> binary PGM (P5)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim != 2:
        raise ValueError(f"PGM wants (h, w), got {a.shape}")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def _pnm_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse *n_tokens* whitespace-separated ints after the magic,
    honoring '#' comments (netpbm spec); returns (values, offset past the
    single whitespace byte that terminates the header)."""
    vals: list[int] = []
    i = 2  # past magic
    n = len(data)
    while len(vals) < n_tokens:
        # skip whitespace
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":  # comment to EOL
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if i == j:
            raise UnsupportedImageError("truncated netpbm header")
        try:
            vals.append(int(data[i:j]))
        except ValueError as e:
            raise UnsupportedImageError(f"bad netpbm header token {data[i:j]!r}") from e
        i = j
    # exactly ONE whitespace byte separates header from raster
    if i >= n or not data[i : i + 1].isspace():
        raise UnsupportedImageError("netpbm header not terminated")
    return vals, i + 1


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3); binary PGM (P5) -> (h, w, 1)."""
    magic = bytes(data[:2])
    if magic not in (b"P6", b"P5"):
        raise UnsupportedImageError(f"not a binary PPM/PGM (magic {magic!r})")
    (w, h, maxval), off = _pnm_header_tokens(data, 3)
    if w <= 0 or h <= 0:
        raise UnsupportedImageError(f"bad PNM dimensions {w}x{h}")
    if maxval != 255:
        raise UnsupportedImageError(f"only maxval 255 supported, got {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = data[off : off + need]
    if len(raster) != need:
        raise UnsupportedImageError(
            f"PNM raster truncated: want {need} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, ch)


# ------------------------------------------------------------------ BMP

_BMP_FILE_HDR = "<2sIHHI"  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # 40-byte BITMAPINFOHEADER


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit uncompressed BMP (BGR on disk,
    bottom-up rows, 4-byte row padding — the file layout mspaint writes)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"BMP wants (h, w, 3), got {a.shape}")
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    # RGB -> BGR, flip to bottom-up, pad each row
    bgr = a[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    raster = rows.tobytes()
    off = struct.calcsize(_BMP_FILE_HDR) + struct.calcsize(_BMP_INFO_HDR)
    fhdr = struct.pack(_BMP_FILE_HDR, b"BM", off + len(raster), 0, 0, off)
    ihdr = struct.pack(
        _BMP_INFO_HDR, 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return fhdr + ihdr + raster


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> uint8 (h, w, 3) RGB. Handles both
    bottom-up (positive height) and top-down (negative height) files."""
    if bytes(data[:2]) != b"BM":
        raise UnsupportedImageError("not a BMP (missing BM magic)")
    if len(data) < 54:
        raise UnsupportedImageError("BMP header truncated")
    _, _, _, _, pix_off = struct.unpack_from(_BMP_FILE_HDR, data, 0)
    hdr_size, w, h, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if hdr_size < 40:
        raise UnsupportedImageError(f"BMP info header {hdr_size} unsupported")
    if bpp != 24 or compression != 0:
        raise UnsupportedImageError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise UnsupportedImageError(f"bad BMP dimensions {w}x{h}")
    row_bytes = (w * 3 + 3) & ~3
    need = row_bytes * h
    raster = data[pix_off : pix_off + need]
    if len(raster) != need:
        raise UnsupportedImageError(
            f"BMP raster truncated: want {need} bytes, have {len(raster)}"
        )
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR -> RGB


# ------------------------------------------------------------- dispatch

def sniff_format(data: bytes) -> str:
    head = bytes(data[:2])
    if head == b"P6":
        return "ppm"
    if head == b"P5":
        return "pgm"
    if head == b"BM":
        return "bmp"
    if head == b"\xff\xd8":
        return "jpeg"
    if bytes(data[:8]) == b"\x89PNG\r\n\x1a\n"[:8]:
        return "png"
    return "unknown"


# Lazily-probed external JPEG backend (Pillow/libjpeg). None = not yet
# probed, False = unavailable/disabled, else the PIL.Image module.
# Cluster images usually ship Pillow; this container does not, so the
# pure-numpy path is what tests exercise by default and a fake-module
# test covers the dispatch itself.
_EXTERNAL_JPEG = None


def jpeg_budget() -> int:
    from fourmc_spark.operators.jpeg import MAX_PIXELS

    return MAX_PIXELS


def _pil_image_module():
    global _EXTERNAL_JPEG
    if _EXTERNAL_JPEG is None:
        import os

        if os.environ.get("FOURMC_PURE_DECODE"):
            _EXTERNAL_JPEG = False  # explicit kill-switch: always pure numpy
        else:
            try:
                from PIL import Image

                _EXTERNAL_JPEG = Image
            except Exception:
                _EXTERNAL_JPEG = False
    return _EXTERNAL_JPEG


def _decode_jpeg_external(data: bytes) -> np.ndarray | None:
    """Decode via libjpeg (Pillow) when importable; None -> caller falls
    back to the pure-numpy decoder. Only L/RGB outputs are taken (the
    modes whose channel semantics match operators/jpeg exactly); any
    failure falls back rather than raising a foreign exception type.
    The pure decoder handles baseline AND progressive itself; the
    external backend is a throughput upgrade, and the oracle queries
    stay backend-independent (their constant/q100 construction is exact
    under ANY conforming decoder)."""
    image_mod = _pil_image_module()
    if not image_mod:
        return None
    import io

    class _BudgetExceeded(Exception):
        pass

    try:
        with image_mod.open(io.BytesIO(data)) as im:
            if im.mode not in ("L", "RGB"):
                return None
            w, h = im.size
            if w * h > jpeg_budget():
                # same executor-memory budget the pure decoder enforces
                # (operators/jpeg.MAX_PIXELS) — the external backend must
                # not quietly void it before pixels materialize. Raised
                # via a local sentinel so Pillow-internal ValueErrors
                # still take the pure-decoder fallback below.
                raise _BudgetExceeded(w, h)
            arr = np.asarray(im, dtype=np.uint8)
        return arr if arr.ndim == 3 else arr[:, :, None]
    except _BudgetExceeded as e:
        w, h = e.args
        raise ValueError(
            f"JPEG frame {w}x{h} exceeds the decoder pixel budget"
        ) from None
    except Exception:
        return None


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode any supported payload -> uint8 (h, w, channels)."""
    fmt = sniff_format(data)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "jpeg":
        ext = _decode_jpeg_external(data)
        if ext is not None:
            return ext
        # pure-numpy decoder (operators/jpeg.py), baseline + progressive;
        # arithmetic/lossless streams raise UnsupportedImageError
        from fourmc_spark.operators.jpeg import (
            cmyk_to_rgb,
            decode_jpeg_with_info,
        )

        arr, jinfo = decode_jpeg_with_info(data)
        if arr.ndim == 3 and arr.shape[2] == 4:
            # Adobe CMYK/YCCK: normalize to this dispatch's RGB/gray
            # contract; APP14 presence selects the inverted-ink
            # convention (call decode_jpeg directly for raw CMYK). The
            # flag comes from the decode itself — no second marker walk
            return cmyk_to_rgb(
                arr, inverted=jinfo["adobe_transform"] is not None)
        return arr if arr.ndim == 3 else arr[:, :, None]
    if fmt == "png":
        # stdlib-zlib + numpy decoder (operators/png.py); 16-bit
        # samples fold to 8 via the high byte to keep this dispatch's
        # uint8 contract (call decode_png directly for full precision)
        from fourmc_spark.operators.png import decode_png

        arr = decode_png(data)
        if arr.dtype == np.uint16:
            arr = (arr >> 8).astype(np.uint8)
        return arr
    raise UnsupportedImageError(
        f"format {fmt!r} needs an external decoder; supported here: "
        "PPM (P6), PGM (P5), 24-bit BMP, baseline/progressive JPEG "
        "(gray, YCbCr, Adobe CMYK/YCCK), PNG"
    )


# -------------------------------------------------------------- resize

def drop_alpha(arr: np.ndarray) -> np.ndarray:
    """Normalize a decoded (h, w, c) array to an encodable channel
    count before PPM/PGM re-encoding: gray (1) and RGB (3) pass
    through, gray+alpha (2) keeps the gray plane, RGBA (4) keeps RGB.
    Alpha is DISCARDED, not composited — deterministic and
    oracle-checkable (compositing would need a background color choice).
    The PNG decoder is what lets 2/4-channel arrays into the pipeline;
    without this step they were silently re-encoded as a 1-channel PGM
    of channel 0 only."""
    c = arr.shape[2]
    if c in (1, 3):
        return arr
    if c == 2:
        return arr[:, :, :1]
    if c == 4:
        return arr[:, :, :3]
    raise UnsupportedImageError(f"{c}-channel image has no PPM/PGM encoding")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (target_h, target_w, channels).

    Source coordinate mapping is the floor rule ``src = floor(i*src/dst)``
    — deterministic and integer-exact, so results are oracle-checkable
    in plain SQL (no float resampling kernels).
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    if target_w <= 0 or target_h <= 0:
        raise ValueError("target dimensions must be positive")
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return np.ascontiguousarray(arr[ys[:, None], xs[None, :], :])
