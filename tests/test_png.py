"""PNG codec: lossless roundtrips (bit-exact, unlike JPEG), every
scanline filter type, sub-byte depths, 16-bit, palette (+tRNS), Adam7
interlacing, and corrupt-stream rejection. Filtered/interlaced fixtures
are hand-assembled with the same chunk framing the encoder uses, so the
decoder is tested on streams the encoder cannot produce."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fourmc_spark.operators.imaging import UnsupportedImageError, decode_image
from fourmc_spark.operators.png import _SIG, decode_png, encode_png


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _png(w, h, depth, ctype, raw, extra=b"", interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        _SIG + _chunk(b"IHDR", ihdr) + extra
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )


def _rand(h, w, c, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
    return a if c > 1 else a[:, :, 0]


def test_roundtrip_rgb_gray_rgba_bit_exact():
    for c in (1, 3, 4):
        img = _rand(17, 23, c, c)
        out = decode_png(encode_png(img))
        assert out.shape == (17, 23, c)
        assert np.array_equal(out.reshape(img.shape), out.reshape(img.shape))
        assert np.array_equal(out, img if c > 1 else img[:, :, None])


def test_all_filter_types_against_reference_unfilter():
    # one image, each row filtered with a different type (0..4),
    # assembled by FORWARD-filtering a known image by hand
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(int)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=int)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = flat[y]
        if f == 0:
            enc = line % 256
        elif f == 1:
            left = np.concatenate([np.zeros(c, int), line[:-c]])
            enc = (line - left) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(c, int), line[:-c]])
            enc = (line - (left + prev) // 2) % 256
        else:
            enc = np.zeros(w * c, int)
            for i in range(w * c):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (line[i] - pred) % 256
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line
    out = decode_png(_png(w, h, 8, 2, bytes(raw)))
    assert np.array_equal(out, img)


def test_sub_byte_depths_scale_to_8bit():
    # 1-bit gray 8x2: alternating black/white, one packed byte per row
    raw = bytes([0, 0b10101010]) + bytes([0, 0b01010101])
    out = decode_png(_png(8, 2, 1, 0, raw))
    assert out.shape == (2, 8, 1)
    assert list(out[0, :4, 0]) == [255, 0, 255, 0]
    assert list(out[1, :4, 0]) == [0, 255, 0, 255]
    # 4-bit gray: values 0..15 scale by 17
    raw4 = bytes([0, 0x01, 0x2F])
    out4 = decode_png(_png(4, 1, 4, 0, raw4))
    assert list(out4[0, :, 0]) == [0, 17, 34, 255]


def test_16bit_comes_back_uint16():
    w, h = 3, 2
    vals = np.arange(w * h * 3, dtype=np.uint16) * 4097  # spans >8 bits
    raw = b""
    for y in range(h):
        row = vals[y * w * 3:(y + 1) * w * 3]
        raw += bytes([0]) + b"".join(struct.pack(">H", int(v)) for v in row)
    out = decode_png(_png(w, h, 16, 2, raw))
    assert out.dtype == np.uint16
    assert np.array_equal(out.reshape(-1), vals)
    # dispatch folds to uint8 high byte
    arr = decode_image(_png(w, h, 16, 2, raw))
    assert arr.dtype == np.uint8
    assert np.array_equal(arr.reshape(-1), (vals >> 8).astype(np.uint8))


def test_palette_with_and_without_trns():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    raw = bytes([0, 0, 1, 2, 1])  # 4 pixels, depth 8 indices
    png = _png(4, 1, 8, 3, raw, extra=_chunk(b"PLTE", plte))
    out = decode_png(png)
    assert out.shape == (1, 4, 3)
    assert list(out[0, 0]) == [255, 0, 0] and list(out[0, 2]) == [0, 0, 255]
    png_a = _png(4, 1, 8, 3, raw,
                 extra=_chunk(b"PLTE", plte) + _chunk(b"tRNS", bytes([128])))
    out_a = decode_png(png_a)
    assert out_a.shape == (1, 4, 3 + 1)
    assert out_a[0, 0, 3] == 128 and out_a[0, 1, 3] == 255


def test_adam7_interlaced_matches_sequential():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 10, 3)).astype(np.uint8)
    h, w, c = img.shape
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for xo, yo, xs, ys in passes:
        sub = img[yo::ys, xo::xs]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw += bytes([0]) + sub[y].tobytes()
    out = decode_png(_png(w, h, 8, 2, bytes(raw), interlace=1))
    assert np.array_equal(out, img)


def test_corrupt_streams_raise():
    img = _rand(4, 4, 3, 1)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + good[4:])
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    with pytest.raises(ValueError):
        decode_png(good[:30])
    # truncated pixel data under valid framing
    short = _png(4, 4, 8, 2, b"\x00" + b"\x01" * 5)
    with pytest.raises(ValueError, match="bytes"):
        decode_png(short)


def test_decode_image_dispatch_handles_png():
    img = _rand(6, 5, 3, 3)
    out = decode_image(encode_png(img))
    assert np.array_equal(out, img)
    gray = decode_image(encode_png(_rand(6, 5, 1, 4)))
    assert gray.shape == (6, 5, 1)


def test_corrupt_deflate_raises_value_error():
    # CRC-valid framing around a garbage deflate payload must reject as
    # ValueError (the documented corrupt-stream contract), never leak
    # zlib.error to callers catching (ValueError, UnsupportedImageError)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bad = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x00not-deflate\xff")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="deflate"):
        decode_png(bad)


def test_wrong_size_ihdr_raises_value_error():
    # 12-byte IHDR with a valid CRC: struct.error must not escape
    bad = (
        _SIG + _chunk(b"IHDR", b"\x00" * 12)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(bad)
