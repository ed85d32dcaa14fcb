"""Adversarial-input properties for the image decode path.

The decoders run per-document inside Arrow batches on executors, so two
contracts matter at scale: (1) NO input, however malformed, may raise
anything but ValueError / UnsupportedImageError (a foreign exception
type escapes the callers' documented catch and kills the task), and
(2) NO input may demand memory disproportionate to a real frame (a
30-byte header declaring a 2^31-pixel image, or a deflate bomb inside a
CRC-valid IDAT chunk, must be rejected before allocation, not OOM the
worker)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from fourmc_spark.operators import imaging, jpeg, png
from fourmc_spark.operators.jpeg import decode_jpeg, encode_jpeg
from fourmc_spark.operators.png import _SIG, decode_png, encode_png


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _gray(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


# --------------------------------------------------------- error contract

@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_decode_image_only_raises_value_error(data):
    try:
        imaging.decode_image(data)
    except ValueError:
        pass  # UnsupportedImageError subclasses ValueError — both fine


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=150))
def test_jpeg_soi_prefixed_garbage(tail):
    try:
        decode_jpeg(b"\xff\xd8" + tail)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=150))
def test_png_sig_prefixed_garbage(tail):
    try:
        decode_png(_SIG + tail)
    except ValueError:
        pass


_JPEG_FIXTURE = encode_jpeg(_gray(16, 16), quality=85)
_PNG_FIXTURE = encode_png(_gray(16, 16)[:, :, None])


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, len(_JPEG_FIXTURE) - 1),
    st.integers(0, 255),
)
def test_jpeg_single_byte_mutation(pos, val):
    buf = bytearray(_JPEG_FIXTURE)
    buf[pos] = val
    try:
        out = decode_jpeg(bytes(buf))
        assert out.dtype == np.uint8  # survived: must still be an image
    except ValueError:
        pass


def _ycck_fixture_bytes() -> bytes:
    # the multimodal_jpeg_ycck_dispatch construction: bare 4-component
    # encode of constant (Y, 128, 128, K) planes with an Adobe APP14
    # transform=2 segment spliced after SOI
    import struct

    ycck = np.empty((12, 14, 4), dtype=np.uint8)
    ycck[:, :] = (77, 128, 128, 33)
    enc = encode_jpeg(ycck, quality=100)
    app14 = (b"\xff\xee" + struct.pack(">H", 14)
             + b"Adobe" + b"\x00\x64" + b"\x00\x00" + b"\x00\x00"
             + bytes([2]))
    return enc[:2] + app14 + enc[2:]


_YCCK_FIXTURE = _ycck_fixture_bytes()


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, len(_YCCK_FIXTURE) - 1),
    st.integers(0, 255),
)
def test_ycck_dispatch_single_byte_mutation(pos, val):
    # the 4-component + APP14 path through the decode_image SEAM: the
    # mutation can corrupt the Adobe segment itself (flipping the color
    # model between CMYK/YCCK/none) — any surviving decode must still
    # honor the seam's uint8 gray/RGB contract, never leak 4 channels
    buf = bytearray(_YCCK_FIXTURE)
    buf[pos] = val
    try:
        out = imaging.decode_image(bytes(buf))
        assert out.dtype == np.uint8
        assert out.ndim == 3 and out.shape[2] in (1, 3)
    except ValueError:
        pass  # UnsupportedImageError subclasses ValueError


def _progressive_fixture_bytes() -> bytes:
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from jpeg_golden_fixtures import FIXTURES, _unpack

    for fx in FIXTURES:
        if fx.get("progressive"):
            return _unpack(fx["jpeg_b85"])
    raise AssertionError("no progressive fixture")


_PROG_FIXTURE = _progressive_fixture_bytes()


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, len(_PROG_FIXTURE) - 1),
    st.integers(0, 255),
)
def test_progressive_single_byte_mutation(pos, val):
    # the annex-G scan machinery (EOB runs, refinement walks, band
    # bookkeeping) has its own branch surface; the error contract is
    # the same as baseline
    buf = bytearray(_PROG_FIXTURE)
    buf[pos] = val
    try:
        out = decode_jpeg(bytes(buf))
        assert out.dtype == np.uint8
    except ValueError:
        pass  # UnsupportedImageError subclasses ValueError


@settings(max_examples=60, deadline=None)
@given(st.integers(2, len(_PROG_FIXTURE) - 1))
def test_progressive_truncation(cut):
    # any truncation either raises ValueError or (cut past the first
    # complete DC scan, re-terminated) decodes as a legal coarse preview
    try:
        out = decode_jpeg(_PROG_FIXTURE[:cut] + b"\xff\xd9")
        assert out.dtype == np.uint8
    except ValueError:
        pass


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, len(_PNG_FIXTURE) - 1),
    st.integers(0, 255),
)
def test_png_single_byte_mutation(pos, val):
    buf = bytearray(_PNG_FIXTURE)
    buf[pos] = val
    try:
        out = decode_png(bytes(buf))
        assert out.dtype in (np.uint8, np.uint16)
    except ValueError:
        pass


@settings(max_examples=80, deadline=None)
@given(
    st.integers(0, len(_JPEG_FIXTURE) - 1),
    st.integers(0, len(_PNG_FIXTURE) - 1),
)
def test_truncations_raise_value_error(jcut, pcut):
    try:
        decode_jpeg(_JPEG_FIXTURE[:jcut])
        raise AssertionError("truncated JPEG decoded")
    except ValueError:
        pass
    try:
        decode_png(_PNG_FIXTURE[:pcut])
        raise AssertionError("truncated PNG decoded")
    except ValueError:
        pass


# --------------------------------------------------------- memory budget

def test_png_rejects_giant_declared_frame():
    # 20000 x 20000 = 400M pixels > MAX_PIXELS — must reject BEFORE
    # allocating or inflating anything
    ihdr = struct.pack(">IIBBBBB", 20000, 20000, 8, 0, 0, 0, 0)
    bomb = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="pixel budget"):
        decode_png(bomb)


def test_png_rejects_deflate_bomb():
    # CRC-valid 4x4 gray frame whose IDAT inflates to 10 MB: inflate is
    # capped at the frame's exact byte count, so the bomb never expands
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(bomb)


def test_png_rejects_short_pixel_data():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    short = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 7))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(short)


def test_jpeg_rejects_giant_declared_frame():
    data = bytearray(encode_jpeg(_gray(8, 8), quality=85))
    sof = data.find(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) — patch dims to 65535
    struct.pack_into(">HH", data, sof + 5, 65535, 65535)
    with pytest.raises(ValueError, match="pixel budget"):
        decode_jpeg(bytes(data))


def test_budget_constants_are_sane():
    # 8K video frames (33M pixels) must pass; the cap is above them
    assert jpeg.MAX_PIXELS >= 7680 * 4320
    assert png.MAX_PIXELS >= 7680 * 4320


# --------------------------------------------------------- audio / video

from fourmc_spark.operators.av import (  # noqa: E402
    decode_wav,
    encode_wav,
    encode_y4m,
    iter_y4m_frames,
)

_WAV_FIXTURE = encode_wav(
    (np.sin(np.linspace(0, 20, 800)) * 20000).astype(np.int16)
)
_Y4M_FIXTURE = encode_y4m([_gray(16, 16, s) for s in range(3)])


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=150))
def test_wav_riff_prefixed_garbage(tail):
    try:
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE" + tail)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=150))
def test_y4m_prefixed_garbage(tail):
    try:
        for _ in iter_y4m_frames(b"YUV4MPEG2 " + tail):
            pass
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.integers(0, len(_WAV_FIXTURE) - 1), st.integers(0, 255))
def test_wav_single_byte_mutation(pos, val):
    buf = bytearray(_WAV_FIXTURE)
    buf[pos] = val
    try:
        arr, rate = decode_wav(bytes(buf))
        assert arr.ndim == 2 and rate >= 0
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.integers(0, len(_Y4M_FIXTURE) - 1), st.integers(0, 255))
def test_y4m_single_byte_mutation(pos, val):
    buf = bytearray(_Y4M_FIXTURE)
    buf[pos] = val
    try:
        for _, luma in iter_y4m_frames(bytes(buf)):
            assert luma.dtype == np.uint8
    except ValueError:
        pass


_CMYK_FIXTURE = encode_jpeg(
    (np.arange(13 * 11 * 4, dtype=np.int64) % 251).reshape(13, 11, 4)
    .astype(np.uint8), quality=90)
_PROG_ENC_FIXTURE = encode_jpeg(_gray(16, 16), quality=85, progressive=True)


@settings(max_examples=120, deadline=None)
@given(
    st.sampled_from([0, 1]),
    st.integers(0, max(len(_CMYK_FIXTURE), len(_PROG_ENC_FIXTURE)) - 1),
    st.integers(0, 255),
)
def test_new_surface_single_byte_mutation(which, pos, val):
    # round-7 decode surfaces: 4-component CMYK streams and OUR
    # progressive-encoder output — corrupt bytes must stay inside the
    # ValueError/UnsupportedImageError contract
    from fourmc_spark.operators.imaging import UnsupportedImageError

    base = (_CMYK_FIXTURE, _PROG_ENC_FIXTURE)[which]
    buf = bytearray(base)
    buf[pos % len(base)] = val
    try:
        out = decode_jpeg(bytes(buf))
        assert out.dtype == np.uint8
    except (ValueError, UnsupportedImageError):
        pass


@settings(max_examples=80, deadline=None)
@given(st.integers(2, len(_CMYK_FIXTURE) - 1))
def test_cmyk_truncation(cut):
    from fourmc_spark.operators.imaging import UnsupportedImageError

    try:
        decode_jpeg(_CMYK_FIXTURE[:cut])
    except (ValueError, UnsupportedImageError):
        pass
