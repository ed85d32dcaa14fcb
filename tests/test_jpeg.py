"""Baseline JPEG codec: roundtrip tolerances, layout edge cases, and
transform-level oracles (the IDCT is checked against the O(n^4)
textbook definition; the zigzag against the spec's published prefix).
Lossy roundtrips can't be bit-exact by design — tolerances are chosen
so a channel swap, a transposed block, or an off-by-one in the MCU
walk fails loudly while legitimate quantization error passes."""

from __future__ import annotations

import numpy as np
import pytest

from fourmc_spark.operators.imaging import UnsupportedImageError, decode_image
from fourmc_spark.operators.jpeg import _A, _ZZ, decode_jpeg, encode_jpeg


def _gradient_rgb(h, w):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_zigzag_matches_spec_prefix():
    # first 10 entries of the T.81 zigzag sequence, (row, col)
    assert _ZZ[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert len(_ZZ) == 64 and len(set(_ZZ)) == 64
    assert _ZZ[-1] == (7, 7)


def test_idct_matches_textbook_definition():
    rng = np.random.default_rng(7)
    coef = rng.integers(-200, 200, (8, 8)).astype(float)
    fast = _A.T @ coef @ _A
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
                    cv = np.sqrt(0.125) if v == 0 else np.sqrt(0.25)
                    s += cu * cv * coef[u, v] \
                        * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            slow[x, y] = s
    assert np.allclose(fast, slow, atol=1e-9)


def test_roundtrip_gray_smooth():
    img = _gradient_rgb(32, 48)[:, :, 0]
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (32, 48)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3


def test_roundtrip_rgb_444():
    img = _gradient_rgb(40, 40)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (40, 40, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4
    # channel order: red gradient rises along x, green along y
    assert out[5, -1, 0] > out[5, 0, 0] + 100
    assert out[-1, 5, 1] > out[0, 5, 1] + 100


def test_roundtrip_rgb_420_subsampled():
    img = _gradient_rgb(32, 32)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert out.shape == (32, 32, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_roundtrip_nonmultiple_of_8_dimensions():
    for h, w in ((13, 9), (8, 17), (1, 1), (9, 16)):
        img = _gradient_rgb(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 6


def test_roundtrip_noise_exercises_stuffing():
    # random noise at high quality produces dense entropy data — the
    # chance of no 0xFF byte needing a stuff across ~10kB is negligible,
    # so this exercises writer stuffing + reader unstuffing
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    enc = encode_jpeg(img, quality=100)
    scan = enc[enc.find(b"\xff\xda"):]
    assert b"\xff\x00" in scan
    out = decode_jpeg(enc)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 16


def test_roundtrip_with_restart_markers():
    img = _gradient_rgb(48, 48)
    enc = encode_jpeg(img, quality=95, restart_interval=3)
    assert b"\xff\xdd" in enc  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    out = decode_jpeg(enc)
    ref = decode_jpeg(encode_jpeg(img, quality=95))
    # restart markers change the byte stream, not the pixels
    assert np.array_equal(out, ref)


def test_subsampled_restart_markers():
    img = _gradient_rgb(33, 47)
    out = decode_jpeg(
        encode_jpeg(img, quality=95, subsample=True, restart_interval=2)
    )
    assert out.shape == (33, 47, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_progressive_raises_unsupported():
    img = _gradient_rgb(16, 16)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(UnsupportedImageError, match="baseline"):
        decode_jpeg(bytes(enc))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_truncated_stream_raises():
    img = _gradient_rgb(16, 16)
    enc = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(enc[:20])  # cut inside the header segments


def test_decode_image_dispatch_handles_jpeg():
    img = _gradient_rgb(16, 24)
    arr = decode_image(encode_jpeg(img, quality=95))
    assert arr.shape == (16, 24, 3)
    gray = decode_image(encode_jpeg(img[:, :, 0], quality=95))
    assert gray.shape == (16, 24, 1)


def test_quality_monotonic_in_error():
    img = _gradient_rgb(32, 32)
    errs = []
    for q in (30, 60, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]
