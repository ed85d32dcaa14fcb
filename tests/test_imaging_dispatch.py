"""decode_image's external-JPEG dispatch seam (Pillow/libjpeg).

The container has no Pillow, so a fake PIL module pins the dispatch
contract: external backend used when importable and the mode is L/RGB,
pure-numpy fallback on absence, on unsupported modes, on decode
failure, and under the FOURMC_PURE_DECODE kill-switch.
"""

from __future__ import annotations

import io
import sys
import types

import numpy as np
import pytest

from fourmc_spark.operators import imaging
from fourmc_spark.operators.jpeg import decode_jpeg, encode_jpeg


@pytest.fixture
def reset_probe(monkeypatch):
    monkeypatch.setattr(imaging, "_EXTERNAL_JPEG", None)
    monkeypatch.delenv("FOURMC_PURE_DECODE", raising=False)
    yield
    imaging._EXTERNAL_JPEG = None


def _fake_pil(monkeypatch, mode: str, arr: np.ndarray | None = None,
              raises: bool = False):
    class _Im:
        def __init__(self) -> None:
            self.mode = mode
            self.size = ((arr.shape[1], arr.shape[0])
                         if arr is not None else (8, 8))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def __array__(self, dtype=None, copy=None):
            return arr

    class _Image:
        @staticmethod
        def open(fp):
            assert isinstance(fp, io.BytesIO)
            if raises:
                raise OSError("broken backend")
            return _Im()

    pil = types.ModuleType("PIL")
    pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _Image)


GRAY = np.arange(64, dtype=np.uint8).reshape(8, 8)
JPEG = encode_jpeg(GRAY, quality=95)


def test_external_backend_used_for_rgb_mode(reset_probe, monkeypatch):
    want = np.full((8, 8, 3), 7, np.uint8)
    _fake_pil(monkeypatch, "RGB", want)
    out = imaging.decode_image(JPEG)
    assert np.array_equal(out, want)


def test_external_gray_gets_channel_axis(reset_probe, monkeypatch):
    _fake_pil(monkeypatch, "L", GRAY)
    out = imaging.decode_image(JPEG)
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out[:, :, 0], GRAY)


def test_unsupported_mode_falls_back_to_pure(reset_probe, monkeypatch):
    _fake_pil(monkeypatch, "CMYK", None)
    out = imaging.decode_image(JPEG)
    assert np.array_equal(out[:, :, 0], decode_jpeg(JPEG))


def test_backend_failure_falls_back_to_pure(reset_probe, monkeypatch):
    _fake_pil(monkeypatch, "RGB", None, raises=True)
    out = imaging.decode_image(JPEG)
    assert np.array_equal(out[:, :, 0], decode_jpeg(JPEG))


def test_kill_switch_forces_pure_path(reset_probe, monkeypatch):
    poisoned = np.zeros((1, 1, 3), np.uint8)
    _fake_pil(monkeypatch, "RGB", poisoned)
    monkeypatch.setenv("FOURMC_PURE_DECODE", "1")
    out = imaging.decode_image(JPEG)
    assert np.array_equal(out[:, :, 0], decode_jpeg(JPEG))


def test_external_backend_respects_pixel_budget(reset_probe, monkeypatch):
    # the external decode must enforce the same MAX_PIXELS executor
    # budget as the pure decoder, BEFORE pixels materialize
    class _HugeIm:
        mode = "RGB"
        size = (1 << 14, 1 << 14)  # 268M pixels > MAX_PIXELS

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def __array__(self, dtype=None, copy=None):  # pragma: no cover
            raise AssertionError("pixels must not materialize")

    class _Image:
        @staticmethod
        def open(fp):
            return _HugeIm()

    pil = types.ModuleType("PIL")
    pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _Image)
    with pytest.raises(ValueError, match="pixel budget"):
        imaging.decode_image(JPEG)


def test_absent_backend_uses_pure_path(reset_probe, monkeypatch):
    monkeypatch.setitem(sys.modules, "PIL", None)  # import -> ImportError
    out = imaging.decode_image(JPEG)
    assert np.array_equal(out[:, :, 0], decode_jpeg(JPEG))
    assert imaging._EXTERNAL_JPEG is False  # probed once, cached
