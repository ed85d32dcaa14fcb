"""4-component (Adobe CMYK / YCCK) JPEG decode (VERDICT r6 optional #8).

The independent golden is the JDK: javax.imageio writes a 4-band
Raster as a real 4-component baseline JPEG (SOF0, nf=4, no color
transform, no Adobe marker) and readRaster() returns the decoded raw
bands without colorspace conversion — an encoder AND decoder we did
not write. YCCK coverage injects an APP14 transform=2 marker into the
same stream and checks our decoder's inverse against a test-local
implementation of the documented formula.
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from fourmc_spark.operators.imaging import decode_image
from fourmc_spark.operators.jpeg import (
    adobe_color_transform,
    cmyk_to_rgb,
    decode_jpeg,
)

# JDK-dependent tests skip via the `jdk` fixture; pure-Python pins
# (transform semantics, encoder stream shape, cache immutability) run
# everywhere — they guard the decoder behavior itself, not the golden

JAVA_SRC = """
import java.awt.image.*;
import javax.imageio.*;
import javax.imageio.stream.*;
import java.io.*;

public class CmykTool {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("encode")) {
      int w = Integer.parseInt(a[1]), h = Integer.parseInt(a[2]);
      byte[] raw;
      try (FileInputStream f = new FileInputStream(a[3])) { raw = f.readAllBytes(); }
      WritableRaster r = Raster.createInterleavedRaster(DataBuffer.TYPE_BYTE, w, h, 4, null);
      int k = 0;
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) for (int b = 0; b < 4; b++)
        r.setSample(x, y, b, raw[k++] & 0xFF);
      ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
      ImageWriteParam p = wr.getDefaultWriteParam();
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
      p.setCompressionQuality(Float.parseFloat(a[5]));
      try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[4]))) {
        wr.setOutput(os);
        wr.write(null, new IIOImage(r, null, null), p);
      }
    } else {
      ImageReader rd = ImageIO.getImageReadersByFormatName("jpeg").next();
      rd.setInput(ImageIO.createImageInputStream(new File(a[1])));
      Raster r = rd.readRaster(0, null);
      int bands = r.getNumBands();
      System.out.println(r.getWidth() + " " + r.getHeight() + " " + bands);
      try (FileOutputStream fo = new FileOutputStream(a[2])) {
        for (int y = 0; y < r.getHeight(); y++) for (int x = 0; x < r.getWidth(); x++)
          for (int b = 0; b < bands; b++) fo.write(r.getSample(x, y, b));
      }
    }
  }
}
"""


@pytest.fixture(scope="module")
def jdk(tmp_path_factory):
    import shutil

    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available for the independent CMYK golden")
    td = tmp_path_factory.mktemp("cmyk")
    (td / "CmykTool.java").write_text(JAVA_SRC)
    subprocess.run(["javac", "-d", str(td), str(td / "CmykTool.java")],
                   check=True)

    def encode(raw: np.ndarray, quality: float = 1.0) -> bytes:
        h, w = raw.shape[:2]
        (td / "raw.bin").write_bytes(raw.tobytes())
        subprocess.run(
            ["java", "-cp", str(td), "CmykTool", "encode", str(w), str(h),
             str(td / "raw.bin"), str(td / "out.jpg"), str(quality)],
            check=True)
        return (td / "out.jpg").read_bytes()

    def read_raster(blob: bytes) -> np.ndarray:
        (td / "in.jpg").write_bytes(blob)
        wh = subprocess.run(
            ["java", "-cp", str(td), "CmykTool", "decode",
             str(td / "in.jpg"), str(td / "dec.bin")],
            check=True, capture_output=True, text=True).stdout.split()
        w, h, b = int(wh[0]), int(wh[1]), int(wh[2])
        return np.frombuffer((td / "dec.bin").read_bytes(),
                             np.uint8).reshape(h, w, b)

    return encode, read_raster


def _inject_app14(blob: bytes, transform: int) -> bytes:
    body = b"Adobe" + struct.pack(">HHH", 100, 0, 0) + bytes([transform])
    return (blob[:2] + b"\xff\xee" + struct.pack(">H", 2 + len(body))
            + body + blob[2:])


def test_cmyk_decode_matches_jdk_raster(jdk):
    encode, read_raster = jdk
    rng = np.random.default_rng(5)
    for raw in (
        rng.integers(0, 256, (12, 16, 4)).astype(np.uint8),
        np.full((9, 11, 4), (200, 30, 99, 77), np.uint8),  # constant
        np.full((24, 8, 4), 255, np.uint8),
    ):
        blob = encode(raw)
        jdk_bands = read_raster(blob)
        ours = decode_jpeg(blob)
        assert ours.shape == jdk_bands.shape == raw.shape
        d = np.abs(ours.astype(int) - jdk_bands.astype(int)).max()
        assert d <= 2, f"JDK disagrees by {d}"  # IDCT rounding tolerance


def test_ycck_inverse_matches_documented_formula(jdk):
    encode, _ = jdk
    # constant bands: our decoded planes are exact constants, so the
    # float-domain transform equals the test-local uint8-domain formula
    # with no rounding slack
    raw = np.full((10, 14, 4), (90, 140, 170, 33), np.uint8)
    blob = encode(raw)
    stored = decode_jpeg(blob)  # no APP14: raw 4 bands
    assert np.array_equal(stored, raw)  # constants at q1.0 are exact
    marked = _inject_app14(blob, transform=2)
    assert adobe_color_transform(marked) == 2
    got = decode_jpeg(marked)
    # independent statement of libjpeg's ycck_cmyk convert
    y = stored[..., 0].astype(np.float64)
    cb = stored[..., 1].astype(np.float64) - 128.0
    cr = stored[..., 2].astype(np.float64) - 128.0
    exp_c = 255.0 - (y + 1.402 * cr)
    exp_m = 255.0 - (y - 0.344136 * cb - 0.714136 * cr)
    exp_y = 255.0 - (y + 1.772 * cb)
    exp = np.stack([exp_c, exp_m, exp_y,
                    stored[..., 3].astype(np.float64)], -1)
    exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)
    assert np.array_equal(got, exp)
    # transform=0 marker: bands pass through untouched
    assert np.array_equal(decode_jpeg(_inject_app14(blob, 0)), stored)


def test_decode_image_converts_cmyk_to_rgb(jdk):
    encode, _ = jdk
    raw = np.full((8, 8, 4), (40, 200, 120, 250), np.uint8)
    blob = encode(raw)
    out = decode_image(blob)  # no Adobe marker: plain-CMYK convention
    assert out.shape == (8, 8, 3)
    exp = np.clip(np.round(
        (255.0 - raw[..., :3]) * (255.0 - raw[..., 3:4]) / 255.0),
        0, 255).astype(np.uint8)
    assert np.array_equal(out, exp)
    # Adobe-marked: inverted-ink convention (R = C'*K'/255)
    out2 = decode_image(_inject_app14(blob, 0))
    exp2 = np.clip(np.round(
        raw[..., :3].astype(np.float64) * raw[..., 3:4] / 255.0),
        0, 255).astype(np.uint8)
    assert np.array_equal(out2, exp2)


def test_cmyk_to_rgb_conventions():
    arr = np.zeros((1, 2, 4), np.uint8)
    arr[0, 0] = (0, 0, 0, 0)
    arr[0, 1] = (255, 255, 255, 255)
    assert cmyk_to_rgb(arr, inverted=True).tolist() == [
        [[0, 0, 0], [255, 255, 255]]]
    assert cmyk_to_rgb(arr, inverted=False).tolist() == [
        [[255, 255, 255], [0, 0, 0]]]


def test_two_component_still_rejected():
    from fourmc_spark.operators.imaging import UnsupportedImageError
    from fourmc_spark.operators.jpeg import encode_jpeg

    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = blob.find(b"\xff\xc0")
    blob[i + 9] = 2  # SOF nf: 1 -> 2 (frame data now inconsistent, but
    # the component-count guard must fire before anything else)
    with pytest.raises((UnsupportedImageError, ValueError)):
        decode_jpeg(bytes(blob))


def test_our_cmyk_encode_decodes_identically_under_jdk(jdk):
    # reverse golden: bytes from OUR 4-component encoder must decode to
    # the same bands under the JDK's independent decoder
    from fourmc_spark.operators.jpeg import encode_jpeg

    _, read_raster = jdk
    rng = np.random.default_rng(11)
    for raw, prog in (
        (np.full((10, 12, 4), (90, 140, 170, 33), np.uint8), False),
        (rng.integers(0, 256, (14, 9, 4)).astype(np.uint8), False),
        (np.full((11, 8, 4), (5, 250, 128, 64), np.uint8), True),
    ):
        blob = encode_jpeg(raw, quality=95, progressive=prog)
        jdk_bands = read_raster(blob)
        ours = decode_jpeg(blob)
        assert jdk_bands.shape == ours.shape == raw.shape
        d = np.abs(jdk_bands.astype(int) - ours.astype(int)).max()
        assert d <= 2, f"JDK disagrees with our decode by {d} (prog={prog})"


def test_cmyk_encode_rejects_subsample():
    from fourmc_spark.operators.jpeg import encode_jpeg

    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(np.zeros((8, 8, 4), np.uint8), subsample=True)


def test_adobe_rgb_transform0_three_component_passthrough():
    # APP14 transform=0 on a 3-component frame = stored RGB (libjpeg
    # JCS_RGB): the YCbCr inverse must be skipped (review finding r7)
    from fourmc_spark.operators.jpeg import (
        decode_jpeg_with_info,
        encode_jpeg,
    )

    img = np.empty((8, 8, 3), np.uint8)
    img[:, :] = (70, 120, 200)
    blob = encode_jpeg(img, quality=100)  # stores YCbCr planes
    plain = decode_jpeg(blob)
    assert np.array_equal(plain, img)  # constant/q100 exact
    marked = _inject_app14(blob, transform=0)
    got, info = decode_jpeg_with_info(marked)
    assert info["adobe_transform"] == 0 and info["components"] == 3
    # planes interpreted verbatim: the stored YCbCr constants
    y = 0.299 * 70 + 0.587 * 120 + 0.114 * 200
    cb = 128 - 0.168736 * 70 - 0.331264 * 120 + 0.5 * 200
    cr = 128 + 0.5 * 70 - 0.418688 * 120 - 0.081312 * 200
    exp = np.empty((8, 8, 3), np.uint8)
    exp[:, :] = (round(y), round(cb), round(cr))
    assert np.array_equal(got, exp)
    # transform=1 (explicit YCbCr) behaves like no marker
    assert np.array_equal(decode_jpeg(_inject_app14(blob, 1)), img)


def test_marker_walks_agree_on_tem_and_fills(jdk):
    # the light scanner and the decoder's own walk must agree about
    # APP14 presence on streams with standalone TEM markers and fill
    # bytes before the Adobe segment (review finding r7)
    from fourmc_spark.operators.jpeg import decode_jpeg_with_info

    encode, _ = jdk
    raw = np.full((8, 8, 4), (90, 140, 170, 33), np.uint8)
    blob = _inject_app14(encode(raw), transform=2)
    # TEM (FF 01) then fill bytes ahead of everything after SOI
    hostile = blob[:2] + b"\xff\x01" + b"\xff" * 2 + blob[2:]
    assert adobe_color_transform(hostile) == 2
    _, info = decode_jpeg_with_info(hostile)
    assert info["adobe_transform"] == 2


def test_cmyk_stream_has_no_jfif_app0():
    # JFIF is defined only for 1/3-component frames (ISO 10918-5): the
    # 4-component encode must stay bare (no APP0, no APP14)
    from fourmc_spark.operators.jpeg import encode_jpeg

    four = encode_jpeg(np.zeros((8, 8, 4), np.uint8))
    three = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    assert not four.startswith(b"\xff\xd8\xff\xe0")
    assert b"JFIF" not in four and b"Adobe" not in four
    assert three.startswith(b"\xff\xd8\xff\xe0")
    # and the "444" no-op mode is accepted on 4-channel input
    assert encode_jpeg(np.zeros((8, 8, 4), np.uint8), subsample="444")


def test_optimal_table_cache_returns_immutable():
    from fourmc_spark.operators.jpeg import _optimal_table

    freq = np.zeros(256, np.int64)
    freq[3] = 10
    freq[0] = 5
    bits, vals = _optimal_table(freq)
    assert isinstance(bits, tuple) and isinstance(vals, tuple)
    again = _optimal_table(freq)
    assert again == (bits, vals)


def test_app14_last_pre_sos_wins_and_post_sos_ignored():
    # libjpeg header semantics (third review, r7): the LAST APP14
    # before the FIRST SOS wins; APP14 after scan data must not flip
    # the color model — BOTH walks agree, so the pure path can never
    # diverge from a libjpeg-backed one on the same bytes
    from fourmc_spark.operators.jpeg import (
        decode_jpeg_with_info,
        encode_jpeg,
    )

    img = np.empty((8, 8, 3), np.uint8)
    img[:, :] = (70, 120, 200)
    blob = encode_jpeg(img, quality=100)
    plain = decode_jpeg(blob)

    # duplicate pre-SOS markers: last one (transform=1, YCbCr) wins
    dup = _inject_app14(_inject_app14(blob, 1), 0)
    # _inject_app14 prepends at SOI, so stream order is [0, 1]
    assert adobe_color_transform(dup) == 1
    got, info = decode_jpeg_with_info(dup)
    assert info["adobe_transform"] == 1
    assert np.array_equal(got, plain)

    # post-SOS APP14 must be invisible to both walks
    assert blob[-2:] == b"\xff\xd9"
    body = b"Adobe" + struct.pack(">HHH", 100, 0, 0) + bytes([0])
    tail = (blob[:-2] + b"\xff\xee"
            + struct.pack(">H", 2 + len(body)) + body + blob[-2:])
    assert adobe_color_transform(tail) is None
    got, info = decode_jpeg_with_info(tail)
    assert info["adobe_transform"] is None
    assert np.array_equal(got, plain)
