#!/usr/bin/env python
"""Generate external golden JPEG fixtures via the JDK's javax.imageio.

Why: the pure-numpy JPEG codec (fourmc_spark/operators/jpeg.py) was
verified against its own encoder, spec internals, and a fuzz suite — but
a complementary encoder/decoder bug pair would cancel in every such
test. The JDK ships an independent JPEG implementation (no libjpeg/PIL
in this container), so this script:

  1. builds small deterministic images in numpy,
  2. encodes them to JPEG with the JDK writer (independent encoder),
  3. decodes those same bytes back with the JDK reader (independent
     decoder) to get the externally-blessed pixel arrays,
  4. emits tests/jpeg_golden_fixtures.py with the JPEG bytes and the
     expected pixels pinned as literals (zlib+base85) so the regression
     tests run WITHOUT java.

Also cross-checks the reverse direction at generation time: our
encoder's bytes must decode to ~the same pixels under the JDK reader.

Usage: python scripts/gen_jpeg_golden.py  (requires javac/java)
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys
import tempfile
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JAVA_SRC = r"""
import java.awt.image.BufferedImage;
import java.io.*;
import java.nio.file.*;
import javax.imageio.*;
import javax.imageio.stream.*;

// JpegTool encode <raw-in> <w> <h> <gray|rgb> <quality> <jpeg-out> [prog]
// JpegTool decode <jpeg-in> <raw-rgb-out>   (prints "w h" on stdout)
public class JpegTool {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("encode")) {
            int w = Integer.parseInt(args[2]), h = Integer.parseInt(args[3]);
            boolean gray = args[4].equals("gray");
            boolean prog = args.length > 7 && args[7].equals("prog");
            float q = Float.parseFloat(args[5]);
            byte[] raw = Files.readAllBytes(Paths.get(args[1]));
            BufferedImage img = new BufferedImage(
                w, h, gray ? BufferedImage.TYPE_BYTE_GRAY
                           : BufferedImage.TYPE_3BYTE_BGR);
            // write raster samples directly: TYPE_BYTE_GRAY is a LINEAR
            // gray colorspace, so setRGB would gamma-convert the samples
            // before they reach the JPEG encoder
            int k = 0;
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    if (gray) {
                        img.getRaster().setSample(x, y, 0, raw[k++] & 0xff);
                    } else {
                        int r = raw[k++] & 0xff, g = raw[k++] & 0xff,
                            b = raw[k++] & 0xff;
                        img.setRGB(x, y, (r << 16) | (g << 8) | b);
                    }
            ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
            ImageWriteParam p = wr.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(q);
            if (prog) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
            try (ImageOutputStream os =
                     ImageIO.createImageOutputStream(new File(args[6]))) {
                wr.setOutput(os);
                wr.write(null, new IIOImage(img, null, null), p);
            }
            wr.dispose();
        } else {
            BufferedImage img = ImageIO.read(new File(args[1]));
            int w = img.getWidth(), h = img.getHeight();
            boolean gray = img.getRaster().getNumBands() == 1;
            byte[] out = new byte[w * h * 3];
            int k = 0;
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    if (gray) {
                        // raw stored sample, not getRGB's linear->sRGB view
                        int s = img.getRaster().getSample(x, y, 0);
                        out[k++] = (byte) s;
                        out[k++] = (byte) s;
                        out[k++] = (byte) s;
                    } else {
                        int px = img.getRGB(x, y);
                        out[k++] = (byte) (px >> 16);
                        out[k++] = (byte) (px >> 8);
                        out[k++] = (byte) px;
                    }
            Files.write(Paths.get(args[2]), out);
            System.out.println(w + " " + h);
        }
    }
}
"""


def _images() -> list[tuple[str, np.ndarray, float, bool]]:
    rng = np.random.default_rng(42)
    out = []
    # gray gradient: no chroma, exercises DC prediction + IDCT only
    y, x = np.mgrid[0:16, 0:24]
    out.append(("gray_gradient_16x24",
                ((y * 7 + x * 5) % 256).astype(np.uint8), 0.9, False))
    # gray noise at an odd size: partial edge MCUs, heavy AC energy
    out.append(("gray_noise_17x13",
                rng.integers(0, 256, (17, 13), dtype=np.uint8), 0.7, False))
    # constant color: every block is DC-only; decode must be spatially flat
    c = np.zeros((16, 16, 3), np.uint8)
    c[:] = (80, 160, 40)
    out.append(("rgb_constant_16x16", c, 0.9, False))
    # smooth color gradient (JDK default 4:2:0 subsampling on 3-channel):
    # exercises chroma upsampling on content where interpolation
    # differences between implementations stay small
    y, x = np.mgrid[0:32, 0:24]
    g = np.stack([(y * 4) % 256, (x * 5) % 256, ((x + y) * 3) % 256],
                 axis=-1).astype(np.uint8)
    out.append(("rgb_gradient_32x24", g, 0.9, False))
    # odd-size color with moderate texture: partial MCUs + subsampling
    t = (rng.integers(0, 5, (19, 21, 3), dtype=np.int32) * 8
         + np.arange(21)[None, :, None] * 3).clip(0, 255).astype(np.uint8)
    out.append(("rgb_texture_19x21", t, 0.5, False))
    # PROGRESSIVE (SOF2): the JDK writer emits ~10 scans (DC first +
    # refinement, AC bands + successive approximation, EOB runs) — the
    # whole annex-G surface in one fixture each for gray and color
    out.append(("gray_prog_29x37",
                ((np.mgrid[0:29, 0:37][0] * 3 + np.mgrid[0:29, 0:37][1] * 5)
                 % 256 + rng.integers(0, 40, (29, 37))).astype(np.uint8)
                % 256, 0.85, True))
    out.append(("rgb_prog_32x40",
                np.stack([(y2 := np.mgrid[0:32, 0:40][0]) * 7 % 256,
                          (x2 := np.mgrid[0:32, 0:40][1]) * 6 % 256,
                          (y2 + x2) * 3 % 256], -1).astype(np.uint8),
                0.8, True))
    return out


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="jpeg-golden-")
    src = os.path.join(tmp, "JpegTool.java")
    with open(src, "w") as f:
        f.write(JAVA_SRC)
    subprocess.run(["javac", "-d", tmp, src], check=True)

    def jrun(*args: str) -> str:
        return subprocess.run(
            ["java", "-cp", tmp, "JpegTool", *args],
            check=True, capture_output=True, text=True,
        ).stdout

    fixtures = []
    for name, img, q, prog in _images():
        gray = img.ndim == 2
        raw = os.path.join(tmp, f"{name}.raw")
        jpg = os.path.join(tmp, f"{name}.jpg")
        dec = os.path.join(tmp, f"{name}.dec")
        h, w = img.shape[:2]
        with open(raw, "wb") as f:
            f.write(img.tobytes())
        jrun("encode", raw, str(w), str(h), "gray" if gray else "rgb",
             str(q), jpg, *(["prog"] if prog else []))
        if prog:
            assert b"\xff\xc2" in open(jpg, "rb").read(), name
        wh = jrun("decode", jpg, dec).split()
        assert [int(wh[0]), int(wh[1])] == [w, h]
        jpeg_bytes = open(jpg, "rb").read()
        expected = np.frombuffer(open(dec, "rb").read(), np.uint8).reshape(
            h, w, 3
        )
        # sanity: the JDK's own decode must be near the source image
        err = np.abs(expected.astype(int)
                     - (np.stack([img] * 3, -1) if gray else img).astype(int))
        fixtures.append((name, w, h, gray, q, prog, jpeg_bytes, expected,
                         int(err.max())))
        print(f"{name}: {len(jpeg_bytes)} jpeg bytes, "
              f"jdk-vs-source maxdiff {err.max()}")

    # reverse direction: OUR encoder -> JDK decoder (generation-time check)
    from fourmc_spark.operators.jpeg import decode_jpeg, encode_jpeg
    for name, img, _q, _prog in _images():
        ours = encode_jpeg(img, quality=90)
        jpg = os.path.join(tmp, "rev.jpg")
        dec = os.path.join(tmp, "rev.dec")
        with open(jpg, "wb") as f:
            f.write(ours)
        wh = jrun("decode", jpg, dec).split()
        h, w = img.shape[:2]
        assert [int(wh[0]), int(wh[1])] == [w, h], name
        jdk = np.frombuffer(open(dec, "rb").read(), np.uint8).reshape(h, w, 3)
        mine = decode_jpeg(ours)
        if mine.ndim == 2:
            mine = np.stack([mine] * 3, axis=-1)
        elif mine.shape[-1] == 1:
            mine = np.repeat(mine, 3, axis=-1)
        d = int(np.abs(jdk.astype(int) - mine.astype(int)).max())
        print(f"reverse {name}: jdk-decode-of-our-bytes vs our-decode "
              f"maxdiff {d}")
        assert d <= 3, (name, d)

    def lit(b: bytes) -> str:
        enc = base64.b85encode(zlib.compress(b, 9)).decode()
        lines = [enc[i:i + 68] for i in range(0, len(enc), 68)]
        body = "\n".join(f'    "{ln}"' for ln in lines)
        return "(\n" + body + "\n)"

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "jpeg_golden_fixtures.py")
    with open(out_path, "w") as f:
        f.write('"""EXTERNAL golden JPEG fixtures — GENERATED, do not edit.\n'
                "\n"
                "Produced by scripts/gen_jpeg_golden.py using the JDK's\n"
                "javax.imageio JPEG codec (an implementation independent of\n"
                "fourmc_spark.operators.jpeg): `jpeg_b85` are JPEG bytes the\n"
                "JDK ENCODER emitted, `pixels_b85` the RGB array the JDK\n"
                "DECODER produced for those same bytes. A complementary bug\n"
                "pair in our encoder+decoder cannot cancel against these.\n"
                '"""\n\n'
                "import base64\nimport zlib\n\n\n"
                "def _unpack(s: str) -> bytes:\n"
                "    return zlib.decompress(base64.b85decode(s))\n\n\n"
                "FIXTURES = [\n")
        for (name, w, h, gray, q, prog, jpeg_bytes, expected,
                maxdiff) in fixtures:
            f.write(f"    dict(\n        name={name!r}, w={w}, h={h}, "
                    f"gray={gray}, quality={q}, progressive={prog},\n"
                    f"        jdk_vs_source_maxdiff={maxdiff},\n"
                    f"        jpeg_b85={lit(jpeg_bytes)},\n"
                    f"        pixels_b85={lit(expected.tobytes())},\n"
                    "    ),\n")
        f.write("]\n\n\n"
                "def load():\n"
                "    import numpy as np\n"
                "    out = []\n"
                "    for fx in FIXTURES:\n"
                "        jpeg = _unpack(fx['jpeg_b85'])\n"
                "        px = np.frombuffer(_unpack(fx['pixels_b85']),\n"
                "                           np.uint8)\n"
                "        out.append((fx, jpeg,\n"
                "                    px.reshape(fx['h'], fx['w'], 3)))\n"
                "    return out\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
