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


def test_roundtrip_rgb_422_subsampled():
    # 4:2:2: chroma halved horizontally only — exercises the (2,1)
    # sampling-factor decode path with smooth chroma so the box-average
    # + triangle-upsample loss stays small
    yy, xx = np.mgrid[0:24, 0:33]
    img = np.stack([yy * 5, xx * 4, (yy + xx) * 3], -1).clip(
        0, 255).astype(np.uint8)
    enc = encode_jpeg(img, quality=92, subsample="422")
    out = decode_jpeg(enc)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6


def test_constant_color_422_roundtrip_exact():
    # same exactness argument as 4:2:0: constant chroma survives the
    # horizontal box average + triangle upsample bit-exactly at q100
    img = np.empty((13, 19, 3), np.uint8)
    img[:, :] = (200, 30, 90)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsample="422"))
    assert (out == img).all()


def test_unknown_subsampling_mode_raises():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_gradient_rgb(16, 16), subsample="411")


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


def test_sof2_marker_on_baseline_stream_raises_value_error():
    # SOF2 is now DECODED (annex G) — but relabeling a baseline stream
    # as progressive makes it structurally invalid: its SOS declares the
    # band 0..63, which a progressive DC scan cannot carry
    img = _gradient_rgb(16, 16)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(bytes(enc))


@pytest.mark.parametrize("nc", [2])
def test_unsupported_component_count_raises(nc):
    # nc=2 used to IndexError at the YCbCr unpack (outside the
    # ValueError contract) and must reject at SOF parse; nc=4 (Adobe
    # CMYK/YCCK) is SUPPORTED since round 7 (tests/test_jpeg_cmyk.py)
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xd9"
    with pytest.raises(UnsupportedImageError, match="component"):
        decode_jpeg(bytes(out))


def test_arithmetic_sof_raises_unsupported():
    img = _gradient_rgb(16, 16)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(UnsupportedImageError, match="arithmetic"):
        decode_jpeg(bytes(enc))


def _progressive_fixture():
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from jpeg_golden_fixtures import load

    for fx, jpeg, expected in load():
        if fx["name"] == "rgb_prog_32x40":
            return fx, jpeg, expected
    raise AssertionError("progressive fixture missing")


def test_progressive_prefix_decodes_as_preview():
    # T.81 G: any prefix of a progressive stream is a legal coarse
    # image once every component has a DC scan. Chop the JDK fixture
    # after its third scan, terminate with EOI, decode both.
    fx, jpeg, _expected = _progressive_fixture()
    sos = []
    i = 0
    while True:
        i = jpeg.find(b"\xff\xda", i + 2)
        if i < 0:
            break
        sos.append(i)
    assert len(sos) >= 4, "JDK emitted fewer scans than expected"
    preview = decode_jpeg(jpeg[:sos[3]] + b"\xff\xd9")
    full = decode_jpeg(jpeg)
    assert preview.shape == full.shape == (fx["h"], fx["w"], 3)
    d = np.abs(preview.astype(int) - full.astype(int))
    # a preview is the same picture, coarser: close on average but not
    # equal (later scans add AC detail / precision bits)
    assert d.mean() < 32
    assert d.max() > 0


def test_progressive_dc_shift_overflow_raises_value_error():
    # crafted SOF2 stream: DC scan at Al=13 whose DHT maps the 1-bit
    # code '0' to category 15, with magnitude bits all ones — pred walks
    # +32767 per block and pred << 13 would exceed int32 after a few
    # blocks (NumPy 2 raises OverflowError on the store, escaping the
    # ValueError contract, before the shifted-value guard existed)
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    sof = bytes([8]) + struct.pack(">HH", 8, 80) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    bits = [0] * 16
    bits[0] = 1  # one 1-bit code
    dht = bytes([0x00]) + bytes(bits) + bytes([15])  # code '0' -> cat 15
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([1, 1, 0x00, 0, 0, 0x0D])  # Ss=0 Se=0 Ah=0 Al=13
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += b"\x7f\xff" * 10  # per block: code bit 0 + 15 one-bits = +32767
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="DC prediction out of range"):
        decode_jpeg(bytes(out))


def _crafted_progressive_dc_stream(n_blocks: int, restart_interval: int,
                                   rst_ids=None) -> bytes:
    # minimal gray SOF2 stream: one DC scan (Al=0), category-0 diffs
    # everywhere (each block is the single 1-bit code '0'), optional
    # DRI + RSTn markers with 1-padded byte alignment per interval
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    sof = bytes([8]) + struct.pack(">HH", 8, 8 * n_blocks) + bytes(
        [1, 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    bits = [0] * 16
    bits[0] = 1
    dht = bytes([0x00]) + bytes(bits) + bytes([0])  # code '0' -> category 0
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([1, 1, 0x00, 0, 0, 0x00])  # Ss=0 Se=0 Ah=0 Al=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    intervals = ([n_blocks] if not restart_interval else
                 [restart_interval] * (n_blocks // restart_interval))
    for i, nb in enumerate(intervals):
        # nb code bits of '0', padded to a byte with 1-bits
        nbytes = (nb + 7) // 8
        val = ((1 << (nbytes * 8 - nb)) - 1)  # low pad bits set
        out += val.to_bytes(nbytes, "big")
        if i + 1 < len(intervals):
            rid = (rst_ids[i] if rst_ids else i % 8)
            out += bytes([0xFF, 0xD0 + rid])
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_dc_scan_with_restart_markers():
    dec = decode_jpeg(_crafted_progressive_dc_stream(8, restart_interval=2))
    assert dec.shape == (8, 64)
    assert (dec == 128).all()  # all-zero DC + level shift


def test_progressive_restart_out_of_order_raises():
    bad = _crafted_progressive_dc_stream(8, restart_interval=2,
                                         rst_ids=[0, 2, 1])
    with pytest.raises(ValueError, match="restart marker out of order"):
        decode_jpeg(bad)


def test_progressive_missing_dc_scan_raises():
    # chop BEFORE any scan: no component has DC data
    fx, jpeg, _expected = _progressive_fixture()
    first_sos = jpeg.find(b"\xff\xda")
    with pytest.raises(ValueError, match="no scan data"):
        decode_jpeg(jpeg[:first_sos] + b"\xff\xd9")


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


# ---------------------------------------------------------------------------
# error contract: corrupt/truncated input must raise ValueError, never
# IndexError/struct.error — callers follow decode_image's documented
# (ValueError, UnsupportedImageError) contract
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bad", [
    b"\xff\xd8\xff",                  # marker byte cut in half
    b"\xff\xd8\xff\xdb",              # segment header missing entirely
    b"\xff\xd8\xff\xdb\x00\x05\x00",  # DQT seglen runs past the buffer
    b"\xff\xd8\xff\xdb\x00\x04\x00\x00",   # DQT too short for a table
    b"\xff\xd8\xff\xc4\x00\x04\x00\x00",   # DHT too short for bits[]
    b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x08",  # SOF cut mid-dimensions
    b"\xff\xd8\xff\xdd\x00\x03\x00",  # DRI with 1-byte payload
    b"\xff\xd8\xff\xda\x00\x03\x01",  # SOS before any SOF
])
def test_corrupt_headers_raise_value_error(bad):
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_sos_with_zero_components_raises_value_error():
    # ns=0 would make scan_sel empty -> scan_sel[0] IndexError before
    # the guard existed; must stay inside the ValueError contract
    img = _gradient_rgb(16, 16)
    enc = bytearray(encode_jpeg(img[:, :, 0]))
    i = enc.find(b"\xff\xda")
    assert i >= 0 and enc[i + 4] == 1  # gray scan declares 1 component
    enc[i + 4] = 0
    with pytest.raises(ValueError, match="SOS declares 0 components"):
        decode_jpeg(bytes(enc))


def test_duplicate_sof_raises_value_error():
    # a gray SOF+SOS followed by a 3-component SOF+SOS used to rebind
    # frame/comps without reallocating planes -> planes[ci] IndexError
    gray = bytearray(encode_jpeg(_gradient_rgb(16, 16)[:, :, 0]))
    color = encode_jpeg(_gradient_rgb(16, 16))
    assert gray[-2:] == b"\xff\xd9"
    j = color.find(b"\xff\xc0")  # splice color's SOF..EOI after gray's scan
    crafted = bytes(gray[:-2]) + color[j:]
    with pytest.raises(ValueError, match="multiple SOF"):
        decode_jpeg(crafted)


def test_single_component_scan_with_sampling_factors():
    # A grayscale baseline file whose SOF declares 2x2 sampling: per
    # T.81 A.2.2 a single-component scan is NON-interleaved — one data
    # unit per MCU on the component's own block grid — so the entropy
    # stream is identical to the 1x1 encoding and must decode to the
    # same pixels. (The interleaved-only reading walks 4 blocks/MCU on
    # a half-size grid and desyncs.)
    g = (np.arange(24 * 17, dtype=np.uint8).reshape(24, 17) * 3) % 251
    data = bytearray(encode_jpeg(g, quality=100))
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    # SOF0 layout: marker(2) len(2) prec(1) h(2) w(2) nc(1) id(1) samp(1)
    samp_off = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert data[samp_off] == 0x11
    data[samp_off] = 0x22
    patched = decode_jpeg(bytes(data))
    baseline = decode_jpeg(encode_jpeg(g, quality=100))
    assert np.array_equal(patched, baseline)


def _encode_multiscan_rgb(arr: np.ndarray, quality: int) -> bytes:
    """A 4:4:4 color baseline stream written as THREE sequential
    single-component scans (legal per T.81) — same tables and
    coefficients as encode_jpeg's interleaved output, different scan
    structure. Built from the module's own primitives so the fixture
    never goes stale against the table format."""
    import struct

    from fourmc_spark.operators.jpeg import (
        _ZZ_COLS,
        _ZZ_ROWS,
        _BitWriter,
        _encode_block,
        _fixed_length_table,
        _huff_encode_lut,
        _padded_block,
        _quant_table,
    )

    h, w = arr.shape[:2]
    q = _quant_table(quality)
    qzz = q[_ZZ_ROWS, _ZZ_COLS]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = (128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
          + 0.5 * rgb[:, :, 2])
    cr = (128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
          - 0.081312 * rgb[:, :, 2])
    planes = [y, cb, cr]

    dc_bits, dc_vals = _fixed_length_table(list(range(12)))
    ac_bits, ac_vals = _fixed_length_table(
        [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    dc_enc = _huff_encode_lut(dc_bits, dc_vals)
    ac_enc = _huff_encode_lut(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" \
        + bytes(int(v) for v in qzz)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for i in range(3):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)),
                             (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    bw_blocks = -(-w // 8)
    bh_blocks = -(-h // 8)
    for ci, plane in enumerate(planes):
        sos = bytes([1, ci + 1, 0x00]) + b"\x00\x3f\x00"
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BitWriter()
        preds = [0] * 3
        for m in range(bw_blocks * bh_blocks):
            by, bx = divmod(m, bw_blocks)
            block = _padded_block(plane, by * 8, bx * 8) - 128.0
            coef = _A @ block @ _A.T
            zz = np.round(coef[_ZZ_ROWS, _ZZ_COLS] / qzz).astype(np.int64)
            _encode_block(bw, zz, preds, ci, dc_enc, ac_enc)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_scalar_reference(arr: np.ndarray, quality: int,
                             subsample: bool = False,
                             restart_interval: int = 0) -> bytes:
    """The pre-vectorization per-MCU/_BitWriter encode loop, kept as a
    byte-level oracle: encode_jpeg's batched record pipeline must emit
    the IDENTICAL stream (same tables, same headers, same entropy
    bits)."""
    import struct

    from fourmc_spark.operators.jpeg import (
        _ZZ_COLS,
        _ZZ_ROWS,
        _BitWriter,
        _box2,
        _encode_block,
        _fixed_length_table,
        _huff_encode_lut,
        _padded_block,
        _quant_table,
    )

    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    gray = a.ndim == 2
    h, w = a.shape[:2]
    q = _quant_table(quality)
    qzz = q[_ZZ_ROWS, _ZZ_COLS]
    if gray:
        planes = [a.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = (128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
              + 0.5 * rgb[:, :, 2])
        cr = (128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
              - 0.081312 * rgb[:, :, 2])
        if subsample == "422":
            from fourmc_spark.operators.jpeg import _boxh

            cb, cr = _boxh(cb), _boxh(cr)
            samps = [(2, 1), (1, 1), (1, 1)]
        elif subsample:
            cb, cr = _box2(cb), _box2(cr)
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1)] * 3
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    dc_bits, dc_vals = _fixed_length_table(list(range(12)))
    ac_bits, ac_vals = _fixed_length_table(
        [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    dc_enc = _huff_encode_lut(dc_bits, dc_vals)
    ac_enc = _huff_encode_lut(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" \
        + bytes(int(v) for v in qzz)
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (hs, vs) in enumerate(samps):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)),
                             (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * nc
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            preds = [0] * nc
        my, mx = divmod(m, mcux)
        for ci, ((hs, vs), plane) in enumerate(zip(samps, planes)):
            for v in range(vs):
                for hh in range(hs):
                    block = _padded_block(
                        plane, (my * vs + v) * 8, (mx * hs + hh) * 8
                    ) - 128.0
                    coef = _A @ block @ _A.T
                    zz = np.round(coef[_ZZ_ROWS, _ZZ_COLS] / qzz
                                  ).astype(np.int64)
                    _encode_block(bw, zz, preds, ci, dc_enc, ac_enc)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("shape,subsample,ri,quality", [
    # at or below the 32-block dispatch threshold: scalar path
    ((16, 16), False, 0, 90),
    ((17, 23, 3), False, 0, 100),   # partial edge blocks, dense coeffs
    ((32, 24, 3), True, 0, 80),     # 4:2:0 interleaved MCUs
    ((21, 30, 3), True, 3, 60),     # subsampled + restart intervals
    ((16, 16), False, 1, 35),       # restart every MCU, gray
    # above the threshold: the VECTORIZED record pipeline must emit the
    # same bytes as the scalar loop (these are the cases that actually
    # exercise _entropy_records/_pack_bits/_stuff)
    ((48, 48, 3), False, 0, 75),    # 108 blocks, 4:4:4
    ((64, 48, 3), True, 0, 85),     # 4:2:0 interleaved, partial MCUs
    ((48, 48, 3), False, 3, 55),    # vectorized + restart intervals
    ((41, 57), False, 5, 100),      # gray, dense coeffs, restarts
    ((21, 27, 3), "422", 0, 80),    # 4:2:2, scalar dispatch
    ((48, 50, 3), "422", 2, 70),    # 4:2:2, vectorized + restarts
])
def test_vectorized_encoder_byte_identical_to_scalar_reference(
        shape, subsample, ri, quality):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    got = encode_jpeg(img, quality=quality, subsample=subsample,
                      restart_interval=ri)
    want = _encode_scalar_reference(img, quality=quality,
                                    subsample=subsample,
                                    restart_interval=ri)
    assert got == want


def test_constant_color_420_roundtrip_exact_across_id_sweep():
    # exactness claim behind the multimodal_jpeg_420_roundtrip oracle:
    # constant-color 4:2:0 at quality 100 decodes to EXACTLY the source
    # constants (DC-only planes, <=1/16 per-plane error, inverse color
    # transform amplification < 0.5). Sweep the query's id construction
    # over one full period of each modulus interaction sample.
    for d in list(range(60)) + [255, 256, 1000, 4095, 9999]:
        w, h = 9 + d % 21, 9 + d % 17
        rgb = (d % 256, d * 7 % 256, d * 13 % 256)
        img = np.empty((h, w, 3), np.uint8)
        img[:, :] = rgb
        dec = decode_jpeg(encode_jpeg(img, quality=100, subsample=True))
        assert dec.shape == (h, w, 3)
        assert (dec == img).all(), (d, rgb, np.unique(dec.reshape(-1, 3),
                                                      axis=0))


@pytest.mark.parametrize("shape,kw", [
    ((96, 128, 3), {}),                      # dense 4:4:4
    ((64, 80), {}),                          # gray
    ((48, 64, 3), {"subsample": True}),      # 4:2:0
    ((44, 52, 3), {"subsample": "422"}),     # 4:2:2
    ((40, 40, 3), {"restart_interval": 2}),  # per-interval packing
    ((14, 13), {}),                          # degenerate histogram:
                                             # constant-ish tiny image
])
def test_optimized_huffman_same_pixels_smaller_files(shape, kw):
    rng = np.random.default_rng(sum(shape))
    img = (rng.integers(0, 6, shape, np.int32) * 9
           + np.arange(shape[1])[None, :]
           .reshape(1, -1, *([1] * (len(shape) - 2)))).clip(
               0, 255).astype(np.uint8)
    fixed = encode_jpeg(img, quality=85, **kw)
    opt = encode_jpeg(img, quality=85, optimize_huffman=True, **kw)
    # identical coefficients, different entropy coding
    assert np.array_equal(decode_jpeg(fixed), decode_jpeg(opt))
    assert len(opt) < len(fixed)


def test_optimized_huffman_constant_image_degenerate_table():
    # a constant image uses ~2 distinct symbols per table — the K.2
    # builder must still emit valid canonical tables (and never the
    # all-ones code, which the reserved pseudo-symbol guarantees)
    img = np.full((24, 24, 3), 200, np.uint8)
    opt = encode_jpeg(img, quality=100, optimize_huffman=True,
                      subsample=True)
    out = decode_jpeg(opt)
    assert (out == img).all()


def test_multiscan_baseline_decodes_like_interleaved():
    # Three sequential single-component scans carry exactly the same
    # coefficients as the interleaved encoding — the decoder must
    # accumulate scans until EOI and produce identical pixels
    arr = _gradient_rgb(21, 30)
    multi = _encode_multiscan_rgb(arr, quality=90)
    inter = encode_jpeg(arr, quality=90)
    assert np.array_equal(decode_jpeg(multi), decode_jpeg(inter))


def test_multiscan_missing_component_raises():
    # a stream that reaches EOI having scanned only some components is
    # corrupt (truncated mid-pipeline), not silently half-gray
    arr = _gradient_rgb(16, 16)
    multi = bytearray(_encode_multiscan_rgb(arr, quality=90))
    # chop everything after the FIRST scan's data: find the second SOS
    first_sos = multi.find(b"\xff\xda")
    second_sos = multi.find(b"\xff\xda", first_sos + 2)
    assert second_sos > 0
    chopped = bytes(multi[:second_sos]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="component"):
        decode_jpeg(chopped)


def test_fill_bytes_before_markers_skipped():
    # T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    # fill bytes — both between header segments and after scan data
    img = (np.arange(24 * 16, dtype=np.uint8).reshape(24, 16) * 7) % 251
    blob = encode_jpeg(img, quality=95)
    base = decode_jpeg(blob)
    # between SOI and the first segment
    padded = blob[:2] + b"\xff" * 3 + blob[2:]
    assert np.array_equal(decode_jpeg(padded), base)
    # after the entropy-coded scan data, before EOI
    assert blob[-2:] == b"\xff\xd9"
    padded = blob[:-2] + b"\xff" * 4 + b"\xff\xd9"
    assert np.array_equal(decode_jpeg(padded), base)


def test_vectorized_encode_dc_category_guard():
    # a DC diff beyond baseline category 11 must fail loudly (the code
    # gather would otherwise emit a zero-length code = corrupt stream)
    from fourmc_spark.operators.jpeg import _entropy_records

    zz = np.zeros((2, 64), np.int32)
    zz[1, 0] = 4096  # diff 4096 -> category 13
    with pytest.raises(ValueError, match="DC difference"):
        _entropy_records(zz, np.arange(2), 1, 0)


def test_progressive_encode_matches_baseline_pixels():
    # progressive changes only entropy-coding order, never coefficients:
    # decoded pixels must equal the baseline encode of the same input
    rng = np.random.default_rng(11)
    cases = [((24, 17), False), ((21, 19, 3), False),
             ((21, 19, 3), True), ((16, 24, 3), "422"), ((1, 1), False)]
    for shape, sub in cases:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for q in (75, 100):
            b = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            p = decode_jpeg(encode_jpeg(
                img, quality=q, subsample=sub, progressive=True))
            assert np.array_equal(b, p), (shape, sub, q)


def test_progressive_stream_shape():
    blob = encode_jpeg(np.zeros((8, 8), np.uint8), progressive=True)
    assert b"\xff\xc2" in blob  # SOF2
    # gray: 1 DC scan + 2 AC band scans = 3 SOS markers
    assert blob.count(b"\xff\xda") == 3
    color = encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsample=True,
                        progressive=True)
    assert color.count(b"\xff\xda") == 1 + 2 * 3


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(np.zeros((8, 8), np.uint8), progressive=True,
                    restart_interval=2)


def test_progressive_eob_run_split_beyond_32767():
    # 2048x2048 constant gray = 65536 all-zero AC blocks per band: the
    # EOB run must split at EOB14's 32767 cap and still decode exactly
    img = np.full((2048, 2048), 33, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, progressive=True))
    assert np.array_equal(out, img)


def test_fill_bytes_before_restart_markers_skipped():
    # T.81 B.1.1.2 applies to RSTn markers inside the entropy stream
    # too, not just markers between segments (review finding r7)
    img = (np.arange(48 * 24, dtype=np.uint8).reshape(48, 24) * 5) % 249
    blob = encode_jpeg(img, quality=90, restart_interval=1)
    base = decode_jpeg(blob)
    sos = blob.find(b"\xff\xda")
    rst = blob.find(b"\xff\xd0", sos)
    assert rst > 0
    padded = blob[:rst] + b"\xff" * 3 + blob[rst:]
    assert np.array_equal(decode_jpeg(padded), base)
    # and before EVERY restart marker at once
    import re
    parts = re.split(b"(\xff[\xd0-\xd7])", blob[sos:])
    rebuilt = blob[:sos] + parts[0] + b"".join(
        b"\xff\xff" + parts[i] + parts[i + 1]
        for i in range(1, len(parts) - 1, 2)
    )
    assert np.array_equal(decode_jpeg(bytes(rebuilt)), base)
