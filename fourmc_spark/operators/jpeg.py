"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy.

Closes the last multimodal-column gap: the container has no libjpeg, so
compressed camera formats previously raised ``UnsupportedImageError``
and only PPM/PGM/BMP flowed through the decode → feature → resize path
(``operators/imaging.py``). This module implements the baseline
sequential DCT process AND the progressive Huffman process (SOF2,
T.81 annex G: DC first/refinement scans, AC spectral bands with EOB
runs, successive-approximation correction bits) from the PUBLIC spec —
marker parsing, DQT/DHT/SOF/SOS/DRI, canonical Huffman entropy decoding
with byte-stuffing and restart markers, dequantization, batched inverse
DCT, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), and the JFIF YCbCr→RGB
transform. Arithmetic coding, lossless, and hierarchical modes are out
of scope and raise with a clear message.

A matching baseline ENCODER is included so pipelines (and tests) can
produce real JPEG fixtures without external tools. It is
correctness-oriented, not ratio-oriented: it writes fixed-length
canonical Huffman tables constructed programmatically (every table is
embedded in the stream's DHT segments, so ANY valid table decodes
identically everywhere — no dependence on perfectly-recalled Annex K
constants) and a deterministic frequency-weighted quantization table
(embedded in DQT, same argument). Optional 4:2:0 subsampling exercises
the decoder's interleaved-MCU + upsampling path.

Scale shape: this is the per-payload kernel behind the Arrow-batched
pandas UDFs in ``operators/multimodal.py`` — decoding parallelizes
across Spark tasks per batch. Within one payload the entropy pass is a
per-symbol Python loop over 16-bit-window Huffman LUTs (libjpeg's
fast-path shape; the bit dependencies are inherently serial) while
everything block-shaped — dequant, IDCT, scatter, and the encoder's
entire DCT/RLE/bit-pack pipeline — runs as batched numpy/BLAS passes.
``decode_image`` dispatches to libjpeg (Pillow) automatically when the
cluster image ships it; this module is the dependency-free floor.

Reference parity: the reference repo (fingltd/4mc) has no image
surface at all — this is part of the LLM-pipeline brief
(multimodal columns), not a port.
"""

from __future__ import annotations

import struct

import numpy as np

from fourmc_spark.operators.imaging import UnsupportedImageError

__all__ = ["decode_jpeg", "encode_jpeg", "MAX_PIXELS"]

# per-payload decode budget (~67M pixels — beyond any sane camera
# image; an 8K frame is 33M). Decoding runs per-document inside Arrow
# batches, so this caps one adversarial payload's executor memory at
# ~frame bytes instead of letting a 20-byte SOF demand gigabytes.
MAX_PIXELS = 1 << 26


# --------------------------------------------------------------- tables

def _zigzag() -> list[tuple[int, int]]:
    """The spec's 8x8 zigzag scan order, generated (not recalled):
    diagonal s = row+col; odd diagonals walk row-increasing, even ones
    row-decreasing."""
    out = []
    for s in range(15):
        rows = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            rows.reverse()
        out.extend((r, s - r) for r in rows)
    return out


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis A: forward X = A x A^T,
    inverse x = A^T X A."""
    n = np.arange(8)
    a = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    a *= np.sqrt(2 / 8)
    a[0] *= np.sqrt(0.5)
    return a


_A = _dct_matrix()


# --------------------------------------------------------------- huffman

class _HuffTable:
    """Flat 16-bit-window decode LUT (libjpeg's fast-path shape): for a
    window w of the next 16 bits, ``sym[w]``/``length[w]`` give the
    decoded symbol and its code length (0 = invalid code). Python lists,
    not numpy arrays — scalar indexing is the hot path and list access
    is ~3x cheaper than numpy scalar extraction."""

    __slots__ = ("sym", "length")

    def __init__(self, sym: list[int], length: list[int]) -> None:
        self.sym = sym
        self.length = length


_HUFF_MEMO: dict[tuple[bytes, bytes], _HuffTable] = {}


def _huff_decode_lut(bits: list[int], vals: list[int]) -> _HuffTable:
    """Canonical Huffman -> 16-bit-window LUT. Memoized on the DHT
    payload: building 65536 entries costs ~1 ms, and a corpus decoded in
    one Arrow batch typically repeats a handful of tables."""
    key = (bytes(bits), bytes(vals))
    t = _HUFF_MEMO.get(key)
    if t is not None:
        return t
    sym = np.zeros(1 << 16, np.int32)
    ln = np.zeros(1 << 16, np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                # canonical overflow: more codes than the length can hold
                raise ValueError("invalid DHT: canonical code overflow")
            lo = code << (16 - length)
            sym[lo:lo + (1 << (16 - length))] = vals[k]
            ln[lo:lo + (1 << (16 - length))] = length
            k += 1
            code += 1
        code <<= 1
    t = _HuffTable(sym.tolist(), ln.tolist())
    # bounded: each entry is two 65536-slot lists (~1 MB). The cache only
    # pays off for repeated tables (our encoder's fixed tables, one
    # producer's optimize_coding output); a diverse corpus of
    # image-specific DHTs would just churn it, so keep the ceiling small
    # rather than pinning hundreds of MB per executor
    if len(_HUFF_MEMO) >= 32:
        _HUFF_MEMO.pop(next(iter(_HUFF_MEMO)))  # FIFO evict
    _HUFF_MEMO[key] = t
    return t


def _huff_encode_lut(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length)."""
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return lut


class _FastBits:
    """MSB-first bit cursor over DESTUFFED entropy data. Past the end it
    supplies zeros forever — T.81 decoders treat the terminating marker
    as an endless zero tail, and block counts bound consumption."""

    __slots__ = ("data", "i", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _ensure(self, k: int) -> None:
        # drop consumed high bits so acc stays a small int
        acc, n = self.acc & ((1 << self.n) - 1), self.n
        while n < k:
            chunk = self.data[self.i:self.i + 8]
            if chunk:
                acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                n += 8 * len(chunk)
                self.i += len(chunk)
            else:
                acc <<= 16
                n += 16
        self.acc, self.n = acc, n

    def peek16(self) -> int:
        if self.n < 16:
            self._ensure(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k

    def get(self, k: int) -> int:
        if self.n < k:
            self._ensure(k)
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)


def _up2(p: np.ndarray, axis: int) -> np.ndarray:
    """2x triangle ('fancy') upsample along one axis: each output sample
    mixes its source sample with the nearest neighbor 3:1, borders
    replicated — the separable filter libjpeg applies for h2v1/h2v2
    chroma (our planes stay float through color conversion, so the mix
    uses exact 0.75/0.25 weights instead of libjpeg's integer >>2)."""
    s = p if axis == 1 else p.T
    sl = np.concatenate([s[:, :1], s[:, :-1]], axis=1)
    sr = np.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    o = np.empty((s.shape[0], s.shape[1] * 2))
    o[:, 0::2] = 0.75 * s + 0.25 * sl
    o[:, 1::2] = 0.75 * s + 0.25 * sr
    return o if axis == 1 else o.T


def _upsample_plane(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Upsample a chroma plane by integer factors (fy, fx): power-of-two
    steps use the triangle filter (visibly better than replication and
    within a couple of levels of libjpeg's fancy upsampling); residual
    odd factors (3x — legal but unseen in practice) replicate."""
    while fx % 2 == 0:
        plane = _up2(plane, axis=1)
        fx //= 2
    while fy % 2 == 0:
        plane = _up2(plane, axis=0)
        fy //= 2
    if fy > 1 or fx > 1:
        plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
    return plane


def _advance_restart(segments: list[bytes], rst_ids: list[int],
                     seg_i: int, n_rst: int) -> tuple[_FastBits, int]:
    """Advance a scan decoder to its next restart segment, validating
    the RSTn index lazily (like a streaming decoder: junk after the
    point where decoding completes must not raise). Returns the fresh
    bit cursor and the new segment index; callers manage their own
    prediction/EOB-run resets."""
    if seg_i + 1 >= len(segments):
        raise ValueError("scan ended while expecting a restart marker")
    got = rst_ids[seg_i]
    exp = n_rst % 8
    if got != exp:
        raise ValueError(
            f"restart marker out of order: got {0xD0 + got:#x}, "
            f"expected {0xD0 + exp:#x}"
        )
    return _FastBits(segments[seg_i + 1]), seg_i + 1


def _destuff(seg: bytes) -> bytes:
    """Remove 0xFF00 byte-stuffing. Left-to-right non-overlapping
    replace is exactly the stuffing rule: every 0xFF DATA byte is
    followed by one 0x00 escape (so FF 00 00 -> data FF, 00 and
    FF 00 FF 00 -> data FF, FF)."""
    if b"\xff" not in seg:
        return seg
    return seg.replace(b"\xff\x00", b"\xff")


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF inverse color transform (floats in, unclamped floats out)."""
    cb = cb - 128.0
    cr = cr - 128.0
    return np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=-1,
    )


def cmyk_to_rgb(arr: np.ndarray, inverted: bool) -> np.ndarray:
    """(h, w, 4) decoded JPEG CMYK samples -> (h, w, 3) uint8 RGB.

    ``inverted=True`` is the Adobe convention (APP14 present: ink
    values are stored complemented, so R = C'·K'/255 on the stored
    samples — what browsers/libjpeg-turbo consumers do); ``False`` is
    plain CMYK (R = (255-C)·(255-K)/255)."""
    a = arr.astype(np.float64)
    c, k = a[..., :3], a[..., 3:4]
    rgb = c * k / 255.0 if inverted else (255.0 - c) * (255.0 - k) / 255.0
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def adobe_color_transform(data: bytes) -> int | None:
    """Light marker scan: the APP14 Adobe transform code (0/1/2), or
    None when the stream carries no Adobe marker before its first SOS.
    Kept for callers that only need the flag; ``decode_image`` gets it
    from :func:`decode_jpeg_with_info` instead (one parse, no drift).
    Semantics match decode_jpeg's walk AND libjpeg's header parse: the
    LAST APP14 before the FIRST SOS wins, post-SOS markers are ignored;
    TEM 0x01 is standalone; seglen < 2 is corrupt -> None."""
    buf = bytes(data)
    pos = 2
    found: int | None = None
    while pos + 4 <= len(buf) and buf[pos] == 0xFF:
        while buf[pos + 1] == 0xFF:  # B.1.1.2 fill bytes
            pos += 1
            if pos + 4 > len(buf):
                return found
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / entropy data begins
            return found
        (seglen,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        if seglen < 2:
            return found
        seg = buf[pos + 4:pos + 2 + seglen]
        if marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            found = seg[11]
        pos += 2 + seglen
    return found


def _segment_scan(
    buf: bytes, pos: int
) -> tuple[list[bytes], list[int], int]:
    """Split the entropy-coded data starting at ``pos`` into destuffed
    per-restart-interval segments. Returns (segments, rst_ids, end_pos)
    where ``rst_ids`` are the RSTn indices BETWEEN segments (validated
    lazily at each consumed boundary, like a streaming decoder) and
    ``end_pos`` is the offset of the terminating non-RST marker."""
    a = np.frombuffer(buf, np.uint8)
    segments: list[bytes] = []
    rst_ids: list[int] = []
    seg_start = pos
    # all candidate marker prefixes in one vector pass
    for j in (np.flatnonzero(a[pos:len(buf) - 1] == 0xFF) + pos).tolist():
        if j < seg_start:
            continue  # 0xFF inside an already-consumed RST pair
        m = buf[j + 1]
        if m == 0x00:
            continue  # stuffing escape: data byte
        k = j + 1
        if m == 0xFF:
            # T.81 B.1.1.2: fill bytes may precede ANY marker, RSTn
            # included — the run ends the entropy segment at j; the
            # real marker byte follows the run
            while k < len(buf) and buf[k] == 0xFF:
                k += 1
            if k >= len(buf):
                raise ValueError("truncated JPEG (no marker after scan data)")
            m = buf[k]
            if m == 0x00:
                raise ValueError("stuffed byte after fill bytes in scan")
        segments.append(_destuff(buf[seg_start:j]))
        if 0xD0 <= m <= 0xD7:
            rst_ids.append(m - 0xD0)
            seg_start = k + 1
            continue
        return segments, rst_ids, j
    raise ValueError("truncated JPEG (no marker after scan data)")


# --------------------------------------------------------------- decode

def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 (h, w, 3) RGB, (h, w) gray, or (h, w, 4)
    CMYK. See :func:`decode_jpeg_with_info` for the full contract."""
    return decode_jpeg_with_info(data)[0]


def decode_jpeg_with_info(data: bytes) -> tuple[np.ndarray, dict]:
    """JPEG bytes -> (uint8 array, stream info dict).

    The array is (h, w, 3) RGB, (h, w) gray, or (h, w, 4) CMYK (Adobe
    4-component streams; YCCK transform=2 undone per libjpeg's
    JCS_CMYK semantics, samples returned in the STORED convention —
    see :func:`cmyk_to_rgb` for display conversion; APP14 transform=0
    on a 3-component frame means stored RGB and skips the YCbCr
    inverse, matching libjpeg's JCS_RGB). The info dict carries
    ``components``, ``progressive``, and ``adobe_transform`` (the
    APP14 code, or None) so callers like ``decode_image`` never need a
    second, driftable marker walk over the same bytes.

    Supports: SOF0/SOF1 (baseline/extended sequential Huffman) AND SOF2
    (progressive Huffman, T.81 annex G — DC first + refinement scans,
    AC spectral-selection bands with EOB runs, successive-approximation
    correction bits; validated against JDK-produced multi-scan streams,
    see tests/jpeg_golden_fixtures.py); 8-bit precision, 1/3/4
    components (4 = Adobe CMYK/YCCK, JDK-goldened in
    tests/test_jpeg_cmyk.py), any sampling factors up to 4
    (4:4:4 / 4:2:2 / 4:2:0
    included), restart intervals, multiple DQT/DHT segments, stuffed
    bytes, and multi-scan baseline files (one SOS per component, legal
    per T.81 — each single-component scan decodes non-interleaved on
    the component's own block grid). Raises
    :class:`UnsupportedImageError` for arithmetic / lossless /
    hierarchical streams and ``ValueError`` for corrupt or truncated
    ones (every marker/segment read is bounds-checked so malformed
    input can never surface IndexError/struct.error).
    """
    buf = bytes(data)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(cid, hsamp, vsamp, tq)]
    planes: list[np.ndarray] | None = None  # persist across scans
    scanned: set[int] = set()  # component ids entropy-decoded so far
    saw_eoi = False
    progressive = False
    adobe_transform: int | None = None  # APP14 color-transform code
    # progressive only: per-component coefficient store on the PADDED
    # MCU grid, accumulated across scans and inverse-transformed at EOI
    coefs: list[np.ndarray] | None = None

    while True:
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG (stream ends before EOI)")
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {buf[pos]:#x}")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — the byte after the run is the marker code
        while buf[pos + 1] == 0xFF:
            pos += 1
            if pos + 2 > len(buf):
                raise ValueError("truncated JPEG (stream ends before EOI)")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", buf[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(buf):
            raise ValueError(f"truncated JPEG segment at {pos}")
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                width = 128 if pq else 64
                if i + width > len(seg):
                    raise ValueError("truncated DQT segment")
                if pq == 0:
                    t = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                else:
                    t = np.frombuffer(seg[i:i + 128], dtype=">u2")
                i += width
                qtables[tq] = t.astype(np.int32)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("truncated DHT segment")
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                if i + 17 + nv > len(seg):
                    raise ValueError("truncated DHT segment")
                vals = list(seg[i + 17:i + 17 + nv])
                hufftabs[(tc, th)] = _huff_decode_lut(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline (SOF0/1), progressive (SOF2)
            if frame is not None:
                # libjpeg also rejects duplicate SOF; without this a
                # second SOF rebinds frame/comps while planes keep the
                # first frame's shape, and a following SOS indexes
                # planes[ci] out of range (IndexError escaping the
                # ValueError error contract)
                raise ValueError("multiple SOF segments")
            if len(seg) < 6:
                raise ValueError("truncated SOF segment")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise UnsupportedImageError(f"{prec}-bit JPEG unsupported")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated SOF segment")
            if h == 0 or w == 0 or nc == 0:
                raise ValueError("SOF declares an empty frame")
            if nc not in (1, 3, 4):
                # 2-component frames have no defined color model here
                # and would index out of the YCbCr unpack (IndexError
                # outside the ValueError contract)
                raise UnsupportedImageError(
                    f"{nc}-component JPEG unsupported (1 gray, 3 YCbCr, "
                    "or 4 CMYK/YCCK components)"
                )
            if h * w > MAX_PIXELS:
                # executor-memory safety: a tiny payload can declare a
                # 65535x65535 frame; per-payload decode inside an Arrow
                # batch must not OOM the worker on adversarial input
                raise ValueError(
                    f"JPEG frame {w}x{h} exceeds the decoder pixel "
                    f"budget ({MAX_PIXELS}); raise jpeg.MAX_PIXELS if "
                    "the image is real"
                )
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = samp >> 4, samp & 15
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"invalid sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"JPEG SOF marker {marker:#x}: only baseline sequential "
                "(SOF0/SOF1) and progressive Huffman (SOF2) are supported "
                "(no arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif (marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12
                and not scanned):
            # APP14 Adobe: last byte is the color-transform code
            # (0 = none/CMYK, 1 = YCbCr, 2 = YCCK) — decides the
            # 3/4-component color model below. libjpeg semantics: the
            # LAST APP14 before the FIRST SOS wins (jpeg_read_header
            # stops at SOS; later markers must not flip the model, or
            # the pure path would diverge from a libjpeg-backed one on
            # the same bytes)
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            h, w, comps = frame
            if len(seg) < 1:
                raise ValueError("truncated SOS header")
            ns = seg[0]
            if ns == 0 or ns > 4:
                # T.81 B.2.3: 1 <= Ns <= 4. ns=0 would make scan_sel
                # empty and _decode_scan's non-interleaved branch index
                # scan_sel[0] -> IndexError outside the error contract
                raise ValueError(f"SOS declares {ns} components")
            if len(seg) < 1 + 2 * ns:
                raise ValueError("truncated SOS header")
            if planes is None and not progressive:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                planes = [
                    np.zeros((mcuy * vs * 8, mcux * hs * 8),
                             dtype=np.float64)
                    for _, hs, vs, _ in comps
                ]
            by_id = {c[0]: ci for ci, c in enumerate(comps)}
            scan_sel = []  # (ci, cid, hs, vs, tq, dc_table, ac_table)
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in by_id:
                    raise ValueError(
                        f"SOS references component {cs} absent from SOF"
                    )
                ci = by_id[cs]
                scan_sel.append((ci, *comps[ci], tt >> 4, tt & 15))
            if progressive:
                if len(seg) < 1 + 2 * ns + 3:
                    raise ValueError("truncated SOS header")
                band_lo, band_hi = seg[1 + 2 * ns], seg[2 + 2 * ns]
                approx = seg[3 + 2 * ns]
                ah, al = approx >> 4, approx & 15
                if band_lo == 0:
                    if band_hi != 0:
                        raise ValueError(
                            "progressive DC scan must have Se = 0"
                        )
                elif not band_lo <= band_hi <= 63:
                    raise ValueError(
                        f"invalid spectral band {band_lo}..{band_hi}"
                    )
                if al > 13 or ah > 13 or (ah and ah != al + 1):
                    raise ValueError(
                        f"invalid successive approximation Ah={ah} Al={al}"
                    )
                if band_lo > 0 and any(
                    s[1] not in scanned for s in scan_sel
                ):
                    raise ValueError(
                        "progressive AC scan before the component's "
                        "DC scan"
                    )
                if coefs is None:
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    coefs = [
                        np.zeros((mcuy * vs * mcux * hs, 64), np.int32)
                        for _, hs, vs, _ in comps
                    ]
                pos = _decode_scan_progressive(
                    buf, pos + seglen, frame, scan_sel, hufftabs,
                    restart_interval, coefs, band_lo, band_hi, ah, al,
                )
                if band_lo == 0:
                    scanned |= {s[1] for s in scan_sel}
                continue
            pos = _decode_scan(
                buf, pos + seglen, frame, scan_sel, qtables, hufftabs,
                restart_interval, planes,
            )
            scanned |= {s[1] for s in scan_sel}
            continue  # pos already points at the next marker
        pos += seglen

    if progressive and coefs is not None:
        # all scans accumulated into the coefficient store; one batched
        # dequant+IDCT per component now (same kernel as baseline)
        planes = _reconstruct_progressive(frame, coefs, qtables)
    if planes is None:
        raise ValueError("no scan data found (missing SOS)")
    h, w, comps = frame
    missing = [cid for cid, _, _, _ in comps if cid not in scanned]
    if missing:
        raise ValueError(
            f"stream {'ended' if saw_eoi else 'stopped'} with no scan "
            f"for component(s) {missing}"
        )
    info = {
        "components": len(comps),
        "progressive": progressive,
        "adobe_transform": adobe_transform,
    }
    # upsample each component to the luma grid and crop
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        # T.81's decoder model clamps component samples to [0, 255]
        # after the IDCT, BEFORE upsampling/color conversion — without
        # this, IDCT ringing overshoot on busy content propagates
        # through the chroma filter and diverges from libjpeg-family
        # decoders by up to ~20 RGB levels (measured)
        plane = np.clip(plane, 0.0, 255.0)
        if hs != hmax or vs != vmax:
            plane = _upsample_plane(plane, vmax // vs, hmax // hs)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8), info
    if len(out) == 4:
        # Adobe CMYK/YCCK (libjpeg JCS_CMYK semantics): transform 2
        # stores YCCK — undo the YCbCr part into (255 - R, 255 - G,
        # 255 - B) stored-CMY, K passes through; transform 0 / no APP14
        # stores the four channels directly. Returned samples are the
        # STORED convention (Adobe files keep their inverted ink
        # values) — cmyk_to_rgb handles the display interpretation.
        if adobe_transform == 2:
            cmy = 255.0 - _ycbcr_to_rgb(out[0], out[1], out[2])
            cmyk = np.concatenate([cmy, out[3][..., None]], axis=-1)
        else:
            cmyk = np.stack(out, axis=-1)
        return np.clip(np.round(cmyk), 0, 255).astype(np.uint8), info
    if adobe_transform == 0:
        # APP14 transform=0 on a 3-component frame: stored RGB, no
        # inverse color transform (libjpeg's JCS_RGB — Photoshop "RGB"
        # saves); running the YCbCr inverse here would garble colors
        rgb = np.stack(out, axis=-1)
    else:
        rgb = _ycbcr_to_rgb(out[0], out[1], out[2])
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), info


def _decode_block(bits: _FastBits, dc: _HuffTable, ac: _HuffTable,
                  pred: int, row: np.ndarray) -> int:
    """Entropy-decode one 8x8 data unit into ``row`` (a zero (64,) int32
    view in zigzag order); returns the new DC prediction.

    Symbol decode is one 16-bit-window LUT probe (libjpeg's fast path)
    instead of a per-bit tree walk; RECEIVE+EXTEND reads all magnitude
    bits at once."""
    w = bits.peek16()
    length = dc.length[w]
    if length == 0:
        raise ValueError("invalid Huffman code in scan data")
    bits.skip(length)
    s = dc.sym[w]
    if s > 15:
        # baseline DC categories are 0..11; a corrupt DHT can map a
        # code to any byte and a 200-bit magnitude read would build an
        # arbitrary-precision int
        raise ValueError(f"invalid DC category {s} in scan data")
    if s:
        v = bits.get(s)
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        pred += v
        # a malformed stream can walk the prediction out of int32 (the
        # coefficient store); a conforming one cannot get anywhere near
        if pred > 0x3FFFFFFF or pred < -0x3FFFFFFF:
            raise ValueError("DC prediction out of range")
    row[0] = pred
    k = 1
    while k < 64:
        w = bits.peek16()
        length = ac.length[w]
        if length == 0:
            raise ValueError("invalid Huffman code in scan data")
        bits.skip(length)
        rs = ac.sym[w]
        size = rs & 15
        if size == 0:
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("AC coefficient overrun")
        v = bits.get(size)
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        row[k] = v
        k += 1
    return pred


# IDCT batch size: bounds float64 temporaries to ~17 MB per slab so an
# adversarial MAX_PIXELS frame can't triple the per-payload footprint
_IDCT_CHUNK = 1 << 15

# below this many total blocks the scalar encode loop beats the
# vectorized pipeline's fixed numpy setup cost (measured crossover)
_SCALAR_ENCODE_MAX_BLOCKS = 32


def _idct_scatter(plane: np.ndarray, coeffs: np.ndarray, q: np.ndarray,
                  by: np.ndarray, bx: np.ndarray) -> None:
    """Dequantize + inverse-DCT a whole component's blocks as batched
    matmuls and scatter them into the plane's (bh, 8, bw, 8) view —
    one BLAS call per slab instead of one 8x8 matmul per block."""
    at = _A.T
    ph, pw = plane.shape
    view = plane.reshape(ph // 8, 8, pw // 8, 8)
    qf = q.astype(np.float64)
    for s0 in range(0, coeffs.shape[0], _IDCT_CHUNK):
        sl = slice(s0, min(s0 + _IDCT_CHUNK, coeffs.shape[0]))
        dq = coeffs[sl].astype(np.float64) * qf[None, :]
        blk = np.zeros((dq.shape[0], 8, 8))
        blk[:, _ZZ_ROWS, _ZZ_COLS] = dq
        view[by[sl], :, bx[sl], :] = at @ blk @ _A + 128.0


def _decode_scan(buf, pos, frame, scan_sel, qtables, hufftabs,
                 restart_interval, planes) -> int:
    """Entropy-decode one scan into ``planes``; returns the byte offset
    of the marker following the scan's entropy-coded data.

    ``scan_sel`` rows are (ci, cid, hs, vs, tq, dc_id, ac_id). Multiple
    components -> interleaved MCUs on the frame's MCU grid (T.81 A.2.3);
    a single component -> non-interleaved, MCU = ONE data unit walking
    the component's OWN block grid (T.81 A.2.2) — its sampling factors
    size its grid but do NOT multiply blocks per MCU.

    Two passes: a sequential entropy pass (inherently serial — every
    Huffman code's position depends on the previous one) filling one
    (nblocks, 64) coefficient array per scan component, then a batched
    dequant+IDCT+scatter per component (_idct_scatter)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    luts = []
    for ci, cid, hs, vs, tq, dc_id, ac_id in scan_sel:
        dc_lut = hufftabs.get((0, dc_id))
        ac_lut = hufftabs.get((1, ac_id))
        if dc_lut is None or ac_lut is None:
            raise ValueError("scan references an undefined DHT table")
        if tq not in qtables:
            raise ValueError("scan references an undefined DQT table")
        luts.append((dc_lut, ac_lut, qtables[tq]))

    segments, rst_ids, end_pos = _segment_scan(buf, pos)
    seg_i = 0
    bits = _FastBits(segments[0] if segments else b"")
    n_rst = 0
    nsel = len(scan_sel)
    preds = [0] * nsel

    def _restart() -> None:
        nonlocal seg_i, bits
        bits, seg_i = _advance_restart(segments, rst_ids, seg_i, n_rst)

    if nsel > 1:
        nm = mcux * mcuy
        per = [hs * vs for _, _, hs, vs, _, _, _ in scan_sel]
        # chunk the entropy->IDCT handoff: decode a bounded strip of
        # MCUs into reusable per-component buffers, scatter, reuse —
        # the int32 coefficient store stays O(strip), not O(frame),
        # so peak memory is the float64 planes plus ~_IDCT_CHUNK blocks
        strip_m = max(1, _IDCT_CHUNK // max(per))
        coeffs = [np.empty((min(strip_m, nm) * p, 64), np.int32)
                  for p in per]
        for m0 in range(0, nm, strip_m):
            m1 = min(m0 + strip_m, nm)
            idx = [0] * nsel
            for si in range(nsel):
                coeffs[si][: (m1 - m0) * per[si]].fill(0)
            for m in range(m0, m1):
                if restart_interval and m and m % restart_interval == 0:
                    _restart()
                    n_rst += 1
                    preds = [0] * nsel
                for si in range(nsel):
                    dc, ac, _q = luts[si]
                    co = coeffs[si]
                    p = preds[si]
                    b0 = idx[si]
                    for b in range(b0, b0 + per[si]):
                        p = _decode_block(bits, dc, ac, p, co[b])
                    idx[si] = b0 + per[si]
                    preds[si] = p
            # block positions in stream order: per MCU, vs rows x hs cols
            marange = np.arange(m0, m1)
            for si, (ci, cid, hs, vs, tq, _, _) in enumerate(scan_sel):
                gw = mcux * hs  # plane width is mcux*hs*8 (SOF alloc)
                _, b = _stream_order_block_indices(
                    marange, mcux, hs, vs, gw)
                _idct_scatter(planes[ci], coeffs[si][: idx[si]],
                              luts[si][2], b // gw, b % gw)
    else:
        (ci, cid, hs, vs, tq, _, _) = scan_sel[0]
        dc, ac, q = luts[0]
        # the component's own dimensions (T.81 A.1.1) and block grid
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        nb = bw * bh
        co = np.empty((min(_IDCT_CHUNK, nb), 64), np.int32)
        p = 0
        for m0 in range(0, nb, _IDCT_CHUNK):
            m1 = min(m0 + _IDCT_CHUNK, nb)
            co[: m1 - m0].fill(0)
            for m in range(m0, m1):
                if restart_interval and m and m % restart_interval == 0:
                    _restart()
                    n_rst += 1
                    p = 0
                p = _decode_block(bits, dc, ac, p, co[m - m0])
            m_all = np.arange(m0, m1)
            _idct_scatter(planes[ci], co[: m1 - m0], q,
                          m_all // bw, m_all % bw)

    return end_pos


def _decode_scan_progressive(buf, pos, frame, scan_sel, hufftabs,
                             restart_interval, coefs, band_lo, band_hi,
                             ah, al) -> int:
    """Entropy-decode one PROGRESSIVE scan (T.81 annex G) into the
    per-component coefficient stores; returns the offset of the marker
    after the scan data.

    DC scans (band 0..0) walk the interleaved MCU grid (or a single
    component's own block grid) exactly like baseline; a first pass
    (Ah=0) decodes diffs shifted left by Al, refinements (Ah>0) add one
    raw bit per block at position Al. AC scans are single-component
    bands with EOB-run coding; refinements use the correction-bit walk
    (the same algorithm libjpeg implements from G.1.2.3: every
    nonzero-history coefficient passed over consumes a correction bit,
    runs count only zero-history positions)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    segments, rst_ids, end_pos = _segment_scan(buf, pos)
    seg_i = 0
    bits = _FastBits(segments[0] if segments else b"")
    n_rst = 0
    nsel = len(scan_sel)
    preds = [0] * nsel
    eobrun = 0

    def _restart() -> None:
        nonlocal seg_i, bits, n_rst, preds, eobrun
        bits, seg_i = _advance_restart(segments, rst_ids, seg_i, n_rst)
        n_rst += 1
        preds = [0] * nsel
        eobrun = 0

    if band_lo == 0:  # ---- DC scan (first or refinement) ----
        # hoisted per scan component: (coefficient store, DHT LUT)
        targets = []
        for ci, cid, hs, vs, tq, dc_id, ac_id in scan_sel:
            lut = hufftabs.get((0, dc_id)) if ah == 0 else None
            if ah == 0 and lut is None:
                raise ValueError("scan references an undefined DHT table")
            targets.append((coefs[ci], lut))
        # the store is int32 and the stored value is pred << al, so the
        # range guard must bound the SHIFTED value (a crafted Al=13 scan
        # can walk pred high enough that pred<<al wraps int32 — NumPy 2
        # raises OverflowError, escaping the ValueError contract)
        pred_cap = 0x3FFFFFFF >> al

        def _dc_block(si: int, idx: int) -> None:
            co, dc = targets[si]
            if ah == 0:
                wdw = bits.peek16()
                length = dc.length[wdw]
                if length == 0:
                    raise ValueError("invalid Huffman code in scan data")
                bits.skip(length)
                s = dc.sym[wdw]
                if s > 15:
                    raise ValueError(f"invalid DC category {s} in scan data")
                if s:
                    v = bits.get(s)
                    if v < (1 << (s - 1)):
                        v -= (1 << s) - 1
                    preds[si] += v
                    if not -pred_cap < preds[si] < pred_cap:
                        raise ValueError("DC prediction out of range")
                co[idx, 0] = preds[si] << al
            elif bits.get(1):
                co[idx, 0] |= 1 << al

        if nsel > 1:
            for m in range(mcux * mcuy):
                if restart_interval and m and m % restart_interval == 0:
                    _restart()
                my, mx = divmod(m, mcux)
                for si, (ci, cid, hs, vs, tq, _, _) in enumerate(scan_sel):
                    gw = mcux * hs
                    for v in range(vs):
                        for hh in range(hs):
                            _dc_block(si, (my * vs + v) * gw + mx * hs + hh)
        else:
            (ci, cid, hs, vs, tq, _, _) = scan_sel[0]
            gw = mcux * hs
            cw = -(-w * hs // hmax)
            ch = -(-h * vs // vmax)
            bw = -(-cw // 8)
            bh = -(-ch // 8)
            for m in range(bw * bh):
                if restart_interval and m and m % restart_interval == 0:
                    _restart()
                by, bx = divmod(m, bw)
                _dc_block(0, by * gw + bx)
        return end_pos

    # ---- AC scan: exactly one component (T.81 B.2.3) ----
    if nsel != 1:
        raise ValueError("progressive AC scan must be single-component")
    (ci, cid, hs, vs, tq, dc_id, ac_id) = scan_sel[0]
    ac = hufftabs.get((1, ac_id))
    if ac is None:
        raise ValueError("scan references an undefined DHT table")
    gw = mcux * hs
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    bw = -(-cw // 8)
    bh = -(-ch // 8)
    co = coefs[ci]
    p1, n1 = 1 << al, -1 << al
    for m in range(bw * bh):
        if restart_interval and m and m % restart_interval == 0:
            _restart()
        by, bx = divmod(m, bw)
        row = co[by * gw + bx]
        if ah == 0:  # first pass for this band
            if eobrun:
                eobrun -= 1
                continue
            k = band_lo
            while k <= band_hi:
                wdw = bits.peek16()
                length = ac.length[wdw]
                if length == 0:
                    raise ValueError("invalid Huffman code in scan data")
                bits.skip(length)
                rs = ac.sym[wdw]
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:  # EOBn: 2^r - 1 + extension bits blocks
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += bits.get(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > band_hi:
                    raise ValueError("AC coefficient overrun")
                v = bits.get(s)
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                row[k] = v << al
                k += 1
        else:  # refinement pass
            k = band_lo
            if eobrun == 0:
                while k <= band_hi:
                    wdw = bits.peek16()
                    length = ac.length[wdw]
                    if length == 0:
                        raise ValueError("invalid Huffman code in scan data")
                    bits.skip(length)
                    rs = ac.sym[wdw]
                    r, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += bits.get(r)
                            break  # rest of the block via the EOB walk
                        # r == 15: ZRL — pass over 16 zero-history slots
                    elif s == 1:
                        val = p1 if bits.get(1) else n1
                    else:
                        raise ValueError(
                            "invalid refinement magnitude category"
                        )
                    # advance: nonzero-history coefficients consume a
                    # correction bit; the run counts zero-history only
                    while k <= band_hi:
                        cur = int(row[k])
                        if cur:
                            if bits.get(1) and not cur & p1:
                                row[k] = cur + (p1 if cur > 0 else n1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= band_hi:
                        row[k] = val
                    k += 1
            if eobrun:
                while k <= band_hi:  # correction bits to the band's end
                    cur = int(row[k])
                    if cur and bits.get(1) and not cur & p1:
                        row[k] = cur + (p1 if cur > 0 else n1)
                    k += 1
                eobrun -= 1
    return end_pos


def _reconstruct_progressive(frame, coefs, qtables) -> list[np.ndarray]:
    """Dequantize + IDCT the accumulated progressive coefficient stores
    into sample planes (same batched kernel as the baseline path)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError("scan references an undefined DQT table")
        gh, gw = mcuy * vs, mcux * hs
        plane = np.zeros((gh * 8, gw * 8))
        m_all = np.arange(gh * gw)
        _idct_scatter(plane, coefs[ci], qtables[tq], m_all // gw, m_all % gw)
        # release each coefficient store as soon as it is consumed:
        # keeping all int32 stores alive under all float64 planes would
        # raise the adversarial per-payload peak ~50% over baseline
        coefs[ci] = None
        planes.append(plane)
    return planes


# --------------------------------------------------------------- encode

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _fixed_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A valid canonical Huffman table giving every symbol the same code
    length L = ceil(log2(n+1)). n < 2^L keeps the all-ones code unused
    (the spec's tables avoid it too). Suboptimal ratio, unimpeachable
    validity — and since DHT embeds the table, every decoder agrees."""
    n = len(symbols)
    length = max(2, (n + 1 - 1).bit_length())
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


_QUANT_MEMO: dict[int, np.ndarray] = {}


def _quant_table(quality: int) -> np.ndarray:
    """Deterministic frequency-weighted table: DC fine, AC coarser with
    distance from DC, scaled by quality 1..100 (higher = finer). Not
    Annex K — any table is valid because DQT carries it in-stream."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    t = _QUANT_MEMO.get(quality)
    if t is None:
        u = np.arange(8)
        base = 1.0 + (u[:, None] + u[None, :]) * 2.0
        scale = (101 - quality) / 25.0  # q=100 -> 0.04 (near-lossless)
        t = np.clip(np.round(base * scale), 1, 255).astype(np.int32)
        _QUANT_MEMO[quality] = t
    return t


_ENC_TABLES: tuple | None = None


def _encoder_tables() -> tuple:
    """The encoder's (constant) Huffman tables: every baseline DC
    category and every (run, size) AC symbol at a fixed code length.
    Built once — a corpus encode calls this per payload."""
    global _ENC_TABLES
    if _ENC_TABLES is None:
        dc_bits, dc_vals = _fixed_length_table(list(range(12)))
        ac_bits, ac_vals = _fixed_length_table(
            [0x00, 0xF0]
            + [(r << 4) | s for r in range(16) for s in range(1, 11)]
        )
        _ENC_TABLES = (
            dc_bits, dc_vals, ac_bits, ac_vals,
            _huff_encode_lut(dc_bits, dc_vals),
            _huff_encode_lut(ac_bits, ac_vals),
        )
    return _ENC_TABLES


def _category(v: int) -> int:
    return int(v).bit_length() if v != 0 else 0


# ---- vectorized entropy encode: the scalar primitives above (_BitWriter,
# _encode_block) remain as the readable reference implementation — tests
# pin byte-equality between the two, and the multiscan fixture builds on
# them — while encode_jpeg itself uses the batched pipeline below.

def _huff_encode_arrays(bits: list[int],
                        vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """symbol -> (code, length) as flat arrays for vectorized gather."""
    code_arr = np.zeros(256, np.int64)
    len_arr = np.zeros(256, np.int64)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            code_arr[vals[k]] = code
            len_arr[vals[k]] = length
            k += 1
            code += 1
        code <<= 1
    return code_arr, len_arr


def _bitlen(a: np.ndarray) -> np.ndarray:
    """Element-wise bit length of non-negative ints (exact below 2^52:
    frexp's exponent IS the bit length for positive integers)."""
    return np.frexp(a.astype(np.float64))[1].astype(np.int64)


def _pack_bits(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """MSB-first concatenation of variable-length codes (int64 value,
    length <= 31 bits), final partial byte padded with 1-bits per T.81
    F.1.2.3. Each code is shifted into a 5-byte window at its bit offset
    and OR-scattered — one ufunc pass per window byte instead of a
    Python loop per symbol."""
    if len(values) == 0:
        return b""
    offs = np.cumsum(lengths) - lengths
    total = int(offs[-1] + lengths[-1])
    nbytes = (total + 7) // 8
    out = np.zeros(nbytes + 5, np.uint8)
    win = values << (40 - (offs & 7) - lengths)
    base = offs >> 3
    for b in range(5):
        np.bitwise_or.at(out, base + b,
                         ((win >> (8 * (4 - b))) & 0xFF).astype(np.uint8))
    if total & 7:
        out[nbytes - 1] |= (1 << (8 - (total & 7))) - 1
    return out[:nbytes].tobytes()


def _stuff(b: bytes) -> bytes:
    """Insert the 0x00 escape after every 0xFF data byte."""
    if b"\xff" not in b:
        return b
    a = np.frombuffer(b, np.uint8)
    return np.insert(a, np.flatnonzero(a == 0xFF) + 1, 0).tobytes()


def _stream_order_block_indices(
    marange: np.ndarray, mcux: int, hs: int, vs: int, gw: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Padded-grid block indices for the given MCU indices in T.81
    interleaved stream order (per MCU: vs rows x hs cols). Returns
    (mcu_index_per_block, block_index) — the single source of truth for
    grid->stream-order math, shared by the baseline vectorized encoder,
    the progressive DC scan, and the baseline decode scatter."""
    nm = len(marange)
    m = np.repeat(marange, hs * vs)
    v = np.tile(np.repeat(np.arange(vs), hs), nm)
    hh = np.tile(np.arange(hs), vs * nm)
    return m, ((m // mcux) * vs + v) * gw + (m % mcux) * hs + hh


def _dc_records(
    dc: np.ndarray, per: int = 1, restart_interval: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """DC difference coding for a stream-ordered DC sequence: returns
    (categories, magnitude_bits); rejects categories beyond baseline's
    11 (a zero-length code gather would emit a corrupt stream). Shared
    by the baseline record builder and the progressive DC scan."""
    prev = np.concatenate(([0], dc[:-1]))
    if restart_interval:
        # DC prediction resets at each restart interval boundary
        prev[np.arange(len(dc)) % (restart_interval * per) == 0] = 0
    d = dc - prev
    s = _bitlen(np.abs(d))
    if s.size and int(s.max()) > 11:
        raise ValueError("DC difference out of baseline range")
    return s, np.where(d >= 0, d, d + (1 << s) - 1)


def _entropy_records(
    zz: np.ndarray, ranks: np.ndarray, per: int, restart_interval: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """RLE one component's stream-ordered blocks (nb, 64) into symbol
    records: (sort_keys, symbols, magnitudes, magnitude_lengths, is_dc).

    Key layout puts records in T.81 stream order when sorted:
    rank*256 + {0 for DC, zigzag_k*4 + t for the ZRLs (t<3) and the
    coefficient itself (t=3), 255 for EOB} — EOB can't collide with a
    coefficient at k=63 because EOB is only emitted when zz[63]==0.
    Code assignment (fixed or per-image optimized tables) happens later
    via one vectorized gather over the symbols."""
    nb = zz.shape[0]
    s, mv = _dc_records(zz[:, 0].astype(np.int64), per, restart_interval)
    dc_k = ranks * 256

    acs = zz[:, 1:]
    bj, kj = np.nonzero(acs)
    kk = kj + 1  # zigzag index 1..63
    val = acs[bj, kj].astype(np.int64)
    same = np.zeros(len(bj), bool)
    same[1:] = bj[1:] == bj[:-1]
    pk = np.where(same, np.concatenate(([0], kk[:-1])), 0)
    run = kk - pk - 1  # zeros since the previous nonzero (or block start)
    zrl = run >> 4
    rem = run & 15
    sa = _bitlen(np.abs(val))
    if sa.size and int(sa.max()) > 10:
        raise ValueError("AC coefficient out of baseline range")
    mva = np.where(val >= 0, val, val + (1 << sa) - 1)
    sym = (rem << 4) | sa
    ac_k = ranks[bj] * 256 + kk * 4 + 3

    tot = int(zrl.sum())
    if tot:
        src = np.repeat(np.arange(len(zrl)), zrl)
        t = np.arange(tot) - np.repeat(np.cumsum(zrl) - zrl, zrl)
        zr_k = ranks[bj[src]] * 256 + kk[src] * 4 + t
        zr_s = np.full(tot, 0xF0, np.int64)
    else:
        zr_k = zr_s = np.zeros(0, np.int64)

    eb = np.flatnonzero(zz[:, 63] == 0)  # trailing zeros exist -> EOB
    eo_k = ranks[eb] * 256 + 255
    z = np.zeros

    keys = np.concatenate([dc_k, ac_k, zr_k, eo_k])
    syms = np.concatenate([s, sym, zr_s, z(len(eb), np.int64)])
    mags = np.concatenate([mv, mva, z(tot, np.int64), z(len(eb), np.int64)])
    mlen = np.concatenate([s, sa, z(tot, np.int64), z(len(eb), np.int64)])
    isdc = np.concatenate([
        np.ones(nb, bool), np.zeros(len(bj) + tot + len(eb), bool),
    ])
    return keys, syms, mags, mlen, isdc


_OPT_TABLE_CACHE: dict[bytes, tuple[tuple[int, ...], tuple[int, ...]]] = {}


def _optimal_table(
    freq: np.ndarray,
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Per-image length-limited canonical Huffman table from symbol
    frequencies — the T.81 annex K.2 code-size procedure (the same
    algorithm libjpeg's optimize_coding runs): pairwise merge of the
    two least-frequent entries with an 'others' chain, 16-bit length
    adjustment, and a reserved pseudo-symbol whose minimal frequency
    forces it onto the longest code so the all-ones code stays unused.

    Memoized on the histogram bytes: the K.2 merge loop is pure Python
    and dominates tiny progressive encodes (7 scans/image), where many
    images in a batch share the same few histograms — a hit costs one
    2 KiB dict lookup, a distinct real-image histogram just misses."""
    key = np.ascontiguousarray(freq, np.int64).tobytes()
    hit = _OPT_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    freqs = [int(f) for f in freq] + [1]  # pseudo-symbol
    n = len(freqs)
    others = [-1] * n
    codesize = [0] * n
    while True:
        v1 = v2 = -1
        for i in range(n):  # least frequency, ties -> larger index
            if freqs[i] > 0 and (v1 < 0 or freqs[i] <= freqs[v1]):
                v1 = i
        for i in range(n):
            if freqs[i] > 0 and i != v1 and (v2 < 0 or freqs[i] <= freqs[v2]):
                v2 = i
        if v2 < 0:
            break
        freqs[v1] += freqs[v2]
        freqs[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for cs in codesize:
        if cs:
            bits[cs] += 1
    i = 32  # K.2 ADJUST_BITS: fold lengths > 16 down
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the pseudo-symbol's (longest) code
    vals = [sym for _, sym in
            sorted((cs, sym) for sym, cs in enumerate(codesize[:-1]) if cs)]
    if len(_OPT_TABLE_CACHE) >= 4096:  # bounded: adversarial histogram
        _OPT_TABLE_CACHE.clear()       # churn must not grow the worker
    # tuples: the cached entry is shared across encodes — a mutable
    # list would let one caller's mutation corrupt every later image
    # with the same histogram
    out = (tuple(bits[1:17]), tuple(vals))
    _OPT_TABLE_CACHE[key] = out
    return out


def _emit_scan(out, tc, syms, mags, mlens, scan_comps, ss, se) -> None:
    """Emit one progressive scan: a per-scan K.2-optimized DHT (slot 0
    of class ``tc``), the SOS header, and the entropy-coded records
    (symbols already in stream order)."""
    bits, vals = _optimal_table(np.bincount(syms, minlength=256))
    body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out.extend(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
    sos = bytes([len(scan_comps)])
    for cid in scan_comps:
        sos += bytes([cid, 0x00])
    sos += bytes([ss, se, 0x00])  # Ah=Al=0: spectral selection only
    out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    codes, lens = _huff_encode_arrays(bits, vals)
    values = (codes[syms] << mlens) | mags
    lengths = lens[syms] + mlens
    out.extend(_stuff(_pack_bits(values, lengths)))


def _encode_progressive(out, planes, samps, qzz, mcux, mcuy) -> None:
    """Progressive (SOF2, T.81 annex G) scan emission: one interleaved
    DC-first scan, then two spectral-selection AC band scans (1-5 and
    6-63) per component — the band split libjpeg's default progressive
    scan script uses. Every scan carries its own K.2-optimized Huffman
    table: the fixed K.3 tables define no EOBn codes, which is exactly
    why libjpeg forces optimize_coding in progressive mode too.
    Spectral selection only (Ah=Al=0); the decoder's successive-
    approximation refinement paths are pinned by the JDK golden
    fixtures instead.

    Coefficients are batch-DCT'd once per component on the padded MCU
    grid; the DC scan walks that grid in MCU order while AC scans walk
    each component's OWN block grid (T.81 A.2.2 non-interleaved
    semantics — smaller than the MCU grid for subsampled frames with
    partial edge MCUs).
    """
    nc = len(planes)
    nm = mcux * mcuy
    per = [hs * vs for hs, vs in samps]
    seq = sum(per)
    comp_zz, grids = [], []
    for (hs, vs), plane in zip(samps, planes):
        gh, gw = mcuy * vs, mcux * hs
        p = np.pad(plane, ((0, gh * 8 - plane.shape[0]),
                           (0, gw * 8 - plane.shape[1])), mode="edge")
        blocks = p.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(
            -1, 8, 8) - 128.0
        coef = _A @ blocks @ _A.T
        comp_zz.append(
            np.round(coef[:, _ZZ_ROWS, _ZZ_COLS] / qzz).astype(np.int64))
        grids.append((gh, gw))

    # ---- scan 1: DC of all components, interleaved in MCU order ----
    all_k, all_s, all_m = [], [], []
    off = 0
    for ci, ((hs, vs), (gh, gw)) in enumerate(zip(samps, grids)):
        m, b = _stream_order_block_indices(
            np.arange(nm), mcux, hs, vs, gw)
        s, mv = _dc_records(comp_zz[ci][b, 0])
        all_k.append(m * seq + off + np.tile(np.arange(per[ci]), nm))
        all_s.append(s)
        all_m.append(mv)
        off += per[ci]
    order = np.argsort(np.concatenate(all_k), kind="stable")
    syms = np.concatenate(all_s)[order]
    mags = np.concatenate(all_m)[order]
    _emit_scan(out, 0, syms, mags, syms, list(range(1, nc + 1)), 0, 0)

    # ---- AC band scans, one component per scan (T.81 G.1.1.1.1) ----
    for ci, ((hs, vs), (gh, gw)) in enumerate(zip(samps, grids)):
        # the component's own block grid (its own dims, NOT MCU-padded)
        bh = -(-planes[ci].shape[0] // 8)
        bw = -(-planes[ci].shape[1] // 8)
        bidx = (np.arange(bh)[:, None] * gw + np.arange(bw)[None, :]
                ).ravel()
        for ss, se in ((1, 5), (6, 63)):
            Z = comp_zz[ci][bidx][:, ss:se + 1]
            nb, blen = Z.shape
            bj, kj = np.nonzero(Z)
            val = Z[bj, kj]
            same = np.zeros(len(bj), bool)
            same[1:] = bj[1:] == bj[:-1]
            pk = np.where(same, np.concatenate(([-1], kj[:-1])), -1)
            run = kj - pk - 1
            zrl, rem = run >> 4, run & 15
            sa = _bitlen(np.abs(val))
            if sa.size and int(sa.max()) > 10:
                raise ValueError("AC coefficient out of baseline range")
            mva = np.where(val >= 0, val, val + (1 << sa) - 1)
            ac_k = bj * 256 + kj * 4 + 3
            tot = int(zrl.sum())
            if tot:
                src = np.repeat(np.arange(len(zrl)), zrl)
                t = np.arange(tot) - np.repeat(np.cumsum(zrl) - zrl, zrl)
                zr_k = bj[src] * 256 + kj[src] * 4 + t
                zr_s = np.full(tot, 0xF0, np.int64)
            else:
                zr_k = zr_s = np.zeros(0, np.int64)
            # EOB runs: a block ends with EOB when its band has trailing
            # zeros (incl. all-zero blocks); consecutive EOB blocks merge
            # into one EOBn, and any block with nonzeros flushes the run
            # before its own symbols — so run groups are delimited by
            # the running count of nonzero-carrying blocks
            has_nz = np.zeros(nb, bool)
            has_nz[bj] = True
            last_k = np.full(nb, -1, np.int64)
            last_k[bj] = kj  # nonzero kj is nondecreasing per block
            eob = (~has_nz) | (last_k < blen - 1)
            gid = np.cumsum(has_nz)[eob]  # group = preceding nz-block
            eb = np.flatnonzero(eob)
            # run length per group; EOBn emitted at the FIRST block of
            # its run, after that block's coefficient symbols (key 255
            # can't collide: a block with an EOB has last_k < blen-1,
            # so its max coefficient key is (blen-2)*4+3 < 255)
            if len(eb):
                starts = np.concatenate(
                    ([True], gid[1:] != gid[:-1]))
                first = eb[starts]
                rlen = np.diff(np.concatenate(
                    (np.flatnonzero(starts), [len(eb)])))
                eo_k, eo_s, eo_m, eo_l = [], [], [], []
                for fb, r in zip(first.tolist(), rlen.tolist()):
                    r = int(r)
                    while r:  # split runs beyond EOB14's 32767 cap
                        n = min(14, r.bit_length() - 1)
                        take = min(r, (1 << (n + 1)) - 1)
                        eo_k.append(fb * 256 + 255)
                        eo_s.append(n << 4)
                        eo_m.append(take - (1 << n))
                        eo_l.append(n)
                        r -= take
                eo_k = np.asarray(eo_k, np.int64)
                eo_s = np.asarray(eo_s, np.int64)
                eo_m = np.asarray(eo_m, np.int64)
                eo_l = np.asarray(eo_l, np.int64)
            else:
                eo_k = eo_s = eo_m = eo_l = np.zeros(0, np.int64)
            z = np.zeros
            keys = np.concatenate([ac_k, zr_k, eo_k])
            syms = np.concatenate([(rem << 4) | sa, zr_s, eo_s])
            mags = np.concatenate([mva, z(tot, np.int64), eo_m])
            mlens = np.concatenate([sa, z(tot, np.int64), eo_l])
            order = np.argsort(keys, kind="stable")
            _emit_scan(out, 1, syms[order], mags[order], mlens[order],
                       [ci + 1], ss, se)
    out += b"\xff\xd9"  # EOI


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool | str = False,
                restart_interval: int = 0,
                optimize_huffman: bool = False,
                progressive: bool = False) -> bytes:
    """uint8 image -> JPEG bytes.

    (h, w, 3) RGB or (h, w[, 1]) gray inputs produce JFIF streams
    (baseline SOF0, or progressive SOF2 with ``progressive=True``);
    (h, w, 4) inputs produce a BARE raw 4-component stream — no JFIF
    APP0 (ISO 10918-5 defines JFIF for 1/3 components only) and no
    Adobe APP14 (which would flip consumers to the inverted-ink
    interpretation of the raw channels), matching the javax.imageio
    4-band raster convention; ``decode_jpeg`` reads the channels back
    verbatim as stored CMYK.

    ``subsample=True`` (or ``"420"``) writes 4:2:0 chroma (box-averaged)
    and ``"422"`` horizontal-only 4:2:2 chroma, exercising the
    interleaved-MCU layouts; default is 4:4:4.
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs (resynchronization points a parallel/streaming decoder seeks
    to; also exercises the decoder's restart path).
    ``optimize_huffman``: build per-image optimal canonical tables from
    the actual symbol histogram (T.81 annex K.2, what libjpeg's
    optimize_coding does) instead of the deterministic fixed-length
    tables — identical pixels, typically 20-40% smaller files; off by
    default so output stays byte-stable for fixture pinning.
    ``progressive``: emit a progressive (SOF2) stream — interleaved
    DC-first scan then spectral-selection AC band scans per component,
    each with per-scan K.2-optimized tables (progressive always
    optimizes: the fixed tables define no EOBn codes, the same reason
    libjpeg forces optimize_coding there). Identical pixels to the
    baseline encode of the same input — progressive changes only the
    entropy-coding order, never the coefficients.
    """
    if progressive and restart_interval:
        raise ValueError(
            "progressive encode does not support restart intervals")
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    q = _quant_table(quality)
    qzz = q[_ZZ_ROWS, _ZZ_COLS]

    if gray:
        planes = [a.astype(np.float64)]
        samps = [(1, 1)]
    elif a.ndim == 3 and a.shape[2] == 4:
        # 4-channel input: written as a raw 4-component JPEG (no color
        # transform, no APP14 — the same convention javax.imageio uses
        # for 4-band rasters; decode_jpeg reads it back verbatim as
        # stored CMYK). Subsampling is a YCbCr-space concept — reject
        # everything except the explicit no-op mode "444".
        if subsample and str(subsample) not in ("444",):
            raise ValueError("4-component encode does not subsample")
        planes = [a[:, :, c].astype(np.float64) for c in range(4)]
        samps = [(1, 1)] * 4
    else:
        rgb = a.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        # normalize: identity checks would misroute numpy.bool_(True)
        # (a typical truthy arriving from numpy/pandas callers)
        if not subsample:
            mode = "444"
        elif str(subsample) in ("True", "1", "420"):
            mode = "420"
        else:
            mode = str(subsample)
        if mode == "420":
            cb, cr = _box2(cb), _box2(cr)
            samps = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":  # horizontal-only chroma subsampling
            cb, cr = _boxh(cb), _boxh(cr)
            samps = [(2, 1), (1, 1), (1, 1)]
        elif mode == "444":
            samps = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unknown subsampling mode {subsample!r}")
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    (dc_bits, dc_vals, ac_bits, ac_vals,
     dc_enc, ac_enc) = _encoder_tables()

    out = bytearray(b"\xff\xd8")  # SOI
    if len(planes) != 4:
        # JFIF APP0 — defined only for 1- and 3-component frames
        # (ISO 10918-5); 4-component streams stay bare, matching the
        # javax.imageio 4-band raster convention (no JFIF, no APP14 —
        # an APP14 would flip consumers to the Adobe inverted-ink
        # interpretation of our raw channels)
        app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT (one table, id 0, used by all components)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" \
        + bytes(int(v) for v in qzz)
    # SOF0 (baseline) or SOF2 (progressive)
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (hs, vs) in enumerate(samps):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof

    if progressive:
        _encode_progressive(out, planes, samps, qzz, mcux, mcuy)
        return bytes(out)

    def _emit_tables_and_sos(db, dv, ab, av) -> None:
        # DHT: DC table 0, AC table 0 (shared by all components)
        for tc, (bits, vals) in ((0, (db, dv)), (1, (ab, av))):
            body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
            out.extend(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
        if restart_interval:
            out.extend(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
        sos = bytes([nc])
        for i in range(nc):
            sos += bytes([i + 1, 0x00])
        sos += b"\x00\x3f\x00"
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)

    per = [hs * vs for hs, vs in samps]
    seq = sum(per)  # blocks per MCU across the scan
    nm = mcux * mcuy

    # Small images dispatch to the scalar loop: the vectorized record
    # pipeline pays ~40 numpy-call setups regardless of size, which
    # dominates below a few dozen blocks (measured crossover ~32; the
    # oracle-gate payloads are 1-24 blocks). Both paths are pinned
    # byte-identical by tests/test_jpeg.py. Optimized-Huffman encodes
    # always take the vectorized path (the records double as the
    # symbol histogram).
    if nm * seq <= _SCALAR_ENCODE_MAX_BLOCKS and not optimize_huffman:
        _emit_tables_and_sos(dc_bits, dc_vals, ac_bits, ac_vals)
        bw_ = _BitWriter()
        preds = [0] * nc
        n_rst = 0
        for m in range(nm):
            if restart_interval and m and m % restart_interval == 0:
                bw_.flush()
                bw_.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
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
                        _encode_block(bw_, zz, preds, ci, dc_enc, ac_enc)
        bw_.flush()
        out += bw_.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # vectorized entropy stage: per component, batch-DCT every block,
    # gather into T.81 stream order, emit symbol records, choose tables
    # (fixed, or per-image optimal K.2 tables when optimize_huffman),
    # then one vectorized symbol->code gather + global sort + bit-pack.
    # With fixed tables this is byte-identical to the scalar reference
    # loop at ~50-150x the throughput on real frames — the per-payload
    # kernel behind the Arrow-batched multimodal UDFs.
    del dc_enc, ac_enc
    all_k, all_s, all_m, all_ml, all_d = [], [], [], [], []
    off = 0
    for ci, ((hs, vs), plane) in enumerate(zip(samps, planes)):
        gh, gw = mcuy * vs, mcux * hs  # component block grid
        p = np.pad(plane, ((0, gh * 8 - plane.shape[0]),
                           (0, gw * 8 - plane.shape[1])), mode="edge")
        blocks = p.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(
            -1, 8, 8) - 128.0
        coef = _A @ blocks @ _A.T
        zz = np.round(coef[:, _ZZ_ROWS, _ZZ_COLS] / qzz).astype(np.int32)
        # row-major grid -> stream order (per MCU: vs rows x hs cols)
        m, b = _stream_order_block_indices(
            np.arange(nm), mcux, hs, vs, gw)
        zz = zz[b]
        ranks = m * seq + off + np.tile(np.arange(per[ci]), nm)
        k_, s_, m_, ml_, d_ = _entropy_records(
            zz, ranks, per[ci], restart_interval,
        )
        all_k.append(k_)
        all_s.append(s_)
        all_m.append(m_)
        all_ml.append(ml_)
        all_d.append(d_)
        off += per[ci]
    keys = np.concatenate(all_k)
    syms = np.concatenate(all_s)
    mags = np.concatenate(all_m)
    mlens = np.concatenate(all_ml)
    isdc = np.concatenate(all_d)

    if optimize_huffman:
        dc_bits, dc_vals = _optimal_table(
            np.bincount(syms[isdc], minlength=256))
        ac_bits, ac_vals = _optimal_table(
            np.bincount(syms[~isdc], minlength=256))
    _emit_tables_and_sos(dc_bits, dc_vals, ac_bits, ac_vals)
    dc_codes, dc_lens = _huff_encode_arrays(dc_bits, dc_vals)
    ac_codes, ac_lens = _huff_encode_arrays(ac_bits, ac_vals)
    codes = np.where(isdc, dc_codes[syms], ac_codes[syms])
    values = (codes << mlens) | mags
    lengths = np.where(isdc, dc_lens[syms], ac_lens[syms]) + mlens
    order = np.argsort(keys, kind="stable")
    values, lengths = values[order], lengths[order]
    if restart_interval:
        # each interval is byte-aligned (1-padded) and separated by RSTn
        iv = (keys[order] >> 8) // seq // restart_interval
        for i in range(-(-nm // restart_interval)):
            if i:
                out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
            lo, hi = np.searchsorted(iv, [i, i + 1])
            out += _stuff(_pack_bits(values[lo:hi], lengths[lo:hi]))
    else:
        out += _stuff(_pack_bits(values, lengths))
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _box2(p: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample with edge replication to even dims."""
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2]
            + p[1::2, 1::2]) / 4.0


def _boxh(p: np.ndarray) -> np.ndarray:
    """Horizontal 2x box-average (4:2:2 chroma) with edge replication."""
    if p.shape[1] % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[:, 0::2] + p[:, 1::2]) / 2.0


def _padded_block(plane: np.ndarray, y0: int, x0: int) -> np.ndarray:
    """8x8 window at (y0, x0), edge-replicated past the boundary."""
    h, w = plane.shape
    if y0 + 8 <= h and x0 + 8 <= w:
        return plane[y0:y0 + 8, x0:x0 + 8]
    ys = np.minimum(np.arange(y0, y0 + 8), h - 1)
    xs = np.minimum(np.arange(x0, x0 + 8), w - 1)
    return plane[ys[:, None], xs[None, :]]


def _encode_block(bw, zz, preds, ci, dc_enc, ac_enc) -> None:
    dc = int(zz[0])
    diff = dc - preds[ci]
    preds[ci] = dc
    s = _category(abs(diff))
    code, length = dc_enc[s]
    bw.write(code, length)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(v, s)
    # walk only the nonzero ACs (one numpy pass finds them; a constant
    # block costs a single flatnonzero instead of 63 scalar reads)
    nz = np.flatnonzero(zz[1:])
    prev = 0
    for k in nz.tolist():
        k += 1  # zigzag index
        v = int(zz[k])
        run = k - prev - 1
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(abs(v))
        if s > 10:
            raise ValueError("AC coefficient out of baseline range")
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        vv = v if v > 0 else v + (1 << s) - 1
        bw.write(vv, s)
        prev = k
    if prev != 63:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
