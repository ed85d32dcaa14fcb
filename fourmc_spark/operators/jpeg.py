"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy.

Closes the last multimodal-column gap: the container has no libjpeg, so
compressed camera formats previously raised ``UnsupportedImageError``
and only PPM/PGM/BMP flowed through the decode → feature → resize path
(``operators/imaging.py``). This module implements the baseline
sequential DCT process from the PUBLIC spec — marker parsing, DQT/DHT/
SOF0/SOS/DRI, canonical Huffman entropy decoding with byte-stuffing and
restart markers, dequantization, 8x8 inverse DCT as one numpy matmul
per block, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), and the JFIF
YCbCr→RGB transform. Progressive (SOF2), arithmetic coding, and
hierarchical modes are out of scope and raise with a clear message.

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
across Spark tasks per batch; within one payload it is Python-loop
entropy decoding + numpy block math (the honest dependency-free
trade; swap in libjpeg via the same ``decode_image`` dispatch when the
cluster image has it).

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

def _huff_decode_lut(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


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


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing removal. Stops (pads zeros) at any non-RST marker;
    restart markers are consumed explicitly via expect_rst()."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.hit_marker = False

    def _fill(self) -> None:
        if self.hit_marker or self.pos >= len(self.buf):
            self.acc = (self.acc << 8)
            self.n += 8
            self.hit_marker = True
            return
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                # a real marker: scan data ends here; pad with zeros
                self.hit_marker = True
                self.acc = self.acc << 8
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def expect_rst(self, i: int) -> None:
        """Byte-align and consume the RSTi marker ending an interval."""
        self.acc, self.n = 0, 0
        self.hit_marker = False
        while self.pos + 1 < len(self.buf):
            if self.buf[self.pos] == 0xFF:
                m = self.buf[self.pos + 1]
                if m == 0x00:
                    self.pos += 2  # stuffed data byte left before align
                    continue
                if 0xD0 <= m <= 0xD7:
                    if m != 0xD0 + (i % 8):
                        raise ValueError(
                            f"restart marker out of order: got {m:#x}, "
                            f"expected {0xD0 + (i % 8):#x}"
                        )
                    self.pos += 2
                    return
                raise ValueError(f"expected RST marker, found {m:#x}")
            self.pos += 1
        raise ValueError("scan ended while expecting a restart marker")


def _decode_symbol(r: _BitReader, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        v = lut.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in scan data")


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


# --------------------------------------------------------------- decode

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array (h, w, 3) RGB or (h, w) gray.

    Supports: SOF0 (baseline sequential), 8-bit precision, 1 or 3
    components, any sampling factors up to 4 (4:4:4 / 4:2:2 / 4:2:0
    included), restart intervals, multiple DQT/DHT segments, stuffed
    bytes, and multi-scan baseline files (one SOS per component, legal
    per T.81 — each single-component scan decodes non-interleaved on
    the component's own block grid). Raises
    :class:`UnsupportedImageError` for progressive / arithmetic /
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

    while True:
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG (stream ends before EOI)")
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {buf[pos]:#x}")
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline ok
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"JPEG SOF marker {marker:#x}: only baseline sequential "
                "(SOF0/SOF1) is supported (no progressive/arithmetic/"
                "hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
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
            if planes is None:
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
            pos = _decode_scan(
                buf, pos + seglen, frame, scan_sel, qtables, hufftabs,
                restart_interval, planes,
            )
            scanned |= {s[1] for s in scan_sel}
            continue  # pos already points at the next marker
        pos += seglen

    if planes is None:
        raise ValueError("no scan data found (missing SOS)")
    h, w, comps = frame
    missing = [cid for cid, _, _, _ in comps if cid not in scanned]
    if missing:
        raise ValueError(
            f"stream {'ended' if saw_eoi else 'stopped'} with no scan "
            f"for component(s) {missing}"
        )
    # upsample each component to the luma grid and crop
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _next_marker_pos(buf: bytes, pos: int) -> int:
    """First byte offset at/after ``pos`` holding a real marker (0xFF
    followed by anything but the 0x00 stuffing escape)."""
    while pos + 1 < len(buf):
        if buf[pos] == 0xFF:
            if buf[pos + 1] == 0x00:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("truncated JPEG (no marker after scan data)")


def _decode_block(r, dc_lut, ac_lut, pred: int) -> tuple[np.ndarray, int]:
    """Entropy-decode one 8x8 data unit -> (zigzag coefficients, new DC
    prediction)."""
    zz = np.zeros(64, dtype=np.int64)
    s = _decode_symbol(r, dc_lut)
    if s > 15:
        # baseline DC categories are 0..11; a corrupt DHT can map a
        # code to any byte, and read_bits(255) would build an arbitrary-
        # precision int that overflows the int64 coefficient store
        raise ValueError(f"invalid DC category {s} in scan data")
    pred += _receive_extend(r, s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _decode_symbol(r, ac_lut)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient overrun")
        zz[k] = _receive_extend(r, size)
        k += 1
    return zz, pred


def _decode_scan(buf, pos, frame, scan_sel, qtables, hufftabs,
                 restart_interval, planes) -> int:
    """Entropy-decode one scan into ``planes``; returns the byte offset
    of the marker following the scan's entropy-coded data.

    ``scan_sel`` rows are (ci, cid, hs, vs, tq, dc_id, ac_id). Multiple
    components -> interleaved MCUs on the frame's MCU grid (T.81 A.2.3);
    a single component -> non-interleaved, MCU = ONE data unit walking
    the component's OWN block grid (T.81 A.2.2) — its sampling factors
    size its grid but do NOT multiply blocks per MCU.
    """
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    at = _A.T
    luts = []
    for ci, cid, hs, vs, tq, dc_id, ac_id in scan_sel:
        dc_lut = hufftabs.get((0, dc_id))
        ac_lut = hufftabs.get((1, ac_id))
        if dc_lut is None or ac_lut is None:
            raise ValueError("scan references an undefined DHT table")
        if tq not in qtables:
            raise ValueError("scan references an undefined DQT table")
        luts.append((dc_lut, ac_lut, qtables[tq]))

    r = _BitReader(buf, pos)
    preds = [0] * len(scan_sel)
    n_rst = 0

    def _place(si: int, by: int, bx: int) -> None:
        ci, cid, hs, vs, tq, _, _ = scan_sel[si]
        dc_lut, ac_lut, q = luts[si]
        zz, preds[si] = _decode_block(r, dc_lut, ac_lut, preds[si])
        coef = np.zeros((8, 8))
        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q
        planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
            at @ coef @ _A + 128.0
        )

    if len(scan_sel) > 1:
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                r.expect_rst(n_rst)
                n_rst += 1
                preds = [0] * len(scan_sel)
            my, mx = divmod(m, mcux)
            for si, (ci, cid, hs, vs, tq, _, _) in enumerate(scan_sel):
                for v in range(vs):
                    for hh in range(hs):
                        _place(si, my * vs + v, mx * hs + hh)
    else:
        (ci, cid, hs, vs, tq, _, _) = scan_sel[0]
        # the component's own dimensions (T.81 A.1.1) and block grid
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        for m in range(bw * bh):
            if restart_interval and m and m % restart_interval == 0:
                r.expect_rst(n_rst)
                n_rst += 1
                preds = [0] * len(scan_sel)
            by, bx = divmod(m, bw)
            _place(0, by, bx)

    return _next_marker_pos(buf, r.pos)


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


def _quant_table(quality: int) -> np.ndarray:
    """Deterministic frequency-weighted table: DC fine, AC coarser with
    distance from DC, scaled by quality 1..100 (higher = finer). Not
    Annex K — any table is valid because DQT carries it in-stream."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    u = np.arange(8)
    base = 1.0 + (u[:, None] + u[None, :]) * 2.0
    scale = (101 - quality) / 25.0  # q=100 -> 0.04 (near-lossless)
    t = np.clip(np.round(base * scale), 1, 255).astype(np.int32)
    return t


def _category(v: int) -> int:
    return int(v).bit_length() if v != 0 else 0


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w[, 1]) gray -> baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 chroma (box-averaged), exercising
    the interleaved-MCU layout; default is 4:4:4.
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs (resynchronization points a parallel/streaming decoder seeks
    to; also exercises the decoder's restart path).
    """
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
    else:
        rgb = a.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        if subsample:
            cb, cr = _box2(cb), _box2(cr)
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_bits, dc_vals = _fixed_length_table(dc_syms)
    ac_bits, ac_vals = _fixed_length_table(ac_syms)
    dc_enc = _huff_encode_lut(dc_bits, dc_vals)
    ac_enc = _huff_encode_lut(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT (one table, id 0, used by all components)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" \
        + bytes(int(v) for v in qzz)
    # SOF0
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (hs, vs) in enumerate(samps):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0, AC table 0 (shared by all components)
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)),
                             (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
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
                    y0 = (my * vs + v) * 8
                    x0 = (mx * hs + hh) * 8
                    block = _padded_block(plane, y0, x0) - 128.0
                    coef = _A @ block @ _A.T
                    zz = np.round(coef[_ZZ_ROWS, _ZZ_COLS] / qzz
                                  ).astype(np.int64)
                    _encode_block(bw, zz, preds, ci, dc_enc, ac_enc)
    bw.flush()
    out += bw.out
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


def _padded_block(plane: np.ndarray, y0: int, x0: int) -> np.ndarray:
    """8x8 window at (y0, x0), edge-replicated past the boundary."""
    h, w = plane.shape
    if y0 + 8 <= h and x0 + 8 <= w:
        return plane[y0:y0 + 8, x0:x0 + 8]
    ys = np.minimum(np.arange(y0, y0 + 8), h - 1)
    xs = np.minimum(np.arange(x0, x0 + 8), w - 1)
    return plane[ys[:, None], xs[None, :]]


def _encode_block(bw, zz, preds, ci, dc_enc, ac_enc) -> None:
    diff = int(zz[0]) - preds[ci]
    preds[ci] = int(zz[0])
    s = _category(abs(diff))
    code, length = dc_enc[s]
    bw.write(code, length)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
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
        run = 0
    if run:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
