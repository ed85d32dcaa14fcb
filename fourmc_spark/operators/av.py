"""Dependency-free audio/video container codecs: WAV (PCM) and Y4M.

The audio/video twins of :mod:`.imaging` — REAL formats with real
parsers, pure struct/numpy, so the multimodal pipeline can decode actual
media bytes end-to-end without ffmpeg:

* **WAV** — RIFF/WAVE with a ``fmt `` chunk (PCM int16/int8/int32 or
  IEEE float32) and a ``data`` chunk; arbitrary extra chunks (LIST,
  fact, …) are skipped per the RIFF rules. Every sound tool can emit
  this.
* **Y4M (YUV4MPEG2)** — the uncompressed video interchange format every
  ffmpeg/mjpegtools pipeline speaks: a plain-text stream header
  (``YUV4MPEG2 W<w> H<h> F<fps> ... C<chroma>\\n``) followed by
  ``FRAME...\\n`` + raw planar YUV per frame. Real frame demux without a
  codec library.

Compressed media (MP3/AAC/H.264/…) still needs external decoders and
raises :class:`UnsupportedMediaError` with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedMediaError",
    "decode_wav",
    "encode_wav",
    "encode_y4m",
    "iter_y4m_frames",
    "parse_y4m_header",
]


class UnsupportedMediaError(ValueError):
    """Payload is not a format this dependency-free decoder handles."""


# ------------------------------------------------------------------ WAV

_PCM_DTYPES = {
    (1, 8): np.uint8,       # PCM unsigned 8-bit
    (1, 16): np.int16,      # PCM signed 16-bit (the common case)
    (1, 32): np.int32,      # PCM signed 32-bit
    (3, 32): np.float32,    # IEEE float
}


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n_samples,) or (n_samples, channels) int16 -> RIFF/WAVE bytes."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"WAV wants (n,) or (n, ch), got {a.shape}")
    n, ch = a.shape
    data = np.ascontiguousarray(a).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)),
            b"WAVE",
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
        ]
    )
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> ((n_samples, channels) array, sample_rate).

    Walks the RIFF chunk list (skipping unknown chunks, honoring the
    odd-size pad byte) — not just a fixed 44-byte header slice, so files
    with LIST/fact/cue chunks parse correctly.
    """
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE file")
    pos, end = 12, len(data)
    fmt = None
    raw = None
    while pos + 8 <= end:
        cid = bytes(data[pos : pos + 4])
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise UnsupportedMediaError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise UnsupportedMediaError("fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks
    if fmt is None or raw is None:
        raise UnsupportedMediaError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt == 0xFFFE:
        raise UnsupportedMediaError("WAVE_FORMAT_EXTENSIBLE not supported")
    dtype = _PCM_DTYPES.get((audio_fmt, bits))
    if dtype is None:
        raise UnsupportedMediaError(
            f"unsupported WAV encoding (format={audio_fmt}, bits={bits}); "
            "supported: PCM 8/16/32-bit, IEEE float32"
        )
    width = np.dtype(dtype).itemsize
    if ch <= 0 or len(raw) % (width * ch):
        raise UnsupportedMediaError("data chunk not a whole number of frames")
    arr = np.frombuffer(raw, dtype=dtype).reshape(-1, ch)
    return arr, rate


# ------------------------------------------------------------------ Y4M

_Y4M_MAGIC = b"YUV4MPEG2"


def _frame_bytes(w: int, h: int, chroma: str) -> int:
    """Exact per-frame byte count: luma + 2 chroma planes whose
    dimensions are CEIL-halved per the subsampling (a 5x4 4:2:0 frame
    carries 3x2 chroma planes — int(w*h*1.5) would come up short on any
    odd dimension and misalign every following FRAME marker)."""
    luma = w * h
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if chroma in ("420", "420jpeg", "420mpeg2", "420paldv"):
        return luma + 2 * cw * ch
    if chroma == "422":
        return luma + 2 * cw * h
    if chroma == "444":
        return 3 * luma
    if chroma == "mono":
        return luma
    raise UnsupportedMediaError(f"unsupported Y4M chroma {chroma!r}")


def parse_y4m_header(data: bytes) -> tuple[int, int, str, int]:
    """-> (width, height, chroma, header_end_offset)."""
    if bytes(data[: len(_Y4M_MAGIC)]) != _Y4M_MAGIC:
        raise UnsupportedMediaError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n", 0, 4096)
    if nl < 0:
        raise UnsupportedMediaError("unterminated Y4M stream header")
    w = h = 0
    chroma = "420"
    for tok in bytes(data[len(_Y4M_MAGIC):nl]).split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            chroma = t[1:]
    if w <= 0 or h <= 0:
        raise UnsupportedMediaError(f"bad Y4M dimensions {w}x{h}")
    _frame_bytes(w, h, chroma)  # validates the chroma tag
    return w, h, chroma, nl + 1


def iter_y4m_frames(data: bytes):
    """Yield (frame_index, luma_plane) — luma as uint8 (h, w); chroma
    planes are skipped over but size-validated. Stops at end of stream;
    raises on truncation mid-frame."""
    w, h, chroma, pos = parse_y4m_header(data)
    frame_bytes = _frame_bytes(w, h, chroma)
    luma_bytes = w * h
    idx = 0
    n = len(data)
    while pos < n:
        nl = data.find(b"\n", pos, pos + 1024)
        if nl < 0 or bytes(data[pos : pos + 5]) != b"FRAME":
            raise UnsupportedMediaError(f"bad FRAME marker at offset {pos}")
        body = data[nl + 1 : nl + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise UnsupportedMediaError(f"truncated frame {idx}")
        luma = np.frombuffer(body[:luma_bytes], dtype=np.uint8).reshape(h, w)
        yield idx, luma
        idx += 1
        pos = nl + 1 + frame_bytes


def encode_y4m(frames: "list[np.ndarray]", chroma_fill: int = 128) -> bytes:
    """uint8 (h, w) luma planes -> Y4M 4:2:0 stream (chroma planes filled
    with a constant — gray — which real tools accept)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if w % 2 or h % 2:
        raise ValueError("4:2:0 needs even dimensions")
    chroma = bytes([chroma_fill]) * ((w // 2) * (h // 2))
    parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h)]
    for fr in frames:
        a = np.ascontiguousarray(fr, dtype=np.uint8)
        if a.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        parts.append(b"FRAME\n")
        parts.append(a.tobytes())
        parts.append(chroma)
        parts.append(chroma)
    return b"".join(parts)
