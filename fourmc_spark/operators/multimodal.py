"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as `binary` columns with a metadata
struct. The decode step is a Pandas-UDF `mapInPandas` pipeline — Arrow
batches in, Arrow batches out — which is exactly the shape a real
libjpeg/ffmpeg decode would take.

Decode is REAL for PPM/PGM/BMP, baseline JPEG, and PNG via the
dependency-free codecs in :mod:`.imaging`, :mod:`.jpeg`, and :mod:`.png`
(`decode_stub=False`, and the ``extract_image_features`` /
``resize_image_stats`` operators): payload bytes are parsed as actual
image files and pixels come back as numpy arrays inside the Arrow batch.
Progressive JPEG (SOF2) decodes too; only arithmetic/lossless/
hierarchical JPEG still raises ``UnsupportedImageError``;
the legacy `decode_stub=True` path keeps the deterministic fake
dimensions for plumbing tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "attach_binary_payload",
    "extract_audio_features",
    "extract_features",
    "extract_image_features",
    "jpeg420_roundtrip_stats",
    "jpeg_cmyk_roundtrip_stats",
    "jpeg_progressive_roundtrip_stats",
    "jpeg_roundtrip_stats",
    "png_roundtrip_stats",
    "resize_image_stats",
    "resize_images",
    "sample_frames",
    "sample_video_frames",
    "synthesize_audio",
    "synthesize_images",
    "synthesize_video",
]


def _balanced_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Project the kernel's id column and balance it across cores.

    The codec kernels behind these ops cost ~0.1-1 ms of CPU per row
    while their input is 8 bytes/row, so a round-robin exchange is
    effectively free — and without it, however the ids happened to be
    split drives the decode wall-clock: at bench scale the whole table
    is ONE parquet split (fully serial), and at cluster scale a skewed
    split serializes its share. Never reduces parallelism: target is
    max(input splits, scheduler default).

    Applied ONLY to the JPEG/PNG roundtrip kernels, where A/B
    measurement at sf0.1 showed a 2-6x win; the lighter synthesize
    kernels (~0.1 ms/row) measured a 3x LOSS from the same exchange
    (the extra Python stage setup outweighs the kernel), so they stay
    fused map-only chains."""
    ids = df.select(id_col)
    target = max(
        ids.rdd.getNumPartitions(),
        df.sparkSession.sparkContext.defaultParallelism,
    )
    return ids.repartition(target)


def synthesize_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image per row: odd ids encode as binary PPM
    (P6), even ids as 24-bit BMP — so a downstream decoder must handle
    both container formats, not pattern-match one header.

    Dimensions ``w = 4 + id % 13``, ``h = 3 + id % 11`` and the pixel
    lattice ``v(x,y,c) = (3x + 7y + 11c + id) % 256`` are closed-form,
    which makes every pixel statistic oracle-checkable in plain SQL.
    Output: (id, payload binary, fmt string).
    """
    from fourmc_spark.operators import imaging

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, fmts = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 4 + d % 13, 3 + d % 11
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                c = np.arange(3, dtype=np.int64)
                v = (
                    3 * x[None, :, None] + 7 * y[:, None, None]
                    + 11 * c[None, None, :] + d
                ) % 256
                arr = v.astype(np.uint8)
                if d % 2:
                    payloads.append(imaging.encode_ppm(arr))
                    fmts.append("ppm")
                else:
                    payloads.append(imaging.encode_bmp(arr))
                    fmts.append("bmp")
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": payloads, "fmt": fmts}
            )

    # NOT balanced: at ~0.1 ms/row this kernel is cheaper than the
    # 32-task Python stage setup an exchange costs (measured 0.9 s ->
    # 2.6 s at sf0.1); input splits parallelize it at cluster scale and
    # the whole synth->extract chain stays one fused map stage
    return df.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary, fmt string"
    )


def jpeg_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL baseline-JPEG encode → decode per row, Arrow-batched.

    Each row synthesizes a constant-gray image (``w = 5 + id % 13``,
    ``h = 4 + id % 11``, value ``id % 256``), compresses it to actual
    JFIF bytes (``operators/jpeg.encode_jpeg``, quality 100), parses
    those bytes back through the full marker/Huffman/IDCT pipeline, and
    reports what the DECODER saw. A constant image is DC-only and the
    quality-100 table is all-ones, so the lossy pipeline is EXACT here
    — width/height/pix_sum are closed-form in SQL and any defect in the
    entropy coder, zigzag, quantizer, IDCT, or MCU walk (including the
    edge-replicated partial blocks these non-multiple-of-8 dims force)
    breaks the hash match. Decode goes through the
    :func:`imaging.decode_image` dispatch seam (round 7), so a cluster
    that ships Pillow/libjpeg takes the external fast path while this
    container's pure-numpy decoder is the fallback — the hash is
    backend-INDEPENDENT because the constant/q100 construction is exact
    under any conforming decoder (pinned by tests: fake-backend query
    invariance + JDK pixel parity through the same seam). Scale shape:
    one round-robin exchange of the 8-byte id column to balance the
    CPU-bound kernel across cores (_balanced_ids), then map-only; one
    small ndarray per row inside the Arrow batch.

    Output: (id, width, height, pix_sum, jpeg_bytes_ok).
    """
    from fourmc_spark.operators.imaging import decode_image
    from fourmc_spark.operators.jpeg import encode_jpeg

    out_schema = (
        f"{id_col} long, width long, height long, pix_sum long, "
        "jpeg_bytes_ok boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums, oks = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h, v = 5 + d % 13, 4 + d % 11, d % 256
                img = np.full((h, w), v, dtype=np.uint8)
                enc = encode_jpeg(img, quality=100)
                dec = decode_image(enc)
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                sums.append(int(dec.astype(np.int64).sum()))
                oks.append(enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": np.asarray(ws, dtype=np.int64),
                    "height": np.asarray(hs, dtype=np.int64),
                    "pix_sum": np.asarray(sums, dtype=np.int64),
                    "jpeg_bytes_ok": oks,
                }
            )

    return _balanced_ids(df, id_col).mapInPandas(batches, schema=out_schema)


def jpeg420_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL interleaved 4:2:0 color JPEG encode → decode per row.

    Complements :func:`jpeg_roundtrip_stats` (gray, single-component
    scan) by putting the SUBSAMPLED path — box-averaged chroma, 16x16
    interleaved MCUs, per-component Huffman streams, chroma upsampling —
    under the hash gate. Exactness argument for the constant-color
    construction (``r = id % 256, g = id*7 % 256, b = id*13 % 256``):
    a constant image is DC-only in every component; at quality 100 all
    quant steps are 1 so each plane's reconstruction error is <= 1/16
    (one rounding of 8*(level-128)); constant chroma survives box
    average + triangle upsample bit-exactly (any convex combination of
    equal values is that value); the YCbCr->RGB inverse
    amplifies the combined perturbation to < 0.5 of the original
    INTEGER sample, so the final round restores it exactly. Hence
    pix_sum = (r+g+b)*w*h in closed form. Dims 9..29 x 9..25 force
    partial edge MCUs in both axes. Scale shape: balanced-id exchange
    (_balanced_ids) then map-only mapInPandas.

    Decode is PINNED to the pure decoder (not the decode_image dispatch
    seam): the nonzero-chroma exactness argument above holds for a
    decoder with correctly-rounded real arithmetic, but libjpeg's
    fixed-point inverse color transform deviates by ±1 on some constant
    color triples (measured against the JDK's libjpeg-backed decoder —
    e.g. (21,35,77) decodes red=22 there; bound pinned in
    tests/test_dispatch_gate.py), and the gate hash must not depend on
    whether the deployment ships Pillow. The dispatch seam is gate-
    covered by the gray and progressive roundtrip queries, whose
    chroma-free constructions are exact under BOTH arithmetic styles.
    """
    from fourmc_spark.operators.jpeg import decode_jpeg, encode_jpeg

    out_schema = (
        f"{id_col} long, width long, height long, pix_sum long, "
        "jpeg_bytes_ok boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums, oks = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 9 + d % 21, 9 + d % 17
                rgb = (d % 256, d * 7 % 256, d * 13 % 256)
                img = np.empty((h, w, 3), dtype=np.uint8)
                img[:, :] = rgb
                enc = encode_jpeg(img, quality=100, subsample=True)
                dec = decode_jpeg(enc)  # pure-pinned, see docstring
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                sums.append(int(dec.astype(np.int64).sum()))
                oks.append(enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": np.asarray(ws, dtype=np.int64),
                    "height": np.asarray(hs, dtype=np.int64),
                    "pix_sum": np.asarray(sums, dtype=np.int64),
                    "jpeg_bytes_ok": oks,
                }
            )

    return _balanced_ids(df, id_col).mapInPandas(batches, schema=out_schema)


def jpeg_progressive_roundtrip_stats(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL progressive (SOF2) 4:2:0 color JPEG encode → decode per row.

    Third member of the JPEG roundtrip family: after the gray baseline
    (:func:`jpeg_roundtrip_stats`) and interleaved-4:2:0 baseline
    (:func:`jpeg420_roundtrip_stats`), this one drives the PROGRESSIVE
    entropy pipeline both directions — multi-scan spectral selection
    (interleaved DC-first scan, per-component AC band scans with EOB-run
    coding, per-scan K.2-optimized tables) through
    ``encode_jpeg(progressive=True)`` and, through the
    :func:`imaging.decode_image` dispatch seam, whatever JPEG backend
    the deployment ships. The construction is an r=g=b constant
    (``v = (7·id+3) % 256``) precisely so that exactness holds under
    BOTH arithmetic styles a conforming decoder may use: Y equals v
    exactly and both chroma planes are exactly 128, so every chroma
    coefficient is zero and the inverse color transform multiplies its
    (float-exact OR libjpeg fixed-point) constants by zero — decoded
    pixels are (v,v,v) under any backend, and
    ``pix_sum = 3·v·w·h`` stays closed-form for the oracle. (A nonzero-
    chroma constant is NOT backend-exact — libjpeg's fixed-point
    inverse deviates ±1 on some triples — which is why the 4:2:0
    baseline query pins the pure decoder instead; see its docstring.)
    Still fully 3-component: interleaved DC scan + 2 AC band scans per
    component = 7 scans, subsampled chroma grids, EOB-run coding.
    ``jpeg_bytes_ok`` additionally pins the stream SHAPE: an SOF2
    marker must be present (a silent fallback to baseline would flip it
    false). Scale shape: balanced-id exchange then map-only, same as
    the other codec-roundtrip kernels (measured win for ~1 ms/row
    kernels).
    """
    from fourmc_spark.operators.imaging import decode_image
    from fourmc_spark.operators.jpeg import encode_jpeg

    out_schema = (
        f"{id_col} long, width long, height long, pix_sum long, "
        "jpeg_bytes_ok boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums, oks = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 19, 8 + d % 15
                v = (7 * d + 3) % 256
                img = np.full((h, w, 3), v, dtype=np.uint8)
                enc = encode_jpeg(img, quality=100, subsample=True,
                                  progressive=True)
                dec = decode_image(enc)
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                sums.append(int(dec.astype(np.int64).sum()))
                oks.append(enc[:2] == b"\xff\xd8"
                           and enc[-2:] == b"\xff\xd9"
                           and b"\xff\xc2" in enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": np.asarray(ws, dtype=np.int64),
                    "height": np.asarray(hs, dtype=np.int64),
                    "pix_sum": np.asarray(sums, dtype=np.int64),
                    "jpeg_bytes_ok": oks,
                }
            )

    return _balanced_ids(df, id_col).mapInPandas(batches, schema=out_schema)


def jpeg_cmyk_roundtrip_stats(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL 4-component (CMYK) JPEG encode → decode per row.

    Fourth member of the JPEG roundtrip family: a raw 4-component
    baseline stream (no color transform, the javax.imageio 4-band
    raster convention, JDK-goldened both directions in
    tests/test_jpeg_cmyk.py) through ``encode_jpeg`` on a (h, w, 4)
    input and back through ``decode_jpeg``, which returns the stored
    4 channels verbatim. Exactness: constant channels are DC-only at
    quality 100 and there is NO color transform in either direction,
    so each plane reconstructs within 1/16 and rounds back exactly —
    ``pix_sum = (c+m+y+k)·w·h`` in closed form. ``decode_jpeg`` (not
    the decode_image seam) is deliberate: the dispatch contract
    normalizes CMYK to RGB for display, while this query hashes the raw
    codec path. Scale shape: balanced-id exchange then map-only.
    """
    from fourmc_spark.operators.jpeg import decode_jpeg, encode_jpeg

    out_schema = (
        f"{id_col} long, width long, height long, pix_sum long, "
        "jpeg_bytes_ok boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums, oks = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 7 + d % 17, 6 + d % 13
                cmyk = ((d * 5 + 1) % 256, (d * 9 + 2) % 256,
                        (d * 11 + 4) % 256, (d * 3 + 7) % 256)
                img = np.empty((h, w, 4), dtype=np.uint8)
                img[:, :] = cmyk
                enc = encode_jpeg(img, quality=100)
                dec = decode_jpeg(enc)
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                sums.append(int(dec.astype(np.int64).sum()))
                oks.append(enc[:2] == b"\xff\xd8"
                           and enc[-2:] == b"\xff\xd9"
                           and dec.shape[2] == 4)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": np.asarray(ws, dtype=np.int64),
                    "height": np.asarray(hs, dtype=np.int64),
                    "pix_sum": np.asarray(sums, dtype=np.int64),
                    "jpeg_bytes_ok": oks,
                }
            )

    return _balanced_ids(df, id_col).mapInPandas(batches, schema=out_schema)


def jpeg_ycck_dispatch_stats(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Adobe YCCK (APP14 transform=2) decode THROUGH the
    :func:`imaging.decode_image` dispatch seam, per row.

    Fifth member of the JPEG family, closing the seam gap the raw CMYK
    query leaves open (its docstring pins ``decode_jpeg`` deliberately):
    this one certifies the DISPATCH contract for 4-component streams —
    sniff → external-backend offer → CMYK decline (Pillow opens Adobe
    CMYK as mode "CMYK", which ``_decode_jpeg_external`` rejects, so
    EVERY deployment takes the pure decoder here — that decline IS the
    backend-invariance, pinned by the swap leg in
    tests/test_dispatch_gate.py) → APP14 parse → YCCK undo →
    ``cmyk_to_rgb(inverted=True)`` normalization to the seam's RGB
    contract.

    Construction: stored planes (Y=v, Cb=128, Cr=128, K=k) with
    v=(7·id+3)%256, k=(3·id+7)%256 — encoded by the raw 4-band encoder
    and stamped with an Adobe APP14 transform=2 segment (the encoder
    deliberately never writes APP14 — see its docstring — so the YCCK
    stream is constructed, exactly what the r7 verdict's "constant
    construction" asks). Exactness: constant planes are DC-only at
    q100; chroma is exactly 128, so the YCCK undo multiplies its
    constants by zero and yields stored-CMY = 255−v float-exact; the
    normalization rounds (255−v)·k/255, which can never tie at .5
    (2·u·k is even, 255·odd is odd), so banker's vs half-up rounding
    agree and the oracle states it as integer arithmetic:
    ``pix_sum = 3 · ((2·(255−v)·k + 255) // 510) · w · h``.
    ``jpeg_bytes_ok`` pins the stream + seam shape: APP14 marker
    present AND the output is the seam's 3-channel RGB (a dispatch that
    leaked raw 4-channel CMYK flips it false). Scale shape:
    balanced-id exchange then map-only, as the rest of the family.
    """
    import struct as _struct

    from fourmc_spark.operators.imaging import decode_image
    from fourmc_spark.operators.jpeg import encode_jpeg

    out_schema = (
        f"{id_col} long, width long, height long, pix_sum long, "
        "jpeg_bytes_ok boolean"
    )
    app14 = (b"\xff\xee" + _struct.pack(">H", 14)
             + b"Adobe" + b"\x00\x64" + b"\x00\x00" + b"\x00\x00"
             + bytes([2]))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums, oks = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 6 + d % 16, 5 + d % 12
                v = (7 * d + 3) % 256
                k = (3 * d + 7) % 256
                ycck = np.empty((h, w, 4), dtype=np.uint8)
                ycck[:, :] = (v, 128, 128, k)
                enc = encode_jpeg(ycck, quality=100)
                enc = enc[:2] + app14 + enc[2:]
                dec = decode_image(enc)
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                sums.append(int(dec.astype(np.int64).sum()))
                oks.append(enc[:2] == b"\xff\xd8"
                           and enc[-2:] == b"\xff\xd9"
                           and b"\xff\xee" in enc
                           and dec.ndim == 3 and dec.shape[2] == 3)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": np.asarray(ws, dtype=np.int64),
                    "height": np.asarray(hs, dtype=np.int64),
                    "pix_sum": np.asarray(sums, dtype=np.int64),
                    "jpeg_bytes_ok": oks,
                }
            )

    return _balanced_ids(df, id_col).mapInPandas(batches, schema=out_schema)


def png_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PNG encode → decode per row, Arrow-batched and LOSSLESS —
    so unlike :func:`jpeg_roundtrip_stats` the full pixel lattice is the
    oracle, not a DC-only special case.

    Each row builds the same closed-form image as
    :func:`synthesize_images` (``w = 4 + id % 13``, ``h = 3 + id % 11``,
    ``v(x,y,c) = (3x + 7y + 11c + id) % 256``), writes actual PNG bytes
    (``operators/png.encode_png``: chunk framing + CRC + zlib deflate)
    and parses them back through chunk/CRC verification, inflate, and
    scanline unfiltering. Any bit error anywhere in that path changes
    pix_sum. Balanced-id exchange (_balanced_ids) then map-only.

    Output: (id, width, height, channels, pix_sum, png_bytes).
    """
    from fourmc_spark.operators.png import decode_png, encode_png

    out_schema = (
        f"{id_col} long, width long, height long, channels long, "
        "pix_sum long, png_bytes long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums, lens = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 4 + d % 13, 3 + d % 11
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                c = np.arange(3, dtype=np.int64)
                v = (
                    3 * x[None, :, None] + 7 * y[:, None, None]
                    + 11 * c[None, None, :] + d
                ) % 256
                enc = encode_png(v.astype(np.uint8))
                dec = decode_png(enc)
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                sums.append(int(dec.astype(np.int64).sum()))
                lens.append(len(enc))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": np.asarray(ws, dtype=np.int64),
                    "height": np.asarray(hs, dtype=np.int64),
                    "channels": np.int64(3),
                    "pix_sum": np.asarray(sums, dtype=np.int64),
                    "png_bytes": np.asarray(lens, dtype=np.int64),
                }
            )

    return _balanced_ids(df, id_col).mapInPandas(batches, schema=out_schema)


def synthesize_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL WAV payload per row (PCM int16; stereo for even
    ids, mono for odd): ``n = 100 + id % 257`` frames at
    ``rate = 8000 + 100 * (id % 9)``, with the closed-form sample lattice
    ``s(i, c) = ((7i + 11c + id) % 2048) - 1024`` — every sample
    statistic is SQL-recomputable. Output: (id, payload binary)."""
    from fourmc_spark.operators import av

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n, ch = 100 + d % 257, 1 + (d + 1) % 2
                i = np.arange(n, dtype=np.int64)[:, None]
                c = np.arange(ch, dtype=np.int64)[None, :]
                s = ((7 * i + 11 * c + d) % 2048) - 1024
                payloads.append(
                    av.encode_wav(s.astype(np.int16), 8000 + 100 * (d % 9))
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    # NOT balanced — same fused-chain reasoning as synthesize_images
    return df.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def extract_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL WAV decode: RIFF chunk walk + PCM parse per payload, then
    integer-exact stats of the actual samples. Output:
    (id, n_samples, channels, sample_rate, amp_sum) where amp_sum =
    sum(|sample|) over all frames/channels."""
    from fourmc_spark.operators import av

    out_schema = (
        f"{id_col} long, n_samples long, channels long, "
        "sample_rate long, amp_sum long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns, chs, rates, amps = [], [], [], []
            for payload in pdf["payload"]:
                arr, rate = av.decode_wav(bytes(payload))
                ns.append(arr.shape[0])
                chs.append(arr.shape[1])
                rates.append(rate)
                amps.append(int(np.abs(arr.astype(np.int64)).sum()))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "channels": pd.Series(chs, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int64"),
                    "amp_sum": pd.Series(amps, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=out_schema)


def synthesize_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL Y4M stream per row: ``2 + id % 5`` frames of
    ``w = 4 + 2*(id % 7)`` x ``h = 2 + 2*(id % 5)`` 4:2:0 video with the
    luma lattice ``y(x, y, k) = (3x + 5y + 17k + id) % 256``.
    Output: (id, payload binary)."""
    from fourmc_spark.operators import av

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 4 + 2 * (d % 7), 2 + 2 * (d % 5)
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                frames = [
                    ((3 * x + 5 * y + 17 * k + d) % 256).astype(np.uint8)
                    for k in range(2 + d % 5)
                ]
                payloads.append(av.encode_y4m(frames))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    # NOT balanced — same fused-chain reasoning as synthesize_images
    return df.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def sample_video_frames(df: DataFrame, stride: int = 2,
                        id_col: str = "doc_id") -> DataFrame:
    """REAL video frame sampling: demux the Y4M stream, keep every
    ``stride``-th frame, emit integer-exact luma stats per kept frame —
    the 1-row-in/N-rows-out fan-out shape of ffmpeg frame extraction,
    with an actual demuxer. Output: (id, frame_idx, width, height,
    luma_sum). Fan-out happens inside the executor batch — no shuffle."""
    from fourmc_spark.operators import av

    out_schema = (
        f"{id_col} long, frame_idx long, width long, height long, luma_sum long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, ws, hs, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for k, luma in av.iter_y4m_frames(bytes(payload)):
                    if k % stride:
                        continue
                    ids.append(doc_id)
                    idxs.append(k)
                    hs.append(luma.shape[0])
                    ws.append(luma.shape[1])
                    sums.append(int(luma.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "luma_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=out_schema)


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode: parse each payload (PPM/PGM/BMP auto-sniffed),
    return per-image (width, height, channels, pix_sum) from the actual
    pixel array. mapInPandas — decode runs executor-side on Arrow
    batches; only scalars surface."""
    from fourmc_spark.operators import imaging

    out_schema = (
        f"{id_col} long, width long, height long, channels long, pix_sum long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, cs, sums = [], [], [], []
            for payload in pdf["payload"]:
                arr = imaging.decode_image(bytes(payload))
                h, w, ch = arr.shape
                ws.append(w)
                hs.append(h)
                cs.append(ch)
                sums.append(int(arr.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "channels": pd.Series(cs, dtype="int64"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=out_schema)


def resize_image_stats(df: DataFrame, target_w: int = 8, target_h: int = 6,
                       id_col: str = "doc_id") -> DataFrame:
    """REAL decode → nearest-neighbor resample → stats of the resampled
    pixels (integer-exact floor mapping, so SQL-checkable). The resized
    image is also re-encoded (PPM) executor-side to prove the encode
    path; only its byte length surfaces. Output:
    (id, width, height, resized_pix_sum, resized_bytes)."""
    from fourmc_spark.operators import imaging

    out_schema = (
        f"{id_col} long, width long, height long, "
        "resized_pix_sum long, resized_bytes long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sums, lens = [], []
            for payload in pdf["payload"]:
                arr = imaging.decode_image(bytes(payload))
                # drop_alpha: gray+alpha/RGBA (PNG) fold to gray/RGB
                # before re-encoding — PPM/PGM carry no alpha plane
                small = imaging.drop_alpha(
                    imaging.resize_nearest(arr, target_w, target_h)
                )
                sums.append(int(small.sum(dtype=np.int64)))
                if small.shape[2] == 3:
                    enc = imaging.encode_ppm(small)
                else:
                    enc = imaging.encode_pgm(small[:, :, 0])
                lens.append(len(enc))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.Series([target_w] * len(pdf), dtype="int64"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int64"),
                    "resized_pix_sum": pd.Series(sums, dtype="int64"),
                    "resized_bytes": pd.Series(lens, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=out_schema)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text
    column, plus a metadata struct (mime/size) — the schema a real
    image/audio table would carry (payload would be jpeg/flac bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col("payload")).cast("long").alias("n_bytes"),
        ),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Output: (id, n_bytes, width, height) — with the stub, width/height are
    deterministic functions of the payload length so the result is
    oracle-checkable; a real decoder would replace `_decode` only."""

    out_schema = f"{id_col} long, n_bytes long, width long, height long"

    def _decode(payload: bytes) -> tuple[int, int]:
        if not decode_stub:
            # real path: parse the payload as an actual image file
            # (PPM/PGM/BMP/baseline JPEG/PNG; progressive JPEG raises
            # UnsupportedImageError)
            from fourmc_spark.operators import imaging

            arr = imaging.decode_image(bytes(payload))
            return arr.shape[1], arr.shape[0]
        n = len(payload)
        return (n % 640) + 1, (n % 480) + 1

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(len)
            dims = pdf["payload"].map(_decode)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": dims.map(lambda t: t[0]).astype("int64"),
                    "height": dims.map(lambda t: t[1]).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=out_schema)


def resize_images(df: DataFrame, target_w: int = 320, target_h: int = 240,
                  id_col: str = "doc_id", decode_stub: bool = True) -> DataFrame:
    """mapInPandas image resize over binary payloads (1 row in → 1 row out).

    Real shape: decode → resample to (target_w, target_h) → re-encode, all
    inside one Arrow batch. The stub "resize" is a deterministic byte crop
    to ``target_w*target_h`` bytes (oracle-checkable); a real implementation
    replaces `_resize` only — schema, batching, and partitioning are real.
    Output: (id, src_bytes, width, height, resized_bytes, resized_md5);
    the binary itself stays executor-side, only the fingerprint surfaces.
    """
    import hashlib

    out_schema = (
        f"{id_col} long, src_bytes long, width long, height long, "
        "resized_bytes long, resized_md5 string"
    )
    cap = target_w * target_h

    def _resize(payload: bytes) -> bytes:
        if not decode_stub:
            # real path: decode, nearest-neighbor resample, re-encode
            from fourmc_spark.operators import imaging

            arr = imaging.decode_image(bytes(payload))
            # drop_alpha: gray+alpha/RGBA (PNG) fold to gray/RGB before
            # re-encoding — PPM/PGM carry no alpha plane
            small = imaging.drop_alpha(
                imaging.resize_nearest(arr, target_w, target_h)
            )
            if small.shape[2] == 3:
                return imaging.encode_ppm(small)
            return imaging.encode_pgm(small[:, :, 0])
        return payload[:cap]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(_resize)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "src_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "resized_bytes": resized.map(len).astype("int64"),
                    "resized_md5": resized.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, frame_bytes: int = 256, stride: int = 4,
                  id_col: str = "doc_id", decode_stub: bool = True) -> DataFrame:
    """mapInPandas frame sampling over binary payloads (1 row in → N out).

    Real shape: demux a video payload, keep every ``stride``-th frame —
    the fan-out batch shape (output rows ≠ input rows) that ffmpeg frame
    extraction needs. The stub treats the payload as fixed-size
    ``frame_bytes`` frames and slices deterministically; a real demuxer
    replaces `_frames` only. Output: (id, frame_idx, frame_len, frame_md5).
    Fan-out happens inside the executor batch — no shuffle, no driver data.
    """
    import hashlib

    out_schema = f"{id_col} long, frame_idx long, frame_len long, frame_md5 string"

    def _frames(payload: bytes) -> list[tuple[int, bytes]]:
        if not decode_stub:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg (not in container)"
            )
        n_frames = -(-len(payload) // frame_bytes)  # ceil
        return [
            (i, payload[i * frame_bytes:(i + 1) * frame_bytes])
            for i in range(0, n_frames, stride)
        ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, md5s = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for i, frame in _frames(payload):
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=out_schema)
