"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as `binary` columns with a metadata
struct. The decode step is a Pandas-UDF `mapInPandas` pipeline — Arrow
batches in, Arrow batches out — which is exactly the shape a real
libjpeg/ffmpeg decode would take. The actual pixel decode is STUBBED (the
container has no imaging libs): `decode_stub=True` derives deterministic
fake dimensions from the payload so the Spark-side plumbing (schema,
batching, partition shape) is fully real and testable; passing
`decode_stub=False` raises NotImplementedError at the decode site.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "attach_binary_payload",
    "extract_features",
    "resize_images",
    "sample_frames",
]


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
            raise NotImplementedError(
                "real image decode requires pillow/ffmpeg (not in container)"
            )
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
            raise NotImplementedError(
                "real image resize requires pillow/libvips (not in container)"
            )
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
