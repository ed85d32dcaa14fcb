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

__all__ = ["attach_binary_payload", "extract_features"]


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
