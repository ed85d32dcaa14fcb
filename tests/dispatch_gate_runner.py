"""Subprocess runner for the gate-level JPEG backend-invariance test.

Launched by tests/test_dispatch_gate.py in a FRESH process per leg so
the external-backend probe (imaging._EXTERNAL_JPEG, cached per worker
process) and the worker environment are fully controlled by the
launching env: leg "pure" sets FOURMC_PURE_DECODE=1, leg "fake" puts a
pure-decoder-backed fake PIL on PYTHONPATH (workers inherit it at JVM
launch). Prints the JPEG oracle queries' sorted rows as one JSON line.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    sf = sys.argv[1]
    from fourmc_spark.queries import QUERIES
    from fourmc_spark.session import get_spark

    spark = get_spark("dispatch-gate", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in ("multimodal_jpeg_roundtrip", "multimodal_jpeg_420_roundtrip",
                 "multimodal_jpeg_progressive",
                 "multimodal_jpeg_ycck_dispatch"):
        rows = QUERIES[name](spark, sf).collect()
        out[name] = sorted(
            [r["doc_id"], r["width"], r["height"], r["pix_sum"],
             r["jpeg_bytes_ok"]] for r in rows
        )
    spark.stop()
    print("RESULT:" + json.dumps(out))


if __name__ == "__main__":
    main()
