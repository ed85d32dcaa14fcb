#!/usr/bin/env python
"""Round-11 measurement targets that need no cluster (pure-Python kernel
splits) plus phase timers for ann_ivf_kmeans (needs Spark).

Segments:
  jpeg      — multimodal_jpeg_progressive's per-row kernel: total numpy
              codec seconds over the sf0.1 id distribution, split into
              encode/decode, vs the per-row Python loop overhead around
              them. Decides VERDICT r10 #5 (vectorize vs "all codec
              math").
  kmeans    — per-phase timers inside ann_ivf_kmeans_topk's body
              (persist+init collect, each training collect, final probe
              action) so the action-count floor is measured, not
              guessed (VERDICT r10 #6).

    python scripts/profile_r11.py [jpeg|kmeans ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT: dict[str, float] = {}


def profile_jpeg() -> None:
    import numpy as np

    from fourmc_spark.operators.imaging import decode_image
    from fourmc_spark.operators.jpeg import encode_jpeg

    import duckdb

    ids = [r[0] for r in duckdb.connect().execute(
        f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()]
    # same per-row construction as jpeg_progressive_roundtrip_stats
    t_enc = t_dec = t_build = 0.0
    t_all0 = time.perf_counter()
    for d in ids:
        d = int(d)
        t0 = time.perf_counter()
        w, h = 8 + d % 19, 8 + d % 15
        v = (7 * d + 3) % 256
        img = np.full((h, w, 3), v, dtype=np.uint8)
        t1 = time.perf_counter()
        enc = encode_jpeg(img, quality=100, subsample=True, progressive=True)
        t2 = time.perf_counter()
        dec = decode_image(enc)
        t3 = time.perf_counter()
        int(dec.astype(np.int64).sum())
        t_build += t1 - t0
        t_enc += t2 - t1
        t_dec += t3 - t2
    total = time.perf_counter() - t_all0
    OUT["jpeg_rows"] = len(ids)
    OUT["jpeg_kernel_total_sec"] = round(total, 3)
    OUT["jpeg_encode_sec"] = round(t_enc, 3)
    OUT["jpeg_decode_sec"] = round(t_dec, 3)
    OUT["jpeg_build_sec"] = round(t_build, 3)
    OUT["jpeg_loop_overhead_sec"] = round(total - t_enc - t_dec - t_build, 3)
    OUT["jpeg_ideal_wall_32c_sec"] = round(total / int(CPUS), 3)


def profile_kmeans() -> None:
    from pyspark.sql import functions as F

    from fourmc_spark.operators import similarity
    from fourmc_spark.queries import _IVF_NPROBE, _IVF_STRIDE, _t
    from fourmc_spark.session import get_spark

    spark = get_spark("profile-r11", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    e = _t(spark, SF_DIR, "events")  # warm session on an unrelated table
    e.count()

    emb = _t(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 5)

    # phase timers: monkeypatch collect to log
    times: list[float] = []
    from pyspark.sql.classic.dataframe import DataFrame

    orig_collect = DataFrame.collect

    def timed_collect(self, *a, **kw):
        t0 = time.perf_counter()
        r = orig_collect(self, *a, **kw)
        times.append(time.perf_counter() - t0)
        return r

    # warm once end to end
    def run():
        out = similarity.ivf_kmeans_int_topk(
            emb, q, k=10, centroid_stride=_IVF_STRIDE, nprobe=_IVF_NPROBE,
            n_iter=3, scale=1024,
        )
        out.write.format("noop").mode("overwrite").save()

    run()
    spark.catalog.clearCache()
    DataFrame.collect = timed_collect
    try:
        t0 = time.perf_counter()
        run()
        total = time.perf_counter() - t0
    finally:
        DataFrame.collect = orig_collect
    OUT["kmeans_total_sec"] = round(total, 3)
    for i, t in enumerate(times):
        OUT[f"kmeans_collect_{i}_sec"] = round(t, 3)
    OUT["kmeans_final_action_sec"] = round(total - sum(times), 3)
    spark.stop()


SEGMENTS = {"jpeg": profile_jpeg, "kmeans": profile_kmeans}


def main() -> None:
    names = sys.argv[1:] or list(SEGMENTS)
    unknown = [n for n in names if n not in SEGMENTS]
    if unknown:
        raise SystemExit(f"unknown segments: {unknown}")
    for n in names:
        SEGMENTS[n]()
    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    main()
