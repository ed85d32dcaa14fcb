#!/usr/bin/env python
"""Round-9 interleaved re-measure of the two r8-flagged bench drifts.

Flagged by the r8 verdict (both on UNCHANGED code paths):
  * spark_sink_roundtrip_lz4_fast_mbps  221.7 (r7) -> 141.4 (r8, 0.64x)
  * lz4_high_compress_mbps_1t            48.3 (r7) ->  41.1 (r8, 1.68x
    below BASELINE.md's 81 MB/s single-thread HC-4 Silesia number)

Method (the COVERAGE.md round-7/8 drift-re-earn pattern): min-of-N with
the variants INTERLEAVED per rep so host CPU steal lands on the same
noise distribution for all of them, each leg paired with a pinned
control that shares the candidate's substrate but not its suspect code:

  leg A (no Spark, pure codec):
    - candidate: framed lz4-high 1t write (write_file level=high)
    - control 1: framed lz4-fast 1t write (same framing/path, C kernel
      known hardware-stable across rounds)
    - control 2: raw C LZ4_compress_HC level-4 kernel, no framing —
      separates "the C kernel is slow this session" (basis) from "our
      framing layer regressed" (real).
  leg B (Spark, same session+corpus as bench.py's sink section):
    - candidate: full scan->sink roundtrip, lz4-fast
    - control: cached sink-only write (spark_sink_lz4_fast series) —
      the roundtrip minus its feed; moved <6% r7->r8 per the verdict.

Prints one JSON dict; does NOT touch BENCH_DETAIL.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bench import _blob, _canary  # noqa: E402

REPS = int(os.environ.get("REMEASURE_REPS", "5"))


def leg_a() -> dict:
    import tempfile

    from fourmc_spark.format import write_file
    from fourmc_spark.format.native import lz4_compress

    data = _blob(64)
    mb = len(data) / (1024 * 1024)
    blk = 4 << 20
    hc_blocks = [data[i : i + blk] for i in range(0, len(data) // 2, blk)]
    hc_mb = sum(len(b) for b in hc_blocks) / (1024 * 1024)
    tmp = tempfile.mkdtemp(prefix="remeasure-")
    p_high = os.path.join(tmp, "a.4mc")
    p_fast = os.path.join(tmp, "b.4mc")
    # warm
    write_file(p_high, data[: 8 << 20], codec="lz4", level="high")
    write_file(p_fast, data[: 8 << 20], codec="lz4", level="fast")
    best = {"lz4_high_1t": float("inf"), "lz4_fast_1t": float("inf"),
            "raw_c_hc4_1t": float("inf")}
    for _ in range(REPS):
        t0 = time.perf_counter()
        write_file(p_high, data, codec="lz4", level="high")
        best["lz4_high_1t"] = min(best["lz4_high_1t"], time.perf_counter() - t0)
        t0 = time.perf_counter()
        write_file(p_fast, data, codec="lz4", level="fast")
        best["lz4_fast_1t"] = min(best["lz4_fast_1t"], time.perf_counter() - t0)
        t0 = time.perf_counter()
        for b in hc_blocks:
            lz4_compress(b, 4)
        best["raw_c_hc4_1t"] = min(best["raw_c_hc4_1t"], time.perf_counter() - t0)
    return {
        "lz4_high_compress_mbps_1t": round(mb / best["lz4_high_1t"], 1),
        "lz4_fast_compress_mbps_1t": round(mb / best["lz4_fast_1t"], 1),
        "raw_c_lz4hc4_compress_mbps_1t": round(hc_mb / best["raw_c_hc4_1t"], 1),
    }


def leg_b() -> dict:
    import shutil
    import tempfile

    from fourmc_spark.format import write_file
    from fourmc_spark.session import get_spark

    data = _blob(64)
    n_files = 8
    mb = n_files * len(data) / (1024 * 1024)
    nthreads = min(int(bench.CPUS), os.cpu_count() or int(bench.CPUS))
    tmp = tempfile.mkdtemp(prefix="remeasure-spark-")
    spark = get_spark("remeasure-r9", master=f"local[{bench.CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        d = os.path.join(tmp, "scan-lz4")
        os.makedirs(d)
        for i in range(n_files):
            write_file(os.path.join(d, f"data{i}.4mc"), data,
                       codec="lz4", level="fast", workers=nthreads)
        sink_df = (
            spark.read.format("fourmc")
            .option("maxpartitionbytes", 4 << 20)
            .option("maxblockspersplit", 2)
            .load(d)
        )
        sink_dir = os.path.join(tmp, "sink")

        def _roundtrip() -> float:
            t0 = time.perf_counter()
            (sink_df.select("value").write.format("fourmc")
             .option("codec", "lz4").option("level", "fast")
             .mode("overwrite").save(sink_dir))
            return time.perf_counter() - t0

        cached = sink_df.select("value").cache()
        cached.count()

        def _sink_only() -> float:
            t0 = time.perf_counter()
            (cached.write.format("fourmc")
             .option("codec", "lz4").option("level", "fast")
             .mode("overwrite").save(sink_dir))
            return time.perf_counter() - t0

        _roundtrip()  # warm both paths
        _sink_only()
        best_rt = float("inf")
        best_sk = float("inf")
        rt_raw, sk_raw = [], []
        for _ in range(REPS):
            os.sync()
            v = _roundtrip()
            rt_raw.append(round(mb / v, 1))
            best_rt = min(best_rt, v)
            os.sync()
            v = _sink_only()
            sk_raw.append(round(mb / v, 1))
            best_sk = min(best_sk, v)
        cached.unpersist()
        return {
            "spark_sink_roundtrip_lz4_fast_mbps": round(mb / best_rt, 1),
            "spark_sink_lz4_fast_mbps": round(mb / best_sk, 1),
            "roundtrip_raw_mbps": rt_raw,
            "sink_only_raw_mbps": sk_raw,
        }
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    out = {"canary_start": _canary()}
    out["leg_a"] = leg_a()
    out["leg_b"] = leg_b()
    out["canary_end"] = _canary()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
