#!/usr/bin/env python
"""x10 stress evidence for the 4mc streaming sink (VERDICT r8 #5).

The scale claims under test (sources/stream.py FourMcStreamWriter):
  * one sealed file per task per micro-batch — file counts grow with
    BATCHES, not with accumulated output;
  * commit cost is O(batch): the replay sweep hides behind the
    high-water-batch marker, so per-batch wall time stays FLAT while
    the sealed-output tree grows (a listing-per-commit regression would
    show a linear ramp);
  * every sealed file independently verifies with the reference
    prebuilt CLI (sampled).

Feeds N micro-batches (one sealed source file moved in per drain, the
gate query's trickle pattern) of R rows each through a stream-to-stream
pipeline (4mc source -> 4mc sink, optional hive partitionby) and prints
per-batch wall, cumulative sealed files, and the CLI verdicts.

    python scripts/stress_stream_sink.py [n_batches] [rows_per_batch] \
        [--partitionby]
"""
from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_CLI = "/root/reference/tool/linux/amd64/4mc"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(args[0]) if args else 20
    rows = int(args[1]) if len(args) > 1 else 50_000
    partitionby = "--partitionby" in sys.argv

    from pyspark.sql import functions as F

    from fourmc_spark.format.writer import write_file
    from fourmc_spark.session import get_spark

    spark = get_spark("stress-stream-sink")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stress-sink-")
    live_in = os.path.join(tmp, "in")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(live_in)
    os.makedirs(out)

    def feed(i: int) -> None:
        payload = b"".join(
            f"row-{i:04d}-{j:07d}|{j % 4}\n".encode() for j in range(rows)
        )
        write_file(
            os.path.join(live_in, f"src{i:06d}.4mz"), payload,
            codec="zstd", level="fast",
        )

    src = spark.readStream.format("fourmc").load(live_in)
    writer_cols = src.select(
        "value", F.split("value", r"\|")[1].alias("bucket")
    ) if partitionby else src.select("value")
    w = (
        writer_cols.writeStream.format("fourmc")
        .option("codec", "zstd").option("level", "fast")
        .option("path", out).option("checkpointLocation", ckpt)
    )
    if partitionby:
        w = w.option("partitionby", "bucket")

    feed(0)
    q = w.start()
    try:
        walls = []
        counts = []
        for i in range(n_batches):
            if i:
                feed(i)
            t0 = time.perf_counter()
            q.processAllAvailable()
            walls.append(time.perf_counter() - t0)
            n_sealed = len(
                [f for _r, _d, fs in os.walk(out) for f in fs
                 if f.startswith("part-")]
            )
            counts.append(n_sealed)
            print(
                f"batch {i:3d}: wall {walls[-1]:6.2f}s  "
                f"sealed files total {n_sealed}", flush=True,
            )
    finally:
        q.stop()
        q.awaitTermination()

    sealed = sorted(
        os.path.join(r, f) for r, _d, fs in os.walk(out)
        for f in fs if f.startswith("part-")
    )
    sample = sealed[:: max(1, len(sealed) // 8)][:8]
    cli_ok = 0
    for f in sample:
        rc = subprocess.run(
            [REF_CLI, "-f", "-z", "-t", f], capture_output=True
        ).returncode
        cli_ok += rc == 0
        if rc != 0:
            print(f"CLI FAIL: {f}", flush=True)
    back = spark.read.format("fourmc").load(out).count()
    # MEANS over the post-warmup halves, not sums: the halves differ by
    # one batch when the post-warmup count is odd, and a 9-term vs
    # 10-term sum ratio reads a perfectly flat cost as a ~11% ramp
    steady = walls[1:n_batches]
    half = len(steady) // 2
    first_half = sum(steady[:half]) / max(half, 1)
    second_half = sum(steady[half:]) / max(len(steady) - half, 1)
    print("----")
    print(f"rows written {n_batches * rows}, rows read back {back}")
    print(f"sealed files {len(sealed)} across {n_batches} batches "
          f"(partitionby={partitionby})")
    print(f"CLI verified {cli_ok}/{len(sample)} sampled files")
    print(f"steady-state wall: first-half mean {first_half:.3f}s vs "
          f"second-half mean {second_half:.3f}s "
          f"(ratio {second_half / max(first_half, 1e-9):.2f} — ~1.0 = "
          f"flat per-batch cost, no O(accumulated-output) commit)")
    assert back == n_batches * rows, "row count mismatch on read-back"
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
