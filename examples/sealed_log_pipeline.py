#!/usr/bin/env python
"""The sealed-log lifecycle end-to-end — stream-ingest with write-time
zone maps AND bloom filters, raw-copy compaction that CARRIES both, and
pruned queries (temporal range + point lookup) that never open a
non-matching file.

This is the steady-state 100 TB shape the sidecar tiers exist for: a
time-clustered event log lands through the STREAMING sink (each sealed
file gets a FILE-tier ``.stats.json`` sidecar — zone maps from
``statsschema``, bloom bitmaps from ``bloomcolumns`` — computed from
the exact rows it received; no ANALYZE lag), the small per-trigger
files are later collapsed by ``compact_blocks`` (raw block copy: no
recompression; zone maps merge, blooms OR together exactly), and every
query plans from the sidecars alone: a range on ids or TIME
(TimestampType bounds travel as epoch micros) opens only overlapping
files, and a POINT lookup on the unclustered ``event_id`` — where
min/max can never prune — opens only the files whose bloom may hold
it. No stage ever runs a dedicated stats job over the data. (For the
per-BLOCK tier inside kept files, run ``analyze_stats()`` once on the
compacted tree — write-time sidecars are file-tier by design, since a
rolling stream file's blocks are not yet range-clustered.)

Pipeline:

    events stream (rate-limited micro-batches)
      -> writeStream.format("fourmc")
         .option("statsschema", ddl)        (zone sidecar per file)
         .option("bloomcolumns", "event_id")  (bloom rides the sidecar)
      -> compact_blocks(in, out)            (raw copy, carries both)
      -> typed scan: ts-range + id point queries  (file pruning)

Usage:
    python examples/sealed_log_pipeline.py [sf_dir]

Defaults to /root/testdata/sf0.001 so the example runs out of the box.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DDL = ("ts timestamp, event_id bigint, user_id bigint, "
       "event_type string, value double")


def ingest_stream(spark, sf_dir: str, out_dir: str, ckpt: str) -> int:
    """Stream events through the 4mc sink with write-time zone maps."""
    from pyspark.sql import functions as F

    from fourmc_spark.streaming import read_events_stream

    sdf = read_events_stream(spark, f"{sf_dir}/events.parquet").select(
        F.to_json(
            F.struct(
                # full microsecond precision (to_json's default is
                # millis); zone-less text + UTC session is the typed
                # scan's documented convention
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("ts"),
                "event_id", "user_id", "event_type", "value",
            )
        ).alias("value")
    )
    q = (
        sdf.writeStream.format("fourmc")
        .option("codec", "zstd").option("level", "medium")
        .option("statsschema", DDL)
        .option("bloomcolumns", "event_id")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return len(glob.glob(f"{out_dir}/*.4mz"))


def run(spark, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from pyspark.sql import functions as F

    from fourmc_spark.operators.maintenance import compact_blocks

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="sealed-log-")
    live, compacted = f"{root}/live", f"{root}/compacted"
    try:
        n_files = ingest_stream(spark, sf_dir, live, f"{root}/ckpt")
        sidecars = glob.glob(f"{live}/*.stats.json")

        res = compact_blocks(spark, live, compacted)
        carried = res["stats_carried"]

        # the compacted tree prunes immediately from the CARRIED maps —
        # a ts range opens only overlapping files/blocks (one load()
        # per filter set: Spark caches one scan per relation instance)
        meta = json.load(open(glob.glob(f"{compacted}/*.stats.json")[0]))
        lo_us = meta["columns"]["ts"]["min"]
        hi_us = meta["columns"]["ts"]["max"]
        mid_us = (lo_us + hi_us) // 2
        mid = F.timestamp_micros(F.lit(mid_us))
        typed = (spark.read.format("fourmc").option("jsonschema", DDL)
                 .load(compacted))
        recent = typed.filter(F.col("ts") >= mid).count()
        typed2 = (spark.read.format("fourmc").option("jsonschema", DDL)
                  .load(compacted))
        total = typed2.count()
        # load_events normalizes either physical ts era (plain micros
        # TIMESTAMP, or nanos-era int64 — which this same session's
        # nanosAsLong conf would otherwise surface as LongType here)
        from fourmc_spark.events import load_events

        oracle = (
            load_events(spark, f"{sf_dir}/events.parquet")
            .filter(F.unix_micros(F.col("ts")) >= mid_us)
            .count()
        )
        # point lookup on the UNCLUSTERED id: zone maps keep every file
        # (each spans the id domain), the CARRIED blooms open only the
        # files that may hold the probed ids
        probe = [3, 17, 411]
        typed3 = (spark.read.format("fourmc").option("jsonschema", DDL)
                  .load(compacted))
        point_rows = typed3.filter(F.col("event_id").isin(probe)).count()
        point_oracle = (
            load_events(spark, f"{sf_dir}/events.parquet")
            .filter(F.col("event_id").isin(probe)).count()
        )
        return {
            "stream_files": n_files,
            "stream_sidecars": len(sidecars),
            "compacted_files": res["outputs"],
            "stats_carried": carried,
            "total_rows": total,
            "recent_rows": recent,
            "oracle_recent_rows": oracle,
            "point_rows": point_rows,
            "oracle_point_rows": point_oracle,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from fourmc_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sealed-log-pipeline", master="local[4]")
    stats = run(spark, sf_dir)
    print(json.dumps(stats, indent=2))
    assert stats["recent_rows"] == stats["oracle_recent_rows"]
    assert stats["point_rows"] == stats["oracle_point_rows"]


if __name__ == "__main__":
    main()
