#!/usr/bin/env python
"""Per-batch cost evidence for the append-only dedup ingest.

Feeds N batches of synthetic documents (each carrying a duplicate slice
of earlier batches) through ``dedup_ingest_stream`` and prints each
micro-batch's wall time. The claim under test: per-batch cost is
O(batch), NOT O(corpus) — the corpus is never rewritten and every
corpus read is partition-pruned — so batch times stay flat while the
admitted corpus grows linearly.

    python scripts/stress_ingest.py [n_batches] [batch_rows] [compact_every]

SPARK_GRAFT_STRESS_SPAM=1 switches to the DEGENERATE fixture: every doc
in every batch is the same template text, so all rows of the stream
share one LSH bucket per band. Uncapped, the candidate join is
O((corpus+batch)²) per batch; with the streaming default
``max_bucket=4096`` it must stay O(batch) — this is the adversarial
evidence for the default-on hot-bucket cap.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from fourmc_spark.session import get_spark
    from fourmc_spark.streaming import dedup_ingest_stream, read_dedup_state

    spark = get_spark("stress-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ingest-stress-")
    in_dir = os.path.join(tmp, "in")
    state = os.path.join(tmp, "state")
    os.makedirs(in_dir)
    schema = "doc_id long, text string, source string"

    import random

    rng = random.Random(17)
    words = [f"w{i:04d}" for i in range(2000)]
    spam = os.environ.get("SPARK_GRAFT_STRESS_SPAM") == "1"
    template = " ".join(f"spam{i % 7}" for i in range(40))

    def doc(i: int) -> str:
        if spam:
            return template  # one text -> one bucket per band, forever
        r = random.Random(i)
        return " ".join(r.choice(words) for _ in range(40))

    try:
        sdf = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(in_dir)
        q = dedup_ingest_stream(sdf, state, compact_every=compact_every).start()
        times = []
        next_id = 0
        for b in range(n_batches):
            rows = []
            for j in range(batch_rows):
                # ~20% of each batch duplicates an earlier doc's text
                if next_id > batch_rows and j % 5 == 0:
                    src = rng.randrange(0, next_id - batch_rows)
                    rows.append((next_id, doc(src), "s"))
                else:
                    rows.append((next_id, doc(next_id), "s"))
                next_id += 1
            spark.createDataFrame(rows, schema).coalesce(2).write.parquet(
                os.path.join(in_dir, f"b{b}.parquet")
            )
            t0 = time.perf_counter()
            q.processAllAvailable()
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"batch {b}: {dt:5.2f}s  (corpus so far ~{next_id} fed)")
        q.stop()
        n = read_dedup_state(spark, state).count()
        print(f"admitted: {n} / {next_id} fed")
        if n_batches >= 8:
            # compare non-overlapping windows and report the CORPUS
            # ratio between the window midpoints, not the whole-run
            # ratio (the honest flatness figure)
            hw, tw = times[1:4], times[-3:]
            head, tail = sum(hw) / len(hw), sum(tw) / len(tw)
            # midpoint corpus sizes: batch b sees ~b batch-loads
            c_head, c_tail = 2, n_batches - 2
            print(
                f"mean batch time: batches 1-3 {head:.2f}s vs last 3 "
                f"{tail:.2f}s -> time x{tail / head:.2f} while the "
                f"corpus between those windows grew "
                f"x{c_tail / c_head:.1f}"
            )
        else:
            print("(need n_batches >= 8 for the windowed summary)")
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
