#!/usr/bin/env python
"""Continuous near-dup-gated corpus ingest — the streaming twin of
examples/curate_corpus.py's batch dedup stages.

A growing corpus of daily document drops is admitted through
``dedup_ingest_stream``: each micro-batch is gated by MinHash-LSH
against everything already admitted (signatures carried in the
append-only snapshot — the corpus text is never re-read), and the
manifest is compacted inline every few batches. The admitted corpus is
then read back and summarized.

Pipeline:

    daily parquet drops (landing dir)
      -> readStream                         (file micro-batches)
      -> dedup_ingest_stream                (admit iff no near-dup in
                                             the admitted corpus or an
                                             earlier-id row this batch;
                                             append-only manifest state,
                                             partition-pruned probes)
      -> compact_every=4                    (inline state maintenance)
      -> read_dedup_state                   (the admitted corpus)

Usage:
    python examples/continuous_ingest.py [n_days] [docs_per_day]

Synthesizes its own landing drops (each day re-delivers ~20% of older
documents under new ids — the cross-day duplication the gate exists
for), so the example is runnable out of the box.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA = "doc_id long, text string, source string"
WORDS = [f"token{i:03d}" for i in range(600)]


def _doc_text(seed: int) -> str:
    r = random.Random(seed)
    return " ".join(r.choice(WORDS) for _ in range(30))


def run(spark, n_days: int = 5, docs_per_day: int = 500) -> dict:
    from fourmc_spark.streaming import dedup_ingest_stream, read_dedup_state

    tmp = tempfile.mkdtemp(prefix="continuous-ingest-")
    landing = os.path.join(tmp, "landing")
    state = os.path.join(tmp, "state")
    os.makedirs(landing)
    rng = random.Random(99)
    try:
        stream = spark.readStream.schema(
            spark.createDataFrame([], SCHEMA).schema
        ).option("recursiveFileLookup", "true").parquet(landing)
        q = dedup_ingest_stream(stream, state, compact_every=4).start()

        next_id, fed = 0, 0
        for day in range(n_days):
            rows = []
            for j in range(docs_per_day):
                if day > 0 and j % 5 == 0:
                    # a re-crawled page: same text, new id — must be gated
                    rows.append((next_id, _doc_text(rng.randrange(0, fed)), "web"))
                else:
                    rows.append((next_id, _doc_text(next_id), "web"))
                next_id += 1
            fed = next_id
            spark.createDataFrame(rows, SCHEMA).coalesce(2).write.parquet(
                os.path.join(landing, f"day{day}.parquet")
            )
            q.processAllAvailable()
            admitted = read_dedup_state(spark, state).count()
            print(f"day {day}: fed {fed:6d} total, admitted {admitted:6d}")
        q.stop()

        corpus = read_dedup_state(spark, state)
        n = corpus.count()
        print(f"final corpus: {n} / {fed} docs admitted "
              f"({fed - n} near-dups rejected)")
        return {"fed": fed, "admitted": n}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    docs_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from fourmc_spark.session import get_spark

    spark = get_spark("continuous-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        run(spark, n_days, docs_per_day)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
