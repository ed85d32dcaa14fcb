"""The runnable examples must stay runnable (the reference keeps an
examples module as its integration surface; ours is asserted in CI)."""

import os
import sys


def test_curate_corpus_example(spark, tmp_path):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    from examples.curate_corpus import curate, synthesize_input

    inp = str(tmp_path / "raw")
    out = str(tmp_path / "curated")
    synthesize_input(spark, inp, n_docs=400)
    stats = curate(spark, inp, out)
    assert stats["input_docs"] > 400  # dupes were added
    assert 0 < stats["curated_docs"] < stats["input_docs"]
    assert stats["near_dup_dropped"] > 0  # LSH stage did real work
    assert stats["output_files"] >= 1
    # output is a readable splittable corpus
    back = spark.read.format("fourmc").load(out)
    assert back.count() == stats["curated_docs"]


def test_continuous_ingest_example(spark):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    from examples.continuous_ingest import run

    stats = run(spark, n_days=3, docs_per_day=120)
    assert stats["fed"] == 360
    # cross-day re-deliveries must have been rejected
    assert 0 < stats["admitted"] < stats["fed"]


def test_semantic_search_example(spark):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    from examples.semantic_search import main

    stats = main("/root/testdata/sf0.001")
    # trained-quantizer ANN must agree with exact search on most of top-5
    assert stats["recall"] >= 0.5
    # exactly the 5 planted exact-copy vectors must be dropped
    assert stats["total"] - stats["kept"] == 5
    assert stats["bm25_rows"] == 5
    assert stats["fused_rows"] == 5


def test_sealed_log_pipeline_example(spark):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    from examples.sealed_log_pipeline import run

    stats = run(spark, "/root/testdata/sf0.001")
    assert stats["stream_sidecars"] == stats["stream_files"] >= 1
    assert stats["stats_carried"] == stats["compacted_files"] >= 1
    assert stats["total_rows"] == 1000
    # temporal pruning never changes results: exact vs the parquet oracle
    assert stats["recent_rows"] == stats["oracle_recent_rows"] > 0
