"""Partition-layout determinism: a query's result must not depend on
spark.sql.shuffle.partitions (the class of bug where a window/frame over
a non-total sort order returns layout-dependent values — found in q14 at
sf0.1 and fixed with a full tiebreak; this pins the property for the
layout-sensitive query shapes)."""

import math

import pytest

# window frames, ranking, LSH banding, sampling, CDC merge — the shapes
# whose results COULD change under re-partitioning if their orders were
# not total functions of the data
QUERIES_UNDER_TEST = [
    "q13_window_rank",
    "q14_window_frame",
    "q26_window_suite",
    "dedup_minhash_pairs",
    "curation_mixture_sample",
    "ts_apply_changes",
    "curation_pack_sequences",
    # round-3 shapes: trained-quantizer ANN (row_number over float sims
    # from integer dots), BPE training (aggregation order) + encoding,
    # and token packing (collect_list + array_sort regroup)
    "ann_ivf_kmeans_topk",
    "text_bpe_learn",
    "text_bpe_encode",
    "curation_pack_tokens",
]


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    return v.isoformat() if hasattr(v, "isoformat") else v


def _rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        (tuple(_canon(x) for x in r) for r in pdf[cols].itertuples(index=False)),
        key=lambda r: tuple(str(x) for x in r),
    )


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_result_invariant_under_shuffle_partitions(spark, sf_dir, name):
    from fourmc_spark.queries import QUERIES

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(QUERIES[name](spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        b = _rows(QUERIES[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    bad = [(x, y) for x, y in zip(a, b) if x != y]
    assert not bad, f"{name}: layout-dependent rows, first {bad[:3]}"
