"""Z-order clustering: the interleave is exact bit math (oracle-checked
by the layout_zorder_key query); here we pin the property that justifies
it at 100 TB — after cluster_by_zorder, EVERY partition covers a narrow
range of BOTH clustered columns (so min/max stats prune on either
filter), whereas a linear sort narrows only its own column.
"""

from pyspark.sql import functions as F


def _spans(df, cols):
    """Per-partition (max-min) span of each column, as fractions of the
    global span."""
    pid = F.spark_partition_id().alias("_pid")
    agg = df.select(pid, *cols).groupBy("_pid").agg(
        *[F.max(c).alias(f"mx_{c}") for c in cols],
        *[F.min(c).alias(f"mn_{c}") for c in cols],
    )
    rows = agg.collect()
    glob = {
        c: (
            min(r[f"mn_{c}"] for r in rows),
            max(r[f"mx_{c}"] for r in rows),
        )
        for c in cols
    }
    out = {}
    for c in cols:
        lo, hi = glob[c]
        out[c] = [(r[f"mx_{c}"] - r[f"mn_{c}"]) / max(hi - lo, 1) for r in rows]
    return out


def test_zorder_narrows_both_dims(spark):
    from fourmc_spark.operators.layout import cluster_by_zorder

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.floor(F.col("id") / 128) % 128).alias("y"),
    )
    z = cluster_by_zorder(df, ["x", "y"], n_partitions=16, bits=7)
    spans = _spans(z, ["x", "y"])
    # 16 partitions over a 128x128 grid -> a typical z-range covers ~1/4
    # of each axis. A partition straddling a top-level quadrant jump of
    # the curve legitimately spans wide, so assert the MEAN (what
    # expected scan cost is proportional to), not the max.
    assert sum(spans["x"]) / len(spans["x"]) <= 0.5, spans["x"]
    assert sum(spans["y"]) / len(spans["y"]) <= 0.5, spans["y"]
    # row preservation
    assert z.count() == n


def test_linear_sort_leaves_second_dim_wide(spark):
    # control: sorting by x alone gives full-width y spans — the reason
    # z-order exists
    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.floor(F.col("id") / 128) % 128).alias("y"),
    )
    lin = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    spans = _spans(lin, ["x", "y"])
    assert max(spans["y"]) >= 0.9, spans["y"]


def test_zorder_key_validations(spark):
    import pytest

    from fourmc_spark.operators.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key(["a"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)
