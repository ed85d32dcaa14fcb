"""Multi-dimensional layout clustering (Z-order) for data skipping.

At 100 TB, scan cost is governed by how many files/row-groups a filter
can skip via min/max statistics. A linear sort gives perfect skipping on
ONE column and none on the others; interleaving the bits of k columns
(Morton / Z-order) gives every clustered column a min/max span of roughly
``global_span / P**(1/k)`` per partition — all filtered dimensions prune
at once. The z-value is pure integer bit arithmetic (JVM-side, codegen,
exact — and oracle-checkable bit-for-bit in any engine).

``cluster_by_zorder`` = range-partition by z-value + sort within
partitions: one shuffle, and each output file covers a compact
hyper-rectangle of the key space. Pair with ``maintenance.compact`` for
the rewrite job and parquet/4mc hive layouts for the storage side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "cluster_by_zorder", "zorder_key_sql"]


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of k integer columns.

    Bit ``i`` of column ``j`` lands at position ``i * k + j`` — columns
    must be non-negative and fit in ``bits`` bits (rank- or min-max-
    normalize first otherwise); ``k * bits`` must stay < 63.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("z-order needs >= 2 columns")
    if k * bits >= 63:
        raise ValueError(f"{k} cols x {bits} bits overflows a long")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c).cast("long")
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return out


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as portable SQL (DuckDB/Spark SQL) — the
    oracle twin of :func:`zorder_key`."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * k + j})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(df: DataFrame, cols: list[str], n_partitions: int,
                      bits: int = 16) -> DataFrame:
    """Range-partition + sort by the z-value: one shuffle, each output
    partition (-> file, after write) covers a compact hyper-rectangle in
    ``cols`` space, so min/max stats prune on every clustered column."""
    z = zorder_key(cols, bits).alias("_zval")
    return (
        df.withColumn("_zval", z)
        .repartitionByRange(n_partitions, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )
