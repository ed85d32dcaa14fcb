"""Distribution statistics over large columns.

Histograms are the profiling primitive every curation run starts with
(token-length distributions, quality-score distributions, value ranges
before clipping). The shape that scales: binning is a map-side arithmetic
expression (whole-stage codegen), the shuffle carries ``bins`` rows with
map-side partial counts — never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["equi_width_histogram", "profile_table"]


def equi_width_histogram(df: DataFrame, value_col: str, lo: float, hi: float,
                         bins: int) -> DataFrame:
    """Equi-width histogram of ``value_col`` over [lo, hi): (bin, n).

    ``bin = floor((x - lo) / width)`` clamped to [0, bins-1], so the last
    bin absorbs x == hi and outliers past the range (clip-then-count, the
    usual profiling convention; filter first for strict ranges). NULLs are
    dropped. The identical IEEE-double arithmetic runs in any engine, so
    the result is bit-stable across Spark and the DuckDB oracle.

    Empty bins are absent from the output (a 0-row shuffle beats a dense
    join against a bin spine; left-join a `sequence` spine if you need
    density — see timeseries.gap_fill for that pattern).
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    width = (hi - lo) / bins
    x = F.col(value_col).cast("double")
    bin_id = F.floor((x - F.lit(float(lo))) / F.lit(width))
    clamped = F.least(F.greatest(bin_id, F.lit(0)), F.lit(bins - 1))
    return (
        df.where(x.isNotNull())
        .select(clamped.cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data-quality profile: row count, null count, exact
    distinct count, and lexicographic min/max (values cast to string so
    one output schema covers every column type).

    One wide aggregate computes every column's counters in a single
    pass over the data (partial+final hash agg — no per-column jobs, no
    second scan), then a constant-width stack unpivots to one row per
    column. At 100 TB swap ``count_distinct`` for
    ``approx_count_distinct`` if exactness isn't required — same plan
    shape, mergeable sketch state.
    """
    names = cols or df.columns
    aggs = []
    for c in names:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count(s).alias(f"__nn_{c}"),
            F.count_distinct(s).alias(f"__d_{c}"),
            F.min(s).alias(f"__min_{c}"),
            F.max(s).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __n_{c}, __n_{c} - __nn_{c}, __d_{c}, __min_{c}, __max_{c}"
        for c in names
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack}) AS "
            "(column, n_rows, n_null, n_distinct, min_value, max_value)"
        )
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
