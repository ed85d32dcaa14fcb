"""Distribution statistics over large columns.

Histograms are the profiling primitive every curation run starts with
(token-length distributions, quality-score distributions, value ranges
before clipping). The shape that scales: binning is a map-side arithmetic
expression (whole-stage codegen), the shuffle carries ``bins`` rows with
map-side partial counts — never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["equi_width_histogram"]


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
