"""Deterministic, engine-portable sampling for training-data pipelines.

At 100 TB, sampling must be (a) reproducible across runs, partitionings,
and engines — seeded-RNG sampling (`df.sample`) is none of those once the
partition layout changes — and (b) a pure map-side filter with no shuffle
and no state. Hash sampling gives both: a row is kept iff a prefix of
md5(key) falls below a threshold, so membership is a function of the
row's key alone. The identical predicate runs verbatim in any engine with
md5 (the DuckDB oracles do exactly that), and re-running the pipeline on
re-partitioned / incrementally-grown data keeps the same rows — the
property that makes train/eval splits stable across pipeline versions.

The first 4 hex chars of md5 give a uniform 16-bit bucket; thresholds are
expressed in "basis points" of 65536 (keep_bp = 8192 ≈ 12.5%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hash_sample", "stratified_hash_sample", "hash_bucket",
           "train_val_test_split"]


def _key(cols: list[str], sep: str) -> "F.Column":
    return F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])


def hash_bucket(cols: list[str], sep: str = "-") -> "F.Column":
    """Uniform 16-bit bucket from the md5 of the key columns (hex string,
    zero-padded, so plain string comparison is numeric comparison)."""
    return F.substring(F.md5(_key(cols, sep)), 1, 4)


def hash_sample(df: DataFrame, key_cols: list[str], keep_bp: int,
                sep: str = "-") -> DataFrame:
    """Keep ~``keep_bp / 65536`` of rows, decided by md5 of the key columns.

    Map-side filter — pushes inside the scan stage, shuffles nothing,
    deterministic under any partitioning. ``keep_bp`` in [0, 65536].
    """
    if not 0 <= keep_bp <= 0x10000:
        raise ValueError("keep_bp must be in [0, 65536]")
    thr = format(keep_bp, "04x")
    return df.where(hash_bucket(key_cols, sep) < F.lit(thr))


def stratified_hash_sample(df: DataFrame, strata_col: str, key_cols: list[str],
                           fractions_bp: dict[str, int], default_bp: int = 0,
                           sep: str = "-") -> DataFrame:
    """Per-stratum hash sampling: each ``strata_col`` value keeps its own
    fraction (basis points of 65536); unlisted strata keep ``default_bp``.

    The per-stratum threshold is one CASE expression — still a map-only
    filter with zero shuffle (unlike `sampleBy`, also deterministic under
    re-partitioning). Use for class re-balancing at ingest: downsample the
    dominant class, keep all of the rare one.
    """
    thr = F.lit(format(default_bp, "04x"))
    for value, bp in sorted(fractions_bp.items()):
        if not 0 <= bp <= 0x10000:
            raise ValueError("fractions_bp values must be in [0, 65536]")
        thr = F.when(F.col(strata_col) == value, F.lit(format(bp, "04x"))).otherwise(thr)
    return df.where(hash_bucket(key_cols, sep) < thr)


def train_val_test_split(df: DataFrame, key_cols: list[str],
                         val_bp: int = 0x0800, test_bp: int = 0x0800,
                         sep: str = "-", out_col: str = "split") -> DataFrame:
    """Assign every row a stable train/val/test label from its key hash.

    The holdout property that matters at 100 TB: membership is a pure
    function of the row key, so (a) re-runs, re-partitions, and engine
    swaps reproduce the identical split; (b) when the corpus grows, old
    rows NEVER migrate between splits — no eval contamination from
    incremental ingest. ``val_bp``/``test_bp`` are basis points of 65536;
    val takes [0, val), test takes [val, val+test), train the rest — a
    map-only CASE on the hash bucket, zero shuffle.
    """
    if val_bp < 0 or test_bp < 0 or val_bp + test_bp > 0x10000:
        raise ValueError("val_bp/test_bp must be >= 0 and sum to <= 65536")
    b = hash_bucket(key_cols, sep)
    v_thr = F.lit(format(val_bp, "04x"))
    t_thr = F.lit(format(val_bp + test_bp, "04x"))
    return df.withColumn(
        out_col,
        F.when(b < v_thr, F.lit("val"))
        .when(b < t_thr, F.lit("test"))
        .otherwise(F.lit("train")),
    )
