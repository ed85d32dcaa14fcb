"""Time-series operators: hypertable-style rollup cascades and gap filling.

The reference's workloads are batch scans of append-only event logs; at
100 TB the standard serving pattern on top of such logs is a cascade of
downsampled aggregates (minute -> hour -> day) plus dense, gap-filled
series for charting/feature windows. Both are expressed as pure
DataFrame plans:

* ``rollup_cascade`` aggregates the RAW table exactly once (the only
  full-data shuffle); every coarser granularity re-aggregates the next
  finer level — decomposable stats only (count/sum/min/max, avg =
  sum/count at read time), so each cascade step shuffles rows
  proportional to the finer bucket count, not the raw data.
* ``gap_fill`` densifies a bucketed series onto a complete time grid
  (``sequence`` + ``explode`` of the global bucket range, broadcast from
  a one-row bounds aggregate) and forward-fills by an ordered window per
  key — no driver-side loop, grid size = keys x buckets regardless of
  raw volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "rollup_cascade",
    "gap_fill",
    "scd2_intervals",
    "apply_changes",
    "funnel_stages",
]

# truncation units ordered fine -> coarse, as understood by date_trunc
_UNITS = ["minute", "hour", "day", "week", "month"]


def rollup_cascade(df: DataFrame, ts_col: str, key_cols: list[str],
                   value_col: str, levels: tuple[str, ...] = ("hour", "day"),
                   ) -> dict[str, DataFrame]:
    """Cascaded rollups: raw is scanned once, coarser levels fold finer ones.

    Returns ``{level: DataFrame[*key_cols, bucket, cnt, sum_value,
    min_value, max_value]}`` with exact (unrounded) aggregates — callers
    round at presentation time. Levels must be ordered fine -> coarse.
    """
    if not levels:
        raise ValueError("need at least one level")
    order = [u for u in _UNITS if u in levels]
    if tuple(order) != tuple(levels):
        raise ValueError(f"levels must be fine->coarse out of {_UNITS}")

    out: dict[str, DataFrame] = {}
    base = (
        df.groupBy(*key_cols, F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    out[levels[0]] = base
    for lvl in levels[1:]:
        base = (
            base.groupBy(*key_cols, F.date_trunc(lvl, F.col("bucket")).alias("bucket"))
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out[lvl] = base
    return out


def gap_fill(df: DataFrame, ts_col: str, key_cols: list[str], value_col: str,
             unit: str = "hour", value_scale: int = 2) -> DataFrame:
    """Dense per-key time grid with forward fill.

    Buckets ``value_col`` by ``unit`` (per-bucket avg, rounded to 4 so the
    filled copies are bit-stable), expands every key onto the global
    [min_bucket, max_bucket] grid, and forward-fills missing buckets from
    the last observed value. Rows before a key's first observation keep
    NULL. Output: ``*key_cols, bucket, value_ff, filled``.

    The bucket average is computed entirely in integers: values quantize
    to ``value_scale`` decimals (exact for data already at that scale),
    sum as int64, and the 4-decimal average rounds half-up with integer
    arithmetic — ``(2n + d) div 2d``. Both ``avg(double)`` (summation
    order drift) and float ``round`` (engines disagree on ties: shortest
    decimal repr vs binary expansion) flip the 4th decimal once per
    ~10^4-10^5 buckets; integer arithmetic cannot.

    Scale shape: the bounds aggregate is one row (broadcast); the grid is
    keys x buckets built executor-side by ``sequence``/``explode``; the
    fill is one window sort per key partition — nothing is proportional
    to raw row count after the first aggregation.
    """
    q = 10 ** value_scale
    up = 10_000 // q  # scale quantized units to 4-decimal units
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    agg = (
        df.groupBy(*key_cols, bucket)
        .agg(
            F.sum(
                F.expr(f"CAST(round({value_col} * {q}) AS BIGINT)")
            ).alias("_s"),
            F.count(value_col).alias("_n"),
        )
        .select(
            *key_cols,
            "bucket",
            # exact half-up average at 4 decimals: (2n + d) div 2d
            (
                F.expr(f"(2 * _s * {up} + _n) div (2 * _n)") / 10_000.0
            ).alias("_v"),
        )
    )
    bounds = agg.agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
    keys = agg.select(*key_cols).distinct()
    grid = (
        keys.join(F.broadcast(bounds))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.expr(f"INTERVAL 1 {unit}"))
            ).alias("bucket"),
        )
    )
    joined = grid.join(agg, [*key_cols, "bucket"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn("value_ff", F.last("_v", ignorenulls=True).over(w))
        .withColumn("filled", F.col("_v").isNull())
        .drop("_v")
    )


def scd2_intervals(df: DataFrame, key_cols: list[str], ts_col: str,
                   order_tiebreak: list[str] | None = None) -> DataFrame:
    """Slowly-changing-dimension (type 2) validity intervals from a
    changelog: each row becomes a version valid from its own timestamp
    until the key's next change (NULL for the current version).

    One window per key partition — ``lead`` over (ts, tiebreak) — no
    self-join, no driver work; CDC compaction at 100 TB is exactly this
    shape. Output adds ``version`` (1-based per key), ``valid_from``,
    ``valid_to``, ``is_current``.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("version", F.row_number().over(w).cast("long"))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def apply_changes(snapshot: DataFrame, changes: DataFrame,
                  key_cols: list[str], seq_cols: list[str],
                  op_col: str = "op", delete_op: str = "delete") -> DataFrame:
    """Latest-wins CDC MERGE: apply a changelog (upserts + deletes) to a
    snapshot and return the new snapshot.

    ``changes`` carries ``op_col`` ('upsert' or *delete_op*); the
    snapshot needs no op column (its rows count as upserts). Per key the
    newest row by ``seq_cols`` (descending, must be a total order — pass
    a unique tiebreak) wins; keys whose newest row is a delete drop out.

    One shuffle on the key columns (the row_number window); no
    self-joins, no driver state. At 100 TB this is the standard
    changelog-compaction shape — and because it is one window, AQE can
    split a hot key's partition like any other skewed shuffle.
    """
    snap = snapshot
    if op_col not in snap.columns:
        snap = snap.withColumn(op_col, F.lit("upsert"))
    all_rows = snap.unionByName(changes)
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .where(F.col(op_col) != delete_op)
        .drop(op_col)
    )


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest strictly
    increasing timestamp chain through ``steps`` (step k counts only if it
    happens *after* the user's step k-1 time). Output: one row per user
    who reached step 1 — ``(user, t1..tk, stage)`` where ``stage`` is the
    deepest step reached. The standard product-analytics funnel, and the
    batch twin of the streaming ``funnel_interval_join``.

    Plan shape: step k is a join of the step-(k-1) frontier with the
    events filtered to ``steps[k]`` (filter pushed to the scan) followed
    by a min-timestamp hash aggregate — every stage shuffles on the user
    key only, so all joins co-partition under AQE and the frontier only
    shrinks. No windows over the raw log, no collect, no Python.
    """
    if not steps:
        raise ValueError("funnel_stages: steps must be non-empty")
    frontier = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("_ts")
        )
        # conditional min, NOT a filter: a user whose step-k events all
        # precede t_{k-1} must stay in the frontier with t_k = NULL (they
        # reached stage k-1); min() of the all-NULL guard keeps the row.
        # A NULL t_{k-1} (failed earlier) nulls the guard -> t_k NULL too,
        # so non-null t's always form a prefix.
        frontier = (
            frontier.join(nxt, "user", "left")
            .groupBy("user", *[f"t{i}" for i in range(1, k)])
            .agg(
                F.min(
                    F.when(F.col("_ts") > F.col(f"t{k - 1}"), F.col("_ts"))
                ).alias(f"t{k}")
            )
        )
    deepest = F.lit(len(steps))
    for k in range(len(steps), 1, -1):
        deepest = F.when(F.col(f"t{k}").isNull(), k - 1).otherwise(deepest)
    return frontier.select(
        "user",
        *[f"t{i}" for i in range(1, len(steps) + 1)],
        deepest.cast("long").alias("stage"),
    )
