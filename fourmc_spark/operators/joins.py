"""Join operators Spark lacks as primitives: as-of join and range join.

* as-of join — "for each left row, the most recent right row at or before
  it" — implemented with the union + window trick: tag both sides, sort by
  (key, time, side) within key partitions, propagate the last right value
  with last(..., ignoreNulls). ONE shuffle on the key, no range explosion,
  no skew beyond the key distribution — this is the scalable formulation
  (a join on l.ts >= r.ts would be a quadratic range join).
* range join — joining a fact table to interval bands; the band table is
  tiny so the inequality join is a broadcast nested loop over a handful of
  rows per fact row (never a shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join_bands", "salted_join"]


def asof_join(left: DataFrame, right: DataFrame, on: str, time_col: str,
              right_cols: list[str]) -> DataFrame:
    """As-of (backward) join: for each left row, the latest right row with
    right.time <= left.time, matched on `on`.

    Right side should be unique per (on, time); pre-aggregate if not.
    Returns all left columns + right_cols (null when no prior right row).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        on, time_col, *right_cols
    ).withColumn("_side", F.lit(0))
    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in right_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    cols = [on, time_col, "_side"] + [
        c for c in set(left.columns + right_cols) - {on, time_col}
    ]
    u = lt.select(*cols).unionByName(rt.select(*cols))
    # right rows sort before left rows at equal time (_side 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row (>= match)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(time_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c not in right_cols],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def salted_join(facts: DataFrame, dim: DataFrame, on: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-mitigated equi-join: salt the fact side, replicate the dim side.

    When the join key is low-cardinality or zipfian (a hot user, a hot
    event_type), a plain shuffle join lands the hot key in ONE reducer and
    the stage runs at the speed of its slowest task. Salting splits every
    key into ``n_salts`` sub-keys: facts get a deterministic salt
    (xxhash64 of the whole row, mod n), the dim side is exploded n× —
    the hot key now spreads over n tasks, at the cost of an n× dim
    replication (dim must be small relative to the facts; if it fits in
    memory outright, prefer `broadcast()` and skip salting entirely).

    Results are salt-invariant: identical to ``facts.join(dim, on, how)``.
    This is the manual fallback for engines without AQE skew handling;
    with AQE on, Spark's skew-join split covers sort-merge joins, but
    salting also covers hash joins and bounds the worst task statically.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    salted_facts = facts.withColumn("_salt", salt)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_facts.join(salted_dim, [on, "_salt"], how).drop("_salt")


def range_join_bands(facts: DataFrame, bands: DataFrame, value_col: str,
                     lo_col: str = "lo", hi_col: str = "hi") -> DataFrame:
    """Join facts to [lo, hi) interval bands; bands are broadcast so the
    inequality predicate never triggers a shuffle."""
    return facts.join(
        F.broadcast(bands),
        (facts[value_col] >= bands[lo_col]) & (facts[value_col] < bands[hi_col]),
        "left",
    )
