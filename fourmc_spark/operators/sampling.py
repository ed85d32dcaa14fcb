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
           "train_val_test_split", "mixture_sample", "shuffle_order",
           "fixed_k_sample"]


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


def mixture_sample(df: DataFrame, source_col: str, key_cols: list[str],
                   sample_rows: int, alpha: float = 0.5,
                   sep: str = "-") -> DataFrame:
    """Temperature-flattened domain-mixture sampling (the data-mixing
    step of LLM corpus construction): draw ~``sample_rows`` rows total,
    allocated across ``source_col`` domains by w_s ∝ n_s^alpha instead of
    proportionally — alpha < 1 upweights rare domains, alpha = 1 is
    proportional, alpha = 0 is uniform-per-domain.

    Engine-portable determinism: for the default alpha = 0.5 the whole
    rate computation is integer arithmetic — w_s = floor(sqrt(n_s)),
    per-domain quota = sample_rows * w_s div W, keep-rate in basis points
    of 65536 — so Spark and any SQL oracle agree exactly (other alphas go
    through float pow and may drift by one row at rate boundaries).
    Membership itself is the [[hash-sample]] predicate: a pure function
    of the row key, stable under re-partitioning and corpus growth.

    Plan shape at scale: one partial-agg count per domain (shuffles
    #domains rows), rates broadcast back, then a map-side filter — the
    fact table is never shuffled. Output keeps the input schema plus
    ``rate_bp`` (the applied per-domain rate).
    """
    if alpha == 0.5:
        w = F.expr("CAST(floor(sqrt(n_s)) AS BIGINT)")
    else:
        w = F.expr(f"CAST(floor(power(n_s, CAST({alpha} AS DOUBLE))) AS BIGINT)")
    counts = df.groupBy(source_col).agg(F.count("*").cast("long").alias("n_s"))
    weights = counts.withColumn("w_s", F.greatest(w, F.lit(1).cast("long")))
    total = weights.agg(F.sum("w_s").cast("long").alias("w_total"))
    rates = (
        weights.crossJoin(F.broadcast(total))
        .withColumn(
            "quota",
            F.expr(f"CAST({int(sample_rows)} AS BIGINT) * w_s div w_total"),
        )
        .withColumn(
            "rate_bp",
            F.least(F.expr("quota * 65536 div n_s"), F.lit(65536).cast("long")),
        )
        .select(source_col, "rate_bp")
    )
    thr = F.lpad(F.lower(F.conv(F.col("rate_bp"), 10, 16)), 4, "0")
    return (
        df.join(F.broadcast(rates), source_col)
        .where((F.col("rate_bp") >= 65536) | (hash_bucket(key_cols, sep) < thr))
    )


def shuffle_order(df: DataFrame, key_cols: list[str], seed: str = "0",
                  sep: str = "-", out_col: str = "shuffle_key") -> DataFrame:
    """Deterministic global shuffle for training order: every row gets a
    pseudo-random but reproducible sort key — md5 of (seed, row key) —
    and the frame comes back ordered by it. Same seed => same permutation
    on any engine, any partitioning, any run; a new seed is a fresh epoch
    permutation with zero data movement beyond the sort.

    At scale the ORDER BY is a range-partitioned sort on the hash (Spark
    samples hash bounds, so output partitions are balanced by
    construction — the hash is uniform), and downstream writers get the
    shuffled order for free with one shuffle. Ties are impossible in
    practice (128-bit hash); the key columns append as tiebreak so the
    order is total even under hash collisions.
    """
    k = F.md5(F.concat_ws(sep, F.lit(seed), *[F.col(c).cast("string")
                                              for c in key_cols]))
    return (
        df.withColumn(out_col, k)
        .orderBy(out_col, *key_cols)
    )


def fixed_k_sample(df: DataFrame, group_col: str, key_cols: list[str],
                   k: int, sep: str = "-") -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, picked by the
    deterministic hash priority — fixed-size eval/holdout sets per
    source, stable across runs, engines, and re-partitionings (the
    rate-based [[hash-sample]] can't promise exact counts; this can).

    One window per group (rank over md5 priority): exact-k needs a
    per-group total order by definition, so the group is the shuffle
    key — fine for the #groups ≪ #rows regimes this is for (per-source
    eval sets). For budgets better expressed in data volume, use
    ``token_budget_select``'s bucket-histogram shape instead, which
    never sorts the corpus.
    """
    from pyspark.sql import Window

    b = hash_bucket(key_cols, sep)
    w = Window.partitionBy(group_col).orderBy(
        b, *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= int(k))
        .drop("_rk")
    )
