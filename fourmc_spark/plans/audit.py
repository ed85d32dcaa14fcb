"""Physical-plan audit helpers.

Every claim in PLANS.md ("the filter reaches the scan", "only dimension
tables broadcast", "top-k never total-sorts") is a property of the string
Catalyst prints for the physical plan. These helpers parse that string so
the properties become assertions in tests instead of prose — if a future
change silently turns a broadcast join into a 100 TB shuffle, the plan
suite fails, not the production run.

The reference has no optimizer to audit (SURVEY.md §4); this module is
engine-side infrastructure for OUR plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "has_pushed_filter",
    "read_schema_columns",
    "exchange_count",
    "broadcast_join_count",
    "wholestage_codegen_spans",
    "observed",
]


def physical_plan(df: DataFrame, *, executed: bool = True) -> str:
    """The plan string Catalyst will run. No job is triggered.

    ``executed=True`` (default) returns the executed plan — under AQE this
    is the initial adaptive plan, which already contains the Exchange
    nodes EnsureRequirements inserted (AQE can only coalesce/convert them
    at runtime, never add new shuffles). ``executed=False`` returns the
    bare physical plan BEFORE exchange placement — join/agg strategy only.
    """
    qe = df._jdf.queryExecution()
    return str(qe.executedPlan() if executed else qe.sparkPlan())


def _formatted(df: DataFrame) -> str:
    # the "formatted" explain carries PushedFilters/ReadSchema per scan node
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if some scan node pushed a filter whose text contains
    ``fragment`` (e.g. ``"GreaterThan(l_quantity"``)."""
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", _formatted(df))
    return any(fragment in grp for grp in m)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (one list per scan node) —
    the column-pruning witness. Parquet scans that read 3 of 16 lineitem
    columns show exactly those 3 here."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", _formatted(df)):
        body = m.group(1)
        cols = [c.split(":")[0].strip() for c in body.split(",") if ":" in c]
        out.append(cols)
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (broadcast exchanges excluded) —
    THE scale currency; every one moves the working set across the
    cluster."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hash|range|rangepartitioning|SinglePartition)",
                          plan, flags=re.IGNORECASE))


def broadcast_join_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen subtrees the plan compiles — fused JVM
    loops; 0 means the whole query fell off the codegen path. Uses the
    "codegen" explain mode (compiles, runs nothing) because under AQE the
    executed-plan string elides codegen markers until runtime."""
    txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", txt)
    return int(m.group(1)) if m else 0


def runtime_bloom_filter_count(df: DataFrame) -> int:
    """How many runtime Bloom-filter probes (`might_contain`) Catalyst
    injected on the application side of joins — the semi-join reduction
    that kills non-matching fact rows BEFORE their shuffle."""
    return len(re.findall(r"might_contain", physical_plan(df)))


def observed(df: DataFrame, name: str, *metrics):
    """Attach free runtime counters to a pipeline stage via Spark's
    Observation API: ``df2, obs = observed(df, "gate", count(...), ...)``;
    after any action on ``df2``, ``obs.get`` holds the metric row.

    The 100 TB operational tool: stage row/byte counters (rows in, rows
    kept, bytes scanned) come from accumulators inside the SAME job —
    no second pass, no extra action, unlike a ``.count()`` audit which
    re-runs the stage. Used for curation-funnel telemetry (docs in →
    gate → dedup → sample), where re-counting each stage would double
    the pipeline cost.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    if not metrics:
        from pyspark.sql import functions as F

        metrics = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(obs, *metrics), obs
