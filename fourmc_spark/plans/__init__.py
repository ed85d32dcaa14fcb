"""Physical-plan introspection and co-location helpers.

`audit` reads the executed/physical plan Catalyst produced for a DataFrame
and exposes the properties the 100 TB posture depends on (pushed filters,
pruned read schemas, join strategies, shuffle count) so tests can pin them
— a plan regression harness, not a one-off `.explain()` eyeball.

`bucketing` writes bucketed+sorted tables so repeated equi-joins and
aggregations on the bucket key run without an Exchange — the co-located
join strategy for tables joined every day at scale.
"""

from fourmc_spark.plans.audit import (
    broadcast_join_count,
    exchange_count,
    has_pushed_filter,
    observed,
    physical_plan,
    runtime_bloom_filter_count,
    read_schema_columns,
    wholestage_codegen_spans,
)
from fourmc_spark.plans.bucketing import bucketed_join, write_bucketed
from fourmc_spark.plans.runtime_filters import runtime_bloom_filters

__all__ = [
    "physical_plan",
    "has_pushed_filter",
    "read_schema_columns",
    "exchange_count",
    "broadcast_join_count",
    "wholestage_codegen_spans",
    "runtime_bloom_filter_count",
    "runtime_bloom_filters",
    "write_bucketed",
    "bucketed_join",
    "observed",
]
