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
    physical_plan,
    read_schema_columns,
    wholestage_codegen_spans,
)
from fourmc_spark.plans.bucketing import bucketed_join, write_bucketed

__all__ = [
    "physical_plan",
    "has_pushed_filter",
    "read_schema_columns",
    "exchange_count",
    "broadcast_join_count",
    "wholestage_codegen_spans",
    "write_bucketed",
    "bucketed_join",
]
