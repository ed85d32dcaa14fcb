from .ops import (
    cdc_apply_stream,
    dedup_within_watermark,
    distinct_users_hourly,
    enrich_with_dimension,
    funnel_interval_join,
    read_cdc_state,
    read_events_stream,
    run_to_memory,
    session_counts,
    sessionize_stateful,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "distinct_users_hourly",
    "enrich_with_dimension",
    "funnel_interval_join",
    "sessionize_stateful",
    "run_to_memory",
    "cdc_apply_stream",
    "read_cdc_state",
]
