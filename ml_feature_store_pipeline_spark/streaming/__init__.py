from .ingest import (
    bloom_dedup_sink,
    cdc_merge_sink,
    decayed_counter_sink,
    distinct_counter_sink,
    enrich_stream,
    incremental_near_dup_sink,
    incremental_state_sink,
    streaming_feature_aggregation,
    streaming_session_aggregation,
    upsert_sink,
)
from .stateful import dedup_stream, join_streams, sessionize_stream

__all__ = [
    "bloom_dedup_sink",
    "cdc_merge_sink",
    "decayed_counter_sink",
    "dedup_stream",
    "distinct_counter_sink",
    "enrich_stream",
    "incremental_near_dup_sink",
    "incremental_state_sink",
    "join_streams",
    "sessionize_stream",
    "streaming_feature_aggregation",
    "streaming_session_aggregation",
    "upsert_sink",
]
