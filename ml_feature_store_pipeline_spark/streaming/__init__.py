from .ingest import enrich_stream, streaming_feature_aggregation, upsert_sink
from .stateful import dedup_stream, join_streams, sessionize_stream

__all__ = [
    "dedup_stream",
    "enrich_stream",
    "join_streams",
    "sessionize_stream",
    "streaming_feature_aggregation",
    "upsert_sink",
]
