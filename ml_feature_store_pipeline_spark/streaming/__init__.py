from .ingest import streaming_feature_aggregation, upsert_sink

__all__ = ["streaming_feature_aggregation", "upsert_sink"]
