"""PySpark-native feature-store / analytics engine.

A from-scratch re-expression of the capability surface of
``omgitsbees/ML-Feature-Store-Pipeline`` (a single-node pandas + SQLite
feature store) on Apache Spark: events and features are DataFrames over
parquet, extraction is a Catalyst-planned groupBy().agg(), the offline
store is a version-partitioned parquet table, and the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) ride the same engine.
"""

from .config import DataQualityMetrics, FeatureConfig, FeatureMetadata
from .extractors import (
    ApproxUserEventExtractor,
    FeatureExtractor,
    PandasGroupedExtractor,
    UserEventExtractor,
)
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "FeatureConfig",
    "FeatureMetadata",
    "DataQualityMetrics",
    "FeatureExtractor",
    "UserEventExtractor",
    "ApproxUserEventExtractor",
    "PandasGroupedExtractor",
]
