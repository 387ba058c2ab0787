"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ml_feature_store_pipeline_spark``; this module
only adapts it to the driver's (spark, sf_dir) calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ml_feature_store_pipeline_spark.harness import (
    flagship_query,
    oracle_registry,
    query_registry,
)
from ml_feature_store_pipeline_spark.session import apply_engine_conf

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY C1–C8 extractor) on sf0.001 events."""
    apply_engine_conf(spark)
    return flagship_query(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_registry()


def oracle_sql() -> dict[str, str]:
    return oracle_registry()
