"""Skew-mitigation rewrites for hot-key aggregations.

Spark's partial aggregation absorbs skew for algebraic aggregates
(sum/count/min/max combine map-side), but distinct aggregation does not:
``countDistinct(col)`` per key shuffles the DISTINCT (key, col) pairs on
``key`` alone for the final phase, so one hot key's entire distinct set
lands in a single task. The classic rewrite splits it into two
well-behaved shuffles:

  stage 1 — dedupe on (key, col): shuffle keyed by the PAIR, so a hot
            key's values spread across the cluster;
  stage 2 — count per key: input is one row per distinct pair, so even a
            key with 100 M distinct values reduces through map-side
            partial counts.

Same exact answer, no single-task hotspot. Use when a key can own a huge
distinct set; for uniform keys the built-in ``countDistinct`` plan is
fine (one shuffle fewer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_distinct_two_stage(
    df: DataFrame, keys: list[str], col: str, *, alias: str = "n_distinct"
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col) as dedupe-then-count (see module
    docstring). Nulls are not counted (SQL COUNT(DISTINCT) semantics)."""
    dedup = (
        df.filter(F.col(col).isNotNull()).select(*keys, col).distinct()
    )
    return dedup.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))
