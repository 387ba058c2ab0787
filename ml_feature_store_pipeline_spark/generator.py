"""Distributed synthetic event generator (reference A11,
`ML Feature Store Pipeline.py:569-607`).

The reference draws 100 users × 1,000 events with numpy on the driver. This
version builds the same distributions as Column expressions over
``spark.range`` — fully distributed, so "generate 10B events" is just a
bigger range. Distribution fidelity (not byte fidelity — different RNG):

- event_type ~ Categorical(click .40, view .30, purchase .10,
  add_to_cart .15, search .05)                      (`:578-582`)
- amount     = Exponential(mean 50) iff purchase else 0   (`:585-589`)
- timestamp  = base + Exponential(mean 2h) per row        (`:592-597`)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPE_CDF = [
    ("click", 0.40),
    ("view", 0.70),
    ("purchase", 0.80),
    ("add_to_cart", 0.95),
    ("search", 1.00),
]


def generate_events(
    spark: SparkSession,
    n_events: int = 1000,
    n_users: int = 100,
    seed: int = 42,
    base_ts: str = "2023-01-01 00:00:00",
    amount_mean: float = 50.0,
    gap_mean_hours: float = 2.0,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the reference's demo distribution at any scale."""
    df = spark.range(0, n_events, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    # first-match-wins chained WHEN over the cumulative distribution
    u_type = F.rand(seed)
    type_expr = None
    for name, cum in EVENT_TYPE_CDF:
        cond = u_type < cum
        type_expr = F.when(cond, name) if type_expr is None else type_expr.when(cond, name)

    # inverse-CDF exponential: -mean * ln(1 - U)
    expo_amount = -F.lit(amount_mean) * F.log(F.lit(1.0) - F.rand(seed + 1))
    expo_gap_s = -F.lit(gap_mean_hours * 3600.0) * F.log(F.lit(1.0) - F.rand(seed + 2))

    return (
        df.withColumn("user_id", (F.rand(seed + 3) * n_users).cast("long") + 1)
        .withColumn("event_type", type_expr)
        .withColumn(
            "amount",
            F.when(F.col("event_type") == "purchase", expo_amount).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "timestamp",
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(base_ts)) + expo_gap_s.cast("double")
            ),
        )
        .select("user_id", "event_type", "amount", "timestamp")
    )
