"""Query/oracle registry backing ``__spark_entry__.py``.

Each entry pairs a PySpark query (built on this package's operators) with
an ANSI-SQL twin that DuckDB executes over the same parquet tables. The
driver hash-compares values order-insensitively, so:

- every computed column is aliased identically on both sides;
- floating-point aggregates use the deterministic decimal-sum recipe from
  ``functions.dsum``/``dsum_sql`` (order-insensitive, engine-stable);
- top-k queries carry a total tiebreak so the SET of rows is well-defined.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extractors import UserEventExtractor
from .functions import davg_sql, dsum, dsum_sql
from .sources.readers import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: add a (query, oracle) pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def _ensure_loaded() -> None:
    """Import the registry modules (idempotent; deferred to avoid cycles)."""
    from . import harness_northstar, harness_olap, harness_queries  # noqa: F401


# The driver hash-verifies only the FIRST 50 ``queries()`` entries, so the
# registry is emitted in an explicit priority order. Round-8 rotation (the
# r7 verdict's item 1): 90 registry queries — every r6/r7 registration —
# had never produced a driver-green row; the r7 verdict pinned them in
# R8_WINDOW_QUEUE (registration order, oldest local verification first)
# and mandated the r8 window rotate onto that queue with registrations
# frozen. This window is the queue's first 45 plus the FIVE queue members
# whose code round 8 touched (r7 ADVICE fixes + the PageRank
# co-partitioned pin) pulled forward — a changed query's pending local
# verification is stale, so it outranks queue order (the same rule the r7
# rotation applied to its changed-code anchors):
#   part_pagerank_top20        — size-gated co-partitioned edge pin
#   spearman_price_quantity    — DECIMAL(38,6) rank-moment accumulators
#   mann_whitney_view_purchase — one-SELECT conditional-aggregation oracle
#   ranking_metrics_label_topk — relevance-pair dedup before the join
#   count_encode_event_type    — lazy total derived from the counts agg
# The five displaced queue names (hourly_seasonality_events,
# daily_anomaly_profile_events, referential_integrity_lineitem_orders,
# welch_ttest_view_purchase, conversion_latency_view_purchase) lead
# tests/test_registry.py::R9_WINDOW_QUEUE (40 names) for the r9 window.
# Every name here passed tools/verify_oracle.py at sf0.01 (the driver's
# gate) this round — the five changed names at all three SFs — on top of
# their round-7 3-SF verification; every query NOT in this window keeps
# its r4-r7 driver green on code untouched since.
DRIVER_WINDOW: tuple[str, ...] = (
    # R8_WINDOW_QUEUE[0:45] — registration order, oldest verification first
    "table_profile_orders_approx",
    "ml_quality_filter_docs",
    "semantic_decontaminate_embeddings",
    "training_shard_stats",
    "dedup_survivors_priority_docs",
    "hard_negative_pairs",
    "prototypicality_scores",
    "vocab_coverage_docs",
    "quality_calibrated_docs",
    "source_overlap_docs",
    "bpe_token_stats_docs",
    "bpe_pair_stats_docs",
    "quality_calibrated_sketch_docs",
    "funnel_view_click_purchase",
    "trend_slope_user_value",
    "cohort_retention_weekly",
    "random_projection_embeddings",
    "mmr_rerank_embeddings",
    "maxsim_multivector_topk",
    "event_type_affinity",
    "corpus_duplication_rate_docs",
    "zipf_fit_docs",
    "active_users_daily",
    "rfm_segments",
    "touch_attribution_events",
    "interpurchase_gaps",
    "k_anonymity_events",
    "resample_ffill_user_value",
    "session_stats_events",
    "session_window_agg_events",
    "session_trigrams_events",
    "user_event_entropy",
    "benford_orders_totalprice",
    "ohlc_user_value_daily",
    "kmv_user_overlap_view_purchase",
    "weighted_median_price_by_flag",
    "l_diversity_events",
    "part_copurchase_lift",
    "event_transition_matrix",
    "key_skew_gini_events",
    "event_value_mutual_info",
    "weighted_median_price_hist",
    "pq_ann_topk",
    "active_users_hll_daily",
    "daily_value_percentiles",
    # queue members whose code ROUND 8 changed — pulled forward
    "part_pagerank_top20",
    "spearman_price_quantity",
    "mann_whitney_view_purchase",
    "ranking_metrics_label_topk",
    "count_encode_event_type",
)


def _ordered_names() -> list[str]:
    pos = {n: i for i, n in enumerate(_QUERIES)}
    win = {n: i for i, n in enumerate(DRIVER_WINDOW)}

    def key(name: str) -> tuple[int, int]:
        if name in win:
            return (0, win[name])
        return (1 if name in _ORACLES else 2, pos[name])

    return sorted(_QUERIES, key=key)


def query_registry() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: _QUERIES[n] for n in _ordered_names()}


def oracle_registry() -> dict[str, str]:
    _ensure_loaded()
    return {n: _ORACLES[n] for n in _ordered_names() if n in _ORACLES}


# ---------------------------------------------------------------------------
# Flagship: the reference's C1–C8 extractor on the driver events table
# (ts → timestamp, value → amount per FIXTURES.md §2).
# ---------------------------------------------------------------------------


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    extractor = UserEventExtractor(amount_col="value", timestamp_col="ts")
    return extractor.extract(events)


_FLAGSHIP_ORACLE = f"""
WITH agg AS (
  SELECT
    user_id,
    COUNT(event_type) AS total_events,
    CAST(COALESCE(SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS total_purchases,
    {dsum_sql('value')} AS total_amount,
    COALESCE(
      CAST(SUM(CASE WHEN value > 0 THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE)
        / NULLIF(COUNT(CASE WHEN value > 0 THEN 1 END), 0),
      0.0) AS avg_amount,
    MAX(ts) AS last_event_time,
    MIN(ts) AS first_event_time,
    COUNT(DISTINCT event_type) AS unique_event_types,
    CAST(FLOOR(DATE_DIFF('second', MIN(ts), MAX(ts)) / 86400.0) + 1 AS BIGINT) AS days_active
  FROM events GROUP BY user_id
)
SELECT *,
  COALESCE(CAST(total_purchases AS DOUBLE) / NULLIF(total_events, 0), 0.0) AS purchase_rate,
  COALESCE(CAST(total_events AS DOUBLE) / NULLIF(days_active, 0), 0.0) AS avg_events_per_day
FROM agg
"""


@register("user_features", _FLAGSHIP_ORACLE)
def q_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-decimal build of the flagship query for oracle hashing
    (the library extractor keeps plain double sums; semantics identical)."""
    events = read_table(spark, sf_dir, "events")
    value, pred = F.col("value"), F.col("value") > 0
    agg = events.groupBy("user_id").agg(
        F.count("event_type").alias("total_events"),
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("total_purchases"),
        dsum(value).alias("total_amount"),
        F.coalesce(
            F.sum(F.when(pred, value).cast("decimal(28,4)")).cast("double")
            / F.count(F.when(pred, F.lit(1))),
            F.lit(0.0),
        ).alias("avg_amount"),
        F.max("ts").alias("last_event_time"),
        F.min("ts").alias("first_event_time"),
        F.countDistinct("event_type").alias("unique_event_types"),
        (
            F.floor((F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))) / 86400)
            + F.lit(1)
        ).cast("long").alias("days_active"),
    )
    return agg.withColumn(
        "purchase_rate",
        F.coalesce(F.col("total_purchases") / F.nullif(F.col("total_events"), F.lit(0)), F.lit(0.0)),
    ).withColumn(
        "avg_events_per_day",
        F.coalesce(F.col("total_events") / F.nullif(F.col("days_active"), F.lit(0)), F.lit(0.0)),
    )
