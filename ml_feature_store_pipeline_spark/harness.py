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
# registry is emitted in an explicit priority order. Round-12 rotation
# (the r11 verdict's item 1): finish the provenance refresh — after this
# window no registry query's newest driver green predates r7, i.e. every
# query has been re-verified within five rounds of its shipping code.
#
# - FOURTEEN r6-era anchors (tests/test_registry.py::
#   R12_ANCHOR_CANDIDATES — the unconsumed tail of the r11 pool;
#   running_revenue through index_encode_event_types, registry order).
# - SIX changed-code pulls (function text touched this round, so their
#   prior greens predate the shipped code): ivf_ann_topk /
#   ann_rerank_eval (similarity._nearest_cells gained the empty-centers
#   short-circuit, ivf_query the pre-collected-centers pass-through —
#   bit-identical, plan-probed), lsh_ann_topk / pq_ann_topk /
#   ann_rerank_eval again (pin_concurrent now restores
#   spark.job.interruptOnCancel alongside the other two thread-local
#   properties), mad_outliers_order_price and weighted_median_price_hist
#   (their inline driver-pin copies folded into functions.pin_local, so
#   their builder plans now sit under the _PIN_PLAN_SINK audit).
# - THIRTY anchors from the FRONT of tests/test_registry.py::
#   R12_R7_POOL (the 48 queries whose newest driver green is r7 — the
#   oldest signal once the r6 anchors above land); the remaining 18
#   roll to r13.
DRIVER_WINDOW: tuple[str, ...] = (
    # R12_ANCHOR_CANDIDATES — all 14 remaining r6-era greens
    "running_revenue",
    "lag_lead_events",
    "set_ops_summary",
    "json_props_extract",
    "doc_fingerprints",
    "backfill_snapshots",
    "incremental_distinct_users_per_type",
    "robust_scale_orders",
    "target_encode_oof_events",
    "jsd_event_type_drift",
    "standard_scale_events",
    "group_scale_events",
    "winsorize_orders",
    "index_encode_event_types",
    # changed-code pulls (function text touched this round)
    "lsh_ann_topk",
    "ivf_ann_topk",
    "pq_ann_topk",
    "ann_rerank_eval",
    "mad_outliers_order_price",
    "weighted_median_price_hist",
    # anchors — R12_R7_POOL front, registry order (r7 greens)
    "user_features",
    "minhash_signatures",
    "embedding_near_dup",
    "video_vhash_dup_groups",
    "embedding_quantization_stats",
    "mixture_epochs_docs",
    "repetition_stats_docs",
    "ewma_user_spend_prior",
    "sliding_window_counts",
    "dedup_survivors_docs",
    "stratified_sample_counts",
    "key_skew_profile_events",
    "interval_join_price_buckets",
    "tfidf_terms_docs",
    "scd2_event_type_history",
    "pit_scd2_orders_state",
    "embedding_norm_stats",
    "token_histogram_docs",
    "kmv_distinct_orderkeys",
    "weighted_sample_events",
    "incremental_user_value_stats",
    "near_dup_edit_distance",
    "hist_quantile_prices",
    "cms_heavy_hitters_events",
    "semantic_dedup_embeddings",
    "knn_label_audit",
    "gopher_filter_docs",
    "dsir_select_docs",
    "budget_select_docs",
    "chunk_dedup_docs",
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
