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
# registry is emitted in an explicit priority order. Round-11 rotation
# (the r10 verdict's item 1): with never-checked debt at zero since r10
# and registry growth frozen, the window is pure provenance refresh —
# the oldest stale anchors first, then this round's changed-code pulls,
# then the next-oldest anchors.
#
# - THIRTEEN r4-era anchors (tests/test_registry.py::
#   R11_ANCHOR_CANDIDATES — the r10 rotation's planned remainder; after
#   this window no registry query's newest driver green predates r6):
#   tpch_q1, tpch_q3_topk, the as-of/PIT family, sessionize_events,
#   quantile_bin_orders, target_encode_events, hashed_cross_events,
#   table_profile_orders.
# - SIX changed-code pulls (function text touched this round, so their
#   prior greens predate the shipped code): lsh_ann_topk / pq_ann_topk /
#   ann_rerank_eval (pin_concurrent now runs builders on
#   InheritableThread with fail-fast job-group cancel; bit-identical
#   pins), ivf_ann_topk (ivf_topk/ivf_build gained the shared-count
#   n_corpus parameter, as did lsh_topk/pq_topk_rerank),
#   tfidf_doc_similarity_topk (max_postings now DEFAULTS to the
#   corpus-aware max(64, n//1000) plan-side cap — code AND oracle
#   changed), and ml_brp_ann_topk (docstring-only: records the measured
#   decision NOT to pin — exchange reuse already deduplicates its brute
#   subtree; pulled anyway under the changed-code rule).
# - THIRTY-ONE anchors from the FRONT of tests/test_registry.py::
#   R11_R6_POOL (the 45 queries whose newest driver green is r6 — the
#   oldest signal once the r4 anchors above land); the remaining 14
#   (running_revenue through index_encode_event_types) roll to r12.
DRIVER_WINDOW: tuple[str, ...] = (
    # R11_ANCHOR_CANDIDATES — all 13 r4-era greens, registry order
    "tpch_q1",
    "tpch_q3_topk",
    "asof_events_orders",
    "asof_events_orders_bucketed",
    "asof_events_orders_auto",
    "sessionize_events",
    "training_set_pit",
    "training_set_pit_bucketed",
    "training_set_pit_auto",
    "quantile_bin_orders",
    "target_encode_events",
    "hashed_cross_events",
    "table_profile_orders",
    # changed-code pulls (function text touched this round)
    "lsh_ann_topk",
    "ivf_ann_topk",
    "pq_ann_topk",
    "ann_rerank_eval",
    "tfidf_doc_similarity_topk",
    "ml_brp_ann_topk",
    # anchors — R11_R6_POOL front, registry order (r6 greens)
    "language_id",
    "doc_quality_scores",
    "image_phash_dup_groups",
    "audio_afp_dup_groups",
    "chunk_documents",
    "cosine_topk_blas",
    "scrub_pii_docs",
    "decontaminate_docs",
    "decayed_user_spend",
    "lm_quality_score_docs",
    "merge_upsert_orders_evolve",
    "rollup_lineitem",
    "pivot_event_values",
    "unpivot_lineitem",
    "tpch_q6",
    "tpch_q5_like",
    "tpch_q12_like",
    "tpch_q10_like",
    "order_price_rank_stats",
    "rolling_hour_user_spend",
    "scan_filter_project",
    "iqr_outlier_summary",
    "quality_null_dup_stats",
    "topk_latest_events",
    "latest_event_per_user",
    "customer_order_counts",
    "semi_join_customers",
    "anti_join_customers",
    "asof_events_orders_stale30d",
    "asof_prev_order",
    "band_join_price_tiers",
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
