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
# registry is emitted in an explicit priority order. Round-9 rotation (the
# r8 verdict's items 1-2): the window rotates onto ALL 40 names of
# tests/test_registry.py::R9_WINDOW_QUEUE — the last registry queries
# without a driver-green row — zeroing the never-driver-checked debt
# (r8's CORRECTNESS window went 50/50 green on the other half of the r7
# queue). The 10 remaining slots follow the standing priority rules:
#
# - THREE r9 batch-1 registrations (the freeze lifted per r8 verdict
#   item 2/5, each registered straight into the window as r8 did with
#   its changed pulls): substring_decontaminate_docs,
#   temporal_split_leakage_audit, ann_rerank_eval — all 3-SF verified
#   via tools/verify_oracle.py this round, plan-audited 0 flags.
# - FOUR r9 batch-2 registrations (same rule; never-checked new code
#   outranks stale-but-green anchors): adamic_adar_parts_topk,
#   holt_forecast_daily_value, dim_correlation_topk_embeddings,
#   t_closeness_events — all 3-SF verified + plan-audited 0 flags this
#   round. Batch 2's remaining two (item_item_cosine_topk,
#   readability_docs — the simplest oracles of the six) do NOT fit the
#   50-slot window, nor do the eight batch-3/4/5/6 registrations that
#   landed after it filled (best_split, layout_pruning, pca_power, rake,
#   isotonic, forecast_backtest, unigram_kl, stl_anomaly — all 3-SF
#   verified + plan-audited); together they are the r10 rotation queue
#   (tests/test_registry.py::R10_WINDOW_QUEUE, 10 names).
# - THREE changed-code pulls (function text touched this round, so
#   their prior greens predate the shipped code):
#   part_pagerank_top20 (edges_per_partition fail-fast validation +
#   thread-safety note), serving_parity_audit (staleness-SLA docstring
#   + the register_features metadata-copy fix), and lsh_ann_topk
#   (hyperplane_signature gained the name-based single-F.expr build —
#   bit-identical signatures, unit-tested, but changed code is changed
#   code).
# - ZERO anchors: batch 2 consumed the four slots r9 had reserved for
#   the oldest r4-era greens (text_stats, dedup_exact_docs,
#   minhash_candidate_pairs, incremental_minhash_pairs) — those return
#   to the FRONT of the r10 anchor pool
#   (tests/test_registry.py::R10_ANCHOR_CANDIDATES), still the oldest
#   driver signal in the registry.
DRIVER_WINDOW: tuple[str, ...] = (
    # R9_WINDOW_QUEUE — all 40, registration order (never driver-checked)
    "hourly_seasonality_events",
    "daily_anomaly_profile_events",
    "referential_integrity_lineitem_orders",
    "welch_ttest_view_purchase",
    "conversion_latency_view_purchase",
    "ks_value_drift_halves",
    "ab_assignment_srm_events",
    "mad_outliers_order_price",
    "calendar_features_events",
    "classification_report_embeddings",
    "label_centroid_distances",
    "copurchase_degree_profile",
    "bpe_train_merges",
    "bpe_encode_stats_docs",
    "corr_matrix_lineitem",
    "acf_daily_value",
    "bm25_topk_docs",
    "hybrid_rrf_topk",
    "quantile_transform_orders",
    "woe_iv_event_type",
    "chi2_event_type_hour",
    "kmeans_embeddings",
    "triangle_stats_copurchase",
    "lang_confusion_docs",
    "calibration_curve_embeddings",
    "roc_auc_embeddings",
    "kmeans_balanced_sample",
    "survival_curve_users",
    "did_event_value",
    "tfidf_doc_similarity_topk",
    "seasonal_decompose_daily_value",
    "bootstrap_mean_ci_value",
    "cuped_lift_value",
    "robust_trend_daily_value",
    "trimmed_mean_order_price",
    "value_gini_order_price",
    "cusum_daily_value",
    "term_pmi_docs",
    "markov_entropy_rate_events",
    "completeness_by_day_events",
    # r9 batch-1 registrations — new operators enter the window immediately
    "substring_decontaminate_docs",
    "temporal_split_leakage_audit",
    "ann_rerank_eval",
    # r9 batch-2 registrations (4 of 6 — see the priority note above)
    "adamic_adar_parts_topk",
    "holt_forecast_daily_value",
    "dim_correlation_topk_embeddings",
    "t_closeness_events",
    # changed-code pulls (function text touched this round)
    "part_pagerank_top20",
    "serving_parity_audit",
    "lsh_ann_topk",
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
