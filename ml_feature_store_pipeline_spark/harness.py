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
# registry is emitted in an explicit priority order. Round-10 rotation
# (the r9 verdict's item 1): never-checked debt first, then changed-code
# pulls and new registrations, then the oldest stale anchors.
#
# - TEN queue names (tests/test_registry.py::R10_WINDOW_QUEUE — the
#   late-r9 registrations that outgrew the 50-slot window; the last
#   registry queries without a driver-green row, so this window zeroes
#   the never-checked debt): item_item_cosine_topk, readability_docs,
#   best_split_daily_value, layout_pruning_audit_orders,
#   pca_power_embeddings, rake_keyphrases_docs,
#   isotonic_calibration_embeddings, forecast_backtest_daily_value,
#   unigram_kl_sources_docs, stl_anomaly_days_value. Four of these also
#   carry r10 code changes (readability null-gate, forecast_backtest
#   calendar lag, layout_pruning empty-dict guard, pca_power's decimal
#   partial sums) — the queue slot double-serves as the changed-code
#   pull.
# - ONE r10 registration (the standing new-code rule):
#   kl_reweighted_mixture_docs — the unigram-KL→mixture-weights loop
#   closer (r9 verdict item 6), 3-SF verified via tools/verify_oracle.py.
# - SIX changed-code pulls (function text touched this round, so their
#   prior greens predate the shipped code): dim_correlation_topk_embeddings
#   (shares _pairwise_moments' decimal partial sums),
#   lsh_ann_topk / pq_ann_topk / ivf_ann_topk / ann_rerank_eval (the
#   corpus-aware route-default signatures; ivf also gained the
#   partial-agg assignment fold), and tfidf_doc_similarity_topk
#   (registered onto the rank-bounded posting cap — code AND oracle
#   changed).
# - THIRTY-THREE anchors from the FRONT of
#   tests/test_registry.py::R10_ANCHOR_CANDIDATES (newest driver green
#   r4 — the oldest hard signal in the registry); the remaining 13
#   (tpch_q1 through table_profile_orders) roll to the r11 anchor pool.
DRIVER_WINDOW: tuple[str, ...] = (
    # R10_WINDOW_QUEUE — all 10, registration order (never driver-checked)
    "item_item_cosine_topk",
    "readability_docs",
    "best_split_daily_value",
    "layout_pruning_audit_orders",
    "pca_power_embeddings",
    "rake_keyphrases_docs",
    "isotonic_calibration_embeddings",
    "forecast_backtest_daily_value",
    "unigram_kl_sources_docs",
    "stl_anomaly_days_value",
    # r10 registration — new operators enter the window immediately
    "kl_reweighted_mixture_docs",
    # changed-code pulls (function text touched this round)
    "dim_correlation_topk_embeddings",
    "lsh_ann_topk",
    "pq_ann_topk",
    "ivf_ann_topk",
    "ann_rerank_eval",
    "tfidf_doc_similarity_topk",
    # anchors — R10_ANCHOR_CANDIDATES front, registry order (r4 greens)
    "text_stats",
    "dedup_exact_docs",
    "minhash_candidate_pairs",
    "incremental_minhash_pairs",
    "simhash_docs",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "multimodal_decode",
    "windowed_user_counts",
    "ml_tfidf_vectors",
    "ml_minhash_near_dup",
    "ml_brp_ann_topk",
    "pack_sequences_docs",
    "token_mixture_sample_docs",
    "corpus_curation_pipeline",
    "near_dup_clusters",
    "bloom_prune_lineitem",
    "merge_upsert_orders",
    "audio_decode_stats",
    "video_frame_stats",
    "image_resize_stats",
    "psi_order_price_drift",
    "tpch_q13_like",
    "tpch_q17_like",
    "tpch_q22_like",
    "tpch_q11_like",
    "tpch_q16_like",
    "tpch_q21_like",
    "tpch_q2_like",
    "tpch_q8_like",
    "tpch_q9_like",
    "tpch_q20_like",
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
