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
# registry is emitted in an explicit priority order. Round-4 rotation (per
# VERDICT r3): anchors that re-verify every operator changed since its last
# driver row (bit-packed simhash, single-pass ngram jaccard, skew-adaptive
# asof, one per remaining family), then the 3 queries that have NEVER had a
# driver row (the skew-safe twins + the new auto-selector), then the 5 whose
# oracles were upgraded from rows-only to hash/bounded checks after r3
# (multimodal pixel stats, ANN recall floors, MinHashLSH quality, TF-IDF
# invariants), then every query registered during round 4 (no "registered
# after the freeze" backlog), then a refresh slice of round-2-only greens
# (the remainder, all twice-green trivial scans/joins, rotate in r5).
DRIVER_WINDOW: tuple[str, ...] = (
    # anchors: flagship + one per family; simhash/ngram/asof anchors also
    # re-verify the operators rewritten since their last driver row
    "user_features",
    "tpch_q1",
    "tpch_q3_topk",
    "asof_events_orders",
    "training_set_pit",
    "minhash_candidate_pairs",
    "near_dup_clusters",
    "dedup_exact_docs",
    "cosine_topk",
    "text_stats",
    "sessionize_events",
    "windowed_user_counts",
    "simhash_docs",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "psi_order_price_drift",
    # never driver-verified: skew-safe twins, the new auto-selector, and the
    # round-4 sequence-packing op (ivf_ann_topk, r3-green and family-covered
    # by the three other ANN rows this window, yielded the slot)
    "asof_events_orders_bucketed",
    "training_set_pit_bucketed",
    "asof_events_orders_auto",
    "pack_sequences_docs",
    # oracle upgraded after r3 (was rows-only / r1-error): first hash check
    "multimodal_decode",
    "lsh_ann_topk",
    "ml_brp_ann_topk",
    "ml_minhash_near_dup",
    "ml_tfidf_vectors",
    # NEW in round 4 — first driver rows (every r4 registration makes this
    # window; no "registered after the freeze" backlog this round)
    "training_set_pit_auto",
    "incremental_minhash_pairs",
    "token_mixture_sample_docs",
    "corpus_curation_pipeline",
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
    "bloom_prune_lineitem",
    "merge_upsert_orders",
    "semantic_dedup_embeddings",
    "audio_decode_stats",
    "video_frame_stats",
    "image_resize_stats",
    "quantile_bin_orders",
    "target_encode_events",
    "hashed_cross_events",
    "negative_sample_pairs",
    "table_profile_orders",
    # No round-2 refresh slice fits this round: all 17 double-green r2
    # entries (chunk_documents, doc_quality_scores, language_id,
    # order_price_rank_stats, pivot_event_values, rolling_hour_user_spend,
    # rollup_lineitem, embedding_near_dup, topk_latest_events,
    # tpch_q10_like, quality_null_dup_stats, scrub_pii_docs, tpch_q5_like,
    # unpivot_lineitem, json_props_extract, sample_events_10pct,
    # tpch_q12_like) yielded their slots to first-time verifications —
    # every query registered in round 4 gets a driver row; refreshes are
    # the r5 window's job.
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
