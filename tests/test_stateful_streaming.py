"""Stateful streaming operators: session windows via applyInPandasWithState
and bounded-state streaming dedup.

Sessions are driven closed two ways — by a later same-key event past the gap
(in-batch), and by event-time timeout once later batches advance the
watermark — using checkpointed ``availableNow`` runs so watermark/state
persist across restarts exactly as in production."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import windows
from ml_feature_store_pipeline_spark.streaming import dedup_stream, sessionize_stream

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


def _run_once(spark, src: str, ckpt: str, out: str) -> None:
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    sessions = sessionize_stream(
        stream, gap_seconds=600.0, watermark="0 seconds"
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_sessionize_stream_closes_by_gap_and_timeout(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")

    # batch 1: user 1 has two events 2 min apart (one session, still open);
    # user 2 one event. Nothing can close yet.
    b1 = [
        (1, _m(0), 1, "click", 0.0),
        (2, _m(2), 1, "purchase", 25.0),
        (3, _m(0), 2, "view", 0.0),
    ]
    spark.createDataFrame(b1, EVENTS_DDL).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)

    # batch 2: user 1 reappears 58 min later — past the 10 min gap, so the
    # first session closes IN the function; watermark advances to minute 60.
    b2 = [(4, _m(60), 1, "click", 0.0)]
    spark.createDataFrame(b2, EVENTS_DDL).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)

    got = {
        (r["user_id"], r["session_start"]): r
        for r in spark.read.parquet(out).collect()
    }
    first = got[(1, _m(0))]
    assert first["session_end"] == _m(2)
    assert first["n_events"] == 2
    assert first["total_amount"] == pytest.approx(25.0)
    # user 2's session (timeout at minute 10) closes via event-time timeout —
    # fired in batch 2 or at latest batch 3 depending on watermark commit timing.

    # batch 3: unrelated user far in the future → watermark passes every
    # pending timeout; user 2's and user 1's second session both close.
    b3 = [(5, _m(600), 99, "view", 0.0)]
    spark.createDataFrame(b3, EVENTS_DDL).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)
    _run_once(spark, src, ckpt, out)  # extra tick: fire timeouts vs final watermark

    got = {
        (r["user_id"], r["session_start"]): r
        for r in spark.read.parquet(out).collect()
    }
    assert got[(2, _m(0))]["n_events"] == 1
    assert got[(2, _m(0))]["session_end"] == _m(0)
    second = got[(1, _m(60))]
    assert second["n_events"] == 1
    assert second["session_end"] == _m(60)


def test_sessionize_stream_matches_batch_twin(spark, tmp_path):
    """Closed sessions from the stream == operators.windows.sessionize on
    the same data (once every session is past the watermark)."""
    src, ckpt, out = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    rows = [
        (1, _m(0), 1, "click", 1.0),
        (2, _m(5), 1, "click", 2.0),
        (3, _m(30), 1, "view", 0.0),   # gap 25 min > 10 → new session
        (4, _m(0), 2, "view", 0.0),
        (5, _m(9), 2, "purchase", 9.0),  # within gap → same session
    ]
    spark.createDataFrame(rows, EVENTS_DDL).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)
    # advance watermark far enough to close everything, then tick timeouts
    spark.createDataFrame(
        [(6, _m(10000), 99, "view", 0.0)], EVENTS_DDL
    ).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)
    _run_once(spark, src, ckpt, out)

    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).filter(F.col("user_id") != 99).collect()
    }

    batch = windows.sessionize(
        spark.createDataFrame(rows, EVENTS_DDL), "user_id", "ts", 600
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in (
            batch.groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    assert streamed == expected


def test_dedup_stream_drops_duplicates_within_watermark(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    rows = [
        (1, _m(0), 1, "click", 0.0),
        (1, _m(0), 1, "click", 0.0),   # exact dup, same batch
        (2, _m(1), 1, "view", 0.0),
    ]
    spark.createDataFrame(rows, EVENTS_DDL).write.mode("append").parquet(src)
    q = (
        dedup_stream(
            spark.readStream.schema(EVENTS_DDL).parquet(src),
            ["event_id"],
            watermark="5 minutes",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [r["event_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(ids) == [1, 2]


def test_dedup_stream_matches_batch_exact_dedup_twin(spark, tmp_path):
    """Streamed dedup output == operators.dedup.exact_dedup on the union of
    all batches — in-batch AND cross-batch duplicates (within the watermark
    horizon) collapse to the same surviving row set as the batch twin."""
    from ml_feature_store_pipeline_spark.operators import dedup as batch_dedup

    src, ckpt, out = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    b1 = [
        (1, _m(0), 1, "click", 0.0),
        (1, _m(0), 1, "click", 0.0),   # in-batch dup
        (2, _m(1), 1, "view", 0.0),
    ]
    b2 = [
        (1, _m(0), 1, "click", 0.0),   # cross-batch dup, inside watermark
        (3, _m(2), 2, "view", 4.0),
    ]

    def run() -> None:
        q = (
            dedup_stream(
                spark.readStream.schema(EVENTS_DDL).parquet(src),
                ["event_id"],
                watermark="30 minutes",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(b1, EVENTS_DDL).write.mode("append").parquet(src)
    run()
    spark.createDataFrame(b2, EVENTS_DDL).write.mode("append").parquet(src)
    run()

    streamed = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    twin = batch_dedup.exact_dedup(
        spark.createDataFrame(b1 + b2, EVENTS_DDL),
        ["ts", "user_id", "event_type", "value"],
        "event_id",
    )
    expected = sorted(tuple(r) for r in twin.collect())
    assert streamed == expected


def test_stream_stream_interval_join_attribution(spark, tmp_path):
    """Purchases attribute to the view they follow within 30 min, same user;
    later purchases and other users don't match."""
    from ml_feature_store_pipeline_spark.streaming import join_streams

    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "purch")
    views = [
        (1, _m(0), 1, "view", 0.0),
        (2, _m(0), 2, "view", 0.0),
        (3, _m(100), 1, "view", 0.0),
    ]
    purchases = [
        (10, _m(10), 1, "purchase", 9.0),    # within 30 min of view 1
        (11, _m(90), 2, "purchase", 5.0),    # 90 min after view 2 → no match
        (12, _m(110), 1, "purchase", 7.0),   # within 30 min of view 3
    ]
    spark.createDataFrame(views, EVENTS_DDL).write.parquet(vsrc)
    spark.createDataFrame(purchases, EVENTS_DDL).write.parquet(psrc)

    v = spark.readStream.schema(EVENTS_DDL).parquet(vsrc).select(
        F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts"), "user_id"
    )
    p = spark.readStream.schema(EVENTS_DDL).parquet(psrc).select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts"),
        F.col("user_id"), F.col("value"),
    )
    joined = join_streams(
        v, p, key="user_id", left_ts="view_ts", right_ts="purchase_ts",
        max_delay="30 minutes",
    ).select("view_id", "purchase_id", "value")
    q = joined.writeStream.outputMode("append").format("memory").queryName("attr").start()
    try:
        q.processAllAvailable()
        got = {(r["view_id"], r["purchase_id"]) for r in spark.sql("SELECT * FROM attr").collect()}
    finally:
        q.stop()
    assert got == {(1, 10), (3, 12)}


def test_incremental_near_dup_sink_links_across_batches(spark, tmp_path):
    """Continuous near-dup: batch 2's docs must pair against batch 1's
    standing signatures without recomputing them, and a replayed epoch
    overwrites its own output (idempotent recovery)."""
    from ml_feature_store_pipeline_spark.streaming.ingest import incremental_near_dup_sink

    sig_path = str(tmp_path / "sigs")
    pairs_path = str(tmp_path / "pairs")
    sink = incremental_near_dup_sink(sig_path, pairs_path)

    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = spark.createDataFrame(
        [(0, text_a), (1, text_a), (2, "totally different words here every one unique")],
        "doc_id long, text string",
    )
    sink(b1, 0)
    first = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert (0, 1) in first  # within-batch duplicate found on the first epoch

    b2 = spark.createDataFrame([(100, text_a)], "doc_id long, text string")
    sink(b2, 1)
    both = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_path).collect()}
    # cross-batch: the new doc links to BOTH standing duplicates
    assert (0, 100) in both and (1, 100) in both
    # and epoch 0's output is untouched
    assert first <= both

    # replaying epoch 1 (checkpoint recovery) is idempotent
    sink(b2, 1)
    again = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert again == both
    # the signature store holds exactly one row per doc seen
    sigs = spark.read.parquet(sig_path)
    assert sigs.count() == 4


def test_bloom_dedup_sink_bounded_cross_epoch(spark, tmp_path):
    """Cross-epoch dedup through a persisted bloom bitmap: batch 2's
    repeats of batch 1's keys are dropped, novel keys pass, and the state
    stays at most n_bits/32 rows no matter how many keys stream through."""
    from ml_feature_store_pipeline_spark.streaming import bloom_dedup_sink

    src = str(tmp_path / "src")
    bloom = str(tmp_path / "bloom")
    out = str(tmp_path / "out")
    schema = "k long, v string"
    b1 = spark.createDataFrame([(1, "a"), (2, "b"), (2, "b2")], schema)  # 2 dup in-batch
    b2 = spark.createDataFrame([(2, "b3"), (3, "c"), (1, "a2")], schema)  # 2,1 seen; 3 new
    b1.write.parquet(src)

    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(bloom_dedup_sink(bloom, out, "k", n_bits=1 << 12))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == [1, 2]
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    assert sorted(r["k"] for r in rows) == [1, 2, 3]
    # bounded state: the bitmap can never exceed n_bits/32 words
    assert spark.read.parquet(bloom).count() <= (1 << 12) // 32


def test_native_session_window_stream_matches_batch(spark, tmp_path):
    """The streaming session aggregation's CLOSED sessions must equal the
    batch session_window_agg rows over the same events — the backfill
    contract the operator docstrings claim."""
    from ml_feature_store_pipeline_spark.streaming import (
        streaming_session_aggregation,
    )

    src, ckpt, out = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")

    def run_once():
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        q = (
            streaming_session_aggregation(
                stream, key_col="user_id", value_col="value",
                ts_col="ts", gap="10 minutes", watermark="0 seconds",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [
        (1, _m(0), 1, "click", 1.0),
        (2, _m(2), 1, "purchase", 2.0),   # merges with the first (gap 2m)
        (3, _m(30), 2, "view", 5.0),      # separate user
    ]
    spark.createDataFrame(b1, EVENTS_DDL).write.mode("append").parquet(src)
    run_once()
    # advance the watermark far past both sessions' closes
    b2 = [(4, _m(600), 99, "view", 0.0)]
    spark.createDataFrame(b2, EVENTS_DDL).write.mode("append").parquet(src)
    run_once()
    run_once()  # extra tick so the final watermark commit emits stragglers

    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch = windows.session_window_agg(
        spark.createDataFrame(b1 + b2, EVENTS_DDL), "user_id", "ts",
        "10 minutes", "value",
    )
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["total_value"])
        for r in batch.collect()
        if r["user_id"] != 99  # user 99's session is still open in the stream
    }
    assert want  # sanity: the batch side produced the closed sessions
    for k, v in want.items():
        assert got[k] == v, k
