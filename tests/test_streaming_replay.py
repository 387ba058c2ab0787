"""Replay idempotency (exactly-once) for every ``foreachBatch`` state sink.

``foreachBatch`` is at-least-once: when a sink's write lands but the
query's checkpoint commit doesn't, Spark re-delivers the SAME micro-batch
with the SAME ``epoch_id`` on restart. A sink folding a non-idempotent
merge (sum/count partials, decayed counters) must therefore no-op on a
replayed epoch, or the state silently double-counts forever — the exact
failure the batch-twin equivalence tests can never catch, because they
only ever deliver each batch once.

Two layers here:

1. direct-call replay tests — invoke ``write(batch, epoch)`` twice (the
   replay contract distilled) and assert the state/output is unchanged;
2. a kill-and-resume soak — a real checkpointed file-source stream,
   stopped mid-run, with the newest ``commits/<id>`` file deleted to
   simulate the crash-between-swap-and-commit window; on restart Spark
   genuinely re-runs that epoch, and the recovered state must equal the
   one-pass batch recompute over all (out-of-order) events.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import fe, incremental
from ml_feature_store_pipeline_spark.streaming.ingest import (
    bloom_dedup_sink,
    decayed_counter_sink,
    incremental_state_sink,
    upsert_sink,
)

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)
SCHEMA = "user_id long, ts timestamp, value double"


def _df(spark, triples):
    rows = [(u, BASE + dt.timedelta(minutes=m), float(v)) for (u, m, v) in triples]
    return spark.createDataFrame(rows, SCHEMA)


def _state_snapshot(spark, path, drop=()):
    df = spark.read.parquet(path).drop(*drop)
    return sorted(tuple(r) for r in df.collect())


def test_incremental_state_sink_ignores_replayed_epoch(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _df(spark, [(1, 0, 2.0), (2, 1, 8.0), (1, 2, 4.0)])
    b1 = _df(spark, [(1, 3, 6.0), (3, 4, 1.0)])
    sink = incremental_state_sink(state, ["user_id"], "value")
    sink(b0, 0)
    sink(b1, 1)
    before = _state_snapshot(spark, state)
    sink(b1, 1)  # replay: same epoch re-delivered after a lost commit
    assert _state_snapshot(spark, state) == before
    # an epoch OLDER than the marker can't come from this stream (Spark
    # only re-delivers the newest uncommitted batch) — it means a new
    # query with a fresh checkpoint is reusing the state dir, and a
    # silent no-op would discard its batches; the guard raises instead
    with pytest.raises(ValueError, match="different streaming query"):
        sink(b0, 0)
    assert _state_snapshot(spark, state) == before
    # and the state still equals the batch recompute (nothing was lost)
    got = {
        r["user_id"]: (r["n_rows"], r["total"])
        for r in incremental.finalize(spark.read.parquet(state)).collect()
    }
    assert got == {1: (3, 12.0), 2: (1, 8.0), 3: (1, 1.0)}


def test_decayed_counter_sink_ignores_replayed_epoch(spark, tmp_path):
    state = str(tmp_path / "dstate")
    hl = 600.0
    b0 = _df(spark, [(1, 0, 10.0), (2, 5, 20.0)])
    b1 = _df(spark, [(1, 30, 5.0), (3, 40, 7.0)])
    sink = decayed_counter_sink(
        state, key_col="user_id", ts_col="ts", value_col="value",
        half_life_seconds=hl,
    )
    sink(b0, 0)
    sink(b1, 1)
    before = _state_snapshot(spark, state)
    sink(b1, 1)  # without the guard this doubles dsum/dcnt for users 1,3
    assert _state_snapshot(spark, state) == before
    asof = BASE + dt.timedelta(minutes=60)
    got = {
        r["user_id"]: r["decayed_sum"]
        for r in fe.finalize_decayed(
            spark.read.parquet(state), "user_id", half_life_seconds=hl, asof=asof
        ).collect()
    }
    want = {
        r["user_id"]: r["decayed_sum"]
        for r in fe.decayed_agg(
            b0.unionByName(b1), "user_id", "ts", "value",
            half_life_seconds=hl, asof=asof,
        ).collect()
    }
    assert got == pytest.approx(want)


def test_fresh_query_token_resets_guard_and_folds_new_stream(spark, tmp_path):
    """A NEW logical stream (fresh checkpoint → epochs restart at 0) can
    fold into existing state by passing a fresh query_token: the guard
    resets instead of discarding (or raising on) the restarted epochs,
    and replay dedup keeps working under the new token."""
    state = str(tmp_path / "state")
    b0 = _df(spark, [(1, 0, 2.0), (2, 1, 8.0)])
    b1 = _df(spark, [(1, 3, 6.0)])
    incremental_state_sink(state, ["user_id"], "value", query_token="runA")(b0, 0)
    incremental_state_sink(state, ["user_id"], "value", query_token="runA")(b0, 1)
    # new stream, same state dir, fresh token: its epoch 0 must APPLY
    sink_b = incremental_state_sink(state, ["user_id"], "value", query_token="runB")
    sink_b(b1, 0)
    got = {
        r["user_id"]: (r["n_rows"], r["total"])
        for r in incremental.finalize(spark.read.parquet(state)).collect()
    }
    assert got == {1: (3, 10.0), 2: (2, 16.0)}
    # and the guard now belongs to runB: replaying its epoch 0 no-ops
    before = _state_snapshot(spark, state)
    sink_b(b1, 0)
    assert _state_snapshot(spark, state) == before
    # advance runB, then a stale runB epoch is a foreign-stream signal
    sink_b(b1, 1)
    with pytest.raises(ValueError, match="different streaming query"):
        sink_b(b1, 0)


def _windowed(spark, triples):
    """Rows shaped like streaming_feature_aggregation output (window struct)."""
    df = _df(spark, triples)
    win = F.window(F.col("ts"), "5 minutes")
    return df.groupBy(win.alias("window"), "user_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum("value").alias("total_amount"),
    )


def test_upsert_sink_replay_overwrites_same_epoch_dir(spark, tmp_path):
    store = str(tmp_path / "feature_table")
    b0 = _windowed(spark, [(1, 0, 10.0), (1, 1, 0.0), (2, 2, 30.0)])
    sink = upsert_sink(store)
    sink(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    sink(b0, 0)  # replayed epoch lands on the same directory, not appended
    assert sorted(tuple(r) for r in spark.read.parquet(store).collect()) == once
    out = spark.read.parquet(store)
    assert {"window_start", "window_end", "epoch_id", "user_id"} <= set(out.columns)
    assert out.count() == 2


def test_upsert_sink_raises_on_foreign_store_reuse(spark, tmp_path):
    """Per-epoch directories are keyed by epoch id alone, so a NEW query
    (fresh checkpoint → epochs restart at 0) reusing the store path would
    overwrite earlier epochs' features — the marker detects it and raises
    instead of silently corrupting the table."""
    store = str(tmp_path / "feature_table")
    b0 = _windowed(spark, [(1, 0, 10.0), (2, 2, 30.0)])
    sink = upsert_sink(store, query_token="runA")
    sink(b0, 0)
    sink(b0, 1)
    with pytest.raises(ValueError, match="different streaming query"):
        upsert_sink(store, query_token="runB")(b0, 0)
    with pytest.raises(ValueError, match="different streaming query"):
        sink(b0, 0)  # stale epoch from a restored checkpoint backup
    # the table is untouched: both epochs still present
    assert spark.read.parquet(store).count() == 4


def test_bloom_dedup_sink_replay_exactly_once(spark, tmp_path):
    bloom = str(tmp_path / "bloom")
    out = str(tmp_path / "out")
    schema = "k long, v string"
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    b1 = spark.createDataFrame([(2, "b2"), (3, "c")], schema)
    sink = bloom_dedup_sink(bloom, out, "k", n_bits=1 << 12)
    sink(b0, 0)
    # simulate the crash window: keep a copy of the PRE-b1 bitmap so we can
    # roll back to "output written, bitmap swap not committed"
    pre_b1_bitmap = str(tmp_path / "bloom_pre_b1")
    shutil.copytree(bloom, pre_b1_bitmap)
    sink(b1, 1)
    expect = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert expect == [1, 2, 3]

    # (a) replay after FULL commit: marker is at epoch 1 → complete no-op
    sink(b1, 1)
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == [1, 2, 3]

    # (b) replay after PARTIAL commit (output written, swap lost): restore
    # the pre-batch bitmap; the re-run must recompute the same novel set
    # and overwrite the same epoch dir — no duplicates, no rows lost as
    # "already seen" (the old append-then-swap form failed both ways)
    shutil.rmtree(bloom)
    shutil.copytree(pre_b1_bitmap, bloom)
    sink(b1, 1)
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    assert spark.read.parquet(bloom).count() <= (1 << 12) // 32


def test_distinct_counter_sink_replay_skips_redundant_merge(spark, tmp_path):
    """HLL union is idempotent, so replay was already CORRECT — the guard
    just turns the re-union into a no-op. State must be byte-stable."""
    from ml_feature_store_pipeline_spark.operators import incremental
    from ml_feature_store_pipeline_spark.streaming.ingest import distinct_counter_sink

    state = str(tmp_path / "hll")
    schema = "k long, v long"
    b0 = spark.createDataFrame([(1, 10), (1, 11), (2, 10)], schema)
    b1 = spark.createDataFrame([(1, 11), (1, 12), (3, 99)], schema)
    sink = distinct_counter_sink(state, ["k"], "v")
    sink(b0, 0)
    sink(b1, 1)
    before = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    sink(b1, 1)
    assert sorted(tuple(r) for r in spark.read.parquet(state).collect()) == before
    got = {
        r["k"]: r["distinct_est"]
        for r in incremental.finalize_distinct(spark.read.parquet(state)).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1}  # exact at these tiny cardinalities


def test_cdc_merge_sink_guard_noops_on_same_epoch(spark, tmp_path):
    """The epoch guard (vs merge_changes' own idempotency, covered in
    test_cdc.py): a re-delivered epoch with the SAME id returns before any
    job runs, leaving the snapshot directory untouched."""
    import os

    from ml_feature_store_pipeline_spark.streaming.ingest import cdc_merge_sink

    snap = str(tmp_path / "snap")
    schema = "k long, name string, op string"
    b0 = spark.createDataFrame([(1, "a", "upsert"), (2, "b", "upsert")], schema)
    sink = cdc_merge_sink(snap, ["k"])
    sink(b0, 0)
    mtime = os.path.getmtime(snap)
    files = sorted(os.listdir(snap))
    sink(b0, 0)  # same epoch: guard short-circuits, no swap happens
    assert os.path.getmtime(snap) == mtime and sorted(os.listdir(snap)) == files
    assert {r["k"] for r in spark.read.parquet(snap).collect()} == {1, 2}


def _run_available_now(spark, src, ckpt, batch_fn):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_kill_and_resume_soak_state_equals_batch_recompute(spark, tmp_path):
    """The genuine failure path, end to end: a checkpointed stream is
    stopped, its newest commit file deleted (crash after the state swap,
    before the checkpoint commit), and restarted — Spark re-runs that
    epoch with the same id. With the epoch guard the recovered state
    equals the one-pass batch recompute; without it, epoch 1's events
    would be double-counted."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    dstate = str(tmp_path / "dstate")
    hl = 900.0

    def both_sinks(batch, epoch_id):
        incremental_state_sink(state, ["user_id"], "value")(batch, epoch_id)
        decayed_counter_sink(
            dstate, key_col="user_id", ts_col="ts", value_col="value",
            half_life_seconds=hl,
        )(batch, epoch_id)

    b0 = [(1, 0, 2.0), (2, 10, 8.0)]
    b1 = [(1, 5, 4.0), (3, 2, 1.0)]   # out-of-order: earlier than b0's max
    b2 = [(2, 40, 6.0), (3, 0, 3.0)]  # 3@minute-0 arrives two batches late

    _df(spark, b0).write.parquet(src)
    _run_available_now(spark, src, ckpt, both_sinks)            # epoch 0
    _df(spark, b1).write.mode("append").parquet(src)
    _run_available_now(spark, src, ckpt, both_sinks)            # epoch 1

    # the kill: epoch 1's state swaps landed, its checkpoint commit didn't
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # Hadoop local-FS checksum sidecar
        os.remove(crc)

    _run_available_now(spark, src, ckpt, both_sinks)            # REPLAYS epoch 1
    _df(spark, b2).write.mode("append").parquet(src)
    _run_available_now(spark, src, ckpt, both_sinks)            # epoch 2

    allrows = _df(spark, b0 + b1 + b2)
    got = {
        r["user_id"]: (r["n_rows"], r["total"])
        for r in incremental.finalize(spark.read.parquet(state)).collect()
    }
    want = {
        r["user_id"]: (r["n_rows"], r["total"])
        for r in incremental.finalize(
            incremental.aggregate_state(allrows, ["user_id"], "value")
        ).collect()
    }
    assert got == want

    asof = BASE + dt.timedelta(minutes=120)
    got_d = {
        r["user_id"]: (r["decayed_sum"], r["decayed_count"])
        for r in fe.finalize_decayed(
            spark.read.parquet(dstate), "user_id", half_life_seconds=hl, asof=asof
        ).collect()
    }
    want_d = {
        r["user_id"]: (r["decayed_sum"], r["decayed_count"])
        for r in fe.decayed_agg(
            allrows, "user_id", "ts", "value", half_life_seconds=hl, asof=asof
        ).collect()
    }
    assert set(got_d) == set(want_d)
    for k in want_d:
        assert got_d[k] == pytest.approx(want_d[k], abs=1e-6)


def test_bloom_dedup_sink_raises_on_foreign_path_reuse(spark, tmp_path):
    """The survivor output is keyed by epoch id alone, so a NEW stream
    (fresh checkpoint, epochs restart at 0) reusing the paths would
    silently overwrite epoch=0's survivors — foreign reuse must raise
    and leave both the output and the bitmap untouched."""
    from ml_feature_store_pipeline_spark.streaming.ingest import bloom_dedup_sink

    bloom = str(tmp_path / "bloom")
    out = str(tmp_path / "out")
    schema = "k long, v string"
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    sink = bloom_dedup_sink(bloom, out, "k", n_bits=1 << 12, query_token="runA")
    sink(b0, 0)
    sink(spark.createDataFrame([(3, "c")], schema), 1)
    fresh = spark.createDataFrame([(9, "z")], schema)
    with pytest.raises(ValueError, match="different streaming query"):
        bloom_dedup_sink(bloom, out, "k", n_bits=1 << 12, query_token="runB")(fresh, 0)
    with pytest.raises(ValueError, match="different streaming query"):
        sink(b0, 0)  # stale epoch from a restored checkpoint backup
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == [1, 2, 3]
