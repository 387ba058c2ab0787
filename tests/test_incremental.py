"""Incremental aggregate maintenance: merge(partials) == full recompute."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import incremental


def _rows(df):
    return {
        tuple(r[k] for k in ("user_id",)): r.asDict() for r in df.collect()
    }


def test_merge_of_batches_equals_full_recompute(spark):
    data = [(i % 7, float(i) * 0.5 - 10) for i in range(1000)]
    df = spark.createDataFrame(data, "user_id long, value double")
    full = incremental.finalize(
        incremental.aggregate_state(df, ["user_id"], "value")
    )
    # three arbitrary batches, merged in a nested order (associativity)
    b1 = df.filter("value < -5")
    b2 = df.filter("value >= -5 AND value < 100")
    b3 = df.filter("value >= 100")
    s = lambda d: incremental.aggregate_state(d, ["user_id"], "value")
    merged = incremental.finalize(
        incremental.merge_states(incremental.merge_states(s(b1), s(b2)), s(b3))
    )
    f, m = _rows(full), _rows(merged)
    assert f.keys() == m.keys()
    for k in f:
        for col in ("n_rows", "total", "mean", "min", "max", "var_pop"):
            a, b = f[k][col], m[k][col]
            if isinstance(a, float):
                assert math.isclose(a, b, rel_tol=0, abs_tol=0), (k, col, a, b)
            else:
                assert a == b, (k, col)


def test_nulls_count_rows_not_moments(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, None), (1, 4.0)], "user_id long, value double"
    )
    out = incremental.finalize(
        incremental.aggregate_state(df, ["user_id"], "value")
    ).collect()[0]
    assert out["n_rows"] == 3
    assert out["total"] == 6.0
    assert out["mean"] == 3.0
    assert out["var_pop"] == 1.0


def test_all_null_group_yields_null_stats(spark):
    df = spark.createDataFrame([(1, None), (1, None)], "user_id long, value double")
    out = incremental.finalize(
        incremental.aggregate_state(df, ["user_id"], "value")
    ).collect()[0]
    assert out["n_rows"] == 2
    assert out["mean"] is None and out["var_pop"] is None
    assert out["min"] is None and out["max"] is None


def test_streaming_state_sink_equals_batch_recompute(spark, tmp_path):
    """Stream micro-batches through incremental_state_sink; the final
    finalized state must equal a one-pass batch aggregation of all data."""
    import datetime as dt

    from ml_feature_store_pipeline_spark.streaming.ingest import incremental_state_sink

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    schema = "user_id long, value double"
    b1 = spark.createDataFrame([(1, 2.0), (2, 8.0), (1, 4.0)], schema)
    b2 = spark.createDataFrame([(1, 6.0), (3, 1.0)], schema)
    b1.write.parquet(src)

    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(incremental_state_sink(state, ["user_id"], "value"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = incremental.finalize(spark.read.parquet(state))
    batch = incremental.finalize(
        incremental.aggregate_state(b1.unionByName(b2), ["user_id"], "value")
    )
    s = {r["user_id"]: r.asDict() for r in streamed.collect()}
    b = {r["user_id"]: r.asDict() for r in batch.collect()}
    assert s == b
    assert s[1]["mean"] == 4.0 and s[1]["n_rows"] == 3


class TestDistinctState:
    """r5: mergeable HLL distinct state — the one aggregate the scalar
    state table can't carry, made a monoid via sketches."""

    def test_merge_equals_single_pass_and_is_idempotent(self, spark):
        from ml_feature_store_pipeline_spark.operators import incremental

        df = spark.range(20_000).select(
            (F.col("id") % 5).alias("k"), (F.col("id") % 700).alias("v")
        )
        full = {
            r["k"]: r["distinct_est"]
            for r in incremental.finalize_distinct(
                incremental.distinct_state(df, ["k"], "v")
            ).collect()
        }
        s1 = incremental.distinct_state(df.filter(F.col("v") < 350), ["k"], "v")
        s2 = incremental.distinct_state(df.filter(F.col("v") >= 350), ["k"], "v")
        merged = {
            r["k"]: r["distinct_est"]
            for r in incremental.finalize_distinct(
                incremental.merge_distinct_states(s1, s2)
            ).collect()
        }
        assert merged == full
        # idempotent: re-merging an already-seen batch changes nothing
        again = {
            r["k"]: r["distinct_est"]
            for r in incremental.finalize_distinct(
                incremental.merge_distinct_states(
                    incremental.merge_distinct_states(s1, s2), s2
                )
            ).collect()
        }
        assert again == full

    def test_estimate_tracks_exact(self, spark):
        from ml_feature_store_pipeline_spark.operators import incremental

        df = spark.range(50_000).select(
            (F.col("id") % 3).alias("k"), (F.col("id") % 4099).alias("v")
        )
        exact = {
            r["k"]: r["d"]
            for r in df.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
        }
        est = {
            r["k"]: r["distinct_est"]
            for r in incremental.finalize_distinct(
                incremental.distinct_state(df, ["k"], "v")
            ).collect()
        }
        for k in exact:
            assert abs(est[k] - exact[k]) <= 0.03 * exact[k]

    def test_streaming_sink_maintains_state(self, spark, tmp_path):
        from ml_feature_store_pipeline_spark.operators import incremental
        from ml_feature_store_pipeline_spark.streaming.ingest import distinct_counter_sink

        df = spark.range(9_000).select(
            (F.col("id") % 4).alias("k"), (F.col("id") % 500).alias("v"),
            (F.col("id") % 3).alias("epoch"),
        )
        sink = distinct_counter_sink(str(tmp_path / "hll"), ["k"], "v")
        for e in range(3):
            sink(df.filter(F.col("epoch") == e).drop("epoch"), e)
        got = {
            r["k"]: r["distinct_est"]
            for r in incremental.finalize_distinct(
                spark.read.parquet(str(tmp_path / "hll"))
            ).collect()
        }
        want = {
            r["k"]: r["distinct_est"]
            for r in incremental.finalize_distinct(
                incremental.distinct_state(df.drop("epoch"), ["k"], "v")
            ).collect()
        }
        assert got == want
