"""Feature-engineering operators: binning, target encoding, hashed crosses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import fe


def test_quantile_bin_equal_population(spark):
    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    out = fe.quantile_bin(df, "v", n_bins=4)
    counts = {r["bin"]: r["n"] for r in out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    assert all(200 <= c <= 300 for c in counts.values())  # ~250 each
    # bins are monotone in v: max of bin i < min of bin i+1
    edges = out.groupBy("bin").agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
    by_bin = sorted([(r["bin"], r["lo"], r["hi"]) for r in edges])
    for (b1, _, hi1), (b2, lo2, _) in zip(by_bin, by_bin[1:]):
        assert hi1 < lo2


def test_quantile_bin_nulls_get_null_bin(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,), (4.0,)], "v double")
    out = fe.quantile_bin(df, "v", n_bins=2).collect()
    assert [r["bin"] for r in out if r["v"] is None] == [None]
    assert all(r["bin"] is not None for r in out if r["v"] is not None)


def test_target_encode_shrinks_rare_categories(spark):
    rows = [("big", 10.0)] * 100 + [("rare", 100.0)]
    df = spark.createDataFrame(rows, ["cat", "y"])
    enc = {r["cat"]: r["enc"] for r in fe.target_encode(df, "cat", "y", prior_weight=10.0).collect()}
    gmean = (100 * 10.0 + 100.0) / 101
    # the 1-row category lands much closer to the global mean than to 100
    assert abs(enc["rare"] - gmean) < abs(enc["rare"] - 100.0)
    # the 100-row category stays near its own mean
    assert abs(enc["big"] - 10.0) < 1.0


def test_target_encode_partition_invariant(spark):
    rows = [(f"c{i % 5}", float(i % 17)) for i in range(500)]
    df = spark.createDataFrame(rows, ["cat", "y"])
    a = sorted(map(tuple, fe.target_encode(df, "cat", "y").collect()))
    b = sorted(map(tuple, fe.target_encode(df.repartition(13), "cat", "y").collect()))
    assert a == b  # decimal-sum recipe: bit-identical under any partitioning


def test_hashed_cross_deterministic_and_bounded(spark):
    df = spark.createDataFrame([(i, f"t{i % 7}") for i in range(200)], ["uid", "etype"])
    b = fe.hashed_cross([F.col("etype"), F.col("uid") % 16], dim=64)
    out1 = df.select(b.alias("bucket")).collect()
    out2 = df.repartition(9).select(b.alias("bucket")).collect()
    assert sorted(r["bucket"] for r in out1) == sorted(r["bucket"] for r in out2)
    assert all(0 <= r["bucket"] < 64 for r in out1)
    # same tuple -> same bucket; null feature folds to empty string, no crash
    nulls = spark.createDataFrame([(None, "a"), (None, "a")], "uid long, etype string")
    nb = nulls.select(fe.hashed_cross([F.col("etype"), F.col("uid")], dim=64).alias("bucket")).collect()
    assert nb[0]["bucket"] == nb[1]["bucket"]


def test_quantile_bin_plan_broadcasts_bounds(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    plan = fe.quantile_bin(df, "v", n_bins=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan  # assignment must not shuffle the fact side


def test_quantile_bin_approximate_close_to_exact(spark):
    df = spark.range(10_000).select((F.col("id") % 997).cast("double").alias("v"))
    exact = {r["bin"]: r["n"] for r in fe.quantile_bin(df, "v", n_bins=4)
             .groupBy("bin").agg(F.count("*").alias("n")).collect()}
    approx = {r["bin"]: r["n"] for r in fe.quantile_bin(df, "v", n_bins=4, approximate=True)
              .groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(approx) == {0, 1, 2, 3}
    for b in exact:
        assert abs(approx[b] - exact[b]) <= 0.05 * 10_000  # within 5% mass


class TestDecayedFeatures:
    def test_decayed_agg_hand_computed(self, spark):
        """Two events 1 half-life apart: weights 1.0 and 0.5 at asof."""
        import datetime as dt

        from ml_feature_store_pipeline_spark.operators.fe import decayed_agg

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 10.0),                              # 2 half-lives before asof
            (1, t0 + dt.timedelta(hours=1), 20.0),      # 1 half-life before
            (1, t0 + dt.timedelta(hours=3), 99.0),      # AFTER asof — excluded
        ]
        df = spark.createDataFrame(rows, "k long, t timestamp, v double")
        out = decayed_agg(
            df, "k", "t", "v", half_life_seconds=3600.0,
            asof=t0 + dt.timedelta(hours=2),
        ).collect()[0]
        assert out["decayed_sum"] == round(10.0 * 0.25 + 20.0 * 0.5, 6)
        assert out["decayed_count"] == round(0.25 + 0.5, 6)

    def test_ewma_prior_matches_brute_force(self, spark):
        """Rescaled-cumsum EWMA == the O(n²) direct definition."""
        import datetime as dt
        import math

        from ml_feature_store_pipeline_spark.operators.fe import ewma_prior

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, i % 3, t0 + dt.timedelta(minutes=7 * i), float((i * 13) % 50))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "id long, k long, t timestamp, v double")
        got = {
            r["id"]: r["ewma_prior"]
            for r in ewma_prior(
                df, "k", "t", "v", half_life_seconds=1800.0, tie_col="id"
            ).collect()
        }
        hl = 1800.0
        for i, k, t, v in [(i, k, t0 + dt.timedelta(minutes=7 * i), float((i * 13) % 50)) for i, k in ((i, i % 3) for i in range(40))]:
            want = sum(
                vj * math.pow(0.5, (t - tj).total_seconds() / hl)
                for j, kj, tj, vj in ((j, j % 3, t0 + dt.timedelta(minutes=7 * j), float((j * 13) % 50)) for j in range(40))
                if kj == k and (tj, j) < (t, i)
            )
            assert abs(got[i] - round(want, 6)) < 1e-6, i

    def test_ewma_first_event_per_key_is_zero(self, spark):
        import datetime as dt

        from ml_feature_store_pipeline_spark.operators.fe import ewma_prior

        df = spark.createDataFrame(
            [(1, 7, dt.datetime(2024, 1, 1), 5.0)], "id long, k long, t timestamp, v double"
        )
        assert ewma_prior(df, "k", "t", "v", half_life_seconds=60.0, tie_col="id").collect()[0][
            "ewma_prior"
        ] == 0.0

    def test_ewma_stable_under_repartitioning(self, spark):
        import datetime as dt

        from ml_feature_store_pipeline_spark.operators.fe import ewma_prior

        rows = [
            (i, i % 2, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), float(i))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "id long, k long, t timestamp, v double")
        kw = dict(half_life_seconds=10.0, tie_col="id")
        a = sorted(map(tuple, ewma_prior(df, "k", "t", "v", **kw).collect()))
        b = sorted(map(tuple, ewma_prior(df.repartition(7), "k", "t", "v", **kw).collect()))
        assert a == b

    def test_ewma_pathological_span_raises_loudly(self, spark):
        """r7 guard: a 10-year history with a 1-hour half-life (~87,600
        half-lives of span, vs the documented ~900 doubling bound) must
        raise instead of silently rescaling through inf — and a span
        just under the bound must still compute."""
        import datetime as dt

        from ml_feature_store_pipeline_spark.operators.fe import (
            EWMA_SPAN_HALF_LIVES,
            ewma_prior,
        )

        bad = spark.createDataFrame(
            [
                (0, 1, dt.datetime(2014, 1, 1), 1.0),
                (1, 1, dt.datetime(2024, 1, 1), 2.0),
            ],
            "id long, k long, t timestamp, v double",
        )
        with pytest.raises(Exception, match="half-lives|half_life_seconds"):
            ewma_prior(bad, "k", "t", "v", half_life_seconds=3600.0, tie_col="id").collect()

        ok_span = dt.timedelta(seconds=3600.0 * (EWMA_SPAN_HALF_LIVES - 1))
        ok = spark.createDataFrame(
            [
                (0, 1, dt.datetime(2024, 1, 1), 1.0),
                (1, 1, dt.datetime(2024, 1, 1) + ok_span, 2.0),
            ],
            "id long, k long, t timestamp, v double",
        )
        rows = ewma_prior(
            ok, "k", "t", "v", half_life_seconds=3600.0, tie_col="id"
        ).collect()
        got = {r["id"]: r["ewma_prior"] for r in rows}
        assert got[0] == 0.0 and got[1] == pytest.approx(0.0, abs=1e-6)


class TestScalingEncoding:
    def test_standard_scale_hand_computed(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import standard_scale

        df = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "id long, v double")
        got = {r["id"]: r["v_z"] for r in standard_scale(df, ["v"]).collect()}
        assert got == {1: -1.0, 2: 0.0, 3: 1.0}  # sd_samp = 1.0

    def test_standard_scale_constant_column_maps_to_zero(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import standard_scale

        df = spark.createDataFrame([(1, 7.0), (2, 7.0), (3, None)], "id long, v double")
        got = {r["id"]: r["v_z"] for r in standard_scale(df, ["v"]).collect()}
        assert got == {1: 0.0, 2: 0.0, 3: None}

    def test_winsorize_clamps_both_tails(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import winsorize

        vals = [float(i) for i in range(1, 101)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = winsorize(df, ["v"], lower=0.10, upper=0.90).collect()
        lo = 1 + 0.10 * 99  # pandas-style linear interpolation on 1..100
        hi = 1 + 0.90 * 99
        got = sorted(r["v_w"] for r in out)
        assert got[0] == round(lo, 6) and got[-1] == round(hi, 6)
        assert all(round(lo, 6) <= x <= round(hi, 6) for x in got)

    def test_index_encode_frequency_order_and_oov(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import index_encode

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(["b"] * 5 + ["a"] * 5 + ["c"] * 2)],
            "id long, t string",
        )
        vocab, encoded = index_encode(df, "t")
        vv = {r["value"]: (r["n"], r["idx"]) for r in vocab.collect()}
        # count ties (a=5, b=5) break by value asc: a -> 0, b -> 1
        assert vv == {"a": (5, 0), "b": (5, 1), "c": (2, 2)}
        probe = spark.createDataFrame([(1, "c"), (2, "zz")], "id long, t string")
        _, enc2 = index_encode(df, "t", oov_index=None)
        got = {r["t"]: r["t_idx"] for r in enc2.collect()}
        assert got["c"] == 2
        # OOV routes to V on a fresh frame encoded against the same vocab rule
        _, enc3 = index_encode(df.unionByName(probe.filter(F.col("t") == "zz")), "t", min_count=2)
        got3 = {r["t"]: r["t_idx"] for r in enc3.collect()}
        assert got3["zz"] == 3  # below min_count -> out of vocab -> V=3

    def test_index_encode_stable_under_repartitioning(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import index_encode

        df = spark.createDataFrame(
            [(i, f"t{i % 17}") for i in range(200)], "id long, t string"
        )
        v1, _ = index_encode(df, "t")
        v2, _ = index_encode(df.repartition(13), "t")
        assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, v2.collect()))


def test_group_standard_scale_per_group_stats(spark):
    from ml_feature_store_pipeline_spark.operators.fe import group_standard_scale

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 10.0), (4, "b", 10.0)],
        "id long, g string, v double",
    )
    got = {r["id"]: r["v_gz"] for r in group_standard_scale(df, ["v"], by="g").collect()}
    # group a: mean 2, sd_samp sqrt(2) → ±0.707107; group b: zero variance → 0.0
    assert got[1] == -0.707107 and got[2] == 0.707107
    assert got[3] == 0.0 and got[4] == 0.0


class TestDecayedState:
    """r5 streaming counters: the mergeable re-referenced decayed state."""

    def _events(self, spark, rows):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        data = [(k, t0 + dt.timedelta(minutes=m), v) for k, m, v in rows]
        return spark.createDataFrame(data, "k long, t timestamp, v double"), t0

    def test_merge_matches_batch_recompute(self, spark):
        import datetime as dt

        from ml_feature_store_pipeline_spark.operators import fe

        rows = [(1, 0, 10.0), (1, 30, 20.0), (2, 10, 5.0), (1, 90, 40.0), (2, 70, 7.0), (3, 80, 1.0)]
        df, t0 = self._events(spark, rows)
        asof = t0 + dt.timedelta(minutes=120)
        hl = 1800.0

        batch_truth = {
            r["k"]: (r["decayed_sum"], r["decayed_count"])
            for r in fe.decayed_agg(df, "k", "t", "v", half_life_seconds=hl, asof=asof).collect()
        }
        b1 = df.filter(F.col("t") < t0 + dt.timedelta(minutes=60))
        b2 = df.filter(F.col("t") >= t0 + dt.timedelta(minutes=60))
        merged = fe.merge_decayed_states(
            fe.decayed_state(b1, "k", "t", "v", half_life_seconds=hl),
            fe.decayed_state(b2, "k", "t", "v", half_life_seconds=hl),
            "k",
            half_life_seconds=hl,
        )
        got = {
            r["k"]: (r["decayed_sum"], r["decayed_count"])
            for r in fe.finalize_decayed(merged, "k", half_life_seconds=hl, asof=asof).collect()
        }
        assert got == batch_truth

    def test_merge_is_order_independent(self, spark):
        from ml_feature_store_pipeline_spark.operators import fe

        rows = [(1, 0, 10.0), (1, 30, 20.0), (2, 10, 5.0), (1, 90, 40.0)]
        df, t0 = self._events(spark, rows)
        hl = 900.0
        s1 = fe.decayed_state(df.filter(F.col("v") < 15), "k", "t", "v", half_life_seconds=hl)
        s2 = fe.decayed_state(df.filter(F.col("v") >= 15), "k", "t", "v", half_life_seconds=hl)
        ab = fe.merge_decayed_states(s1, s2, "k", half_life_seconds=hl)
        ba = fe.merge_decayed_states(s2, s1, "k", half_life_seconds=hl)
        norm = lambda rs: sorted(
            (r["k"], round(r["ref_ts"], 6), round(r["dsum"], 6), round(r["dcnt"], 6))
            for r in rs.collect()
        )
        assert norm(ab) == norm(ba)

    def test_streaming_sink_equals_batch_over_epochs(self, spark, tmp_path):
        import datetime as dt

        from ml_feature_store_pipeline_spark.operators import fe
        from ml_feature_store_pipeline_spark.streaming.ingest import decayed_counter_sink

        rows = [(k, m, float(k * 10 + m % 7)) for k in (1, 2, 3) for m in range(0, 100, 10)]
        df, t0 = self._events(spark, rows)
        hl = 1200.0
        sink = decayed_counter_sink(
            str(tmp_path / "dstate"), key_col="k", ts_col="t",
            value_col="v", half_life_seconds=hl,
        )
        for e, lo in enumerate(range(0, 100, 25)):
            batch = df.filter(
                (F.col("t") >= t0 + dt.timedelta(minutes=lo))
                & (F.col("t") < t0 + dt.timedelta(minutes=lo + 25))
            )
            sink(batch, e)
        asof = t0 + dt.timedelta(minutes=200)
        state = spark.read.parquet(str(tmp_path / "dstate"))
        got = {
            r["k"]: r["decayed_sum"]
            for r in fe.finalize_decayed(state, "k", half_life_seconds=hl, asof=asof).collect()
        }
        want = {
            r["k"]: r["decayed_sum"]
            for r in fe.decayed_agg(df, "k", "t", "v", half_life_seconds=hl, asof=asof).collect()
        }
        assert got == want


class TestRobustAndOof:
    def test_robust_scale_hand_computed(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import robust_scale

        # 1..5: med=3, IQR=2 → values scale to (-1, -0.5, 0, 0.5, 1)
        df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "v double")
        got = sorted(r["v_r"] for r in robust_scale(df, ["v"]).collect())
        assert got == [-1.0, -0.5, 0.0, 0.5, 1.0]

    def test_robust_scale_ignores_extreme_outlier(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import robust_scale, standard_scale

        vals = [float(i) for i in range(1, 100)] + [1e9]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        robust = {r["v"]: r["v_r"] for r in robust_scale(df, ["v"]).collect()}
        z = {r["v"]: r["v_z"] for r in standard_scale(df, ["v"]).collect()}
        # the z-score of a typical value collapses ~10× toward 0 under the
        # corrupt point (0.86 without it); the robust scale doesn't move
        assert abs(z[75.0]) < 0.15
        assert abs(robust[75.0]) > 0.4

    def test_oof_excludes_own_fold_labels(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import target_encode_oof
        from ml_feature_store_pipeline_spark.operators.sampling import fold_column

        rows = [(i, "c", float(i % 2)) for i in range(60)]
        df = spark.createDataFrame(rows, "uid long, cat string, y double")
        enc = {
            r["fold"]: (r["n_oof"], r["enc"])
            for r in target_encode_oof(df, "cat", "y", "uid", k=3).collect()
        }
        folds = {
            r["f"]: r["n"]
            for r in df.groupBy(fold_column(F.col("uid"), 3).alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert set(enc) == set(folds)
        for f, n in folds.items():
            assert enc[f][0] == 60 - n  # own fold's rows excluded

    def test_oof_single_fold_category_encodes_to_prior(self, spark):
        from ml_feature_store_pipeline_spark.operators.fe import target_encode_oof
        from ml_feature_store_pipeline_spark.operators.sampling import fold_column

        # put a category entirely in one fold by keying folds on uid and
        # giving the rare category a single uid
        rows = [(i, "common", 1.0) for i in range(50)] + [(999, "rare", 0.0)]
        df = spark.createDataFrame(rows, "uid long, cat string, y double")
        out = target_encode_oof(df, "cat", "y", "uid", k=5).collect()
        rare = [r for r in out if r["cat"] == "rare"]
        # the rare category appears in exactly one fold row; with its own
        # fold excluded, n_oof = 0 and enc = the global-mean prior
        assert len(rare) == 1 and rare[0]["n_oof"] == 0
        gmean = 50.0 / 51.0
        assert rare[0]["enc"] == pytest.approx(gmean, abs=1e-6)


# ---------------------------------------------------------------------------
# trend slope (r7)
# ---------------------------------------------------------------------------


def test_trend_slope_matches_numpy_and_guards(spark):
    import datetime as dt

    import numpy as np

    from ml_feature_store_pipeline_spark.operators.fe import trend_slope

    b = dt.datetime(2023, 1, 1)
    rows = []
    # u1: noisy rising series — compare against numpy polyfit
    vals = [5.0, 9.1, 7.3, 12.8, 11.0, 16.2]
    for d, v in enumerate(vals):
        rows.append((1, b + dt.timedelta(days=d, hours=d % 3), v))
    # u2: constant value → slope 0; u3: one event → NULL; u4: two events
    # at the SAME timestamp → zero time variance → NULL
    rows += [(2, b + dt.timedelta(days=d), 4.5) for d in range(4)]
    rows += [(3, b, 1.0), (4, b, 2.0), (4, b, 9.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in trend_slope(df, "user_id", "ts", "value").collect()}
    ts1 = np.array([(dt.timedelta(days=d, hours=d % 3)).total_seconds() / 86400 for d in range(len(vals))])
    expect = np.polyfit(ts1, np.array(vals), 1)[0]
    assert abs(out[1]["slope_per_day"] - expect) < 1e-4
    assert out[2]["slope_per_day"] == 0.0
    assert out[3]["slope_per_day"] is None and out[3]["n_events"] == 1
    assert out[4]["slope_per_day"] is None


def test_trend_slope_partitioning_invariant(spark):
    import datetime as dt

    from ml_feature_store_pipeline_spark.operators.fe import trend_slope

    b = dt.datetime(2023, 1, 1)
    rows = [(i % 7, b + dt.timedelta(hours=i), float((i * 13) % 29)) for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    a = sorted((r["user_id"], r["slope_per_day"]) for r in trend_slope(df, "user_id", "ts", "value").collect())
    c = sorted((r["user_id"], r["slope_per_day"]) for r in trend_slope(df.repartition(17), "user_id", "ts", "value").collect())
    assert a == c


def test_ewma_null_timestamp_passes_span_guard(spark):
    """A row with a NULL timestamp must not trip the span guard
    (assert_true RAISES on a NULL condition rather than propagating
    NULL) — it contributes nothing and its own EWMA coalesces to 0.0,
    the pre-guard behavior."""
    import datetime as dt

    from ml_feature_store_pipeline_spark.operators.fe import ewma_prior

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (0, 1, t0, 10.0),
            (1, 1, t0 + dt.timedelta(seconds=60), 5.0),
            (2, 1, None, 7.0),
        ],
        "id long, k long, t timestamp, v double",
    )
    got = {
        r["id"]: r["ewma_prior"]
        for r in ewma_prior(df, "k", "t", "v", half_life_seconds=60.0, tie_col="id").collect()
    }
    assert got[2] == 0.0
    assert got[0] == 0.0  # NULL-ts row sorts first but contributes NULL z
    assert got[1] == 5.0  # 10 * 0.5^(60/60)


def test_calendar_features_iso_conventions(spark):
    import datetime as dt

    from ml_feature_store_pipeline_spark.operators.fe import calendar_features

    rows = [
        (1, dt.datetime(2024, 1, 6, 10, 30)),   # Saturday
        (2, dt.datetime(2024, 1, 7, 23, 0)),    # Sunday
        (3, dt.datetime(2024, 1, 8, 0, 0)),     # Monday
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = {r["id"]: r for r in calendar_features(df, "ts").collect()}
    assert out[1]["dow_iso"] == 6 and out[1]["is_weekend"] is True
    assert out[2]["dow_iso"] == 7 and out[2]["is_weekend"] is True
    assert out[3]["dow_iso"] == 1 and out[3]["is_weekend"] is False
    assert out[1]["hour"] == 10 and out[1]["week_iso"] == 1
    assert out[3]["week_iso"] == 2


def test_quantile_transform_uniform_and_ties(spark):
    from ml_feature_store_pipeline_spark.operators.fe import quantile_transform

    vals = [10.0, 20.0, 20.0, 30.0, None]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    out = {r["id"]: r["quantile"] for r in quantile_transform(df, "v", n_bands=2).collect()}
    # ranks: 10 -> 1, 20 -> 2.5 (tie avg), 30 -> 4; q = (r - 0.5)/4
    assert out[0] == pytest.approx((1 - 0.5) / 4)
    assert out[1] == out[2] == pytest.approx((2.5 - 0.5) / 4)
    assert out[3] == pytest.approx((4 - 0.5) / 4)
    assert out[4] is None


def test_woe_iv_hand_computed(spark):
    import math

    from ml_feature_store_pipeline_spark.operators.fe import woe_iv
    from pyspark.sql import functions as F

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 2 + [("b", 0)] * 8
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in woe_iv(df, "c", F.col("y") == 1).collect()}
    tp, tn, k, s = 10, 10, 2, 0.5
    for cat, (np_, nn) in {"a": (8, 2), "b": (2, 8)}.items():
        p = (np_ + s) / (tp + s * k)
        q = (nn + s) / (tn + s * k)
        assert out[cat]["woe"] == pytest.approx(math.log(p / q), abs=1e-6)
        assert out[cat]["iv_term"] == pytest.approx((p - q) * math.log(p / q), abs=1e-6)
    # symmetric design: woe(a) == -woe(b), iv terms equal
    assert out["a"]["woe"] == pytest.approx(-out["b"]["woe"], abs=1e-9)
    assert out["a"]["iv_term"] == pytest.approx(out["b"]["iv_term"], abs=1e-9)


def test_woe_iv_empty_cell_stays_finite(spark):
    from ml_feature_store_pipeline_spark.operators.fe import woe_iv
    from pyspark.sql import functions as F

    rows = [("a", 1)] * 5 + [("b", 0)] * 5  # a has zero negatives
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in woe_iv(df, "c", F.col("y") == 1).collect()}
    assert out["a"]["woe"] is not None and abs(out["a"]["woe"]) < 100


def test_count_encode_null_category_is_signal(spark):
    import math

    from ml_feature_store_pipeline_spark.operators.fe import count_encode

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None), (5, None), (6, None)],
        "id long, c string",
    )
    out = {r["id"]: r for r in count_encode(df, "c").collect()}
    assert out[1]["c_count"] == 2 and out[3]["c_count"] == 1
    # NULL level encodes from its own count — missingness is signal
    assert out[4]["c_count"] == 3
    assert out[4]["c_freq"] == pytest.approx(0.5)
    assert out[1]["c_log_count"] == pytest.approx(math.log(3), abs=1e-9)
    assert len(out) == 6  # no row duplication or loss through the join


def test_count_encode_builds_lazily_no_eager_scan(spark):
    """Plan construction must not launch a job: the _freq denominator is
    derived from the per-category counts aggregate, not an eager
    df.count() (r7 ADVICE — the eager count charged a full extra fact
    scan per call at plan-BUILD time)."""
    from ml_feature_store_pipeline_spark.operators.fe import count_encode

    sc = spark.sparkContext
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, c string")
    sc.setJobGroup("ce_lazy_probe", "count_encode plan build")
    try:
        out = count_encode(df, "c")  # build only — no action
        assert sc.statusTracker().getJobIdsForGroup("ce_lazy_probe") == []
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # and the derived denominator still yields the same frequencies
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["c_freq"] == pytest.approx(2 / 3)
    assert got[3]["c_freq"] == pytest.approx(1 / 3)
