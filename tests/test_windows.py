"""Window operator tests: top-n, running aggregates, lag/lead, sessionize."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import windows


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_top_n_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id long, v double",
    )
    out = windows.top_n_per_group(df, ["g"], "v", 2, tiebreak_cols=["id"])
    got = {(r["g"], r["id"]) for r in out.collect()}
    assert got == {("a", 2), ("a", 3), ("b", 4)}


def test_top_n_tiebreak_deterministic(spark):
    df = spark.createDataFrame([("a", i, 1.0) for i in range(5)], "g string, id long, v double")
    out = windows.top_n_per_group(df, ["g"], "v", 2, tiebreak_cols=["id"])
    assert sorted(r["id"] for r in out.collect()) == [0, 1]


def test_running_agg(spark):
    df = spark.createDataFrame([("a", 1, 10.0), ("a", 2, 5.0), ("a", 3, 1.0)], "g string, o long, v double")
    out = windows.running_agg(df, ["g"], "o", "v")
    got = {r["o"]: r["running"] for r in out.collect()}
    assert got == {1: 10.0, 2: 15.0, 3: 16.0}


def test_lag_lead(spark):
    df = spark.createDataFrame([("a", 1, 10.0), ("a", 2, 20.0)], "g string, o long, v double")
    rows = {r["o"]: r for r in windows.with_lag_lead(df, ["g"], "o", "v").collect()}
    assert rows[1]["prev_value"] is None and rows[1]["next_value"] == 20.0
    assert rows[2]["prev_value"] == 10.0 and rows[2]["next_value"] is None


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, ts("2024-01-01 10:00:00")),
        (1, ts("2024-01-01 10:10:00")),  # 10 min gap → same session
        (1, ts("2024-01-01 11:30:00")),  # 80 min gap → new session
        (2, ts("2024-01-01 09:00:00")),  # other user: own session numbering
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = windows.sessionize(df, "user_id", "ts", gap_seconds=1800)
    got = sorted((r["user_id"], r["ts"].isoformat(), r["session_id"]) for r in out.collect())
    assert [g[2] for g in got if g[0] == 1] == [1, 1, 2]
    assert [g[2] for g in got if g[0] == 2] == [1]


def test_sessionize_exact_gap_not_new_session(spark):
    rows = [(1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 10:30:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = windows.sessionize(df, "user_id", "ts", gap_seconds=1800)
    # gap == threshold is NOT > threshold → same session
    assert {r["session_id"] for r in out.collect()} == {1}
