"""Point-in-time training-set assembly: correctness + staleness nulling."""

from __future__ import annotations

import datetime as dt

import pytest

from ml_feature_store_pipeline_spark.operators.pit import FeatureView, training_set


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    labels = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-10 00:00:00")),
            (2, 10, ts("2024-01-20 00:00:00")),
            (3, 20, ts("2024-01-10 00:00:00")),  # user with no features at all
        ],
        "label_id long, user_id long, ts timestamp",
    )
    feats = spark.createDataFrame(
        [
            (10, ts("2024-01-05 00:00:00"), 1.0),
            (10, ts("2024-01-10 00:00:00"), 2.0),  # exactly at label 1's ts
            (10, ts("2024-01-15 00:00:00"), 3.0),
        ],
        "user_id long, fts timestamp, score double",
    )
    return labels, feats


def test_inclusive_takes_equal_ts_row(spark, frames):
    labels, feats = frames
    out = training_set(
        labels,
        {"f": FeatureView(feats, "fts", ["score"])},
        key="user_id",
        label_ts="ts",
    ).collect()
    by_id = {r["label_id"]: r for r in out}
    assert by_id[1]["f__score"] == 2.0          # equal-ts row visible
    assert by_id[2]["f__score"] == 3.0          # latest before Jan 20
    assert by_id[3]["f__score"] is None         # no features for user 20
    assert by_id[3]["f__asof_ts"] is None


def test_strict_excludes_equal_ts_row(spark, frames):
    labels, feats = frames
    out = training_set(
        labels,
        {"f": FeatureView(feats, "fts", ["score"], strict=True)},
        key="user_id",
        label_ts="ts",
    ).collect()
    by_id = {r["label_id"]: r for r in out}
    assert by_id[1]["f__score"] == 1.0          # equal-ts row hidden → Jan 5 value


def test_staleness_nulls_values_keeps_audit_ts(spark, frames):
    labels, feats = frames
    out = training_set(
        labels,
        {"f": FeatureView(feats, "fts", ["score"])},
        key="user_id",
        label_ts="ts",
        staleness_seconds=3 * 86400.0,
    ).collect()
    by_id = {r["label_id"]: r for r in out}
    assert by_id[1]["f__score"] == 2.0                       # 0 days old → kept
    assert by_id[2]["f__score"] is None                      # 5 days old → nulled
    assert by_id[2]["f__asof_ts"] == ts("2024-01-15 00:00:00")  # audit col survives


def test_bucketed_training_set_equals_plain(spark, frames):
    labels, feats = frames
    views = {"f": FeatureView(feats, "fts", ["score"])}
    plain = training_set(labels, views, key="user_id", label_ts="ts")
    # 1-day buckets: label/feature pairs span buckets, so carry-forward is hit
    bucketed = training_set(
        labels, views, key="user_id", label_ts="ts", bucket_seconds=86_400
    )
    key = lambda r: r["label_id"]
    assert sorted(map(tuple, plain.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, bucketed.collect()), key=lambda t: t[0]
    )


def test_two_views_chain_without_column_clashes(spark, frames):
    labels, feats = frames
    other = spark.createDataFrame(
        [(10, ts("2024-01-01 00:00:00"), "bronze")],
        "user_id long, fts timestamp, tier string",
    )
    out = training_set(
        labels,
        {
            "a": FeatureView(feats, "fts", ["score"]),
            "b": FeatureView(other, "fts", ["tier"]),
        },
        key="user_id",
        label_ts="ts",
    )
    assert {"a__score", "a__asof_ts", "b__tier", "b__asof_ts"} <= set(out.columns)
    by_id = {r["label_id"]: r for r in out.collect()}
    assert by_id[1]["a__score"] == 2.0
    assert by_id[1]["b__tier"] == "bronze"
    assert by_id[3]["b__tier"] is None
