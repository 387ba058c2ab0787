"""Deterministic sampling/split: partition-stability, disjointness, accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(F.col("id").alias("key"))


def test_sample_stable_under_repartitioning(spark, ids):
    a = {r["key"] for r in sampling.deterministic_sample(ids, "key", 0.1).collect()}
    b = {
        r["key"]
        for r in sampling.deterministic_sample(ids.repartition(13), "key", 0.1).collect()
    }
    assert a == b
    assert len(a) == pytest.approx(500, rel=0.15)


def test_split_is_disjoint_and_exhaustive(spark, ids):
    train, test = sampling.train_test_split(ids, "key", 0.2)
    tr = {r["key"] for r in train.collect()}
    te = {r["key"] for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == 5000
    assert len(te) == pytest.approx(1000, rel=0.15)


def test_split_column_agrees_with_split_frames(spark, ids):
    train, test = sampling.train_test_split(ids, "key", 0.2)
    te = {r["key"] for r in test.collect()}
    labeled = ids.withColumn("split", sampling.split_column(F.col("key"), 0.2))
    assert {r["key"] for r in labeled.filter(F.col("split") == "test").collect()} == te


def test_split_assignment_is_growth_stable(spark, ids):
    """A key's side must not change when the table doubles — the property
    that prevents train/test leakage over time."""
    _, test_small = sampling.train_test_split(ids.limit(1000), "key", 0.2)
    _, test_big = sampling.train_test_split(ids, "key", 0.2)
    small = {r["key"] for r in test_small.collect()}
    big = {r["key"] for r in test_big.collect()}
    assert small == {k for k in big if k < 1000}


def test_salt_gives_independent_samples(spark, ids):
    a = {r["key"] for r in sampling.deterministic_sample(ids, "key", 0.1, salt="a").collect()}
    b = {r["key"] for r in sampling.deterministic_sample(ids, "key", 0.1, salt="b").collect()}
    # independent ⇒ overlap ≈ 1% of rows, certainly nowhere near identical
    assert len(a & b) < len(a) / 2


def test_stratified_sample_respects_fractions(spark):
    df = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("stratum")
    )
    out = sampling.stratified_sample(df, "stratum", {"true": 0.5, "false": 0.1})
    counts = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["true"] == pytest.approx(1000, rel=0.2)
    assert counts["false"] == pytest.approx(200, rel=0.35)


def test_fold_column_partitions_keys_evenly(spark, ids):
    from ml_feature_store_pipeline_spark.operators.sampling import fold_column

    labeled = ids.withColumn("fold", fold_column(F.col("key"), 5))
    counts = {r["fold"]: r["n"] for r in labeled.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert all(c == pytest.approx(1000, rel=0.15) for c in counts.values())
    # deterministic: same assignment on recompute
    again = {r["key"]: r["fold"] for r in labeled.collect()}
    redo = {r["key"]: r["fold"] for r in ids.repartition(7).withColumn("fold", fold_column(F.col("key"), 5)).collect()}
    assert again == redo


def test_stratified_deterministic_nested_and_default(spark):
    rows = [(i, "a" if i % 2 == 0 else ("b" if i % 4 == 1 else "c")) for i in range(4000)]
    df = spark.createDataFrame(rows, "key long, cls string")
    small = sampling.stratified_sample_deterministic(
        df, "key", "cls", {"a": 0.1, "b": 0.5}, default_fraction=0.0
    )
    big = sampling.stratified_sample_deterministic(
        df, "key", "cls", {"a": 0.3, "b": 1.0}, default_fraction=0.2
    )
    s = {(r["key"], r["cls"]) for r in small.collect()}
    b = {(r["key"], r["cls"]) for r in big.collect()}
    assert s <= b                                # growing fractions nest the sample
    assert not any(c == "c" for _, c in s)       # default 0.0 drops unlisted strata
    by_cls = {}
    for _, c in b:
        by_cls[c] = by_cls.get(c, 0) + 1
    assert by_cls["b"] == 1000                   # fraction 1.0 keeps the whole stratum
    assert by_cls["a"] == pytest.approx(600, rel=0.2)
    assert by_cls["c"] == pytest.approx(200, rel=0.3)


def test_stratified_deterministic_stable_under_repartition(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "key long, cls string")
    frac = {"a": 0.25, "b": 0.75}
    one = {r["key"] for r in
           sampling.stratified_sample_deterministic(df, "key", "cls", frac).collect()}
    two = {r["key"] for r in
           sampling.stratified_sample_deterministic(df.repartition(17), "key", "cls", frac).collect()}
    assert one == two
