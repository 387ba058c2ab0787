"""Feature-engineering operators: binning, target encoding, hashed crosses."""

from __future__ import annotations

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
