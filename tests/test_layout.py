"""Z-order layout: pruning effectiveness measured from real parquet stats."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators.layout import zorder_write, zvalue


def _files(path):
    return [os.path.join(path, n) for n in os.listdir(path) if n.endswith(".parquet")]


def _files_matching(path, col, lo, hi):
    """How many files COULD contain col in [lo, hi] per footer min/max —
    exactly the pruning decision a reader makes."""
    n = 0
    for f in _files(path):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(
                [md.row_group(rg).column(i).path_in_schema for i in range(md.num_columns)].index(col)
            ).statistics
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmax >= lo and fmin <= hi:
            n += 1
    return n


@pytest.fixture(scope="module")
def laid_out(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    # two independent uniform dims: x, y in [0, 1024)
    df = spark.range(200_000).select(
        (F.xxhash64("id") % 1024).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1024).alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))
    zpath, lpath = str(base / "zorder"), str(base / "linear")
    zorder_write(df, zpath, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)
    return zpath, lpath


def test_zorder_prunes_on_both_dimensions(laid_out):
    zpath, _ = laid_out
    total = len(_files(zpath))
    assert total >= 12  # repartitionByRange(16) may merge a couple
    # a 1/8-range filter on EITHER dim must skip at least half the files
    assert _files_matching(zpath, "x", 0, 127) <= total / 2
    assert _files_matching(zpath, "y", 0, 127) <= total / 2


def test_linear_sort_prunes_only_leading_dim(laid_out):
    _, lpath = laid_out
    total = len(_files(lpath))
    assert _files_matching(lpath, "x", 0, 127) <= max(total // 4, 2)
    # ...but the non-sorted dim is unprunable: every file matches
    assert _files_matching(lpath, "y", 0, 127) == total


def test_zorder_preserves_data(spark, laid_out):
    zpath, lpath = laid_out
    a = spark.read.parquet(zpath).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    ).collect()[0]
    b = spark.read.parquet(lpath).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3)], "a long, b long")
    out = df.select(
        zvalue([F.col("a"), F.col("b")], bits=2).alias("z")
    ).collect()
    # a occupies even bit positions, b odd: (1,0)->1, (0,1)->2, (3,3)->15
    assert [r["z"] for r in out] == [1, 2, 15]


def test_training_shards_balanced_reproducible_roundtrip(spark, tmp_path):
    """r7 training export: md5 shards are balanced and partition-
    independent; the written layout reads back complete with the
    reproducible within-shard order."""
    from pyspark.sql import functions as F

    from ml_feature_store_pipeline_spark.operators.layout import (
        training_shards,
        write_training_shards,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    a = training_shards(df, "doc_id", n_shards=8)
    b = training_shards(df.repartition(7), "doc_id", n_shards=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    sizes = {r["shard"]: r["n"] for r in a.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(sizes) == 8
    assert max(sizes.values()) < 2 * min(sizes.values())  # ~250 ± √250

    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=8)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert set(back.columns) >= {"doc_id", "text", "shard", "shard_order"}
    # within one shard file, rows are stored in shard_order (reproducible
    # global shuffle): reading in file order equals sorting by shard_order
    one = spark.read.parquet(f"{path}/shard=3")
    stored = [r["doc_id"] for r in one.collect()]
    expected = [r["doc_id"] for r in one.orderBy("shard_order").collect()]
    assert stored == expected



def test_pruning_audit_sorted_layout_prunes_uncorrelated_does_not(spark):
    """A layout sorted by the predicate column must skip most simulated
    files for a narrow range; a random layout must scan nearly all."""
    from pyspark.sql import functions as F

    from ml_feature_store_pipeline_spark.operators.layout import pruning_audit

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.xxhash64("id").alias("r"),
    )
    preds = spark.createDataFrame(
        [(0, 0, 256)], "pred_id int, lo long, hi long"
    )  # 1/16 of the key space
    out = {
        (row["layout"], row["pred_id"]): row
        for row in pruning_audit(
            df,
            {"by_key": F.col("k"), "by_random": F.col("r")},
            F.col("k"),
            preds,
            n_files=16,
        ).collect()
    }
    sorted_row, random_row = out[("by_key", 0)], out[("by_random", 0)]
    assert sorted_row["n_files"] == 16
    assert sorted_row["files_scanned"] == 1          # perfect pruning
    assert sorted_row["prune_frac"] == pytest.approx(15 / 16)
    assert random_row["files_scanned"] == 16         # no pruning
    assert random_row["prune_frac"] == pytest.approx(0.0)
    # row accounting: the sorted layout scans exactly the selected file
    assert sorted_row["rows_scanned"] == n // 16
