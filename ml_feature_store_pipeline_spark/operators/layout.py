"""Multi-dimensional data layout (Z-order) for scan pruning.

Parquet pruning is only as good as the min/max stats per file/row-group,
and those are only tight for columns the data is SORTED by. A linear sort
gives perfect pruning on its leading column and none on the others.
Interleaving the bits of several columns' bucket ids (a Z-/Morton curve)
gives every interleaved column locality, so selective filters on ANY of
them skip most files — the layout trick behind Delta/Iceberg `ZORDER BY`,
here as a plain DataFrame → partitioned-write recipe.

Everything is Column expressions (codegen): per-column fixed-width bucket
ids from a broadcast min/max row, bit interleave via shifts/ors, then
``repartitionByRange`` + ``sortWithinPartitions`` on the z-value. One
range exchange (with Spark's sampling job) — the same cost as any global
sort layout, but pruning-effective on all dimensions at once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims × 16 bits = 32-bit z-values (fits a long
#: comfortably and gives 65k buckets per dimension — far finer than any
#: realistic file count)
DEFAULT_BITS = 16


def _bucket_id(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Fixed-width bucket id in [0, 2^bits): rank-free normalization from a
    broadcast (min, max) — no window, no second shuffle. Degenerate range
    (min == max) maps to bucket 0; nulls sort first (bucket 0)."""
    span = mx.cast("double") - mn.cast("double")
    frac = F.when(span > 0, (col.cast("double") - mn.cast("double")) / span).otherwise(F.lit(0.0))
    scaled = F.least(
        F.floor(frac * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )
    return F.coalesce(F.greatest(scaled, F.lit(0)), F.lit(0))


def zvalue(bucket_ids: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave: bit j of dimension i lands at position
    ``j * ndims + i``. A static unrolled expression — ``bits × ndims``
    shift/or terms, all inside whole-stage codegen."""
    ndims = len(bucket_ids)
    z = F.lit(0).cast("long")
    for i, b in enumerate(bucket_ids):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * ndims + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` to ``path`` laid out along the Z-curve of ``cols``.

    Plan: one tiny min/max agg (broadcast), z-value projection,
    ``repartitionByRange(n_files, z)`` (range exchange; Spark samples
    bounds) + ``sortWithinPartitions(z)`` so row-group stats inside each
    file are tight too. The z column is dropped before writing — layout is
    invisible to readers except through pruning.
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use a plain sort for 1")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    ranges = df.agg(*aggs)
    buckets = [
        _bucket_id(F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits)
        for c in cols
    ]
    out = (
        df.crossJoin(F.broadcast(ranges))
        .withColumn("__z", zvalue(buckets, bits))
        .select(*df.columns, "__z")
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(path)


def training_shards(
    df: DataFrame,
    key_col: str,
    *,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
    order_within: bool = True,
) -> DataFrame:
    """Deterministic training-export sharding: every row gets
    ``shard = md5-bucket(key) ∈ [0, n_shards)`` and (optionally) a
    within-shard ``shard_order`` — the md5 of the key again, so rows read
    back in shard_order are GLOBALLY SHUFFLED relative to any source
    ordering yet bit-reproducibly so. This is the standard trainer-facing
    layout: epoch-0 data order is fixed across pipeline reruns (loss
    curves comparable), shards are balanced (~N/n_shards ± √N), and a
    trainer can own shard ranges without coordination.

    Pure codegen column derivations — the shard assignment itself costs
    no shuffle; :func:`write_training_shards` pays exactly one exchange
    to co-locate shards for the partitioned write."""
    from .sampling import hash_bucket
    from .sketches import hash_fraction

    key = F.col(key_col)
    out = df.withColumn(shard_col, hash_bucket(key, n_shards, salt))
    if order_within:
        out = out.withColumn(
            "shard_order", hash_fraction(F.concat(F.lit(salt), F.lit("ord"), key.cast("string")))
        )
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    *,
    n_shards: int,
    salt: str = "",
) -> None:
    """Materialize :func:`training_shards` as ``shard=K/`` parquet
    directories, rows sorted by the deterministic ``shard_order`` within
    each file: ONE repartition exchange on the shard id (so each shard is
    one writer task's output, no small-file explosion), then a
    sort-within-partitions (no second exchange). Readers stream
    ``path/shard=K`` in file order and see the reproducible global
    shuffle."""
    sharded = training_shards(df, key_col, n_shards=n_shards, salt=salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        # leading `shard` matters: the partitioned writer REQUIRES its
        # output ordered by the partition columns and would insert its own
        # (order-destroying) sort otherwise; with the shard prefix our sort
        # already satisfies the requirement and survives to the files
        .sortWithinPartitions("shard", "shard_order")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def pruning_audit(
    df: DataFrame,
    layouts: dict[str, Column],
    predicate_col: Column,
    predicates: DataFrame,
    *,
    n_files: int = 16,
    round_digits: int = 6,
) -> DataFrame:
    """Min/max scan-pruning simulator — the measurement that decides a
    table's sort layout BEFORE paying the rewrite: for each candidate
    ``layouts[name]`` sort expression, rows are assigned to ``n_files``
    simulated files by the sort column's EXACT percentile boundaries
    (what a range-partitioned sorted write produces), each file keeps
    min/max of ``predicate_col`` (what parquet footers keep), and each
    predicate in ``predicates`` — rows (pred_id, lo, hi), matching
    ``lo ≤ p < hi`` — counts the files whose [min, max] it cannot skip.

    Per (layout, predicate): (layout, pred_id, lo, hi, n_files,
    files_scanned, rows_scanned, prune_frac). A layout sorted by the
    predicate column prunes ~(1 − selectivity); an uncorrelated layout
    prunes ~0 — the gap is the rewrite's worth. ``n_files`` in the OUTPUT
    is the count of OBSERVED (non-empty) simulated files, which can fall
    below the ``n_files`` parameter when heavy sort-key duplication lands
    several percentile boundaries on the same value (empty ranges produce
    no file, exactly as a range-partitioned writer would emit none).
    An empty ``layouts`` dict raises ``ValueError`` — there is no audit
    to run, and a silent ``None`` return would defer the failure to the
    caller's first method call.

    Exactness: boundaries are one exact interpolated-percentile
    aggregate per layout (broadcast back); file assignment counts
    boundaries strictly below the value (identical double comparisons);
    everything after is integer counts and one rounded ratio.

    Scale shape: per layout ONE scan with a broadcast boundary array +
    one combinable (file)-keyed min/max/count aggregate — no global
    sort, no ntile window (the audit costs a scan; the sorted WRITE it
    evaluates costs the range exchange). The |files|×|predicates|
    overlap join is dimension-sized.
    """
    if not layouts:
        raise ValueError("pruning_audit requires at least one candidate layout")
    fr = [k / n_files for k in range(1, n_files)]
    out = None
    for name, sort_col in layouts.items():
        keyed = df.select(
            sort_col.cast("double").alias("__k"), predicate_col.alias("__p")
        ).filter(F.col("__k").isNotNull())
        bounds = keyed.agg(
            F.expr(f"percentile(__k, array({', '.join(repr(f) for f in fr)}))").alias(
                "__bs"
            )
        )
        files = (
            keyed.crossJoin(F.broadcast(bounds))
            .select(
                F.aggregate(
                    F.col("__bs"),
                    F.lit(0),
                    lambda acc, b: acc + (F.col("__k") > b).cast("int"),
                ).alias("__file"),
                F.col("__p"),
            )
            .groupBy("__file")
            .agg(
                F.min("__p").alias("__mn"),
                F.max("__p").alias("__mx"),
                F.count(F.lit(1)).cast("long").alias("__rows"),
            )
        )
        hit = (F.col("__mx") >= F.col("lo")) & (F.col("__mn") < F.col("hi"))
        audit = (
            files.crossJoin(F.broadcast(predicates))
            .groupBy("pred_id", "lo", "hi")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(hit.cast("long")).cast("long").alias("files_scanned"),
                F.sum(F.when(hit, F.col("__rows")).otherwise(F.lit(0)))
                .cast("long")
                .alias("rows_scanned"),
                F.round(
                    1.0 - F.sum(hit.cast("long")) / F.count(F.lit(1)), round_digits
                ).alias("prune_frac"),
            )
            .select(F.lit(name).alias("layout"), "pred_id", "lo", "hi",
                    "n_files", "files_scanned", "rows_scanned", "prune_frac")
        )
        out = audit if out is None else out.unionByName(audit)
    return out
