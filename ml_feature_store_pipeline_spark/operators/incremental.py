"""Incremental aggregate maintenance: mergeable per-key state tables.

At 100 TB the cardinal sin is rescanning history to refresh a feature.
The standard fix is an algebraic decomposition: keep a compact STATE table
of mergeable partial aggregates per key (count / sum / min / max / sum of
squares), fold each new batch into it with one groupBy, and finalize
(avg, stddev, ...) only at read time. Cost per refresh is O(batch) +
O(|state|), independent of history size — the same partial→final split
Spark's hash aggregate does within a query, lifted across queries.

All state columns are algebraic monoids (commutative, associative), so
merges are partition-order-independent and the decimal-sum recipe keeps
them bit-deterministic cross-engine. ``sum_sq`` uses decimals too: double
summation of squares is catastrophically order-sensitive.

Contract: ``finalize(merge(state(b1), state(b2), ...)) ==
finalize(state(b1 ∪ b2 ∪ ...))`` — pinned in tests/test_incremental.py
and by the ``incremental_user_value_stats`` oracle entry (the driver
compares a two-batch merge against DuckDB's single-pass aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decimal widths for the two running sums (matches functions.dsum).
_SUM_DEC = "decimal(38,4)"
_SUMSQ_DEC = "decimal(38,8)"


def aggregate_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One batch → per-key mergeable state:
    ``(keys..., n, n_nonnull, sum_v, sum_sq, min_v, max_v)``.

    A single partial-aggregated groupBy; nulls count toward ``n`` but not
    the moments (SQL aggregate semantics).
    """
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(v).alias("n_nonnull"),
        F.sum(v.cast(_SUM_DEC)).alias("sum_v"),
        F.sum((v.cast("double") * v.cast("double")).cast(_SUMSQ_DEC)).alias("sum_sq"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Fold any number of state tables into one (union + one groupBy).
    Every column is a monoid, so this is associative — merge daily states
    into monthly, monthly into total, in any order."""
    if not states:
        raise ValueError("need at least one state table")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("n", "n_nonnull", "sum_v", "sum_sq", "min_v", "max_v")]
    return out.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("n_nonnull").alias("n_nonnull"),
        F.sum("sum_v").alias("sum_v"),
        F.sum("sum_sq").alias("sum_sq"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """State → the user-facing aggregate row per key: count, sum, mean,
    min, max, population variance/stddev. Read-time-only math — the state
    table stays mergeable."""
    keys = [c for c in state.columns if c not in ("n", "n_nonnull", "sum_v", "sum_sq", "min_v", "max_v")]
    # cast the decimal sums to double BEFORE dividing (the davg recipe):
    # double/int64 division is IEEE-identical everywhere, while decimal
    # division scale rules differ across engines
    mean = F.col("sum_v").cast("double") / F.col("n_nonnull")
    ex2 = F.col("sum_sq").cast("double") / F.col("n_nonnull")
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))  # clamp float negatives
    return state.select(
        *keys,
        F.col("n").alias("n_rows"),
        F.col("sum_v").cast("double").alias("total"),
        F.when(F.col("n_nonnull") > 0, mean).alias("mean"),
        F.col("min_v").alias("min"),
        F.col("max_v").alias("max"),
        F.when(F.col("n_nonnull") > 0, var).alias("var_pop"),
    )


def distinct_state(df: DataFrame, keys: list[str], value_col: str, *, lg_k: int = 12) -> DataFrame:
    """One batch → per-key mergeable DISTINCT-COUNT state: an HLL sketch
    per key (Spark's native Datasketches ``hll_sketch_agg`` — a binary
    column of ≤ 2^lg_k registers). Exact distinct is the one aggregate the
    algebraic state table above cannot carry (it isn't a monoid on
    scalars); the sketch makes it one: states from disjoint batches union
    with :func:`merge_distinct_states` and estimate within HLL's published
    ~1.6%/√(2^lg_k) error, so a streaming sink can maintain per-key
    distincts over unbounded history in O(keys) space."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll")
    )


def merge_distinct_states(*states: DataFrame) -> DataFrame:
    """Union per-key sketches across batches (``hll_union_agg`` — HLL
    union is commutative/associative/idempotent, so replay and arbitrary
    batch grouping converge). Keys are inferred as every non-sketch
    column shared by the states."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "hll"]
    return out.groupBy(*keys).agg(F.hll_union_agg("hll").alias("hll"))


def finalize_distinct(state: DataFrame) -> DataFrame:
    """Per-key distinct estimates from the sketch state."""
    keys = [c for c in state.columns if c != "hll"]
    return state.select(
        *keys, F.hll_sketch_estimate("hll").alias("distinct_est")
    )
