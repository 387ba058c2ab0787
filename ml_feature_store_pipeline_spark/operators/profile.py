"""ANALYZE-style table profiling: per-column statistics in one pass.

The reference scores data quality over a fixed feature frame (SURVEY §2.C
C9–C13); this is the generic form every warehouse keeps next to a table —
null counts, cardinalities, ranges per column — emitted long-format so the
profile of any table is itself a small queryable table (join it across
snapshots for drift, feed `drift.key_skew_profile` candidates, pick
bucketing keys).

Scale shape: ONE aggregation over the input computes every column's
statistics (a wide single-row aggregate, partial-aggregated map-side),
then a literal ``stack`` unpivots to long format — the table is scanned
once no matter how many columns are profiled. Exact ``count_distinct``
per column adds one expand pass per column (the oracle-parity mode);
``approximate=True`` swaps in HLL sketches, which collapse back into the
single aggregation — the 100 TB default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark type names treated as numeric (profiled with min/max as double).
_NUMERIC = {"byte", "short", "integer", "long", "float", "double", "decimal"}


def table_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approximate: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """Per-column profile: one row per column with
    ``(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str)``. Numeric + timestamp columns fill ``min_num``/``max_num``
    (timestamps as epoch seconds); strings fill ``min_str``/``max_str``;
    the other pair is NULL."""
    fields = {f.name: f.dataType.typeName() for f in df.schema.fields}
    names = cols or list(fields)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        t = fields[c]
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}"))
        # rsd=0.01 (vs Spark's 0.05 default): the profile's distincts feed
        # capacity planning, so a tight sketch (~a few KB per column) is
        # the right trade; still one partial-merged pass, no expand
        nd = F.approx_count_distinct(col, rsd) if approximate else F.countDistinct(col)
        aggs.append(nd.cast("long").alias(f"__nd_{c}"))
        if t in _NUMERIC or t.startswith("decimal"):
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
        elif t == "timestamp":
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
        elif t == "string":
            aggs.append(F.min(col).alias(f"__min_{c}"))
            aggs.append(F.max(col).alias(f"__max_{c}"))
        else:  # arrays/structs/binary: counts only
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)

    rows = []
    for c in names:
        t = fields[c]
        is_str = t == "string"
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.lit(None).cast("double") if is_str else F.col(f"__min_{c}").cast("double")).alias("min_num"),
                (F.lit(None).cast("double") if is_str else F.col(f"__max_{c}").cast("double")).alias("max_num"),
                (F.col(f"__min_{c}") if is_str else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"__max_{c}") if is_str else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def table_profile_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`table_profile` (exact mode). ``cols`` is
    ``(name, kind)`` with kind in {"num", "ts", "str", "other"}."""
    parts = []
    for name, kind in cols:
        if kind == "num":
            mn, mx = f"CAST(MIN({name}) AS DOUBLE)", f"CAST(MAX({name}) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            mn, mx = f"epoch(MIN({name}))", f"epoch(MAX({name}))"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "str":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"MIN({name})", f"MAX({name})"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        parts.append(
            f"""SELECT '{name}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
            CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
            {mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str
            FROM {table}"""
        )
    return " UNION ALL ".join(parts)
