"""Physical-plan inspection: the tooling behind "is this the plan you'd
want at 100 TB?".

Wraps ``df._jdf.queryExecution()`` so tests (and humans) can assert the
properties that matter at scale — filters reached the parquet scan, the
projection was pruned, small sides broadcast, aggregations have a map-side
partial phase, and the plan doesn't shuffle more than it must.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` output (scan details incl. PushedFilters)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (empty = nothing pushed)."""
    text = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema — checks column pruning."""
    text = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            if ":" in field:
                cols.append(field.split(":")[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the aggregate runs partial (map-side) → final — Catalyst's
    automatic combiner. Absent only for plans where partials are impossible
    (e.g. exact distinct re-expansion still shows two HashAggregate levels)."""
    plan = executed_plan(df)
    return len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)) >= 2


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = better, usually)."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", executed_plan(df)))


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen regions the plan compiled — wider spans
    mean more of the plan runs as generated JVM code.

    AQE wraps the plan and hides codegen markers until execution, so the
    count is taken from an AQE-off re-plan of the same logical plan (a
    no-op TRUE filter forces fresh planning under the toggled conf)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        replanned = df.where(F.lit(True))
        text = replanned._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
