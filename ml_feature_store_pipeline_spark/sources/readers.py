"""Sources: schema-explicit readers (SURVEY §2.A).

The reference's only source is a CSV scan with timestamp parsing
(`ML Feature Store Pipeline.py:623`). Here every read is schema-explicit
(no inference job, no surprise types) and parquet-first — columnar,
pushdown-friendly, and splittable, which is what a 100 TB scan needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import RAW_EVENTS_SCHEMA, TESTDATA_TABLES

#: The driver's parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
#: Spark's vectorized reader rejects. We read nanos as longs
#: (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild TimestampType via
#: integer µs division — deterministic truncation, matching how DuckDB
#: narrows nanos to its µs timestamps.
TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

#: (application id, sf_dir, table) -> scan partition count, so the
#: ``parallelize`` probe plans each scan once per session, not per query.
#: Keyed by applicationId (not id(spark)): CPython reuses object ids after
#: GC, so a new SparkSession could alias a dead session's cached probe.
_SCAN_PARTITIONS: dict[tuple[str, str, str], int] = {}

#: (application id, sf_dir, table) -> row count: one column-pruned count
#: job per session feeds row-proportional parallelism caps (the
#: Python-boundary decode queries' knee — see harness `_par_rows`).
_TABLE_ROWS: dict[tuple[str, str, str], int] = {}


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Session-cached row count of one test table. The first call pays a
    column-pruned count job; the cache is keyed by applicationId so a new
    session re-probes. This is a size PROBE (like ``_SCAN_PARTITIONS``),
    never a result cache — every query still computes from the parquet."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _TABLE_ROWS:
        _TABLE_ROWS[key] = read_table(spark, sf_dir, name).count()
    return _TABLE_ROWS[key]


def read_table(
    spark: SparkSession, sf_dir: str, name: str, *, parallelize: bool = False
) -> DataFrame:
    """Read one driver test table (TESTDATA.md): ``{sf_dir}/{name}.parquet``.

    ``parallelize=True`` round-robin-repartitions up to the cluster's default
    parallelism when the scan yields fewer partitions — the testdata tables
    are single-row-group files, so a scan is one task no matter how small
    ``maxPartitionBytes`` goes, and any CPU-heavy work fused into the scan
    stage (decimal aggregation, regex, hashing) serializes onto one core. On
    a real multi-file 100 TB table the scan already has >= cores partitions
    and this is a no-op — the guard exists so the rescue never adds an
    exchange where the layout is healthy. Filter pushdown and column pruning
    survive the repartition (Catalyst pushes through RepartitionOperation;
    asserted in test_plans.py).
    """
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if parallelize:
        target = spark.sparkContext.defaultParallelism
        key = (spark.sparkContext.applicationId, sf_dir, name)
        if key not in _SCAN_PARTITIONS:  # probe plans the scan; cache it
            _SCAN_PARTITIONS[key] = df.rdd.getNumPartitions()
        if _SCAN_PARTITIONS[key] < target:
            df = df.repartition(target)
    for c in TIMESTAMP_COLS.get(name, ()):
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            # NANOS column read as long: integer `div`, not `/` — nanos
            # exceed double's 2^53 mantissa
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # MICROS (isAdjustedToUTC=false) reads as NTZ; session TZ is UTC
            # so the cast is value-preserving
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def read_csv_events(
    spark: SparkSession, path: str, schema: T.StructType = RAW_EVENTS_SCHEMA
) -> DataFrame:
    """CSV scan with parsed timestamps (reference A1 `:623`) — explicit
    schema instead of ``parse_dates`` so no inference pass runs."""
    return (
        spark.read.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .schema(schema)
        .csv(path)
    )


def read_json_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType = RAW_EVENTS_SCHEMA,
    timestamp_format: str | None = None,
) -> DataFrame:
    """JSON-lines scan — schema-explicit for the same reason as CSV: at
    100 TB an inference pass is a full extra scan, and inferred types drift
    run-to-run. Default timestamp parsing is Spark's ISO-8601 (what
    ``write_json`` emits); pass ``timestamp_format`` for foreign feeds."""
    reader = spark.read.schema(schema)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. ORC carries its schema and supports the same predicate
    pushdown / column pruning as parquet — no explicit schema needed."""
    return spark.read.orc(path)
