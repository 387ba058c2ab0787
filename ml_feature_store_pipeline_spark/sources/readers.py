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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver test table (TESTDATA.md): ``{sf_dir}/{name}.parquet``."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
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
