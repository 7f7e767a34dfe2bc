"""Parquet catalog over the driver test tables.

The reference's only "catalog" is a directory-of-files image corpus whose
label is encoded in the path (reference: generator.py:8-34). Our engine's
catalog is a flat Parquet directory per scale factor; Spark gets schema,
column pruning, and predicate pushdown from the Parquet footers for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain `spark.read.parquet` so Catalyst keeps
    pushdown/pruning; callers should `.select()` early so ReadSchema stays
    narrow at 100 TB."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to TIMESTAMP_NTZ — in ONE place, for every
    storage variant the driver testdata has used:

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
      read raw nanos as long (legacy conf, which only affects NANOS
      fields) and truncate to micros — the same ns→µs truncation DuckDB
      applies.
    - parquet TIMESTAMP(µs) without timezone: Spark reads TIMESTAMP_NTZ
      natively; pass through.
    - tz-aware TIMESTAMP: cast to NTZ (the session timezone is pinned to
      UTC in session.py, so the cast is value-preserving).

    TIMESTAMP_NTZ is the canonical type because it is exactly what DuckDB
    reads for naive parquet timestamps — oracle twins then agree on both
    values AND type (the driver's value hash is type-sensitive)."""
    from pyspark.sql import functions as F

    # nanosAsLong is set at session build (session.py); this defensive
    # idempotent set covers sessions built outside get_spark. It only
    # affects TIMESTAMP(NANOS) parquet fields, nothing else.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":  # TIMESTAMP(NANOS) footer read as raw nanos
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    elif ts_type == "timestamp":  # tz-aware storage; UTC session => no-op cast
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def validate_required_schema(df: DataFrame, required: dict[str, str]) -> DataFrame:
    """Schema-on-read with REQUIRED fields — the reference's
    parse_single_example with FixedLenFeatures and no defaults errors on
    any missing key (P1, data_queue.py:15-23). Raises ValueError listing
    every missing/mistyped column; returns df unchanged when valid, so it
    composes as a pass-through assertion at pipeline boundaries."""
    actual = dict(df.dtypes)
    problems = []
    for name, dtype in required.items():
        if name not in actual:
            problems.append(f"missing required column {name!r} ({dtype})")
        elif actual[name] != dtype:
            problems.append(
                f"column {name!r}: expected {dtype}, found {actual[name]}"
            )
    if problems:
        raise ValueError("schema validation failed: " + "; ".join(problems))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
