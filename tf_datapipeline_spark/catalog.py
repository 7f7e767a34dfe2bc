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


# r11 optimization: memoize the DataFrame HANDLE per (session, dir,
# table). `spark.read.parquet` resolves schema by reading parquet
# footers on the DRIVER — measured ~0.11s per table, ~1.2s per
# register_views call — and the engine re-ran it for every query
# invocation (every bench pass, every gate row). The memo caches plan
# METADATA only (schema + file listing), exactly what a metastore
# catalog gives a production session: every action over the handle
# still scans the parquet from disk — no data, no results, nothing is
# persisted or cached across bench invocations (each bench run is a
# fresh session with a fresh applicationId key).
#
# STATIC-DATA ASSUMPTION (r11 advice): the memo pins schema AND the
# file listing at first read, so an in-session rewrite of the parquet
# at the same path would be invisible (or fail on deleted files). The
# driver corpus is generated once and read-only, and every engine write
# path targets scratch dirs outside the table roots; anything that DOES
# rewrite a table in place must call invalidate_caches() first.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def invalidate_caches() -> None:
    """Drop all memoized table handles and view registrations — the
    invalidation hook for any caller that mutates the catalog state
    (rewrites a table dir in place, or drops/replaces a temp view)."""
    _TABLE_MEMO.clear()
    _VIEWS_AT.clear()
    _SPLITS_MEMO.clear()


# scan split count per (session, dir, table) — one driver-side plan
# conversion each, reused by every adaptive-parallelism check below.
_SPLITS_MEMO: dict[tuple[str, str, str], int] = {}


def adaptive_scan_parallelism(
    spark: SparkSession, sf_dir: str, name: str = "documents"
) -> int:
    """Target partition count for a heavy per-row stream over `name`,
    or 0 when the scan already parallelizes.

    The guide §2.5 input-skew remedy, made SCALE-ADAPTIVE: a table
    stored as one small file (the local corpus: documents.parquet is a
    single 580 KB file with one row group) yields a ONE-TASK scan, so
    per-row-heavy streams (the md5-per-5-gram shingle explode, the
    winnow transform) serialize on one core no matter how many the
    session has. When the scan's split count is below the session's
    core count, callers repartition a SLIM pre-explode projection to
    `defaultParallelism` — the shuffle moves (once) an input that is
    small by the very condition that fired, and keyless round-robin
    repartition is deterministic (sortBeforeRepartition) with every
    consumer order-independent. At production scale the input has at
    least as many splits as cores and this returns 0: no shuffle is
    ever added where the scan already parallelizes. Measured (matched
    quiet window, tools/exp_sig.py): the MinHash signature build
    2.6 s → 0.85 s at sf0.1/local[32]."""
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
    )
    if key not in _SPLITS_MEMO:
        _SPLITS_MEMO[key] = load_table(
            spark, sf_dir, name
        ).rdd.getNumPartitions()
    cores = spark.sparkContext.defaultParallelism
    return cores if _SPLITS_MEMO[key] < cores else 0


def docs_scan_source(spark: SparkSession, sf_dir: str) -> str:
    """SQL source expression for `documents` feeding a heavy per-row
    stream: the bare table when its scan parallelizes, else a
    REPARTITION-hinted slim projection (hint BELOW any explode — an
    exchange above the explode would shuffle n_positions × text)."""
    n = adaptive_scan_parallelism(spark, sf_dir, "documents")
    if not n:
        return "documents"
    return f"(SELECT /*+ REPARTITION({n}) */ * FROM documents)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain `spark.read.parquet` so Catalyst keeps
    pushdown/pruning; callers should `.select()` early so ReadSchema stays
    narrow at 100 TB."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
    )
    if key not in _TABLE_MEMO:
        _TABLE_MEMO[key] = (
            _load_events(spark, sf_dir)
            if name == "events"
            else spark.read.parquet(table_path(sf_dir, name))
        )
    return _TABLE_MEMO[key]


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


# session applicationId -> sf_dir the global view names currently point
# at. Re-registration is only needed when the TARGET DIRECTORY changes
# (bench warms up on sf0.001 then times sf0.1; tests hop between scale
# dirs) — re-pointing identical views ate ~1.2s of driver-side footer
# re-reads per SQL-surface query invocation.
_VIEWS_AT: dict[str, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    app = spark.sparkContext.applicationId
    target = os.path.abspath(sf_dir)
    # r12 (r11 advice): the skip is only valid while ALL views are still
    # registered — a test (or any caller) that drops/replaces a view
    # in-session would otherwise leave later same-dir callers with a
    # missing or foreign view. tableExists is a local catalog lookup
    # (~ms for all 10), not a footer read, so the guard keeps the memo's
    # ~1.2s saving.
    if _VIEWS_AT.get(app) == target and all(
        spark.catalog.tableExists(name) for name in TABLES
    ):
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_AT[app] = target
