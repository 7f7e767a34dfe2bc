"""Hive-style partitioned parquet layout + partition pruning.

The reference's only layout trick is contiguous shard files (S6). The
columnar-era equivalent is directory partitioning on a low-cardinality
predicate column: a filter on the partition column never opens
non-matching files — at 100 TB, the difference between scanning a day
and scanning a decade. tests/test_plans.py asserts the PartitionFilters
actually appear and prune the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_by_date(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """events -> parquet partitioned by event_date (derived from ts)."""
    from tf_datapipeline_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out_dir)
    return out_dir


def read_events_day(spark: SparkSession, out_dir: str, day: str) -> DataFrame:
    """One day's slice; the event_date predicate becomes a PartitionFilter
    (directory pruning), not a row filter."""
    return spark.read.parquet(out_dir).filter(F.col("event_date") == day)


def partition_dirs(out_dir: str) -> list[str]:
    return sorted(
        d for d in os.listdir(out_dir) if d.startswith("event_date=")
    )
