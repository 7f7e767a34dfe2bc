"""Small-file compaction.

The reference argues for consolidated binary shards over scattered small
files (tutorial nb cell 5's disk-seek argument; S6's 5-shard layout). At
100 TB the same pathology appears as streaming/append jobs leaving
thousands of KB-scale parquet files per partition: every query pays
per-file open/footer costs and the scheduler drowns in splits. Compaction
rewrites a directory to ~target-sized files with one narrow job.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dir_data_size(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite `path` to ceil(data_size / target) parquet files; returns
    the new file count. Uses an overwrite of a sibling temp dir then an
    atomic-ish rename so readers never see a half-compacted directory."""
    from tf_datapipeline_spark.sources.upsert import swap_in

    n_files = max(1, math.ceil(dir_data_size(path) / target_file_bytes))
    tmp = path.rstrip("/") + ".compacting"
    df = spark.read.parquet(path)
    expected = df.count()
    # coalesce, not repartition: shrinking file count needs no shuffle
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    swap_in(spark, tmp, path, expected)
    return n_files
