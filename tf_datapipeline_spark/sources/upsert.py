"""Keyed upsert (MERGE) over a parquet directory.

Plain parquet has no transactional MERGE; the engine-level pattern is
read → anti-join out replaced keys → union updates → rewrite → swap
(same swap discipline as compaction.py so readers never see a partial
table). At 100 TB you'd scope the rewrite to affected partitions
(partition-pruned read + per-partition overwrite) or use a table format
with merge-on-read; the key-matching semantics below are identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(
    spark: SparkSession, path: str, updates: DataFrame, key_cols: list[str]
) -> None:
    """MERGE semantics: rows in `updates` replace target rows with the
    same key; unmatched update rows are inserted; other target rows are
    untouched. Schemas must match."""
    target = spark.read.parquet(path)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(updates)
    tmp = path.rstrip("/") + ".upserting"
    merged.write.mode("overwrite").parquet(tmp)
    backup = path.rstrip("/") + ".old"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
