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


def swap_in(spark: SparkSession, tmp: str, path: str, expected_rows: int) -> None:
    """Validate `tmp` then swap it over `path`.

    The new directory is read back (footer + row count) BEFORE touching
    the live table, and the backup is deleted only after the new data is
    confirmed in place — a crash mid-swap leaves either the old table at
    `path` or a recoverable `<path>.old`. Concurrent readers between the
    two renames see ENOENT (documented: plain parquet has no atomic swap;
    a table format with a metadata pointer is the 100 TB answer).
    """
    got = spark.read.parquet(tmp).count()
    if got != expected_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise IOError(
            f"swap aborted: rewrite at {tmp} has {got} rows, expected "
            f"{expected_rows}; live table untouched"
        )
    backup = path.rstrip("/") + ".old"
    os.rename(path, backup)
    os.rename(tmp, path)
    if not os.path.isdir(path):  # paranoia before destroying the backup
        os.rename(backup, path)
        raise IOError(f"swap failed: {path} missing after rename; restored backup")
    shutil.rmtree(backup)


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
    # the merged plan is deterministic, so its count is the expected count
    # of the rewrite; computing it from the ORIGINAL inputs (not the tmp
    # dir) makes the validation independent of the write we're checking
    expected = merged.count()
    swap_in(spark, tmp, path, expected)
