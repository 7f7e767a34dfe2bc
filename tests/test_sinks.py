"""Metrics-log sink (S10/S11 analog) and required-schema validation (P1)."""

from __future__ import annotations

import shutil

import pytest

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark.catalog import load_table, validate_required_schema
from tf_datapipeline_spark.sources.etl import scratch_dir
from tf_datapipeline_spark.sources.metrics import MetricsLog


def test_metrics_log_append_and_rollup(spark):
    path = scratch_dir("metrics_log/x").rsplit("/", 1)[0]
    shutil.rmtree(path, ignore_errors=True)
    log = MetricsLog(path)
    log.append(spark, "run1", [(0, 1, "loss", 2.0), (0, 2, "loss", 1.0)])
    log.append(spark, "run1", [(1, 3, "loss", 0.5), (1, 3, "acc", 0.9)])
    log.append(spark, "run2", [(0, 1, "loss", 9.0)])

    assert log.read(spark).count() == 5
    summary = {
        (r.epoch, r.metric): r for r in log.epoch_summary(spark, "run1").collect()
    }
    assert summary[(0, "loss")].mean_value == 1.5
    assert summary[(0, "loss")].n_steps == 2
    assert summary[(1, "acc")].mean_value == 0.9
    assert (0, "loss") in summary and len(summary) == 3


def test_required_schema_passes_and_fails(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = validate_required_schema(
        li, {"l_orderkey": "bigint", "l_quantity": "double"}
    )
    assert out is li
    with pytest.raises(ValueError, match="missing required column 'nope'"):
        validate_required_schema(li, {"nope": "bigint"})
    with pytest.raises(ValueError, match="expected string, found double"):
        validate_required_schema(li, {"l_quantity": "string"})


def test_compaction_reduces_files_preserves_rows(spark):
    import os

    from tf_datapipeline_spark.sources.compaction import compact_parquet_dir

    path = scratch_dir("compact_me/x").rsplit("/", 1)[0]
    shutil.rmtree(path, ignore_errors=True)
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.repartition(40).write.mode("overwrite").parquet(path)  # 40 tiny files
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    rows_before = spark.read.parquet(path).count()
    n = compact_parquet_dir(spark, path)
    after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before == 40 and after == n < 10
    assert spark.read.parquet(path).count() == rows_before


def test_upsert_parquet_merge_semantics(spark):
    from tf_datapipeline_spark.sources.upsert import upsert_parquet

    path = scratch_dir("upsert_me/x").rsplit("/", 1)[0]
    shutil.rmtree(path, ignore_errors=True)
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k bigint, name string, v double"
    ).write.mode("overwrite").parquet(path)

    updates = spark.createDataFrame(
        [(2, "b2", 22.0), (9, "z", 90.0)], "k bigint, name string, v double"
    )
    upsert_parquet(spark, path, updates, ["k"])
    rows = {r.k: r for r in spark.read.parquet(path).collect()}
    assert set(rows) == {1, 2, 3, 9}
    assert rows[2].name == "b2" and rows[2].v == 22.0  # replaced
    assert rows[1].v == 10.0 and rows[3].v == 30.0  # untouched
    assert rows[9].name == "z"  # inserted

    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema mismatch"):
        upsert_parquet(spark, path, updates.drop("v"), ["k"])


def test_approx_percentile_tracks_exact(spark):
    """The sketch-based quantile (the 100 TB path) must track q27's exact
    interpolated values within a small relative error."""
    from pyspark.sql import functions as F

    cust = load_table(spark, SF_SMOKE, "customer")
    rows = cust.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("exact"),
        F.expr("approx_percentile(c_acctbal, 0.5, 1000)").alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        spread = abs(r.exact) + 1.0
        assert abs(r.approx - r.exact) <= 0.1 * spread, r


def test_schema_evolution_merge_on_read(spark):
    """Appending files with a new column must be readable with mergeSchema
    (old rows null-filled) — the parquet-level schema-evolution story."""
    import os

    path = scratch_dir("evolve_me/x").rsplit("/", 1)[0]
    shutil.rmtree(path, ignore_errors=True)
    spark.createDataFrame([(1, "a")], "k bigint, name string").write.mode(
        "overwrite"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "k bigint, name string, score double"
    ).write.mode("append").parquet(path)

    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"k", "name", "score"}
    rows = {r.k: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_heavy_hitters_recovers_exact_top(spark):
    from pyspark.sql import functions as F

    from tf_datapipeline_spark import registry

    from tf_datapipeline_spark.catalog import register_views

    # q1i's registered form reduces to tie-invariant aggregates (the
    # oracle-checkable shape); recover the raw sketch items here to assert
    # the approx set finds the exact top keys.
    register_views(spark, SF_SMOKE)
    approx = {
        r.l_partkey
        for r in spark.sql(
            """
            SELECT item.item AS l_partkey
            FROM (SELECT explode(approx_top_k(l_partkey, 10, 65536)) AS item
                  FROM lineitem)
            """
        ).collect()
    }
    _ = registry.queries()["q1i_heavy_hitters"](spark, SF_SMOKE).collect()
    exact = [
        r.l_partkey
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_partkey")
        .count()
        .orderBy(F.desc("count"), F.asc("l_partkey"))
        .limit(10)
        .collect()
    ]
    # with a 65536-width sketch over ~200 keys the counts are exact; ties
    # at the boundary may swap membership, so demand >= 7/10 overlap
    assert len(approx & set(exact)) >= 7, (sorted(approx), exact)
