"""Interchange-format sources/sinks (SURVEY.md §2A S6/S7 widened): the
engine's tables round-trip through CSV and JSON-lines — the two text
containers every ingest pipeline meets — and the results are value-checked
against the raw-parquet oracle, so the codec path itself is verified
(delimiters, quoting, header handling, float round-trip).

Float discipline: Spark's CSV/JSON writers emit shortest-round-trip
doubles (Java Double.toString), so read-back values are bit-identical and
the exact-decimal aggregate matches the oracle computed on the original
parquet.

Scale notes: both writers/readers are splittable line formats — a 100 TB
drop of .csv/.jsonl shards parallelizes by file and by block exactly like
the reference's sharded record files (S6, make_tf_record.py:94-97);
schemas are always EXPLICIT (inference would scan twice and guess types).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_datapipeline_spark.catalog import load_table
from tf_datapipeline_spark.functions.exact import dsum, sql_dsum
from tf_datapipeline_spark.registry import query
from tf_datapipeline_spark.sources.etl import scratch_dir

_CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)
_NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
_REGION_SCHEMA = "r_regionkey int, r_name string"
_ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


# --------------------------------------------------------------------------
# q1o — CSV round-trip: customer/nation/region written as headered CSV,
# read back with explicit schemas, then the standard dim-join rollup.
# --------------------------------------------------------------------------
@query(
    "q1o_csv_roundtrip",
    oracle=f"""
    SELECT n.n_name, r.r_name AS region_name,
           COUNT(*) AS n_customers,
           {sql_dsum("c.c_acctbal", 2)} AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
    """,
)
def q1o_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = scratch_dir(f"csv_{_tag(sf_dir)}")
    tables = {
        "customer": _CUSTOMER_SCHEMA,
        "nation": _NATION_SCHEMA,
        "region": _REGION_SCHEMA,
    }
    dfs = {}
    for t, schema in tables.items():
        path = f"{root}/{t}"
        load_table(spark, sf_dir, t).write.mode("overwrite").option(
            "header", "true"
        ).csv(path)
        dfs[t] = spark.read.schema(schema).option("header", "true").csv(path)
    joined = (
        dfs["customer"]
        .join(
            F.broadcast(dfs["nation"]),
            dfs["customer"].c_nationkey == dfs["nation"].n_nationkey,
        )
        .join(
            F.broadcast(dfs["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return joined.groupBy(
        "n_name", F.col("r_name").alias("region_name")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", 2).alias("total_acctbal"),
    )


# --------------------------------------------------------------------------
# q1p — JSON-lines round-trip: orders written as .jsonl, read back with an
# explicit schema (timestamps included), then an order-priority rollup.
# --------------------------------------------------------------------------
@query(
    "q1p_jsonl_roundtrip",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", 2)} AS total_price,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_order
    FROM orders GROUP BY 1
    """,
)
def q1p_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir(f"jsonl_{_tag(sf_dir)}/orders")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").json(path)
    orders = spark.read.schema(_ORDERS_SCHEMA).json(path)
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", 2).alias("total_price"),
        F.min("o_orderdate").alias("first_order"),
    )
