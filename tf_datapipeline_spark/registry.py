"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as
    name -> fn(spark, sf_dir) -> DataFrame
optionally with a DuckDB-runnable ANSI-SQL oracle twin. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive value
hash, so:
  - every computed column is aliased identically in Spark and SQL;
  - aggregate floats are rounded (or computed in exact decimal) so the
    two engines agree bit-for-bit despite different summation orders;
  - per-row float arithmetic is left unrounded (IEEE ops are deterministic
    and identical across engines).
Ops that SQL can't express (streaming state, binary UDF pipelines) register
without an oracle → the driver records a weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "tf_datapipeline_spark.operators.relational",
    "tf_datapipeline_spark.operators.window",
    "tf_datapipeline_spark.operators.pipeline",
    "tf_datapipeline_spark.operators.events",
    "tf_datapipeline_spark.operators.text",
    "tf_datapipeline_spark.operators.dedup",
    "tf_datapipeline_spark.operators.similarity",
    "tf_datapipeline_spark.operators.multimodal",
    "tf_datapipeline_spark.streaming.events_stream",
]

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; `oracle` is the DuckDB ANSI-SQL twin (or None for
    rows-only checked ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
