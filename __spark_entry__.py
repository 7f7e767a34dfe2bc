"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`tf_datapipeline_spark.registry`, which is the
single source of truth: every operator from SURVEY.md §2 registers a
``queries()`` entry there, with a DuckDB oracle twin where SQL can express
the semantics (rows-only ops register without one).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from tf_datapipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return registry.queries()["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for each oracle-checkable query."""
    return registry.oracle_sql()
