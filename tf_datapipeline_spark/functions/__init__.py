"""Reusable column expressions shared by operators."""

from tf_datapipeline_spark.functions.exact import (  # noqa: F401
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
