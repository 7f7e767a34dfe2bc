"""MinHash signature-build variants: does a REPARTITION(cores) before
the single-file shingle explode+md5 pay? (documents.parquet is one
580 KB file at sf0.1 -> a 1-task scan feeds the family's dominant
md5-per-5-gram stream; guide §2.5 input-skew fix.) Values identical:
keyless repartition reorders rows only and every consumer aggregates.
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from pyspark.sql import DataFrame, SparkSession

from tf_datapipeline_spark.catalog import register_views
from tf_datapipeline_spark.operators.dedup import _sql_signature


def sig_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_sql_signature("spark"))


def sig_repart(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition BELOW the explode (docs-level: 5000 slim rows), not
    # the exploded block — a hint in the explode's own block lands the
    # exchange on the post-explode stream, shuffling n_positions × text
    # (measured 2× WORSE: cycle-0 of the first A/B).
    register_views(spark, sf_dir)
    cores = spark.sparkContext.defaultParallelism
    sql = _sql_signature("spark").replace(
        "FROM documents WHERE length(text) >= 5",
        f"FROM (SELECT /*+ REPARTITION({cores}) */ doc_id, text"
        f" FROM documents WHERE length(text) >= 5)",
    )
    assert "REPARTITION" in sql
    return spark.sql(sql)


VARIANTS = {"plain": sig_plain, "repart": sig_repart}
