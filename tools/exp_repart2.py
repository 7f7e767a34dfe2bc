"""Adaptive-repartition on/off A/B for the CHEAP-stream text queries
(whitespace tokenize, no md5-per-position): q5t/qt7/qt1. The md5-heavy
streams measured 3-4x wins; these may be shuffle-for-nothing. The
toggle forces catalog.adaptive_scan_parallelism's memoized split count
high (OFF: scan counts as already-parallel) or low (ON)."""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from pyspark.sql import DataFrame, SparkSession

from tf_datapipeline_spark import catalog


def _force(spark: SparkSession, sf_dir: str, splits: int) -> None:
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        "documents",
    )
    catalog._SPLITS_MEMO[key] = splits


def _mk(qname: str, splits: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from tf_datapipeline_spark import registry

        _force(spark, sf_dir, splits)
        try:
            return registry.queries()[qname](spark, sf_dir)
        finally:
            _force(spark, sf_dir, splits)

    return run


VARIANTS = {
    "q5t_on": _mk("q5t_bpe_encode", 1),
    "q5t_off": _mk("q5t_bpe_encode", 10**6),
    "qt7_on": _mk("qt7_tokenize_pack", 1),
    "qt7_off": _mk("qt7_tokenize_pack", 10**6),
    "qt1_on": _mk("qt1_prep_pipeline", 1),
    "qt1_off": _mk("qt1_prep_pipeline", 10**6),
}
