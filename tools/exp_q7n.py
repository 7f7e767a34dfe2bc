"""q7n farthest-first variants for the matched-window A/B.

cur  — shipped loop: per round localCheckpoint(corpus incl. embedding
       payload) + TakeOrdered collect (2 jobs/round, 7 rounds).
flat — stateless recompute: round k scans the BASE table once and
       evaluates md = LEAST(fold_l2(v, c_1), ..., fold_l2(v, c_k)) with
       the k picked centroids inlined as double-array LITERALS (no
       string round-trip: F.lit on the exact collected floats). One
       TakeOrdered job per round, no corpus materialization at any
       scale. LEAST is exact and associative on doubles, and each
       fold_l2 term is the same expression on the same values, so the
       running-min column is bit-identical to the shipped chain.

NOT the r11-rejected variant: that one removed the checkpoint but kept
the chained LEAST lineage, so round k's TakeOrdered re-ran rounds
1..k-1's whole plan (O(K^2) scans + a deepening plan). flat recomputes
from the base scan with a FLAT k-term expression each round.
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_datapipeline_spark.catalog import load_table
from tf_datapipeline_spark.operators.similarity import (
    _FF_K,
    _FF_SEED,
    _farthest_first_picks,
)


def _l2_to_lit(cemb: list[float]):
    lit_arr = F.array(*[F.lit(float(x)).cast("double") for x in cemb])
    return F.aggregate(
        F.zip_with(
            F.col("embedding"),
            lit_arr,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _picks_flat(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seed_emb = [
        float(x)
        for x in emb.filter(F.col("vec_id") == _FF_SEED).collect()[0]["embedding"]
    ]
    cembs = [seed_emb]
    picks: list[tuple] = [(0, _FF_SEED, None)]
    for k in range(1, _FF_K):
        dists = [_l2_to_lit(c) for c in cembs]
        md = dists[0] if len(dists) == 1 else F.least(*dists)
        top = (
            emb.select("vec_id", "embedding", md.alias("md"))
            .orderBy(F.desc("md"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        picks.append((k, top["vec_id"], top["md"]))
        if k < _FF_K - 1:
            cembs.append([float(x) for x in top["embedding"]])
    return picks


def q7n_cur(spark: SparkSession, sf_dir: str) -> DataFrame:
    picks = _farthest_first_picks(spark, sf_dir)
    return spark.createDataFrame(
        picks, "rnd int, vec_id bigint, maximin_d2 double"
    )


def q7n_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    picks = _picks_flat(spark, sf_dir)
    return spark.createDataFrame(
        picks, "rnd int, vec_id bigint, maximin_d2 double"
    )


VARIANTS = {"cur": q7n_cur, "flat": q7n_flat}


def compare_all(spark: SparkSession, sf_dir: str) -> None:
    a = _farthest_first_picks(spark, sf_dir)
    b = _picks_flat(spark, sf_dir)
    assert a == b, f"picks diverge:\n{a}\n{b}"
    print(f"flat: identical pick ledger ({len(b)} rows, exact doubles)")


if __name__ == "__main__":
    from tf_datapipeline_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    compare_all(get_spark("exp-q7n"), sf)
    print("compare_all: OK")
