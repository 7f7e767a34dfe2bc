"""q7m graph-ANN beam variants for the matched-window A/B (r11 verdict
task 2). Every variant must produce IDENTICAL rows to the registered
q7m_graph_ann (asserted by compare_all below / oracle parity before any
variant ships).

Variants:
  cur   — the shipped unrolled 3-round beam (plan doubles per round).
  hop   — hop-superset prescore: the beam can only ever visit nodes
          within _GANN_ROUNDS edge-hops of the seed set, a METADATA-
          sized superset derivable from the edge list alone; score that
          superset against the query set in ONE corpus pass, then run
          the three beam rounds as tiny joins over the checkpointed
          scored table. One corpus scan replaces the per-round rescore
          join, and the unrolled subtrees bottom out in a bounded
          checkpoint instead of corpus exchanges.
  bcast — per-round beam localCheckpoint, rescore by broadcasting the
          tiny candidate set INTO the corpus scan (the r11-documented
          failure mode of per-round checkpoints was the corpus side
          re-shuffling per round; broadcasting the metadata side
          removes that shuffle entirely). 3 corpus scans.
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tf_datapipeline_spark.catalog import load_table
from tf_datapipeline_spark.operators.similarity import (
    _CENTROID_STRIDE,
    _GANN_BEAM,
    _GANN_ROUNDS,
    _N_CELLS,
    _N_QUERIES,
    _REC_K,
    _mknn_edges,
    q7m_graph_ann,
)


def _parts(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    norm2 = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    gnorms = emb.select("vec_id", "embedding", F.sqrt(norm2).alias("nrm"))
    queries = gnorms.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    edges = _mknn_edges(spark, sf_dir)
    undirected = (
        edges.union(edges.select(F.col("vb").alias("va"), F.col("va").alias("vb")))
        .distinct()
        .localCheckpoint()
    )
    seed_ids = [8 + _CENTROID_STRIDE * k for k in range(_N_CELLS)]
    dot = F.aggregate(
        F.zip_with(
            "embedding", "q_emb", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return gnorms, queries, undirected, seed_ids, dot, w


def _tail(found, gnorms, queries, dot, w):
    exact_scored = gnorms.filter(F.col("vec_id") >= _N_QUERIES).join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
    )
    exact = (
        exact_scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _REC_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    hit = found.select(
        F.col("query_id").alias("h_qid"), F.col("vec_id").alias("h_vid")
    )
    return (
        exact.join(
            hit,
            (F.col("h_qid") == F.col("query_id"))
            & (F.col("h_vid") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("h_vid").cast("int").alias("n_hit"),
            F.lit(_REC_K).cast("int").alias("k"),
            (
                F.count("h_vid").cast("double") / F.lit(float(_REC_K))
            ).alias("recall_at_k"),
        )
    )


def q7m_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot of the r11-shipped unrolled beam (the A/B 'cur' when the
    registry q7m moves to the hop shape)."""
    gnorms, queries, undirected, seed_ids, dot, w = _parts(spark, sf_dir)
    seeds = gnorms.filter(F.col("vec_id").isin(seed_ids)).select("vec_id")
    beam = queries.select("query_id").crossJoin(seeds)
    for _ in range(_GANN_ROUNDS):
        cand = (
            beam.select("query_id", "vec_id")
            .unionAll(
                beam.join(undirected, beam.vec_id == undirected.va)
                .filter(F.col("vb") >= _N_QUERIES)
                .select("query_id", F.col("vb").alias("vec_id"))
            )
            .distinct()
        )
        beam = (
            cand.join(gnorms, "vec_id")
            .join(F.broadcast(queries), "query_id")
            .select(
                "query_id",
                "vec_id",
                (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _GANN_BEAM)
            .select("query_id", "vec_id", "cos_sim")
        )
    found = beam.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _REC_K
    ).select("query_id", "vec_id")
    return _tail(found, gnorms, queries, dot, w)


def q7m_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    gnorms, queries, undirected, seed_ids, dot, w = _parts(spark, sf_dir)
    # hop-superset: nodes within _GANN_ROUNDS hops of the seeds (corpus
    # side only) — pure edge-metadata iteration, bounded by
    # seeds * out_degree^T regardless of corpus size
    reach = spark.createDataFrame(
        [(i,) for i in seed_ids], "vec_id bigint"
    )
    frontier = reach
    for _ in range(_GANN_ROUNDS):
        frontier = (
            frontier.join(undirected, frontier.vec_id == undirected.va)
            .filter(F.col("vb") >= _N_QUERIES)
            .select(F.col("vb").alias("vec_id"))
            .distinct()
        )
        reach = reach.unionAll(frontier).distinct()
    # ONE corpus pass scores the superset against every query
    scored = (
        gnorms.join(F.broadcast(reach), "vec_id")
        .crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            "vec_id",
            (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
        )
        .localCheckpoint()
    )
    seeds = scored.select("vec_id").filter(
        F.col("vec_id").isin(seed_ids)
    ).distinct()
    beam = queries.select("query_id").crossJoin(F.broadcast(seeds))
    for _ in range(_GANN_ROUNDS):
        cand = (
            beam.select("query_id", "vec_id")
            .unionAll(
                beam.join(undirected, beam.vec_id == undirected.va)
                .filter(F.col("vb") >= _N_QUERIES)
                .select("query_id", F.col("vb").alias("vec_id"))
            )
            .distinct()
        )
        beam = (
            cand.join(scored, ["query_id", "vec_id"])
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _GANN_BEAM)
            .select("query_id", "vec_id", "cos_sim")
        )
    found = beam.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _REC_K
    ).select("query_id", "vec_id")
    return _tail(found, gnorms, queries, dot, w)


def q7m_hop_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hop + per-round beam localCheckpoint: the plan stops doubling
    entirely (each round is a flat tiny job over the scored checkpoint);
    costs 3 extra small eager jobs."""
    gnorms, queries, undirected, seed_ids, dot, w = _parts(spark, sf_dir)
    reach = spark.sql(
        "SELECT CAST(vec_id AS BIGINT) AS vec_id FROM VALUES "
        + ", ".join(f"({i})" for i in seed_ids)
        + " AS t(vec_id)"
    )
    seed_rel = reach
    frontier = reach
    for _ in range(_GANN_ROUNDS):
        frontier = (
            undirected.join(F.broadcast(frontier), undirected.va == frontier.vec_id)
            .filter(F.col("vb") >= _N_QUERIES)
            .select(F.col("vb").alias("vec_id"))
            .distinct()
        )
        reach = reach.unionAll(frontier).distinct()
    scored = (
        gnorms.join(F.broadcast(reach), "vec_id")
        .crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            "vec_id",
            (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
        )
        .localCheckpoint()
    )
    beam = queries.select("query_id").crossJoin(F.broadcast(seed_rel))
    for _ in range(_GANN_ROUNDS):
        cand = (
            beam.select("query_id", "vec_id")
            .unionAll(
                undirected.join(F.broadcast(beam), beam.vec_id == undirected.va)
                .filter(F.col("vb") >= _N_QUERIES)
                .select("query_id", F.col("vb").alias("vec_id"))
            )
            .distinct()
        )
        beam = (
            cand.join(scored, ["query_id", "vec_id"])
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _GANN_BEAM)
            .select("query_id", "vec_id", "cos_sim")
            .localCheckpoint()
        )
    found = beam.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _REC_K
    ).select("query_id", "vec_id")
    return _tail(found, gnorms, queries, dot, w)


def q7m_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    gnorms, queries, undirected, seed_ids, dot, w = _parts(spark, sf_dir)
    seeds = gnorms.filter(F.col("vec_id").isin(seed_ids)).select("vec_id")
    beam = queries.select("query_id").crossJoin(seeds)
    for _ in range(_GANN_ROUNDS):
        cand = (
            beam.select("query_id", "vec_id")
            .unionAll(
                beam.join(undirected, beam.vec_id == undirected.va)
                .filter(F.col("vb") >= _N_QUERIES)
                .select("query_id", F.col("vb").alias("vec_id"))
            )
            .distinct()
        )
        beam = (
            gnorms.join(F.broadcast(cand), "vec_id")
            .join(F.broadcast(queries), "query_id")
            .select(
                "query_id",
                "vec_id",
                (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _GANN_BEAM)
            .select("query_id", "vec_id", "cos_sim")
            .localCheckpoint()
        )
    found = beam.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _REC_K
    ).select("query_id", "vec_id")
    return _tail(found, gnorms, queries, dot, w)


VARIANTS = {
    "unrolled": q7m_unrolled,
    "hop": q7m_hop,
    "hop_ckpt": q7m_hop_ckpt,
    "bcast": q7m_bcast,
    "registry": q7m_graph_ann,
}


def compare_all(spark: SparkSession, sf_dir: str) -> None:
    base = sorted(map(tuple, q7m_unrolled(spark, sf_dir).collect()))
    for name, fn in VARIANTS.items():
        if name == "unrolled":
            continue
        got = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert got == base, f"{name} diverges: {got[:3]} vs {base[:3]}"
        print(f"{name}: identical ({len(got)} rows)")


if __name__ == "__main__":
    from tf_datapipeline_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    compare_all(get_spark("exp-q7m"), sf)
    print("compare_all: OK")
