"""Invariant pins for the round-9 operators (the convention every round
follows: each new op carries oracle parity in the slow tier AND at
least one structural invariant SQL equality cannot restate — totals
conserved against independent recomputation, domains bounded, statuses
partitioning the input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark.catalog import load_table


def test_retention_triangle_conserves_cohorts(spark):
    """q4ze: offset-0 actives == cohort size for every cohort (everyone
    is active in their first week), retention in (0, 1], and total
    cohort sizes == distinct users."""
    from tf_datapipeline_spark.operators.events import q4ze_retention_triangle

    rows = q4ze_retention_triangle(spark, SF_SMOKE).collect()
    assert rows
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    cohorts = {}
    for r in rows:
        assert 0.0 < r.retention <= 1.0
        assert r.week_offset >= 0
        cohorts[r.cohort_week] = r.cohort_size
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size, r
    assert sum(cohorts.values()) == n_users


def test_rfm_segments_partition_users(spark):
    """q4zf: the segment grid partitions the user universe exactly, every
    quintile label is in 1..5, and each metric's quintile populations are
    balanced (|bucket| within 1 of n/5 — the row_number construction)."""
    from tf_datapipeline_spark.operators.events import q4zf_rfm_segments

    rows = q4zf_rfm_segments(spark, SF_SMOKE).collect()
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for metric in ("r_q", "f_q", "m_q"):
        per = {}
        for r in rows:
            q = getattr(r, metric)
            assert 1 <= q <= 5, (metric, q)
            per[q] = per.get(q, 0) + r.n_users
        lo, hi = n_users // 5, -(-n_users // 5)
        for q, n in per.items():
            assert lo <= n <= hi, (metric, q, n, n_users)


def test_attribution_conserves_purchases(spark):
    """q4zg: attributed purchases and cents sum to the purchase totals —
    attribution reassigns credit, never creates or destroys it."""
    from tf_datapipeline_spark.operators.events import q4zg_attribution

    rows = q4zg_attribution(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "purchase"
    )
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents"),
    ).collect()[0]
    assert sum(r.n_purchases for r in rows) == want.n
    assert sum(r.total_cents for r in rows) == want.cents
    channels = {r.channel for r in rows}
    assert channels <= {"direct", "ch0", "ch1", "ch2", "ch3", "ch4"}


def test_temporal_leakage_partitions_events(spark):
    """q4zh: n_train + n_test == events per type, and leaky test events
    are a subset of test events."""
    from tf_datapipeline_spark.operators.events import q4zh_temporal_leakage

    rows = q4zh_temporal_leakage(spark, SF_SMOKE).collect()
    per_type = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(per_type)
    for r in rows:
        assert r.n_train + r.n_test == per_type[r.event_type]
        assert 0 <= r.n_test_from_seen_users <= r.n_test


def test_length_bands_are_ordered_quartiles(spark):
    """q5q: per source, exactly the bands 1..4 (for n>=4 docs), doc
    counts balanced within 1, totals conserved, and band value ranges
    non-overlapping in order (rank banding over a sorted key)."""
    from tf_datapipeline_spark.operators.text import q5q_length_bands

    rows = q5q_length_bands(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    per_source = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(per_source)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.band)
        assert [r.band for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.n_docs for r in rs) == per_source[src]
        for a, b in zip(rs, rs[1:]):
            assert a.max_chars <= b.min_chars, (src, a, b)


def test_dim_variance_profile_shape(spark):
    """q7l: exactly one row per dimension, n == corpus size everywhere,
    variance non-negative, and the quantized mean within 2^-30 + sampling
    noise of a numpy recomputation."""
    import numpy as np

    from tf_datapipeline_spark.operators.similarity import q7l_dim_variance

    rows = q7l_dim_variance(spark, SF_SMOKE).collect()
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n_vecs = emb.count()
    assert len(rows) == 64
    assert {r.dim for r in rows} == set(range(64))
    mat = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    for r in rows:
        assert r.n == n_vecs
        assert r.var_v >= 0.0
        assert abs(r.mean_v - mat[:, r.dim].mean()) < 1e-6, r.dim


def test_partition_evolution_actions_consistent(spark):
    """q9l: rows conserved across files, action matches n_targets, and
    every file has >= 1 target."""
    from tf_datapipeline_spark.operators.layout import q9l_partition_evolution

    rows = q9l_partition_evolution(spark, SF_SMOKE).collect()
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.n_rows for r in rows) == n_orders
    for r in rows:
        assert r.n_targets >= 1
        assert r.action == ("move" if r.n_targets == 1 else "rewrite")


def test_manifest_diff_statuses_partition(spark):
    """q9m: statuses are consistent with the per-file row/cents deltas,
    and version totals reconcile against the IVM snapshot definitions."""
    from tf_datapipeline_spark.operators.layout import q9m_manifest_diff

    rows = q9m_manifest_diff(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    v1_rows = orders.filter(F.col("o_orderkey") % 10 != 0).count()
    v2_rows = orders.filter(F.col("o_orderkey") % 10 != 1).count()
    assert sum(r.rows_v1 for r in rows) == v1_rows
    assert sum(r.rows_v2 for r in rows) == v2_rows
    for r in rows:
        if r.status == "added":
            assert r.rows_v1 == 0 and r.rows_v2 > 0
        elif r.status == "removed":
            assert r.rows_v2 == 0 and r.rows_v1 > 0
        elif r.status == "unchanged":
            assert (r.rows_v1, r.cents_v1) == (r.rows_v2, r.cents_v2)
        else:
            assert r.status == "rewritten"
            assert (r.rows_v1, r.cents_v1) != (r.rows_v2, r.cents_v2)


def test_transcode_audit_is_lossless(spark):
    """q8o: every payload decodes, transcodes, and round-trips exactly."""
    from tf_datapipeline_spark.operators.multimodal import q8o_transcode_audit

    row = q8o_transcode_audit(spark, SF_SMOKE).collect()[0]
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert row.n_docs == n_docs
    assert row.n_lossless == n_docs
    assert row.total_pixels > 0


def test_window_digests_conserve_rowcounts(spark):
    """q2a/q2b/q2c: the digests' per-group n sums equal the base-table
    row counts — the digest covers the FULL per-row output."""
    from tf_datapipeline_spark.operators.window import (
        q2a_window_digest_running,
        q2b_window_digest_lag,
        q2c_window_digest_ranks,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").count()
    od = load_table(spark, SF_SMOKE, "orders").count()
    cu = load_table(spark, SF_SMOKE, "customer").count()
    assert sum(r.n for r in q2a_window_digest_running(spark, SF_SMOKE).collect()) == li
    assert sum(r.n for r in q2b_window_digest_lag(spark, SF_SMOKE).collect()) == od
    assert sum(r.n for r in q2c_window_digest_ranks(spark, SF_SMOKE).collect()) == cu
