"""Invariant pins for the round-10 operators (r10 verdict task 2 — the
per-round convention `tests/test_round9_ops.py` set: each new op carries
oracle parity in the slow tier AND at least one structural invariant SQL
equality cannot restate — totals conserved against independent
recomputation, monotone ladders, injected violations actually flagged,
estimator closure within a pinned tolerance)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark.catalog import load_table


def test_funnel_ladder_monotone_and_stream_twin_agrees(spark):
    """q4zi/q4zk: the ladder is monotone non-increasing (step k+1 users
    are a subset of step k users by construction), conversion ratios sit
    in [0, 1] with conv_prev(1) == 1, and the streaming state-machine
    twin reproduces the batch ladder ROW FOR ROW on bounded input."""
    from tf_datapipeline_spark.operators.events import q4zi_conversion_funnel
    from tf_datapipeline_spark.streaming.events_stream import q4zk_stream_funnel

    batch = sorted(q4zi_conversion_funnel(spark, SF_SMOKE).collect())
    assert [r.step for r in batch] == [1, 2, 3]
    for a, b in zip(batch, batch[1:]):
        assert b.n_users <= a.n_users, (a, b)
    assert batch[0].conv_prev == 1.0
    for r in batch:
        if r.conv_prev is not None:
            assert 0.0 <= r.conv_prev <= 1.0, r
        if r.conv_start is not None:
            assert 0.0 <= r.conv_start <= 1.0, r

    stream = sorted(q4zk_stream_funnel(spark, SF_SMOKE).collect())
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def test_entry_path_shares_sum_to_one(spark):
    """q4zj: every user lands in exactly one path — n_users sums to the
    distinct-user universe, shares sum to 1 (exactly, up to one IEEE
    rounding per path), and each path is a 3-field ' > ' string."""
    from tf_datapipeline_spark.operators.events import q4zj_entry_paths

    rows = q4zj_entry_paths(spark, SF_SMOKE).collect()
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    assert abs(sum(r.user_share for r in rows) - 1.0) < 1e-9 * len(rows)
    for r in rows:
        assert len(r.path.split(" > ")) == 3, r.path
        assert r.user_share > 0.0


def test_ab_uplift_conserves_variant_split(spark):
    """q4zl: the deterministic hash split partitions the user universe
    (n_a + n_b == distinct users), converters are subsets of their
    variant, and the published rates/uplift are exactly the ratios of
    the published integer counts."""
    from tf_datapipeline_spark.operators.events import q4zl_ab_uplift

    r = q4zl_ab_uplift(spark, SF_SMOKE).collect()[0]
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == n_users
    assert 0 <= r.conv_a_users <= r.n_a
    assert 0 <= r.conv_b_users <= r.n_b
    assert r.rate_a == r.conv_a_users / r.n_a
    assert r.rate_b == r.conv_b_users / r.n_b
    assert r.uplift == r.rate_b - r.rate_a
    if r.z_stat is not None:
        # z sign must agree with the uplift sign
        assert (r.z_stat >= 0) == (r.uplift >= 0)


def test_expectation_suite_flags_injected_violations(spark, tmp_path):
    """q1aa: on the pristine corpus every constraint passes; on a
    corpus with one violation of EACH kind injected (duplicate key,
    orphan FK, non-positive price, null date, bad status) every
    constraint reports EXACTLY the injected count — the suite measures,
    not merely smells."""
    from tf_datapipeline_spark.operators.relational import q1aa_expectation_suite

    clean = {r.constraint_name: r for r in q1aa_expectation_suite(spark, SF_SMOKE).collect()}
    assert len(clean) == 5
    for name, r in clean.items():
        assert r.passed and r.n_violations == 0, name
        assert r.pass_rate == 1.0

    # corrupted twin corpus: base orders plus 5 surgical bad rows
    orders = load_table(spark, SF_SMOKE, "orders")
    cols = orders.columns
    base = orders.limit(1).collect()[0].asDict()
    first_key = base["o_orderkey"]

    def bad(**over):
        d = dict(base)
        d.update(over)
        return tuple(d[c] for c in cols)

    bad_rows = [
        bad(),  # duplicate o_orderkey (first_key appears twice)
        bad(o_orderkey=10**9 + 1, o_custkey=10**9),  # orphan custkey
        bad(o_orderkey=10**9 + 2, o_totalprice=-5.0),  # non-positive price
        bad(o_orderkey=10**9 + 3, o_orderdate=None),  # null date
        bad(o_orderkey=10**9 + 4, o_orderstatus="X"),  # bad domain
    ]
    corrupted = orders.unionAll(spark.createDataFrame(bad_rows, orders.schema))
    dirty_dir = str(tmp_path / "dirty")
    os.makedirs(dirty_dir)
    pq.write_table(
        pa.Table.from_pandas(corrupted.toPandas(), preserve_index=False),
        os.path.join(dirty_dir, "orders.parquet"),
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    pq.write_table(
        pa.Table.from_pandas(cust.toPandas(), preserve_index=False),
        os.path.join(dirty_dir, "customer.parquet"),
    )

    dirty = {r.constraint_name: r for r in q1aa_expectation_suite(spark, dirty_dir).collect()}
    want = {
        "unique_o_orderkey": 1,
        "fk_o_custkey_in_customer": 1,
        "range_o_totalprice_positive": 1,
        "notnull_o_orderdate": 1,
        "domain_o_orderstatus": 1,
    }
    n_total = orders.count() + 5
    for name, v in want.items():
        r = dirty[name]
        assert r.n_violations == v, (name, r)
        assert not r.passed
        assert r.n_checked == n_total


def test_importance_sample_ht_closure(spark):
    """q3f: the Horvitz-Thompson reweighted estimate is (a) never below
    the raw kept mass (weights are 1/p >= 1, FLOOR-quantized at 2^-20),
    and (b) closes on the true corpus char total within a pinned
    tolerance — 25% at this scale (85 kept docs; the estimator is
    unbiased over the hash randomness, a realization wanders ~1/sqrt(n))."""
    from tf_datapipeline_spark.operators.pipeline import q3f_importance_sample

    rows = q3f_importance_sample(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents")
    true_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    est = sum(r.est_chars for r in rows)
    for r in rows:
        assert r.n_kept >= 1
        # weight 1/p >= 1 => per-doc estimate >= its raw chars (FLOOR
        # quantization can shave at most 2^-20 per doc)
        assert r.est_chars >= r.chars_kept - r.n_kept * 2**-20, r
        assert abs(r.est_share_of_corpus - r.est_chars / true_chars) < 1e-12
    assert abs(est - true_chars) / true_chars < 0.25


def test_occ_verdict_matches_footprint_intersection(spark):
    """q9n: verdict is 'conflict' exactly when the two transactions'
    file footprints intersect; the intersection is bounded by each
    side's footprint; rows_to_rebase is positive iff files conflict
    (every manifest file covers >= 1 row)."""
    from tf_datapipeline_spark.operators.layout import q9n_occ_conflicts

    rows = q9n_occ_conflicts(spark, SF_SMOKE).collect()
    assert rows
    verdicts = {r.verdict for r in rows}
    assert verdicts <= {"conflict", "commit-both"}
    for r in rows:
        assert r.files_conflict <= min(r.files_txn_a, r.files_txn_b)
        assert (r.verdict == "conflict") == (r.files_conflict > 0), r
        assert (r.rows_to_rebase > 0) == (r.files_conflict > 0), r
        assert r.rows_to_rebase >= r.files_conflict  # >= 1 row per file


def test_xml_roundtrip_conserves_rows_and_values(spark):
    """q1ab: nothing is lost or invented in the XML round trip — the
    per-nation supplier counts sum to the supplier table's row count,
    the global min suppkey survives, and the exact-decimal acctbal total
    equals a direct parquet-side recomputation per nation."""
    from tf_datapipeline_spark.operators.formats import q1ab_xml_roundtrip

    rows = q1ab_xml_roundtrip(spark, SF_SMOKE).collect()
    sup = load_table(spark, SF_SMOKE, "supplier")
    nat = load_table(spark, SF_SMOKE, "nation")
    assert sum(r.n_suppliers for r in rows) == sup.count()
    assert min(r.min_suppkey for r in rows) == sup.agg(F.min("s_suppkey")).collect()[0][0]
    direct = {
        r.n_name: (r.n, r.cents)
        for r in sup.join(
            F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("s_acctbal") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert {r.n_name for r in rows} == set(direct)
    for r in rows:
        n, cents = direct[r.n_name]
        assert r.n_suppliers == n
        assert round(float(r.total_acctbal) * 100) == cents, r.n_name


def test_zipf_profile_monotone(spark):
    """q5s: ranks are gapless 1..min(64, |vocab|), frequencies are non-increasing in
    rank (ties broken by token ASC), zipf_ratio == f(1)/f(r) >= 1 with
    ratio 1 at rank 1, and the top-1 count matches an independent
    groupBy recomputation."""
    from tf_datapipeline_spark.operators.text import q5s_zipf_profile

    rows = sorted(q5s_zipf_profile(spark, SF_SMOKE).collect(), key=lambda r: r.rnk)
    # a small corpus can have < 64 distinct tokens; ranks stay gapless
    assert 1 <= len(rows) <= 64
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0].zipf_ratio == 1.0
    for a, b in zip(rows, rows[1:]):
        assert a.n >= b.n
        if a.n == b.n:
            assert a.token < b.token  # deterministic tie-break
    f1 = rows[0].n
    for r in rows:
        assert r.zipf_ratio == f1 / r.n
        assert r.zipf_ratio >= 1.0


def test_dup_histogram_mass_matches_exact_dedup(spark):
    """q6j: the histogram is q61's cluster table re-binned — total doc
    mass equals the corpus size, per-size cluster counts match a direct
    recomputation from q61, the >= 2 mass equals q61's duplicate count,
    and the docs_at_least column is the exact suffix-cumulative."""
    from tf_datapipeline_spark.operators.dedup import (
        q61_dedup_exact_hash,
        q6j_dup_size_histogram,
    )

    rows = sorted(
        q6j_dup_size_histogram(spark, SF_SMOKE).collect(),
        key=lambda r: -r.cluster_size,
    )
    docs_n = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == docs_n
    q61 = q61_dedup_exact_hash(spark, SF_SMOKE).collect()
    per_size: dict[int, int] = {}
    for c in q61:
        per_size[c.n_copies] = per_size.get(c.n_copies, 0) + 1
    assert {r.cluster_size: r.n_clusters for r in rows} == per_size
    dup_docs = sum(c.n_copies for c in q61 if c.n_copies >= 2)
    assert sum(r.n_docs for r in rows if r.cluster_size >= 2) == dup_docs
    running = 0
    for r in rows:  # sorted by size DESC == the window's order
        running += r.n_docs
        assert r.docs_at_least == running
        assert abs(r.share_at_least - running / docs_n) < 1e-12


def test_moving_median_equals_bruteforce_at_frame_edges(spark):
    """q2d: for every row of a handful of customers, the published
    moving median equals a Python brute-force over the trailing-5 frame
    — including the short head frames (n=1..4) where the lower/upper
    order-statistic indexing is most fragile."""
    from tf_datapipeline_spark.operators.window import q2d_moving_median

    out = q2d_moving_median(spark, SF_SMOKE)
    custs = [r.o_custkey for r in out.select("o_custkey").distinct().limit(5).collect()]
    got = {
        (r.o_custkey, r.o_orderkey): (r.n_frame, r.moving_median)
        for r in out.filter(F.col("o_custkey").isin(custs)).collect()
    }
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_custkey").isin(custs))
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_cust: dict[int, list] = {}
    for r in sorted(orders, key=lambda r: (r.o_custkey, r.o_orderdate, r.o_orderkey)):
        by_cust.setdefault(r.o_custkey, []).append(r)
    checked = 0
    for ck, rs in by_cust.items():
        for i, r in enumerate(rs):
            frame = sorted(x.cents for x in rs[max(0, i - 4) : i + 1])
            n = len(frame)
            want = (frame[(n - 1) // 2] + frame[n // 2]) / 200.0
            nf, med = got[(ck, r.o_orderkey)]
            assert nf == n
            assert med == want, (ck, r.o_orderkey, frame, med, want)
            checked += 1
    assert checked == len(got)
