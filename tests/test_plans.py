"""Physical-plan shape tests: the scale-critical plan properties
(pushdown, pruning, broadcast, top-k, codegen) pinned as assertions so a
regression fails loudly instead of costing 100x on a real cluster."""

from __future__ import annotations

from pyspark.sql.functions import broadcast as F_broadcast
from pyspark.sql.functions import col as F_col

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark import registry
from tf_datapipeline_spark.plans.inspect import (
    codegen_subtree_count,
    has_operator,
    has_pushed_filters,
    join_strategies,
    read_schema_columns,
)


def _q(name, spark):
    return registry.queries()[name](spark, SF_SMOKE)


def test_filter_reaches_parquet_scan(spark):
    """q06's shipdate/discount/quantity predicates must appear as
    PushedFilters on the lineitem scan."""
    assert has_pushed_filters(_q("q06_forecast_revenue", spark))
    assert has_pushed_filters(_q("q02_filter_project", spark))


def test_column_pruning_is_narrow(spark):
    """q01 touches 7 of lineitem's 11 columns; the scan must not read
    more (a full-width scan of a 100 TB table is the canonical fail)."""
    schemas = read_schema_columns(_q("q01_pricing_summary", spark))
    assert schemas, "no parquet scan found"
    for cols in schemas:
        assert cols <= {
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        }


def test_dim_joins_broadcast(spark):
    """q05 joins lineitem against customer/supplier/nation/region dims —
    every one must be a BroadcastHashJoin (no shuffle of the fact side)."""
    joins = join_strategies(_q("q05_region_revenue", spark))
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins


def test_topk_uses_take_ordered(spark):
    """q09 (ORDER BY ... LIMIT k) must plan as TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    assert has_operator(_q("q09_topk_orders", spark), "TakeOrderedAndProject")


def test_flagship_runs_in_codegen(spark):
    """Pin the whole-stage-codegen property with AQE momentarily off —
    AdaptiveSparkPlan reports 0 subtrees until execution, but the
    underlying stages are the same ones AQE will compile."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert codegen_subtree_count(_q("q01_pricing_summary", spark)) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_knn_has_no_cartesian_product(spark):
    """Brute-force kNN must not plan a CartesianProduct of embeddings x
    embeddings; the packed/broadcast formulation keeps it linear."""
    joins = join_strategies(_q("q70_knn_bruteforce", spark))
    assert "CartesianProduct" not in joins, joins


def test_bucketed_join_has_no_exchange(spark):
    """orders ⋈ lineitem both bucketed on the join key: the join must plan
    WITHOUT any Exchange (the shuffle was paid once at write time) and
    return the same rows as the plain join."""
    from tf_datapipeline_spark.catalog import load_table
    from tf_datapipeline_spark.plans.inspect import formatted_plan
    from tf_datapipeline_spark.sources.bucketing import colocated_join

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        df = colocated_join(spark, SF_SMOKE)
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        plain = load_table(spark, SF_SMOKE, "orders").join(
            load_table(spark, SF_SMOKE, "lineitem"),
            F_col("o_orderkey") == F_col("l_orderkey"),
        )
        assert df.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_partition_pruning(spark):
    """A filter on the partition column must prune directories
    (PartitionFilters in the scan), not just filter rows."""
    import shutil

    from tf_datapipeline_spark.plans.inspect import formatted_plan
    from tf_datapipeline_spark.sources.etl import scratch_dir
    from tf_datapipeline_spark.sources.partitioned import (
        partition_dirs,
        read_events_day,
        write_events_by_date,
    )

    out = scratch_dir("events_by_date/x").rsplit("/", 1)[0]
    shutil.rmtree(out, ignore_errors=True)
    write_events_by_date(spark, SF_SMOKE, out)
    days = [d.split("=")[1] for d in partition_dirs(out)]
    assert len(days) > 1
    df = read_events_day(spark, out, days[0])
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "event_date" in plan
    # pruned scan reads exactly the one day's rows
    full = spark.read.parquet(out)
    day_rows = full.filter(F_col("event_date") == days[0]).count()
    assert df.count() == day_rows > 0


def test_exact_numbering_has_no_single_partition_exchange(spark):
    """q32/q35/q36 use two-pass partition-offset numbering: their plans
    must contain NO `Exchange SinglePartition` (the 1-task global-window
    bottleneck the old formulation paid)."""
    from tf_datapipeline_spark.plans.inspect import formatted_plan

    for name in (
        "q32_split_exact_head",
        "q35_batch_ragged_tail",
        "q36_shard_assignment",
        "q5d_sequence_packing",
        # r8: the clustering-depth audit numbers 60M rows through the
        # same two-pass offset machinery — the window must stay
        # partitioned by the orderkey bucket
        "q9j_clustering_depth",
        # r10 (r9 verdict task 2): the last data-sized windows keyed on
        # the 5-value c_mktsegment, rewritten onto
        # grouped_offset_row_number — every window must stay partitioned
        # by (segment, balance-bucket) / (segment, balance)
        "q26_ntile_frames",
        "q28_distribution_ranks",
    ):
        plan = formatted_plan(_q(name, spark))
        assert "SinglePartition" not in plan, (name, plan)


def test_contamination_broadcasts_benchmark_grams(spark):
    """q5c's overlap join must broadcast the (tiny) benchmark n-gram set —
    a shuffle join here would re-exchange the full corpus gram stream."""
    from tf_datapipeline_spark.plans.inspect import formatted_plan

    plan = formatted_plan(_q("q5c_contamination", spark))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_salted_range_join_exchanges_on_salt(spark):
    """q4v must shuffle on the salted key: the exchange's hash
    partitioning carries _salt, so a hot (user, bucket) key spreads over
    n reducers instead of one."""
    from tf_datapipeline_spark.plans.inspect import formatted_plan

    # at smoke SF the salted side fits a broadcast (no shuffle at all, also
    # fine); force the shuffle path to pin the salted exchange shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(_q("q4v_range_join_salted", spark))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "_salt" in plan, plan
    low = plan.lower()
    assert "hashpartitioning" in low and "_salt" in low.split("hashpartitioning", 1)[1], plan


def test_salted_join_matches_plain_join(spark):
    """Salted fact ⋈ dim must return exactly the plain join's rows, with
    the hot key spread over n salts pre-shuffle."""
    from tf_datapipeline_spark.catalog import load_table
    from tf_datapipeline_spark.operators.skew import salted_join

    # skewed fact: lineitem with 60% of rows forced onto one supplier
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "s_key",
        F_col("l_suppkey") % 3,
    )
    dim = (
        load_table(spark, SF_SMOKE, "supplier")
        .withColumn("s_key", F_col("s_suppkey") % 3)
        .select("s_key", "s_name")
        .distinct()
    )
    plain = li.join(dim, "s_key").groupBy("s_name").count()
    salted = salted_join(li, dim, "s_key", n_salts=4).groupBy("s_name").count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_no_accidental_cross_products(spark):
    """Engine-wide join audit: no query may plan a CartesianProduct, and
    every BroadcastNestedLoopJoin must broadcast a relation STRUCTURALLY
    bounded by the query text — verified per-NLJ by
    plans.inspect.unbounded_nlj_builds (literal relation, one-row scalar,
    keyless aggregate, literal-id-filtered query set, or a join that
    key-filters through one of those). This replaced the r2-r6 per-query
    name allowlist after the r6 advisor pointed out a blanket exemption
    would let a future edit plan a genuine corpus x corpus nested loop
    silently — and the structural audit promptly caught q75/q76
    broadcasting the (corpus x 8-sub) side while streaming the 8-row
    codeword side (fixed with BROADCAST hints). The only remaining
    name-level exemption is the pmod-domain idiom the parser cannot
    prove: q68/qt2's 16-row centroid dim is a grouped aggregate whose
    key is pmod(vec_id, 16) — bounded by the literal modulus, but the
    grouping-key domain isn't visible in the physical plan."""
    from tf_datapipeline_spark.plans.inspect import (
        join_strategies,
        unbounded_nlj_builds,
    )

    pmod_domain_bounded = {
        # 16-row centroid dim = groupBy(pmod(vec_id, 16)) aggregate: key
        # domain is the literal modulus; every other NLJ in these plans
        # passes the structural audit
        "q68_semantic_dedup",
        "qt2_prep_semantic",
        # source-pair enumeration: srcs a < b self-join over the DISTINCT
        # source dimension — domain-bounded by the corpus SCHEMA (source
        # is a feed/shard name: tens here, at most thousands anywhere),
        # not by the row count; the sketch rows the pairs then join are
        # capped at k per source by construction
        "q6h_kmv_source_overlap",
        # file-manifest self-join: both sides are the 64-row grouped
        # aggregate keyed on (rn-1) div ceil(total/_CLUSTER_FILES) — the
        # key domain is bounded by the literal _CLUSTER_FILES, but (like
        # q68's pmod) that arithmetic bound isn't visible in the plan
        "q9j_clustering_depth",
        # source x length-band grid: both cross-join sides are rollups
        # over DOMAIN-bounded keys — source (a feed/shard name, the q6h
        # rationale) and band = floor(n_chars / 64) (document length is
        # schema-capped); the grid is metadata-sized at any corpus size
        # but neither bound is visible in the plan
        "q5w_chi2_drift",
    }
    # Accumulate violations across ALL queries before asserting — a single
    # failure must not shadow the rest of the sweep (round-5 lesson: an
    # in-loop assert left q7c/q9a/q9b unaudited).
    violations: list[tuple[str, object]] = []
    for name, fn in sorted(registry.queries().items()):
        if "stream" in name:
            continue  # streaming results come from a memory sink scan
        df = fn(spark, SF_SMOKE)
        joins = join_strategies(df)
        if "CartesianProduct" in joins:
            violations.append((name, joins))
        elif "BroadcastNestedLoopJoin" in joins and name not in pmod_domain_bounded:
            bad = unbounded_nlj_builds(df)
            if bad:
                violations.append((name, bad))
    assert not violations, violations


def test_chunking_has_no_exchange(spark):
    """q5g (document chunking) is embarrassingly parallel — sequence/
    explode/substring per row. Any Exchange in its plan means a shuffle
    crept into a map-only pipeline (a 100 TB scan would pay it for
    nothing)."""
    from tf_datapipeline_spark.plans.inspect import formatted_plan

    plan = formatted_plan(_q("q5g_doc_chunking", spark))
    assert "Exchange" not in plan, plan


def test_multigrain_rollup_partial_aggregates(spark):
    """q4d fans each event out to 3 (grain, bucket) cells; the partial
    HashAggregate must sit below the single Exchange so the shuffle
    carries cells, not the 3x-expanded event rows."""
    from tf_datapipeline_spark.plans.inspect import formatted_plan

    import re

    plan = formatted_plan(_q("q4d_multigrain_rollup", spark))
    # exactly one shuffle (each operator appears once as "(n) <Op>" in the
    # formatted detail section; the tree repeats them without numbers)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    # map-side partial aggregate below it
    assert "partial_sum" in plan and "partial_count" in plan, plan


def test_quantile_check_broadcasts_sketch(spark):
    """q1w's verification pass joins lineitem back against the 3-row
    sketch result — that side must broadcast (shuffling the fact table to
    rank-check 3 rows would invert the cost model)."""
    from tf_datapipeline_spark.plans.inspect import join_strategies

    joins = join_strategies(_q("q1w_approx_quantiles", spark))
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins


def test_no_row_wise_python_udfs(spark):
    """Engine-wide UDF audit: no batch query may plan a BatchEvalPython
    (row-at-a-time Python UDF — the 10-100x slow path). Python is allowed
    only Arrow-batched: MapInPandas / FlatMapGroupsInPandas (decode,
    augment, cogroup kernels) and ArrowEvalPython (vectorized pandas_udf
    array kernels)."""
    from tf_datapipeline_spark.plans.inspect import formatted_plan

    for name, fn in sorted(registry.queries().items()):
        if "stream" in name:
            continue  # streaming results come from a memory sink scan
        plan = formatted_plan(fn(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, (
            f"{name} plans a row-at-a-time Python UDF"
        )


def test_collect_sites_are_bounded_metadata_only():
    """Source-level audit: .collect() inside the engine package is the
    un-distributed anti-pattern, so every site must be on the explicit
    allowlist of BOUNDED metadata collects (per-bucket aggregate rows,
    k-row centroid tables, shard manifests). A new .collect() on row
    data (like q87's old driver-side fixture loop) fails here until it
    is either made executor-side or consciously allowlisted."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parent.parent / "tf_datapipeline_spark"
    allowed = {
        # (file, enclosing function): why it is bounded
        ("operators/multimodal.py", "q8h_tfrecord_roundtrip"),  # shard manifest rows
        ("operators/pipeline.py", "offset_running_sum"),  # n_buckets agg rows
        ("operators/pipeline.py", "offset_row_number"),  # n_buckets agg rows
        # 1-row (min, max) span guard + equi-depth approxQuantile cuts;
        # bounds the two collects above at _MAX_OFFSET_BUCKETS rows (r9
        # advice: a raw metric bucket is otherwise corpus-proportional)
        ("operators/pipeline.py", "_coarsen_bucket"),
        # fused multi-metric variant of the same probe: one 1-row span
        # agg + one multi-column approxQuantile for ALL ranked metrics
        ("operators/pipeline.py", "plan_coarsen_cuts"),
        # <= _BPE_K merge-table rows (top-K over a partial aggregate);
        # inlined as literals so the vocab fold stays codegen-cheap
        ("operators/text.py", "_bpe_doc_counts"),
        # <= |groups| * _MAX_OFFSET_BUCKETS agg rows; group_cols is a
        # low-cardinality metadata key by contract (q26/q28's 5-value
        # c_mktsegment)
        ("operators/pipeline.py", "grouped_offset_row_number"),
        ("operators/similarity.py", "q73_knn_ann_ivf"),  # k=16 centroid rows
        ("operators/similarity.py", "q77_knn_ivfpq"),  # k=16 seed-centroid rows
        ("operators/similarity.py", "q7k_cell_balance"),  # <=16 seed rows
        # ONE argmax row per maximin round, K-1 rounds total (the
        # sequential farthest-first ledger q7n/qt6 seed from — each
        # round's distance update stays executor-side; only the single
        # winner row crosses to the driver)
        ("operators/similarity.py", "_farthest_first_picks"),
        # <= _COARSE_CAP coarse seed rows — the filter itself caps the row
        # count at a corpus-INDEPENDENT constant (r5 fix; the fine split
        # happens executor-side). Pinned corpus-independent below. Moved
        # to semcells.semantic_cells_df in r6 (shared by q6b and q7c).
        ("operators/semcells.py", "semantic_cells_df"),
        ("streaming/events_stream.py", "q7a_stream_sq_ingest"),  # 64 dim-range rows
        ("streaming/events_stream.py", "q7b_stream_ivf_assign"),  # <=16 seed rows
        # query-set-bounded shortlist: _N_QUERIES x _MMR_POOL rel rows +
        # _N_QUERIES x _MMR_POOL^2 pairwise sims (~4.6k rows, corpus-
        # independent — the distributed corpus pass happens BEFORE the
        # collect; the greedy is serving-layer work by design). The bound
        # is LINEAR in query count x pool^2, so q7f enforces it at runtime
        # against _MMR_COLLECT_CAP and fails fast past the ceiling — see
        # test_mmr_driver_greedy_regime_guard below.
        ("operators/similarity.py", "q7f_mmr_rerank"),
    }
    found = set()
    for py in pkg.rglob("*.py"):
        tree = ast.parse(py.read_text())
        rel = str(py.relative_to(pkg))

        def visit(node, fn_name):
            for child in ast.iter_child_nodes(node):
                name = fn_name
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    name = child.name if fn_name is None else fn_name
                if (
                    isinstance(child, ast.Call)
                    and isinstance(child.func, ast.Attribute)
                    and child.func.attr == "collect"
                ):
                    found.add((rel, fn_name or "<module>"))
                visit(child, name)

        visit(tree, None)
    unexpected = found - allowed
    assert not unexpected, (
        f"unreviewed .collect() sites (add executor-side write or "
        f"allowlist with a bounded-rows justification): {sorted(unexpected)}"
    )


def test_mmr_driver_greedy_regime_guard(spark):
    """q7f's driver-side greedy is allowlisted ONLY under the documented
    shortlist bound (r7 verdict task 5): _N_QUERIES * _MMR_POOL * (1 +
    _MMR_POOL) rows must stay under _MMR_COLLECT_CAP, and a configuration
    past the ceiling must fail fast with the regime message instead of
    silently growing the collect."""
    import pytest

    from tf_datapipeline_spark.operators import similarity as sim

    # current config is comfortably inside the regime
    assert sim._mmr_collect_rows() <= sim._MMR_COLLECT_CAP
    assert sim._mmr_collect_rows() == (
        sim._N_QUERIES * sim._MMR_POOL * (1 + sim._MMR_POOL)
    )
    # past the ceiling the operator refuses to run (fail fast, no collect)
    orig = sim._MMR_POOL
    try:
        sim._MMR_POOL = 4096  # 8 * 4096 * 4097 >> cap
        with pytest.raises(ValueError, match="out of driver-greedy regime"):
            sim.q7f_mmr_rerank(spark, SF_SMOKE)
    finally:
        sim._MMR_POOL = orig


def test_semantic_centroid_collect_is_corpus_independent():
    """The r4 verdict's top finding: q6b collected max(16, n/128) centroid
    rows — LINEAR in the corpus — to the driver. The r5 shape caps the
    driver-visible coarse level at _COARSE_CAP and splits the residual
    executor-side; this pins that the cap holds at ANY corpus size (the
    allowlist entry above relies on it), that the target cell count
    still grows with the corpus (per-cell pair work stays bounded), and
    that coarse x fine covers the target."""
    from tf_datapipeline_spark.operators.dedup import (
        _COARSE_CAP,
        _semantic_cells_config,
    )

    for n in [0, 500, 10**5, 10**7, 10**9, 10**12]:
        target, k1, n_fine = _semantic_cells_config(n)
        assert k1 <= _COARSE_CAP, f"driver-side centroid rows unbounded at n={n}"
        assert target == max(16, n // 128)  # cell growth keeps pairs linear
        assert k1 * n_fine >= target  # hierarchy covers the target count
        assert n_fine <= -(-target // k1) + 1  # no overshoot blow-up


def test_nlj_audit_catches_corpus_broadcast(spark):
    """Negative control for the structural NLJ audit: a deliberate
    corpus-sized broadcast build (broadcast(documents) cross-joined
    against documents) must be flagged — otherwise the audit above is
    vacuously green."""
    from tf_datapipeline_spark.catalog import load_table
    from tf_datapipeline_spark.plans.inspect import unbounded_nlj_builds

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    bad = F_broadcast(docs).crossJoin(docs.select(F_col("doc_id").alias("d2")))
    assert unbounded_nlj_builds(bad), "corpus broadcast not flagged"
