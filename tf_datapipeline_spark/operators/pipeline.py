"""The reference's own pipeline operator surface, re-expressed relationally
(SURVEY.md §2A): label-dictionary build (S1/P6), seeded shuffle (R1),
train/validation split (R2), epoch repeat (B3), batching math (B1/B2),
shard assignment (S6), one-hot encode (M12), argmax (A2) and accuracy-style
metric reductions (A1/A3/A4).

Randomness discipline: the reference shuffles with `random.seed(0);
random.shuffle(filenames)` (reference: make_tf_record.py:10,155-156). A
Python shuffle is neither distributed nor oracle-checkable, so the engine
uses an arithmetic permutation key — a Knuth multiplicative hash of the
row key — which is deterministic, seedable, computable in any engine, and
embarrassingly parallel at 100 TB. Tests verify it is a permutation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tf_datapipeline_spark.catalog import load_table
from tf_datapipeline_spark.functions.dicts import dense_id_dict
from tf_datapipeline_spark.registry import query
from tf_datapipeline_spark.functions.texthash import sql_hash32, sql_hash32_dialect

# Knuth's multiplicative constant (2^32 / phi); modulus 2^32.
_SHUFFLE_MULT = 2654435761
_SHUFFLE_MOD = 4294967296


def shuffle_key(col: Column, seed: int = 0) -> Column:
    """Deterministic pseudo-random permutation key for seeded shuffles
    (R1). seed offsets the multiplicative hash so different seeds give
    different orders."""
    return (
        (col.cast("bigint") + F.lit(seed)) * F.lit(_SHUFFLE_MULT) % F.lit(_SHUFFLE_MOD)
    )


def sql_shuffle_key(expr: str, seed: int = 0) -> str:
    return f"((({expr}) + {seed}) * {_SHUFFLE_MULT}) % {_SHUFFLE_MOD}"


_MAX_OFFSET_BUCKETS = 4096  # driver prefix-table ceiling (corpus-independent)

# Per-bucket row target for the coarsening sketch (r11 optimization):
# the bucket count only has to (a) keep the driver prefix table bounded
# (≤ _MAX_OFFSET_BUCKETS rows) and (b) keep each (group, bucket) window
# task's sort bounded — a 64Ki-row in-task sort is noise at any scale.
# A FIXED 4096-bucket sketch (the r10 shape) paid the sketch's cost
# ceiling on every input: approxQuantile at eps=1/4096 with 4095 probes
# is multi-second even on a 3000-row table (driver-side sketch query per
# probe), which dominated q4zf/q4zm at bench scale. k now adapts to the
# measured row count — k = min(ceiling, ceil(n / 64Ki)) — so small
# inputs sketch a handful of cuts (or none: k ≤ 1 collapses to one
# bucket, a single ≤64Ki-row sort) while 100 TB inputs still get the
# full 4096 buckets. Cut placement only shapes the PLAN, never values
# (monotone re-bucket — see _coarsen_bucket), so results are identical.
_TARGET_BUCKET_ROWS = 65536


def _adaptive_k(n: int, max_buckets: int) -> int:
    return min(max_buckets, -(-n // _TARGET_BUCKET_ROWS))


def _sketch_cuts(df: DataFrame, cols: list[str], k: int) -> list["np.ndarray"]:
    """Equi-depth cut points (k-quantiles) for each column, one sketch
    job. k ≤ 1 means a single bucket: empty cut array (every row maps to
    bucket 0 in _apply_cuts)."""
    if k <= 1:
        return [np.array([], dtype=np.int64) for _ in cols]
    probs = [i / k for i in range(1, k)]
    return [
        np.array(sorted(int(v) for v in qs), dtype=np.int64)
        for qs in df.stat.approxQuantile(cols, probs, 1.0 / k)
    ]


def plan_coarsen_cuts(
    df: DataFrame, cols: list[str], max_buckets: int = _MAX_OFFSET_BUCKETS
) -> dict[str, "np.ndarray | None"]:
    """Fused coarsening probe for callers that rank SEVERAL metrics of
    the same table (r10 verdict task 6: q4zf ran the span guard + the
    approxQuantile sketch once PER ranked metric — three stats jobs and
    up to three sketch jobs over the same per-user aggregate). ONE agg
    computes every metric's span AND the row count; ONE multi-column
    approxQuantile call sketches exactly the metrics whose span exceeds
    the ceiling, at the adaptive bucket count (see _TARGET_BUCKET_ROWS).
    Returns per-column cut arrays (None = span fits, keep raw buckets)
    to pass as offset_row_number(..., cuts=...). The cut semantics are
    identical to _coarsen_bucket's own probe, so the fusion changes job
    count, never values."""
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c).cast("bigint")).alias(f"_lo_{c}"))
        aggs.append(F.max(F.col(c).cast("bigint")).alias(f"_hi_{c}"))
    stats = df.agg(*aggs).collect()[0]
    need = [
        c
        for c in cols
        if stats[f"_lo_{c}"] is not None
        and stats[f"_hi_{c}"] - stats[f"_lo_{c}"] + 1 > max_buckets
    ]
    cuts: dict[str, np.ndarray | None] = {c: None for c in cols}
    if need:
        k = _adaptive_k(stats["_n_rows"], max_buckets)
        for c, arr in zip(need, _sketch_cuts(df, need, k)):
            cuts[c] = arr
    return cuts


def _apply_cuts(df: DataFrame, cuts: "np.ndarray") -> DataFrame:
    """Monotone re-bucket of `_b` by binary search over the cut points
    (vectorized Arrow-batched np.searchsorted — the engine's sanctioned
    Python path; a pure-SQL binary search either duplicates the index
    expression exponentially or scans all cuts linearly). An EMPTY cut
    array is the k ≤ 1 degenerate case (input fits one target-sized
    bucket): constant bucket 0, pure codegen, no Python node at all."""
    if len(cuts) == 0:
        return df.withColumn("_b", F.lit(0).cast("bigint"))

    @F.pandas_udf("bigint")
    def _equi_depth(vals: pd.Series) -> pd.Series:
        return pd.Series(
            np.searchsorted(cuts, vals.to_numpy(), side="right").astype(
                "int64"
            )
        )

    return df.withColumn("_b", _equi_depth("_b"))


def _coarsen_bucket(df: DataFrame, max_buckets: int) -> DataFrame:
    """Re-bucket `_b` so the driver prefix table stays ≤ max_buckets rows
    no matter the caller's bucket cardinality (r9 advice: a raw metric
    bucket — e.g. q4zf's cents — is ~user-cardinality, so the pass-1
    collect would grow with the corpus).

    Guard: when the value SPAN already fits (hi - lo + 1 ≤ max_buckets),
    distinct ≤ span is an EXACT bound — keep the raw buckets and the
    final plan byte-identical (the r10 review killed the earlier
    approx_count_distinct guard, whose HLL error made the documented
    ceiling only approximate).

    Otherwise: EQUI-DEPTH cut points (approxQuantile, one sketch pass)
    + a vectorized Arrow-batched np.searchsorted per row (the engine's
    sanctioned Python path — a pure-SQL binary search either duplicates
    the index expression exponentially or scans all cuts linearly).
    Equi-width shifting was the first draft and collapses under range
    outliers (one whale value stretches the span so every other row
    lands in coarse bucket 0 — re-creating the single-task sort this
    device exists to prevent); quantile cuts keep partitions balanced
    for ANY distribution. The mapping (count of cuts ≤ raw) is monotone
    in raw, so bucket order still equals global order, and the RESULT is
    invariant to where the cuts land — only plan balance depends on
    sketch accuracy. Heavy TIES in the leading order key cannot be split
    by any monotone bucketing (they must share a window partition), so
    tie-skew is inherent to exact global numbering, not to this
    device.

    r11: the sketch's bucket count adapts to the measured row count
    (see _TARGET_BUCKET_ROWS) — the span probe already aggregates the
    table, so the count rides the same job. Values are unchanged for
    any k (monotone re-bucket); only sketch cost and plan balance
    move."""
    stats = df.agg(
        F.min("_b").alias("lo"),
        F.max("_b").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if stats["lo"] is None or stats["hi"] - stats["lo"] + 1 <= max_buckets:
        return df
    k = _adaptive_k(stats["n"], max_buckets)
    return _apply_cuts(df, _sketch_cuts(df, ["_b"], k)[0])


def offset_running_sum(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column | str],
    value: Column,
    sum_name: str = "running_sum",
) -> DataFrame:
    """Exclusive global running sum of `value` WITHOUT an unpartitioned
    window — the same two-pass partition-offset shape as
    `offset_row_number`: (1) per-bucket value sums -> driver prefix sum
    (one tiny row per bucket), (2) within-bucket exclusive running sum +
    broadcast-joined bucket offset. `bucket` must be a monotone function
    of the leading order key. Row r gets sum(value) over all rows
    strictly before r in the global order."""
    spark = df.sparkSession
    b = df.withColumn("_b", bucket.cast("bigint")).withColumn(
        "_v", value.cast("bigint")
    )
    # r11: run the coarsening probe/sketch and the pass-1 sums over a
    # SLIM (16 B/row) localCheckpoint of just (_b, _v) instead of
    # re-deriving the caller's full lineage once per stats job (3-4
    # upstream re-evaluations at bench scale; 3-4 full corpus scans at
    # 100 TB). The final numbered plan below stays on the original
    # lineage — exactly one more evaluation — so payload columns are
    # never materialized.
    slim = b.select("_b", "_v").localCheckpoint()
    st = slim.agg(
        F.min("_b").alias("lo"),
        F.max("_b").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if st["lo"] is not None and st["hi"] - st["lo"] + 1 > _MAX_OFFSET_BUCKETS:
        cuts = _sketch_cuts(
            slim, ["_b"], _adaptive_k(st["n"], _MAX_OFFSET_BUCKETS)
        )[0]
        slim = _apply_cuts(slim, cuts)
        b = _apply_cuts(b, cuts)
    sums = {
        r["_b"]: r["s"]
        for r in slim.groupBy("_b").agg(F.sum("_v").alias("s")).collect()
    }
    w = (
        Window.partitionBy("_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    if len(sums) <= 1:
        # single bucket: the only prefix offset is 0 — no join (see
        # offset_row_number's single-bucket note)
        return b.withColumn(
            sum_name, F.coalesce(F.sum("_v").over(w), F.lit(0))
        ).drop("_b", "_v")
    offsets, acc = [], 0
    for k in sorted(sums):
        offsets.append((k, acc))
        acc += sums[k]
    odf = spark.createDataFrame(offsets, "_b bigint, _off bigint")
    return (
        b.join(F.broadcast(odf), "_b")
        .withColumn(sum_name, F.coalesce(F.sum("_v").over(w), F.lit(0)) + F.col("_off"))
        .drop("_b", "_v", "_off")
    )


def offset_row_number(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column | str],
    rn_name: str = "rn",
    prebounded: bool = False,
    cuts: "np.ndarray | None | str" = "auto",
) -> tuple[DataFrame, int]:
    """Global 1-based row numbering WITHOUT an unpartitioned window.

    Two passes: (1) per-bucket counts -> driver prefix sum (one tiny row
    per bucket), (2) partitioned row_number + broadcast-joined offset.
    `bucket` must be a monotone function of the leading order key so that
    bucket order == global order; every window in the final plan is
    partitioned by bucket — no `Exchange SinglePartition`, the shape that
    survives 100 TB. High-cardinality buckets (a raw metric value is
    fine) are re-coarsened to ≤ _MAX_OFFSET_BUCKETS driver rows first;
    a caller whose bucket is bounded BY CONSTRUCTION (q32/q36's fixed
    64-cell hash-key grid) passes prebounded=True to skip the
    coarsening stats pass entirely (r10 review: the guard pass is cheap
    but it is still one extra scan); a caller ranking several metrics of
    one table passes the fused plan_coarsen_cuts result as `cuts`
    (ndarray = apply these cut points, None = span already fits) so the
    guard + sketch run once for ALL metrics, not once per call.
    Returns (numbered df, total row count) — the total falls out of
    pass 1 for free.
    """
    spark = df.sparkSession
    b = df.withColumn("_b", bucket.cast("bigint"))
    counts_src = b
    if cuts is None or prebounded:
        pass  # caller certifies the bucket span fits _MAX_OFFSET_BUCKETS
    elif isinstance(cuts, str):  # "auto": probe + sketch per call
        # r11: probe/sketch/counts over a SLIM (_b-only) localCheckpoint
        # — one lineage evaluation instead of one per stats job (see
        # offset_running_sum). Callers on the None/prebounded/ndarray
        # paths skip the checkpoint: they either certify the span or
        # have already materialized their input (q4zf's per-user m).
        slim = b.select("_b").localCheckpoint()
        st = slim.agg(
            F.min("_b").alias("lo"),
            F.max("_b").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if (
            st["lo"] is not None
            and st["hi"] - st["lo"] + 1 > _MAX_OFFSET_BUCKETS
        ):
            arr = _sketch_cuts(
                slim, ["_b"], _adaptive_k(st["n"], _MAX_OFFSET_BUCKETS)
            )[0]
            slim = _apply_cuts(slim, arr)
            b = _apply_cuts(b, arr)
        counts_src = slim
    else:
        b = _apply_cuts(b, cuts)
        counts_src = b
    counts = {
        r["_b"]: r["n"]
        for r in counts_src.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    w = Window.partitionBy("_b").orderBy(*order_cols)
    if len(counts) <= 1:
        # single bucket (e.g. the adaptive-k degenerate constant bucket):
        # the only offset is 0 — no join at all. (A literal-_b equi-join
        # also constant-folds into a nested-loop join, which the
        # structural NLJ audit rightly rejects.)
        numbered = b.withColumn(rn_name, F.row_number().over(w)).drop("_b")
        return numbered, total
    offsets, acc = [], 0
    for k in sorted(counts):
        offsets.append((k, acc))
        acc += counts[k]
    odf = spark.createDataFrame(offsets, "_b bigint, _off bigint")
    numbered = (
        b.join(F.broadcast(odf), "_b")
        .withColumn(rn_name, F.row_number().over(w) + F.col("_off"))
        .drop("_b", "_off")
    )
    return numbered, total


def grouped_offset_row_number(
    df: DataFrame,
    group_cols: list[str],
    bucket: Column,
    order_cols: list[Column | str],
    rn_name: str = "rn",
    n_name: str = "_n",
) -> DataFrame:
    """Per-GROUP 1-based row numbering plus the group's row count,
    without partitioning any window on the group key alone — the fix for
    the q26/q28 class (r9 verdict task 2): a data-sized window
    partitioned on a ≤5-value key funnels each group through ONE task's
    sort. Same two-pass shape as `offset_row_number`, prefix-summed per
    group: (1) (group, bucket) counts -> driver (≤ |groups| ·
    _MAX_OFFSET_BUCKETS rows — group_cols must be a LOW-cardinality
    metadata key, the very property that made the single-task sort a
    bottleneck), (2) windows partitioned by (group, bucket) + a
    broadcast-joined per-(group, bucket) offset. `bucket` must be a
    monotone function of the group's leading order key. Appends rn_name
    and n_name (the group total, for rank-ratio arithmetic)."""
    spark = df.sparkSession
    b = df.withColumn("_b", bucket.cast("bigint"))
    # r11: slim checkpoint for probe/sketch/counts (see offset_running_sum)
    slim = b.select(*group_cols, "_b").localCheckpoint()
    st = slim.agg(
        F.min("_b").alias("lo"),
        F.max("_b").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if st["lo"] is not None and st["hi"] - st["lo"] + 1 > _MAX_OFFSET_BUCKETS:
        arr = _sketch_cuts(
            slim, ["_b"], _adaptive_k(st["n"], _MAX_OFFSET_BUCKETS)
        )[0]
        slim = _apply_cuts(slim, arr)
        b = _apply_cuts(b, arr)
    counts = (
        slim.groupBy(*group_cols, "_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_group: dict[tuple, list] = {}
    for r in counts:
        by_group.setdefault(tuple(r[c] for c in group_cols), []).append(r)
    offsets = []
    for g in sorted(by_group, key=repr):
        acc = 0
        rows = sorted(by_group[g], key=lambda r: r["_b"])
        total = sum(r["n"] for r in rows)
        for r in rows:
            offsets.append((*g, r["_b"], acc, total))
            acc += r["n"]
    schema_groups = b.select(*group_cols).schema
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema_groups.fields
    )
    w = Window.partitionBy(*group_cols, "_b").orderBy(*order_cols)
    if len({r["_b"] for r in counts}) <= 1:
        # single bucket everywhere (the adaptive-k degenerate case):
        # per-group offset is 0 and the join key reduces to the group
        # columns (a literal-_b equi-join would constant-fold into a
        # nested-loop join — see offset_row_number)
        odf = spark.createDataFrame(
            [(*g, sum(r["n"] for r in rows))
             for g, rows in ((g, by_group[g]) for g in sorted(by_group, key=repr))],
            f"{fields}, {n_name} bigint",
        )
        return (
            b.join(F.broadcast(odf), list(group_cols))
            .withColumn(rn_name, F.row_number().over(w))
            .drop("_b")
        )
    odf = spark.createDataFrame(
        offsets, f"{fields}, _b bigint, _off bigint, {n_name} bigint"
    )
    return (
        b.join(F.broadcast(odf), [*group_cols, "_b"])
        .withColumn(rn_name, F.row_number().over(w) + F.col("_off"))
        .drop("_b", "_off")
    )


# --------------------------------------------------------------------------
# q30 — label dictionary: sorted class names → dense ids, joined back.
# Reference: sorted(class_names) → dict(zip(names, range(n)))
# (generator.py:34-38, make_tf_record.py:151); here the "class name" is
# documents.lang. The dictionary is tiny → broadcast join back.
# --------------------------------------------------------------------------
@query(
    "q30_label_dictionary",
    oracle="""
    WITH dict AS (
      SELECT lang,
             CAST(ROW_NUMBER() OVER (ORDER BY lang) - 1 AS INTEGER) AS label_id
      FROM (SELECT DISTINCT lang FROM documents)
    )
    SELECT d.doc_id, d.lang, dict.label_id
    FROM documents d JOIN dict USING (lang)
    """,
)
def q30_label_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dict_df = dense_id_dict(docs, "lang", "label_id")
    return docs.join(F.broadcast(dict_df), "lang").select("doc_id", "lang", "label_id")


# --------------------------------------------------------------------------
# q31 — seeded shuffle + split, scalable form: a modulo of the permutation
# key assigns ~10% to validation. O(1) per row, no global sort — the form
# that survives 100 TB. Reference semantics analog: R1+R2
# (make_tf_record.py:155-158).
# --------------------------------------------------------------------------
@query(
    "q31_seeded_shuffle_split",
    oracle=f"""
    SELECT doc_id,
           {sql_shuffle_key("doc_id")} AS shuffle_key,
           CASE WHEN {sql_shuffle_key("doc_id")} % 10 = 0
                THEN 'validation' ELSE 'train' END AS split
    FROM documents
    """,
)
def q31_seeded_shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = shuffle_key(F.col("doc_id"))
    return docs.select(
        "doc_id",
        key.alias("shuffle_key"),
        F.when(key % 10 == 0, "validation").otherwise("train").alias("split"),
    )


# --------------------------------------------------------------------------
# q32 — exact-head split: the reference's literal semantics (shuffle, then
# the first N records are validation; make_tf_record.py:157-158). Exact
# AND scalable: the permutation key is uniform in [0, 2^32), so its top
# bits are an order-preserving bucket — two-pass offset numbering
# (offset_row_number) gives the global rank with every window partitioned
# by bucket, no single-task Exchange.
# --------------------------------------------------------------------------
_KEY_BUCKETS = 64  # order-preserving buckets over the uniform 32-bit key
_KEY_BUCKET_W = _SHUFFLE_MOD // _KEY_BUCKETS
@query(
    "q32_split_exact_head",
    oracle=f"""
    WITH shuffled AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY {sql_shuffle_key("doc_id")}, doc_id) AS rn,
             COUNT(*) OVER () AS total
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN rn <= total / 10 THEN 'validation' ELSE 'train' END AS split
    FROM shuffled
    """,
)
def q32_split_exact_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = shuffle_key(F.col("doc_id"))
    numbered, total = offset_row_number(
        docs, F.floor(key / _KEY_BUCKET_W), [key, F.col("doc_id")],
        prebounded=True,  # fixed 64-cell grid by construction
    )
    return numbered.select(
        "doc_id",
        F.when(F.col("rn") <= F.lit(total) / 10, "validation")
        .otherwise("train")
        .alias("split"),
    )


# --------------------------------------------------------------------------
# q33 — epoch repeat (B3): dataset.repeat(num_epochs)
# (dataset_queue.py:56). Cardinality = epochs × rows; realized as a cross
# join with a tiny epoch dim (broadcast, no shuffle of the fact side).
# --------------------------------------------------------------------------
@query(
    "q33_epoch_repeat",
    oracle="""
    SELECT d.doc_id, e.epoch
    FROM documents d
    CROSS JOIN (VALUES (0), (1), (2)) AS e(epoch)
    """,
)
def q33_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    return docs.crossJoin(F.broadcast(epochs))


# --------------------------------------------------------------------------
# q34 — one-hot encode (M12): tf.one_hot(labels, class_num)
# (train.py:85). Nation's region key one-hot over the 5 regions; flat
# integer columns so the oracle can check exactly.
# --------------------------------------------------------------------------
@query(
    "q34_one_hot",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 0 THEN 1 ELSE 0 END AS r_0,
           CASE WHEN n_regionkey = 1 THEN 1 ELSE 0 END AS r_1,
           CASE WHEN n_regionkey = 2 THEN 1 ELSE 0 END AS r_2,
           CASE WHEN n_regionkey = 3 THEN 1 ELSE 0 END AS r_3,
           CASE WHEN n_regionkey = 4 THEN 1 ELSE 0 END AS r_4
    FROM nation
    """,
)
def q34_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cols = [
        F.when(F.col("n_regionkey") == i, 1).otherwise(0).alias(f"r_{i}")
        for i in range(5)
    ]
    return nation.select("n_nationkey", *cols)


# --------------------------------------------------------------------------
# q35 — batching math (B1/B2): fixed-size batches with a ragged tail
# (generator.py:44-47 `min(batch_size, remaining)`;
# dataset.batch, dataset_queue.py:57). Logical batch ids over a
# deterministic order; the output shows every batch full except the tail.
# In execution, batching is an Arrow detail (maxRecordsPerBatch) — this is
# the *logical* operator for when batch identity matters.
# --------------------------------------------------------------------------
@query(
    "q35_batch_ragged_tail",
    oracle="""
    WITH numbered AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn
      FROM documents
    )
    SELECT CAST(FLOOR(rn / 16.0) AS BIGINT) AS batch_id, COUNT(*) AS batch_rows
    FROM numbered GROUP BY 1
    """,
)
def q35_batch_ragged_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # doc_id itself is the order key: bucket its value range directly
    # (4096-wide, order-preserving; balanced for the dense ids this table
    # carries, and correctness never depends on balance).
    numbered, _ = offset_row_number(
        docs, F.floor(F.col("doc_id") / 4096), [F.col("doc_id")]
    )
    return (
        numbered.select(F.floor((F.col("rn") - 1) / 16).alias("batch_id"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("batch_rows"))
    )


# --------------------------------------------------------------------------
# q36 — shard assignment (S6): the ETL writer's contiguous range sharding
# into _NUM_SHARDS=5 (make_tf_record.py:111,120-128:
# shard i gets records [i*ceil(N/5), (i+1)*ceil(N/5))).
# --------------------------------------------------------------------------
@query(
    "q36_shard_assignment",
    oracle=f"""
    WITH numbered AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY {sql_shuffle_key("doc_id")}, doc_id) - 1 AS rn,
             COUNT(*) OVER () AS total
      FROM documents
    )
    SELECT CAST(FLOOR(rn / CAST(CEIL(total / 5.0) AS BIGINT)) AS BIGINT) AS shard_id,
           COUNT(*) AS shard_rows,
           MIN(rn) AS first_rn, MAX(rn) AS last_rn
    FROM numbered GROUP BY 1
    """,
)
def q36_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = shuffle_key(F.col("doc_id"))
    numbered, total = offset_row_number(
        docs, F.floor(key / _KEY_BUCKET_W), [key, F.col("doc_id")],
        prebounded=True,  # fixed 64-cell grid by construction
    )
    per_shard = math.ceil(total / 5) if total else 1
    rn0 = F.col("rn") - 1
    return (
        numbered.select((rn0 / per_shard).cast("bigint").alias("shard_id"), rn0.alias("rn"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("shard_rows"),
            F.min("rn").alias("first_rn"),
            F.max("rn").alias("last_rn"),
        )
    )


# --------------------------------------------------------------------------
# q37 — argmax (A2): tf.argmax(logits, 1) (train.py:89-90) over the
# embedding array; 1-based position of the max (first occurrence), a pure
# array expression (no UDF, stays in codegen).
# --------------------------------------------------------------------------
@query(
    "q37_argmax",
    oracle="""
    SELECT vec_id,
           CAST(list_position(embedding, list_aggregate(embedding, 'max')) AS BIGINT)
             AS argmax_pos
    FROM embeddings
    """,
)
def q37_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.array_position(F.col("embedding"), F.array_max(F.col("embedding"))).alias(
            "argmax_pos"
        ),
    )


# --------------------------------------------------------------------------
# q38 — accuracy-style metric reduction (A1):
# reduce_mean(cast(equal(pred, truth))) (train.py:58-59). "Prediction" is
# the argmax index mod 10 vs the stored label; integer sums → exact.
# --------------------------------------------------------------------------
@query(
    "q38_accuracy_metric",
    oracle="""
    SELECT label,
           CAST(SUM(CASE WHEN (list_position(embedding, list_aggregate(embedding, 'max')) - 1) % 10 = label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN (list_position(embedding, list_aggregate(embedding, 'max')) - 1) % 10 = label
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS accuracy
    FROM embeddings
    GROUP BY label
    """,
)
def q38_accuracy_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pred = (
        F.array_position(F.col("embedding"), F.array_max(F.col("embedding"))) - 1
    ) % 10
    correct = F.when(pred == F.col("label"), 1).otherwise(0)
    return emb.groupBy("label").agg(
        F.sum(correct).alias("n_correct"),
        F.count(F.lit(1)).alias("n"),
        (F.sum(correct).cast("double") / F.count(F.lit(1))).alias("accuracy"),
    )


# --------------------------------------------------------------------------
# q39 — epoch/step bookkeeping (A4): steps-per-epoch = ceil(rows / batch)
# (train.py:115-117), per split from q31's assignment.
# --------------------------------------------------------------------------
@query(
    "q39_step_math",
    oracle=f"""
    SELECT CASE WHEN {sql_shuffle_key("doc_id")} % 10 = 0
                THEN 'validation' ELSE 'train' END AS split,
           COUNT(*) AS n_rows,
           CAST(CEIL(COUNT(*) / 16.0) AS BIGINT) AS steps_per_epoch,
           CAST(CEIL(COUNT(*) / 16.0) AS BIGINT) * 2 AS total_steps_2_epochs
    FROM documents GROUP BY 1
    """,
)
def q39_step_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = shuffle_key(F.col("doc_id"))
    split = F.when(key % 10 == 0, "validation").otherwise("train").alias("split")
    steps = F.ceil(F.count(F.lit(1)) / 16.0).cast("bigint")
    return (
        docs.select(split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            steps.alias("steps_per_epoch"),
            (steps * 2).alias("total_steps_2_epochs"),
        )
    )


# --------------------------------------------------------------------------
# q3a — deterministic stratified sampling: ~1-in-5 of each lang stratum
# via the arithmetic permutation key (NOT rand()-based Bernoulli — the
# sample must be identical under task retries, repartitions, and across
# engines; df.sample() is none of those). Output proves stratification:
# per-stratum picked counts alongside stratum size.
# --------------------------------------------------------------------------
@query(
    "q3a_stratified_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, doc_id, {sql_shuffle_key("doc_id", 3)} AS k FROM documents
    )
    SELECT lang,
           COUNT(*) AS stratum_size,
           CAST(SUM(CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(MIN(CASE WHEN k % 5 = 0 THEN doc_id END) AS BIGINT) AS first_sampled
    FROM keyed GROUP BY lang
    """,
)
def q3a_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = shuffle_key(F.col("doc_id"), seed=3)
    picked = (k % 5 == 0).cast("int")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("stratum_size"),
        F.sum(picked).alias("n_sampled"),
        F.min(F.when(picked == 1, F.col("doc_id"))).alias("first_sampled"),
    )


# --------------------------------------------------------------------------
# q3b — source-weighted dataset mixing: each source gets a sampling rate
# derived from its name (even sources 80%, odd sources 30% here — in a
# real pipeline the weights come from a mixing config). Selection is the
# deterministic permutation key against a per-source threshold: O(1) per
# row, no rand(), identical under retries and across engines — how a
# 100 TB corpus is re-weighted without materializing per-source splits.
# --------------------------------------------------------------------------
@query(
    "q3b_weighted_mix",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id,
             {sql_shuffle_key("doc_id", 11)} % 100 AS pct,
             CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
                  THEN 80 ELSE 30 END AS rate
      FROM documents
    )
    SELECT source, MIN(rate) AS rate_pct,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN pct < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM keyed GROUP BY source
    """,
)
def q3b_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pct = shuffle_key(F.col("doc_id"), seed=11) % 100
    rate = F.when(
        F.substring("source", 4, 10).cast("bigint") % 2 == 0, 80
    ).otherwise(30)
    kept = (pct < rate).cast("int")
    return docs.select("source", rate.alias("rate"), kept.alias("kept")).groupBy(
        "source"
    ).agg(
        F.min("rate").alias("rate_pct"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("kept").alias("n_kept"),
    )


# --------------------------------------------------------------------------
# qp1 — composite feed pipeline: seeded shuffle (R1/R4) -> train/val split
# (R2) -> per-epoch reshuffle (B3, seed+epoch) -> fixed-size batches with
# ragged tails (B1/B2), reduced to per-(epoch, split, batch) audit rows.
# One driver-gate query exercising the whole feed chain the reference
# builds from queue runners (train.py:113-129, make_tf_record.py:155-158);
# windows are partitioned by (epoch, split) — no global sort.
# --------------------------------------------------------------------------
@query(
    "qp1_feed_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT d.doc_id, e.epoch,
             CASE WHEN {sql_shuffle_key("d.doc_id")} % 10 = 0
                  THEN 'validation' ELSE 'train' END AS split,
             ((d.doc_id + e.epoch) * {_SHUFFLE_MULT}) % {_SHUFFLE_MOD} AS ek
      FROM documents d CROSS JOIN (VALUES (0), (1)) AS e(epoch)
    ), numbered AS (
      SELECT epoch, split, doc_id, ek,
             ROW_NUMBER() OVER (PARTITION BY epoch, split ORDER BY ek, doc_id) - 1 AS rn
      FROM base
    )
    SELECT epoch, split, CAST(FLOOR(rn / 16.0) AS BIGINT) AS batch_id,
           COUNT(*) AS batch_rows,
           CAST(arg_min(doc_id, ek) AS BIGINT) AS first_doc
    FROM numbered GROUP BY 1, 2, 3
    """,
)
def qp1_feed_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    key0 = shuffle_key(F.col("doc_id"))
    ek = ((F.col("doc_id") + F.col("epoch")) * F.lit(_SHUFFLE_MULT)) % F.lit(
        _SHUFFLE_MOD
    )
    base = docs.crossJoin(F.broadcast(epochs)).select(
        "doc_id",
        "epoch",
        F.when(key0 % 10 == 0, "validation").otherwise("train").alias("split"),
        ek.alias("ek"),
    )
    w = Window.partitionBy("epoch", "split").orderBy("ek", "doc_id")
    numbered = base.withColumn("rn", F.row_number().over(w) - F.lit(1))
    return (
        numbered.groupBy(
            "epoch", "split", F.floor(F.col("rn") / 16).alias("batch_id")
        )
        .agg(
            F.count(F.lit(1)).alias("batch_rows"),
            F.min_by("doc_id", "ek").alias("first_doc"),
        )
    )


# --------------------------------------------------------------------------
# qp2 — composite label/metric kernel: label dictionary (S1/P6 analog over
# the embeddings labels), one-hot encode (M12, train.py:85), argmax (A2,
# train.py:89-90), accuracy reduction (A1, train.py:58-59) and step math
# (A4, train.py:115-117) in one oracle-checked result — the training-side
# scalar surface as a single driver-gate row per label.
# --------------------------------------------------------------------------
@query(
    "qp2_label_metrics",
    oracle="""
    WITH pred AS (
      SELECT label,
             CASE WHEN (list_position(embedding, list_aggregate(embedding, 'max')) - 1) % 10
                       = label
                  THEN 1 ELSE 0 END AS correct
      FROM embeddings
    ), per_label AS (
      SELECT label, COUNT(*) AS n, CAST(SUM(correct) AS BIGINT) AS n_correct
      FROM pred GROUP BY label
    ), dict AS (
      SELECT label, ROW_NUMBER() OVER (ORDER BY label) - 1 AS label_id
      FROM (SELECT DISTINCT label FROM embeddings)
    )
    SELECT p.label, d.label_id, p.n, p.n_correct,
           CAST(p.n_correct AS DOUBLE) / p.n AS accuracy,
           CAST(CEIL(p.n / 16.0) AS BIGINT) AS steps_per_epoch,
           CASE WHEN d.label_id % 5 = 0 THEN 1 ELSE 0 END AS oh_0,
           CASE WHEN d.label_id % 5 = 1 THEN 1 ELSE 0 END AS oh_1,
           CASE WHEN d.label_id % 5 = 2 THEN 1 ELSE 0 END AS oh_2,
           CASE WHEN d.label_id % 5 = 3 THEN 1 ELSE 0 END AS oh_3,
           CASE WHEN d.label_id % 5 = 4 THEN 1 ELSE 0 END AS oh_4
    FROM per_label p JOIN dict d USING (label)
    """,
)
def qp2_label_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pred = (
        F.array_position(F.col("embedding"), F.array_max(F.col("embedding"))) - 1
    ) % 10
    correct = F.when(pred == F.col("label"), 1).otherwise(0)
    per_label = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum(correct).alias("n_correct")
    )
    dict_df = dense_id_dict(emb, "label", "label_id").withColumn(
        "label_id", F.col("label_id").cast("bigint")
    )
    one_hot = [
        F.when(F.col("label_id") % 5 == i, 1).otherwise(0).alias(f"oh_{i}")
        for i in range(5)
    ]
    return per_label.join(F.broadcast(dict_df), "label").select(
        "label",
        "label_id",
        "n",
        "n_correct",
        (F.col("n_correct").cast("double") / F.col("n")).alias("accuracy"),
        F.ceil(F.col("n") / 16.0).cast("bigint").alias("steps_per_epoch"),
        *one_hot,
    )


# --------------------------------------------------------------------------
# q3c — stratified hash sampling: per-stratum (lang) keep rates applied via
# the cross-engine md5 hash32 (functions/texthash.py), so the SAME rows
# are kept in Spark and DuckDB and the oracle is exact — no RNG, no
# sampleBy approximation. At 100 TB this is a narrow filter (scan ->
# filter, no shuffle); rates live in the expression, not a join.
# --------------------------------------------------------------------------
_STRATA_RATES = {"en": 50, "de": 30, "es": 30, "fr": 20, "zh": 10}  # % kept


@query(
    "q3c_stratified_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             {sql_hash32("'strat-' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    ),
    kept AS (
      SELECT * FROM keyed
      WHERE bucket < CASE lang
          {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())}
          ELSE 0 END
    )
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM kept GROUP BY lang
    """,
)
def q3c_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            sql_hash32_dialect("'strat-' || CAST(doc_id AS STRING)", "spark")
        )
        % 100
    )
    rate = F.create_map(
        *[x for k, v in _STRATA_RATES.items() for x in (F.lit(k), F.lit(v))]
    )
    kept = docs.filter(bucket < F.coalesce(rate[F.col("lang")], F.lit(0)))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# --------------------------------------------------------------------------
# q3d — deterministic reservoir sample: exactly k docs per stratum, chosen
# by rank over the same cross-engine hash — the distributed analog of
# reservoir sampling (uniform exact-k without a global pass; Vitter 1985
# semantics, made deterministic/retry-stable by hash ranking). One
# partial-aggregated shuffle on lang; rank is a per-stratum window, never
# a global sort.
# --------------------------------------------------------------------------
_RESERVOIR_K = 8


@query(
    "q3d_reservoir_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             {sql_hash32("'resv-' || CAST(doc_id AS VARCHAR)")} AS hk
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
      FROM keyed
    )
    SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_RESERVOIR_K}
    """,
)
def q3d_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hk = F.expr(sql_hash32_dialect("'resv-' || CAST(doc_id AS STRING)", "spark"))
    w = Window.partitionBy("lang").orderBy(F.col("hk").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", "n_chars", hk.alias("hk"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _RESERVOIR_K)
        .select("lang", "doc_id", "n_chars", "rk")
    )


# --------------------------------------------------------------------------
# q3e — K-FOLD cross-validation assignment: every document gets a
# deterministic fold id from the seeded permutation key (R1's machinery,
# so folds are reproducible at any parallelism and disjoint by
# construction), and the output reports per-(fold, lang) counts plus
# each cell's share of its fold — the balance check run before
# cross-validated eval to confirm no fold is skewed. Same 100 TB shape
# as q31: the fold id is a row-local expression (no shuffle to assign),
# and only the tiny (fold x lang) aggregate shuffles.
# --------------------------------------------------------------------------
_N_FOLDS = 5


@query(
    "q3e_kfold_assignment",
    oracle=f"""
    WITH folds AS (
      SELECT doc_id, lang,
             CAST(({sql_shuffle_key('doc_id')}) % {_N_FOLDS} AS BIGINT) AS fold
      FROM documents
    ),
    cells AS (
      SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM folds GROUP BY 1, 2
    ),
    tot AS (
      SELECT fold, CAST(SUM(n_docs) AS BIGINT) AS fold_size FROM cells GROUP BY 1
    )
    SELECT c.fold, c.lang, c.n_docs, t.fold_size,
           CAST(c.n_docs AS DOUBLE) / t.fold_size AS lang_share
    FROM cells c JOIN tot t ON t.fold = c.fold
    """,
)
def q3e_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = (shuffle_key(F.col("doc_id")) % _N_FOLDS).cast("bigint")
    cells = (
        docs.select(fold.alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = cells.groupBy("fold").agg(F.sum("n_docs").cast("bigint").alias("fold_size"))
    return cells.join(F.broadcast(tot), "fold").select(
        "fold",
        "lang",
        "n_docs",
        "fold_size",
        (F.col("n_docs").cast("double") / F.col("fold_size")).alias("lang_share"),
    )


# --------------------------------------------------------------------------
# q3f — IMPORTANCE-WEIGHTED DOWNSAMPLE (round 10): the inverse-
# propensity sampling shape behind size-aware corpus thinning — keep
# each document with probability proportional to its length (capped at
# 1), carry the inverse-probability weight, and report the per-language
# Horvitz-Thompson reweighted character estimate next to the true total
# so the estimator's closure is value-checked, not assumed. This is the
# 5th sampling rung (q3a hash-stratified, q3b weighted mix, q3c rate
# table, q3d exact-k reservoir) — the one that changes INCLUSION
# probability per row instead of per stratum.
#
# Determinism: inclusion is the cross-engine md5 hash compared against
# FLOOR(p * 2^20) (integer compare of identically-derived doubles —
# p is one shared IEEE chain from two exact integers); the reweighted
# estimate sums FLOOR(w * n_chars * 2^20) exact bigints
# (order-independent), divided back once at the end.
#
# Scale (100 TB): one 1-row totals aggregate broadcast back, one
# pushed-down per-row filter, one partial-aggregated groupBy(lang) —
# no shuffle carries more than |langs| rows past the scan.
# --------------------------------------------------------------------------
_IMP_TARGET = "CAST(0.2 AS DOUBLE)"  # sampled fraction of documents


def _importance_sample_sql(dialect: str) -> str:
    from tf_datapipeline_spark.functions.texthash import sql_hash32_dialect

    cast_t = "STRING" if dialect == "spark" else "VARCHAR"
    h = sql_hash32_dialect(f"'imp-' || CAST(doc_id AS {cast_t})", dialect)
    p = (
        f"LEAST(CAST(1 AS DOUBLE), CAST(n_chars AS DOUBLE)"
        f" * ({_IMP_TARGET} * n_total) / chars_total)"
    )
    return f"""
    WITH tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(n_chars) AS BIGINT) AS chars_total
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, n_chars, chars_total, {p} AS p
      FROM documents, tot
    ),
    kept AS (
      SELECT lang, n_chars, chars_total,
             CAST(FLOOR((CAST(1 AS DOUBLE) / p) * n_chars * 1048576.0)
                  AS BIGINT) AS wq
      FROM scored
      WHERE ({h}) % 1048576 < CAST(FLOOR(p * 1048576.0) AS BIGINT)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           CAST(SUM(wq) AS DOUBLE) / 1048576.0 AS est_chars,
           CAST(SUM(wq) AS DOUBLE) / 1048576.0 / MAX(chars_total)
             AS est_share_of_corpus
    FROM kept GROUP BY lang
    """


@query("q3f_importance_sample", oracle=_importance_sample_sql("duckdb"))
def q3f_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tf_datapipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_importance_sample_sql("spark"))
