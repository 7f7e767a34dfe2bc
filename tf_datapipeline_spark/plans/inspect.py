"""Physical-plan inspection helpers.

The engine's 100 TB posture is only real if Catalyst actually produces
the plans we designed for: filters pushed into the parquet scan, narrow
ReadSchema (column pruning), broadcast joins for dims, TakeOrdered for
top-k, wide WholeStageCodegen spans. These helpers stringify the
formatted physical plan so tests can pin those shapes — a plan
regression then fails CI instead of silently costing 100x at scale.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`df.explain("formatted")` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if at least one scan carries a non-empty PushedFilters list."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:") and s != "PushedFilters: []":
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column-name sets of every parquet ReadSchema in the plan (one per
    scan) — the ground truth for column pruning."""
    out: list[set[str]] = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            schema = s.split("struct<", 1)
            if len(schema) == 2:
                body = schema[1].rsplit(">", 1)[0]
                cols = {f.split(":")[0].strip() for f in body.split(",") if ":" in f}
                out.append(cols)
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """Names of the join operators in the physical plan."""
    names = []
    for line in formatted_plan(df).splitlines():
        for op in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        ):
            if op in line:
                names.append(op)
    return names


def has_operator(df: DataFrame, op: str) -> bool:
    return op in formatted_plan(df)


def codegen_subtree_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees ('Found N WholeStageCodegen
    subtrees.' from the codegen explain — under AQE the formatted plan
    hides them until execution)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    for line in buf.getvalue().splitlines():
        if "WholeStageCodegen subtrees" in line:
            return int(line.split("Found", 1)[1].strip().split()[0])
    return 0
