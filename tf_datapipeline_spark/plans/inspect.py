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


# ---------------------------------------------------------------------------
# Structural NLJ build-side audit (replaces name-allowlisting queries in
# the cross-product sweep — a blanket exemption would let a future edit
# plan a genuine corpus x corpus nested loop silently). A
# BroadcastNestedLoopJoin is safe iff its BUILD (broadcast) subtree is
# provably bounded by the query text: a literal relation, a one-row
# relation, a global (keyless) aggregate scalar, or a corpus scan
# key-filtered through a join against such a bounded relation. A bare
# file scan or any shuffle inside the build subtree means the broadcast
# grows with the corpus — the latent 100 TB explosion the audit exists
# to catch (it caught q75/q76 broadcasting the corpus x 8-sub side and
# streaming the 8-row codeword side before the BROADCAST hints pinned
# the build sides).
# ---------------------------------------------------------------------------
import re as _re

_TREE_LINE = _re.compile(
    r"^(?P<prefix>[ :+\-|]*)(?:\*\s*)?(?P<name>[A-Za-z][^(]*?)\s*\((?P<id>\d+)\)\s*$"
)

_BOUNDED_LEAVES = (
    "LocalTableScan",
    "Scan OneRowRelation",
    "ReusedExchange",  # audited where it was first planned
)

# literal point/range/set predicates pushed onto an id column — the
# "fixed query set" selection (vec_id < 8, cvec_id IN (...)); key-range
# predicates on non-id columns deliberately do NOT match (l_quantity <
# 24 bounds nothing)
_BOUNDED_PUSHED = _re.compile(r"(?:LessThan|LessThanOrEqual|EqualTo|In)\(\w*_id,")

# the same idiom as a post-scan Filter condition: (vec_id#103L < 8),
# (doc_id#4L = 17), (vec_id#9L IN (8,24,...))
_BOUNDED_CONDITION = _re.compile(r"\w*_id#\d+L? (?:<|<=|=|IN) ?\(?-?\d")


def _parse_tree(plan: str) -> list[tuple[int, str, str]]:
    """(depth, op_name, node_id) per tree line of a formatted plan."""
    out: list[tuple[int, str, str]] = []
    for line in plan.splitlines():
        if line.startswith("== Physical Plan =="):
            out = []
            continue
        if not line.strip():
            if out:
                break  # tree section ends at the first blank line
            continue
        m = _TREE_LINE.match(line)
        if m:
            out.append((len(m.group("prefix")), m.group("name").strip(), m.group("id")))
    return out


def _details_by_id(plan: str) -> dict[str, str]:
    blocks: dict[str, str] = {}
    cur_id = None
    cur: list[str] = []
    for line in plan.splitlines():
        m = _re.match(r"^\((\d+)\)\s+\S", line)
        if m:
            if cur_id is not None:
                blocks[cur_id] = "\n".join(cur)
            cur_id, cur = m.group(1), [line]
        elif cur_id is not None:
            cur.append(line)
    if cur_id is not None:
        blocks[cur_id] = "\n".join(cur)
    return blocks


def _subtree(nodes: list[tuple[int, str, str]], i: int) -> list[int]:
    """Indices of node i's subtree (i plus all following deeper nodes)."""
    depth = nodes[i][0]
    j = i + 1
    while j < len(nodes) and nodes[j][0] > depth:
        j += 1
    return list(range(i, j))


def _children(nodes: list[tuple[int, str, str]], i: int) -> list[int]:
    sub = _subtree(nodes, i)[1:]
    if not sub:
        return []
    child_depth = min(nodes[j][0] for j in sub)
    return [j for j in sub if nodes[j][0] == child_depth]


def _is_global_agg(detail: str) -> bool:
    for line in detail.splitlines():
        s = line.strip()
        if s.startswith("Keys") and s.endswith("[]"):
            return True
    return False


def _bounded(nodes, i, details) -> bool:
    depth, name, nid = nodes[i]
    if any(name.startswith(leaf) for leaf in _BOUNDED_LEAVES):
        return True
    if name.startswith("Scan parquet") or name.startswith("Scan orc") or name.startswith(
        "Scan csv"
    ) or name.startswith("Scan json") or name.startswith("BatchScan"):
        # the query-set idiom: a scan whose PushedFilters pin an *_id
        # column to a literal point/range/set (vec_id < 8 selects the
        # fixed query vectors) is bounded by the query text; any other
        # scan is corpus-sized
        return bool(_BOUNDED_PUSHED.search(details.get(nid, "")))
    if name.startswith("Filter"):
        # literal id-comparison bounds the subtree even when the source
        # can't push filters (ExistingRDD / checkpointed dims): the
        # query-set idiom again, post-scan
        if _BOUNDED_CONDITION.search(details.get(nid, "")):
            return True
        return all(_bounded(nodes, c, details) for c in _children(nodes, i))
    # Exchange is a pass-through: shuffling a bounded relation stays
    # bounded; an unbounded child already fails on its own shape
    if name.startswith("HashAggregate") or name.startswith("SortAggregate") or name.startswith(
        "ObjectHashAggregate"
    ):
        if _is_global_agg(details.get(nid, "")):
            return True  # keyless aggregate: exactly one row
        return all(_bounded(nodes, c, details) for c in _children(nodes, i))
    kids = _children(nodes, i)
    if "Join" in name or name.startswith("CartesianProduct"):
        # a join is bounded if EITHER input is: an equi/nested join
        # against a literal-bounded side key-filters (or at worst
        # literal-multiplies) the other side
        return any(_bounded(nodes, c, details) for c in kids)
    if not kids:  # unknown leaf (Range, etc): Range is literal-bounded
        return name.startswith("Range")
    # unary operators (Project/Filter/Sort/Window/Generate/...) preserve
    # or shrink boundedness; Generate over a literal stays literal
    return all(_bounded(nodes, c, details) for c in kids)


def unbounded_nlj_builds(df: DataFrame) -> list[str]:
    """Node ids of BroadcastNestedLoopJoins whose BUILD side is not
    provably bounded by the query text (see module comment). Empty list
    == every NLJ in the plan broadcasts a bounded relation."""
    plan = formatted_plan(df)
    nodes = _parse_tree(plan)
    details = _details_by_id(plan)
    bad: list[str] = []
    for i, (depth, name, nid) in enumerate(nodes):
        if not name.startswith("BroadcastNestedLoopJoin"):
            continue
        kids = _children(nodes, i)
        if len(kids) != 2:
            continue  # degenerate parse; the sweep's strategy check still sees it
        # the formatted tree line carries BuildLeft/BuildRight
        build = kids[0] if "BuildLeft" in name else kids[1]
        if not _bounded(nodes, build, details):
            bad.append(f"NLJ({nid}) build side unbounded: {nodes[build][1]}")
    return bad
