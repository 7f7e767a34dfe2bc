"""Capture .explain("formatted") for a set of queries into plans/<tag>/.

Usage:
  python tools/capture_plans.py <tag> <suffix> [q1,q2,... | ALL]

Writes plans/<tag>/<query>_<suffix>.txt for each query (suffix is
"before" / "after" per the optimization-round deliverable). Uses
$SPARK_GRAFT_SF_DIR (default sf0.1) so the plans match the bench scale.
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names_arg = sys.argv[3] if len(sys.argv) > 3 else "ALL"

    from tf_datapipeline_spark import registry
    from tf_datapipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    qs = registry.queries()
    names = (
        sorted(qs) if names_arg == "ALL" else [n for n in names_arg.split(",") if n]
    )
    out_dir = os.path.join(REPO_DIR, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure in-file
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
