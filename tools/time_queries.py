"""Per-query timing probe for the optimization rounds.

Times each query with the noop sink (guide §1.4), labelled via
setJobDescription (guide §1.5), min over N warm passes after one
warm-up pass, and counts plan features (Exchange / Python-eval nodes)
from the formatted explain. Prints one JSON line per query plus a
sorted summary. This is a diagnostic, NOT the driver bench (bench.py
is unchanged); use it to find where time goes, then re-measure with
bench.py.

Usage:
  python tools/time_queries.py [q1,q2,...|ALL] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    names_arg = sys.argv[1] if len(sys.argv) > 1 else "ALL"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from tf_datapipeline_spark import registry
    from tf_datapipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    qs = registry.queries()
    names = (
        list(qs) if names_arg == "ALL" else [n for n in names_arg.split(",") if n]
    )
    # JVM warmup
    qs["q01_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        times = []
        feats = {}
        for p in range(passes + 1):
            t0 = time.perf_counter()
            try:
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                results[name] = {"err": f"{type(exc).__name__}: {exc}"[:160]}
                break
            t = time.perf_counter() - t0
            if p == 0:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                    feats = {
                        "exchanges": plan.count("Exchange"),
                        "py": plan.count("EvalPython")
                        + plan.count("MapInPandas")
                        + plan.count("ArrowEval")
                        + plan.count("FlatMapGroupsInPandas"),
                        "smj": plan.count("SortMergeJoin"),
                        "bnlj": plan.count("BroadcastNestedLoopJoin"),
                    }
                except Exception:  # noqa: BLE001
                    feats = {}
            else:
                times.append(t)
        else:
            results[name] = {
                "warm_min": round(min(times), 3),
                "warm_max": round(max(times), 3),
                **feats,
            }
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: results[name]}), flush=True)

    ranked = sorted(
        (
            (v["warm_min"], k)
            for k, v in results.items()
            if "warm_min" in v  # errored queries are listed separately
        ),
        reverse=True,
    )
    print("== slowest ==")
    for t, k in ranked[:25]:
        print(f"{t:8.3f}  {k}  {results[k]}")
    failed = {k: v["err"] for k, v in results.items() if "err" in v}
    if failed:
        print("== failed ==")
        for k, e in failed.items():
            print(f"  {k}: {e}")
    total = sum(v.get("warm_min", 0) for v in results.values())
    print(json.dumps({"total_warm_min": round(total, 3), "n": len(results)}))


if __name__ == "__main__":
    main()
