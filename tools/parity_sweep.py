"""Full-registry oracle parity sweep at an arbitrary scale directory.

Runs EVERY registered query that has a DuckDB oracle twin through the
same comparison the driver gate uses (tests/oracle_harness.compare:
row-count + column names + type widths + exact values, order-
insensitive) against a scale replica built by tools/gen_scale.py.
Unlike the pytest sweep (which asserts per-query), this accumulates
every result so one failure cannot shadow the rest, and records
per-query wall time for the artifact.

This is the machinery behind PARITY_sf1.md (the round-5 sweep that
caught the dsum last-ulp double-rounding and the approx_top_k
under-capacity certification — both invisible at sf0.1).

Usage:
  python tools/parity_sweep.py <sf_dir> <out_json> [only1,only2,...]

The JSON artifact holds {"sf_dir", "results": {name: {"status":
"pass"|"fail"|"error", "sec": float, "detail": str}}, "total_sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from tests.oracle_harness import compare
    from tf_datapipeline_spark import registry
    from tf_datapipeline_spark.session import get_spark

    spark = get_spark("parity-sweep")
    qs = registry.queries()
    os_sql = registry.oracle_sql()
    names = sorted(n for n in os_sql if only is None or n in only)

    results: dict[str, dict] = {}
    t_all = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            compare(qs[name](spark, sf_dir), os_sql[name], sf_dir, name=name)
            status, detail = "pass", ""
        except AssertionError as e:
            status, detail = "fail", str(e)[:500]
        except Exception:
            status, detail = "error", traceback.format_exc()[-500:]
        sec = round(time.time() - t0, 2)
        results[name] = {"status": status, "sec": sec, "detail": detail}
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({sec}s)", flush=True)

    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_pass": n_pass,
        "total_sec": round(time.time() - t_all, 1),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        f"SWEEP DONE: {n_pass}/{len(names)} pass, "
        f"{summary['total_sec']}s, -> {out_path}",
        flush=True,
    )


if __name__ == "__main__":
    main()
