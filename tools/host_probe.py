"""Standalone host-quietness probe: runs bench.py's constant-work
calibration (8M sha2 -> 1024-bucket shuffled agg) N times on a fresh
local session and prints each timing. Quiet band on this host: ~0.62-0.8s
(BENCH_NOTES.md). Use before committing a BENCH artifact: the r7 session
lost its bench to hypervisor rationing that a pre-run probe would have
shown instantly.

Usage: python tools/host_probe.py [n_probes]
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from bench import calibration_probe
    from tf_datapipeline_spark.session import get_spark

    spark = get_spark("host-probe")
    # one warmup (JIT) discarded
    calibration_probe(spark)
    vals = [round(calibration_probe(spark), 3) for _ in range(n)]
    print({"probes": vals, "min": min(vals), "max": max(vals)})


if __name__ == "__main__":
    main()
