#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule): run the identical headline
bench at two parallelism levels (N and 4N cores) on the same input and
report throughput at both plus efficiency = (T_N / T_4N) / 4.

No real multi-executor cluster exists in this sandbox, so local[N] vs
local[4N] on the same JVM host is the sanctioned proxy (driver
instruction). Each level runs in a fresh subprocess so the JVM/session is
cold-started identically.

Usage: python scripts/scaling_bench.py [N] [SF_DIR]
Appends a result block to BENCH/BASELINE.md and prints the JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        # 2x corpus -> ~4x candidate pairs: the scoring job runs long enough
        # (minutes at N cores) that fixed JVM/scheduling startup is
        # amortized and the measured rate reflects steady-state throughput
        SPARK_GRAFT_THROUGHPUT_REPLICATE=os.environ.get(
            "SPARK_GRAFT_THROUGHPUT_REPLICATE", "2"
        ),
        # scaling efficiency is judged on the long throughput job; one
        # headline rep per level keeps the 2-core run tractable
        SPARK_GRAFT_BENCH_REPS=os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"),
        # the sf1 tier (round 4) is a 32-core scale check, not part of the
        # N-vs-4N protocol — at local[2] it alone would run for hours
        SPARK_GRAFT_SF1="0",
        # extras don't feed the scaling metric (headline total +
        # throughput job only) and would add tens of minutes at local[2]
        SPARK_GRAFT_EXTRAS="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # Default N=2 (so 4N=8): this sandbox VM's vCPUs stop scaling near ~16
    # threads for ANY workload (a pure-JVM md5 microbenchmark scales only
    # 2.4x from 8 to 32 threads — see BENCH/BASELINE.md), so the honest
    # algorithmic-scaling measurement runs below that contention knee.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    lo = run_level(n, sf_dir)
    hi = run_level(4 * n, sf_dir)
    # throughput scaling on the parallel headline work
    thr_lo = lo["pairs_scored_per_sec"]
    thr_hi = hi["pairs_scored_per_sec"]
    eff_pairs = round(thr_hi / thr_lo / 4.0, 3)
    eff_total = round((lo["value"] / hi["value"]) / 4.0, 3)
    result = {
        "n_cores": n,
        "n4_cores": 4 * n,
        "sf_dir": sf_dir,
        "pairs_scored_per_sec": {"N": thr_lo, "4N": thr_hi},
        "total_sec": {"N": lo["value"], "4N": hi["value"]},
        "scaling_efficiency_pairs": eff_pairs,
        "scaling_efficiency_total": eff_total,
        "per_query_sec": {"N": lo["queries"], "4N": hi["queries"]},
    }
    print(json.dumps(result))
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    block = (
        f"\n## Measured scaling run ({stamp})\n\n"
        f"| level | cores | pairs scored/sec | headline total (s) |\n"
        f"|---|---|---|---|\n"
        f"| N | {n} | {thr_lo} | {lo['value']} |\n"
        f"| 4N | {4 * n} | {thr_hi} | {hi['value']} |\n\n"
        f"Scaling efficiency (pairs-scored/sec, N->4N): **{eff_pairs}**; "
        f"(headline total): **{eff_total}**. Input: `{sf_dir}` "
        f"(identical at both levels; fresh subprocess per level).\n"
        f"Per-query seconds: N={json.dumps(lo['queries'])} "
        f"4N={json.dumps(hi['queries'])}\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(block)


if __name__ == "__main__":
    main()
