#!/usr/bin/env python
"""Arrow batch-size sweep for the comparator pandas-UDF kernels
(SURVEY §7.4.7 lever; VERDICT r4 next-round #5).

`spark.sql.execution.arrow.maxRecordsPerBatch` bounds the rows each
Arrow batch hands the JW/DL C kernels (threads=1 per batch by the repo's
contract). Too small -> per-batch Python/Arrow overhead dominates; too
large -> worse pipelining across the 32 local cores and bigger peak
memory per Python worker. The conf is runtime-settable, so one session
sweeps all sizes on the sf1 scoring-shaped queries (comparison_vectors_jw
/ _dl — the two kernels the verdict names).

Usage: python scripts/arrow_batch_sweep.py [SF_DIR] [batch ...]
Defaults: dist/sf1 and 2000 10000 50000. Prints one JSON line; record
the table + chosen default in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bayesianrecordlinkage_jl_spark.plans.oracle_queries import (  # noqa: E402
    build_catalog,
    clear_upstream_memo,
)
from bayesianrecordlinkage_jl_spark.session import get_spark  # noqa: E402

QUERIES = ["comparison_vectors_jw", "comparison_vectors_dl"]
REPS = 2


def main() -> None:
    args = sys.argv[1:]
    sf = args[0] if args else os.path.join(REPO, "dist", "sf1")
    batches = [int(b) for b in args[1:]] or [2000, 10000, 50000]
    spark = get_spark("arrow-batch-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    cat = build_catalog()
    spark.read.parquet(f"{sf}/documents.parquet").count()  # warm footers

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for b in batches:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(b))
        for name in QUERIES:
            clear_upstream_memo()
            force(cat[name]["spark"](spark, sf))  # untimed warm-up
            samples = []
            for _ in range(REPS):
                clear_upstream_memo()
                t0 = time.time()
                force(cat[name]["spark"](spark, sf))
                samples.append(round(time.time() - t0, 3))
            out.setdefault(str(b), {})[name] = round(
                statistics.median(samples), 3
            )
            out[str(b)][f"{name}_samples"] = samples
    print(json.dumps({"sf_dir": sf, "reps": REPS, "by_batch": out}))


if __name__ == "__main__":
    main()
