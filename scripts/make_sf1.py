#!/usr/bin/env python
"""Materialize a deterministic sf1 (10x sf0.1) dataset under dist/sf1 by
replicating the driver's sf0.1 tables with disjoint id ranges — the scale
spot-check input (dist/ is gitignored; /root/testdata is read-only).

Semantics of the scaling: key cardinality (lang/source, event_type) stays
fixed, so block sizes grow ~10x and within-block pair counts ~100x —
matching how the driver's own sf ladder scales and exercising exactly the
hot-block/salting machinery the engine claims to handle. user_id IS
offset per replica, so per-user event volume stays constant (sessions
scale linearly, like real traffic growth). Document text is replica-
tagged at the END of the text so exact-dup clusters do not multiply
quadratically across replicas while shingle/token distributions stay
essentially unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bayesianrecordlinkage_jl_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "dist", "sf1"),
)
REPLICATE = int(os.environ.get("SPARK_GRAFT_SF1_REPLICATE", "10"))
OFFSET = 1_000_000_000


def replicate(df, id_cols, tag_text=False):
    parts = []
    for r in range(REPLICATE):
        p = df
        for c in id_cols:
            p = p.withColumn(c, F.col(c) + F.lit(r * OFFSET))
        if tag_text and r > 0:
            p = p.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" r{r}"))
            ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark("make-sf1", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    jobs = {
        "documents": (["doc_id"], True),
        "embeddings": (["vec_id"], False),
        "events": (["event_id", "user_id"], False),
    }
    for name, (id_cols, tag) in jobs.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        rep = replicate(df, id_cols, tag_text=tag)
        rep.repartition(32).write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
        print(name, spark.read.parquet(f"{OUT}/{name}.parquet").count())
    # small relational tables pass through untouched (bench never scales them)
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem"):
        src = f"{SRC}/{name}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{OUT}/{name}.parquet"
            )
    spark.stop()


if __name__ == "__main__":
    main()
