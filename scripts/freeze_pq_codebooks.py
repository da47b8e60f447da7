"""Freeze the PQ codebooks (data-derived) so the embedding_topk_pq oracle
SQL stays STATIC — repo invariant: oracle SQL never computes data-derived
parameters at query time (same pattern as plans/ivf_centroids.json).

Trains similarity.train_pq_codebooks on the sf0.01 embeddings (id-ordered
2048-row sample, n_sub=8, n_codes=16, 5 Lloyd iters — deterministic) and
writes the n_sub x n_codes x dsub float table.

Usage: python scripts/freeze_pq_codebooks.py
Writes: bayesianrecordlinkage_jl_spark/plans/pq_codebooks.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bayesianrecordlinkage_jl_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", n_sub=8, n_codes=16, iters=5
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bayesianrecordlinkage_jl_spark", "plans", "pq_codebooks.json",
    )
    with open(out, "w") as f:
        json.dump(books, f)
    print(f"wrote {out}: {len(books)} subspaces x {len(books[0])} codes "
          f"x {len(books[0][0])} dims")
    spark.stop()


if __name__ == "__main__":
    main()
