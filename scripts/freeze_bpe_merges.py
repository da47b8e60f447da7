"""Freeze the trained BPE merge list (data-derived) so the bpe_segment
oracle SQL stays STATIC — repo invariant: oracle SQL never computes
data-derived parameters at query time (same pattern as plans/ngram_lm.json).

Trains corpus.bpe_train on the sf0.01 documents (8 rounds, deterministic
total-order argmax) and writes the ordered merge list.

Usage: python scripts/freeze_bpe_merges.py
Writes: bayesianrecordlinkage_jl_spark/plans/bpe_merges.json
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

    from bayesianrecordlinkage_jl_spark.operators import corpus

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    merges = [
        [r["left_sym"], r["right_sym"]]
        for r in corpus.bpe_train(docs, "doc_id", "text").collect()
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bayesianrecordlinkage_jl_spark", "plans", "bpe_merges.json",
    )
    with open(out, "w") as f:
        json.dump(merges, f)
    print(f"wrote {out}: {len(merges)} merges")
    spark.stop()


if __name__ == "__main__":
    main()
