"""Freeze the char-trigram LM table (data-derived) so the ngram_lm_scores
oracle SQL stays STATIC — repo invariant: oracle SQL never computes
data-derived parameters at query time (same pattern as
plans/ivf_centroids.json / plans/pq_codebooks.json).

Trains corpus.train_ngram_lm on the sf0.01 documents (top-256 trigrams by
count, integer-quantized log-probs, safe charset only — deterministic).

Usage: python scripts/freeze_ngram_lm.py
Writes: bayesianrecordlinkage_jl_spark/plans/ngram_lm.json
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
    model = corpus.train_ngram_lm(docs, "text", top_n=256)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bayesianrecordlinkage_jl_spark", "plans", "ngram_lm.json",
    )
    with open(out, "w") as f:
        json.dump(model, f)
    print(f"wrote {out}: {len(model['scores'])} trigrams, "
          f"backoff {model['backoff']}")
    spark.stop()


if __name__ == "__main__":
    main()
