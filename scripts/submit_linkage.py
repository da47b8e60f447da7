#!/usr/bin/env python
"""spark-submit job entry (north_rule: `spark-submit --py-files` on a
multi-executor cluster). Package the library with scripts/make_pyfiles_zip.py
and run:

  spark-submit --master <cluster> --py-files dist/brl.zip \
      scripts/submit_linkage.py <pages_parquet> <output_dir> [checkpoint_dir]

Reads a pages table (url, warc_ts, html, text, lang), runs the full
linkage pipeline, writes clusters + links as parquet. On a real cluster
the same invocation works unchanged — the SparkSession picks up master /
executor conf from spark-submit; get_spark is only the local fallback.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    pages_path = sys.argv[1]
    out_dir = sys.argv[2]
    ckpt = sys.argv[3] if len(sys.argv) > 3 else None

    spark = SparkSession.builder.appName("brl-linkage").getOrCreate()
    from bayesianrecordlinkage_jl_spark.plans.pipeline import (
        LinkageConfig,
        run_linkage,
    )

    pages = spark.read.parquet(pages_path)
    res = run_linkage(spark, pages, LinkageConfig(checkpoint_dir=ckpt))
    res.clusters.write.mode("overwrite").parquet(f"{out_dir}/clusters")
    res.links.write.mode("overwrite").parquet(f"{out_dir}/links")
    n = res.clusters.count()
    print(f"linkage done: {n} cluster assignments -> {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
