"""SparkSession factory tuned for the linkage workload.

Local testing runs on local[N]; the same configs are what we would ship in
spark-submit --conf for a multi-executor cluster (AQE on, skew-join on,
Arrow on). Shuffle partition count is sized for the test scale; at 100 TB
the same code relies on AQE coalescing + explicit repartition by block.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "brl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    # Python workers unpickle our applyInPandas functions, so the package
    # must be importable on executors. On a cluster that's
    # `spark-submit --py-files brl.zip`; in local mode, export the package
    # root via PYTHONPATH before the JVM forks workers.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting (hot blocking keys).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for all pandas UDF / applyInPandas paths (no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 50k rows/batch: measured sweep (scripts/arrow_batch_sweep.py,
        # sf1 JW/DL kernels — BENCH/BASELINE.md round-5) shows the
        # C-kernel comparators want large batches (JW 5.4s@2k ->
        # 3.4s@10k -> 2.4s@50k; flat beyond), DL is compute-bound
        # (insensitive). ~50 MB peak Arrow buffer per worker at ~1 KB
        # rows — safe at 100x partition scale under default
        # maxPartitionBytes.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        # Parquet scans: pushdown + pruning are defaults, be explicit anyway.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
