"""Streaming incremental entity resolution: continuous micro-batches of
new documents linked into a standing cluster state.

Composes the batch delta operators (operators/incremental.py:
cluster_representatives + link_increment) with Structured Streaming via
foreachBatch + a VERSIONED parquet state table — the standard streaming
pattern for stateful table maintenance (on a real cluster the state table
would be a Delta/Iceberg MERGE target; versioned directories plus an
atomically-swapped pointer file give the same exactly-once contract here
without lakehouse jars).

State layout under `state_dir`:

    v{batch_id}/reps/        (cluster_id, rep_id, rep_text)
    v{batch_id}/membership/  (doc_id, cluster_id, matched, best_jac_e4,
                              batch_id)
    _LATEST                  {"version": N}  (os.replace-swapped)

Exactly-once under replay: each micro-batch loads the newest committed
version STRICTLY BELOW its own batch_id, so a batch whose foreachBatch ran
but whose streaming checkpoint did not commit simply rewrites its own
version directory from the same inputs — idempotent, no double-append.

Per micro-batch work touches |clusters| rows (representatives) +
|batch| rows — never the corpus. Batch ORDER affects singleton minting
(as in any streaming ER): a doc that arrives before its cluster's first
member mints the cluster; reps are stable thereafter (min-id reps never
change once minted, so future batches link deterministically).

Reference analog: none — the reference re-clusters per run
(/root/reference/src/clustering_functions.jl); this is the re-crawl
contract of the north rule made continuous.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental

REPS_SCHEMA = "cluster_id long, rep_id long, rep_text string"
MEMBER_SCHEMA = (
    "doc_id long, cluster_id long, matched boolean, best_jac_e4 long, "
    "batch_id long"
)


def _latest_committed(state_dir: str, before: int | None = None) -> int | None:
    """Newest committed version, optionally restricted to versions below
    `before` (replay idempotency). The pointer file is the commit record;
    version directories above it (a crashed batch) are ignored."""
    try:
        with open(os.path.join(state_dir, "_LATEST")) as f:
            latest = int(json.load(f)["version"])
    except (OSError, ValueError, KeyError):
        return None
    if before is None or latest < before:
        return latest
    vs = [
        int(m.group(1))
        for m in (re.fullmatch(r"v(\d+)", d) for d in os.listdir(state_dir))
        if m and int(m.group(1)) < before
    ]
    return max(vs) if vs else None


def load_state(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(reps, membership) at the newest committed version (< `before` when
    given); empty DataFrames before the first commit."""
    v = _latest_committed(state_dir, before)
    if v is None:
        return (
            spark.createDataFrame([], REPS_SCHEMA),
            spark.createDataFrame([], MEMBER_SCHEMA),
        )
    base = os.path.join(state_dir, f"v{v}")
    return (
        spark.read.schema(REPS_SCHEMA).parquet(os.path.join(base, "reps")),
        spark.read.schema(MEMBER_SCHEMA).parquet(
            os.path.join(base, "membership")
        ),
    )


def apply_increment(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    **link_kw,
) -> None:
    """One micro-batch: assign every new doc to an existing cluster (via
    its representative) or mint a singleton; commit state v{batch_id}."""
    reps, members = load_state(spark, state_dir, before=int(batch_id))
    assign = incremental.link_increment(
        reps, batch, id_col, text_col, **link_kw
    ).localCheckpoint()  # consumed twice: new-rep derivation + membership
    new_reps = (
        assign.where(~F.col("matched"))
        .join(
            batch.select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.col(text_col).alias("rep_text"),
            ),
            on="doc_id",
        )
        .select("cluster_id", F.col("doc_id").alias("rep_id"), "rep_text")
    )
    base = os.path.join(state_dir, f"v{int(batch_id)}")
    reps.unionByName(new_reps).write.mode("overwrite").parquet(
        os.path.join(base, "reps")
    )
    members.unionByName(
        assign.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
    ).write.mode("overwrite").parquet(os.path.join(base, "membership"))
    tmp = os.path.join(state_dir, "_LATEST.tmp")
    os.makedirs(state_dir, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump({"version": int(batch_id)}, f)
    os.replace(tmp, os.path.join(state_dir, "_LATEST"))  # atomic commit


def start_incremental_er(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files: int = 1,
    **link_kw,
) -> StreamingQuery:
    """Continuous ER over a parquet staging dir: every micro-batch of new
    documents is linked into the standing clusters (availableNow trigger —
    rerun the query as new files land, the checkpoint + versioned state
    resume exactly where the last run committed)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )

    def fb(batch: DataFrame, bid: int) -> None:
        apply_increment(
            batch.sparkSession, state_dir, batch, bid, id_col, text_col,
            **link_kw,
        )

    return (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
