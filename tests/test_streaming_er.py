"""Streaming incremental ER: foreachBatch + versioned parquet state.

What the streaming layer must guarantee (the linking math itself is
oracle-tested via the link_increment catalog row): state persistence
roundtrips bit-exactly across micro-batches, batch slicing + state
versioning compose to the same result as sequential in-memory batch
calls, replays are idempotent, and a resumed query (new files, same
checkpoint) appends without rewriting history."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import incremental
from bayesianrecordlinkage_jl_spark.streaming import er

DOCS_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def er_dirs(spark):
    root = tempfile.mkdtemp(prefix="brl_stream_er_")
    inp, state, ckpt = f"{root}/in", f"{root}/state", f"{root}/ckpt"
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("long"), "text")
    )
    # three file drops sliced by doc_id so planted near-dup groups span
    # micro-batches (adjacent ids land in different files)
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    yield {"in": inp, "state": state, "ckpt": ckpt, "docs": docs}
    shutil.rmtree(root, ignore_errors=True)


def _run_stream(spark, dirs):
    q = er.start_incremental_er(
        spark, dirs["in"], dirs["state"], dirs["ckpt"], DOCS_SCHEMA,
        max_files=1,
    )
    q.awaitTermination(300)


def test_streaming_er_end_to_end(spark, er_dirs):
    _run_stream(spark, er_dirs)
    reps, members = er.load_state(spark, er_dirs["state"])
    m = members.toPandas()

    # every input doc assigned exactly once, across >= 2 micro-batches
    n_docs = er_dirs["docs"].count()
    assert len(m) == n_docs
    assert m["doc_id"].nunique() == n_docs
    assert m["batch_id"].nunique() >= 2

    # the fixture's planted near-dups must link across batches
    assert bool(m["matched"].any())
    # reps = one per cluster, covering every assigned cluster (matched
    # clusters carry their original rep; minted singletons get the new doc)
    r = reps.toPandas()
    assert r["cluster_id"].nunique() == len(r)
    assert set(m["cluster_id"]) <= set(r["cluster_id"])

    # batch twin: replay the SAME batch slicing sequentially with the
    # batch operators and in-memory state — the streamed state versioning
    # must compose to identical assignments
    reps_b = spark.createDataFrame([], er.REPS_SCHEMA)
    for b in sorted(m["batch_id"].unique()):
        ids = [int(x) for x in m.loc[m["batch_id"] == b, "doc_id"]]
        docs_b = er_dirs["docs"].where(F.col("doc_id").isin(ids))
        assign = incremental.link_increment(
            reps_b, docs_b, "doc_id", "text"
        ).localCheckpoint()
        got = {
            (row["doc_id"], row["cluster_id"], row["matched"],
             row["best_jac_e4"])
            for row in assign.collect()
        }
        want = {
            tuple(row)
            for row in m.loc[
                m["batch_id"] == b,
                ["doc_id", "cluster_id", "matched", "best_jac_e4"],
            ].itertuples(index=False)
        }
        assert got == want, f"batch {b} diverged from the streamed state"
        new_reps = (
            assign.where(~F.col("matched"))
            .join(
                docs_b.select("doc_id", F.col("text").alias("rep_text")),
                on="doc_id",
            )
            .select("cluster_id", F.col("doc_id").alias("rep_id"), "rep_text")
        )
        reps_b = reps_b.unionByName(new_reps).localCheckpoint()


def test_streaming_er_replay_idempotent(spark, er_dirs):
    """A foreachBatch whose streaming checkpoint did not commit re-runs
    with the same batch_id: the version directory is rewritten from the
    same pre-batch state, so membership must not double-append."""
    _, members_before = er.load_state(spark, er_dirs["state"])
    # materialize BEFORE the replay: apply_increment overwrites the very
    # parquet files this lazy DataFrame points at
    a = members_before.toPandas().sort_values(
        ["doc_id", "batch_id"], ignore_index=True
    )
    last = int(a["batch_id"].max())
    replay_ids = [int(x) for x in a.loc[a["batch_id"] == last, "doc_id"]]
    batch = er_dirs["docs"].where(F.col("doc_id").isin(replay_ids))
    er.apply_increment(spark, er_dirs["state"], batch, last)
    _, members_after = er.load_state(spark, er_dirs["state"])
    b = members_after.toPandas().sort_values(
        ["doc_id", "batch_id"], ignore_index=True
    )
    assert a.equals(b)


def test_streaming_er_resume_appends(spark, er_dirs):
    """New files + the same checkpoint resume the query: history rows are
    untouched, the new docs are assigned exactly once."""
    _, members_before = er.load_state(spark, er_dirs["state"])
    before = members_before.toPandas()

    # two exact near-dups in SEPARATE files: intra-batch duplicates are
    # out of link_increment's contract (both would mint; a later
    # merge_components delta pass reconciles them), so each doc arrives in
    # its own micro-batch — the second must link to the first's cluster
    for doc in [
        (9_000_001, "entirely novel resume document alpha beta gamma"),
        (9_000_002, "entirely novel resume document alpha beta gamma"),
    ]:
        spark.createDataFrame([doc], DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(er_dirs["in"])
    _run_stream(spark, er_dirs)

    _, members_after = er.load_state(spark, er_dirs["state"])
    after = members_after.toPandas()
    assert len(after) == len(before) + 2
    hist = after[after["doc_id"] < 9_000_000].sort_values(
        ["doc_id", "batch_id"], ignore_index=True
    )
    assert hist.equals(
        before.sort_values(["doc_id", "batch_id"], ignore_index=True)
    )
    novel = after[after["doc_id"] >= 9_000_000]
    assert len(novel) == 2
    # the two novel docs are exact near-dups: one mints, one links to it
    assert sorted(novel["matched"].tolist()) == [False, True]
    assert novel["cluster_id"].nunique() == 1
