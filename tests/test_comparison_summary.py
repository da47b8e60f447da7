"""ComparisonSummary analog: dedup round-trip invariant (the reference's
obsvecs[:, obsidx[i,j]] == comparisons[i,j,:] test, runtests.jl:14-21),
marginal counts, and summary merge."""

import random

import pandas as pd
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators.comparison_summary import (
    attach_vec_ids,
    distinct_vectors,
    marginal_counts,
    merge_summaries,
)

GCOLS = ["g1", "g2", "g3"]


def _random_pairs(seed, n=400):
    rng = random.Random(seed)
    return pd.DataFrame(
        {
            "id_a": range(n),
            "id_b": [i + 10_000 for i in range(n)],
            "g1": [rng.randint(0, 4) for _ in range(n)],
            "g2": [rng.randint(0, 4) for _ in range(n)],
            "g3": [rng.randint(0, 2) for _ in range(n)],
        }
    )


def test_roundtrip_invariant(spark):
    pdf = _random_pairs(1)
    pairs = spark.createDataFrame(pdf)
    dv = distinct_vectors(pairs, GCOLS)
    keyed = attach_vec_ids(pairs, dv, GCOLS).toPandas()
    dvp = dv.toPandas().set_index("vec_id")
    # every pair's vector equals its distinct vector's fields
    for r in keyed.itertuples():
        row = dvp.loc[r.vec_id]
        assert (row["g1"], row["g2"], row["g3"]) == (r.g1, r.g2, r.g3)
    # multiplicities sum back to pair count
    assert dvp["n_pairs"].sum() == len(pdf)
    # vec_ids dense 1..K deterministic lexicographic
    assert sorted(dvp.index) == list(range(1, len(dvp) + 1))


def test_vec_id_determinism(spark):
    pdf = _random_pairs(2)
    a = distinct_vectors(spark.createDataFrame(pdf), GCOLS).toPandas()
    b = distinct_vectors(spark.createDataFrame(pdf.sample(frac=1.0, random_state=3)), GCOLS).toPandas()
    assert a.sort_values("vec_id").reset_index(drop=True).equals(
        b.sort_values("vec_id").reset_index(drop=True)
    )


def test_marginal_counts(spark):
    pdf = _random_pairs(3)
    dv = distinct_vectors(spark.createDataFrame(pdf), GCOLS)
    mc = marginal_counts(dv, GCOLS).toPandas()
    for g in GCOLS:
        want = pdf[g].value_counts().to_dict()
        got = {
            int(r.level): int(r.n_pairs)
            for r in mc[mc["field"] == g].itertuples()
        }
        assert got == {int(k): int(v) for k, v in want.items()}


def test_merge_summaries(spark):
    p1, p2 = _random_pairs(4, 200), _random_pairs(5, 300)
    d1 = distinct_vectors(spark.createDataFrame(p1), GCOLS)
    d2 = distinct_vectors(spark.createDataFrame(p2), GCOLS)
    merged = merge_summaries(d1, d2, GCOLS).toPandas()
    both = pd.concat([p1, p2])
    want = both.groupby(GCOLS).size()
    assert merged["n_pairs"].sum() == 500
    for r in merged.itertuples():
        assert want.loc[(r.g1, r.g2, r.g3)] == r.n_pairs
