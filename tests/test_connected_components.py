"""Connected components: hand-checked 2x2 adjacency cases and randomized
property tests vs a driver-side union-find oracle — direct analog of the
reference's only real unit tests (/root/reference/test/runtests.jl:41-57)."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators.connected_components import (
    components_with_isolated,
    connected_components,
    summarize_components,
)


def _uf_oracle(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id labeling
    lab = {}
    for n in nodes:
        r = find(n)
        lab.setdefault(r, min(m for m in nodes if find(m) == r))
    return {n: lab[find(n)] for n in nodes}


def _run_cc(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    out = connected_components(df).toPandas()
    return dict(zip(out["node"], out["component"]))


def test_hand_checked_cases(spark):
    # 2x2 bipartite adjacency cases (runtests.jl:41-48 analog): rows {0,1},
    # cols encoded as {10,11}
    cases = [
        ([(0, 10)], {0: 0, 10: 0}),
        ([(0, 10), (1, 11)], {0: 0, 1: 1, 10: 0, 11: 1}),
        ([(0, 10), (0, 11), (1, 11)], {0: 0, 1: 0, 10: 0, 11: 0}),
        ([(0, 10), (1, 10)], {0: 0, 1: 0, 10: 0}),
    ]
    for edges, expect in cases:
        assert _run_cc(spark, edges) == expect, edges


def test_chain_and_star(spark):
    chain = [(i, i + 1) for i in range(20)]
    got = _run_cc(spark, chain)
    assert set(got.values()) == {0}
    star = [(0, i) for i in range(1, 15)]
    assert set(_run_cc(spark, star).values()) == {0}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_property_vs_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(u, v) for u, v in edges if u != v]
    nodes = sorted({x for e in edges for x in e})
    got = _run_cc(spark, edges)
    want = _uf_oracle(edges, nodes)
    assert got == want


def test_threshold_equivalence(spark):
    """bipartite_cluster(float, t) == bipartite_cluster(bool on w>t)
    (runtests.jl:51-57 analog): thresholding before CC is the only place
    weights enter."""
    rng = random.Random(7)
    rows = [
        (rng.randrange(50), 100 + rng.randrange(50), rng.random())
        for _ in range(200)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    for t in [0.2, 0.5, 0.8]:
        e_float = df.where(F.col("w") > t).select("src", "dst")
        kept = [(u, v) for u, v, w in rows if w > t]
        nodes = sorted({x for e in kept for x in e})
        got = dict(
            zip(*(lambda p: (p["node"], p["component"]))(connected_components(e_float).toPandas()))
        )
        assert got == _uf_oracle(kept, nodes)


def test_isolated_nodes_and_summary(spark):
    edges = spark.createDataFrame(pd.DataFrame([(1, 2)], columns=["src", "dst"]))
    nodes = spark.createDataFrame(pd.DataFrame({"node": [1, 2, 3, 4]}))
    cc = components_with_isolated(edges, nodes).toPandas()
    got = dict(zip(cc["node"], cc["component"]))
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}
    s = summarize_components(
        spark.createDataFrame(cc)
    ).collect()[0]
    assert s["n_components"] == 3
    assert s["n_singletons"] == 2
    assert s["max_nodes"] == 2
    assert s["total_nodes"] == 4
