"""LinkMatrix diff set-ops, drop_outside, size-capped clustering
(iterative_bipartite_cluster2 analog), threshold sensitivity, and the small
driver helpers (minimum_margin, one-hot counts, get_mids)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import em, linkmatrix
from bayesianrecordlinkage_jl_spark.operators.connected_components import (
    get_mids,
    size_capped_components,
    threshold_sensitivity,
)


def test_link_diffs(spark):
    old = spark.createDataFrame(pd.DataFrame({"id_a": [1, 2, 3], "id_b": [11, 12, 13]}))
    new = spark.createDataFrame(pd.DataFrame({"id_a": [2, 3, 4], "id_b": [12, 14, 14]}))
    rem = linkmatrix.links_removed(old, new).toPandas()
    assert set(zip(rem["id_a"], rem["id_b"])) == {(1, 11), (3, 13)}
    add = linkmatrix.links_added(old, new).toPandas()
    assert set(zip(add["id_a"], add["id_b"])) == {(3, 14), (4, 14)}
    diff = linkmatrix.links_difference(old, new).toPandas()
    got = {(r.id_a, r.id_b): r.status for r in diff.itertuples()}
    assert got[(2, 12)] == "kept"
    assert got[(1, 11)] == "removed"
    assert got[(4, 14)] == "added"


def test_drop_outside(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 1, 2], "id_b": [11, 12, 11], "w": [1.0, 1.0, 1.0]})
    )
    comps = spark.createDataFrame(
        pd.DataFrame({"node": [1, 2, 11, 12], "component": [1, 2, 1, 2]})
    )
    kept = linkmatrix.drop_outside(pairs, comps).toPandas()
    assert set(zip(kept["id_a"], kept["id_b"])) == {(1, 11)}
    assert list(kept["block_id"]) == [1]


def test_matched_comparisons(spark):
    dv = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2, 3], "g1": [1, 2, 1], "n_pairs": [5, 5, 5]})
    )
    links = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2], "id_b": [11, 12], "vec_id": [1, 1]})
    )
    got = linkmatrix.matched_comparisons(dv, links).toPandas()
    assert list(got["vec_id"]) == [1]


def test_size_capped_components_splits_hot_block(spark):
    """A 12-node hub component (66 edges at w=1.0, intra-core edges at
    w=2.0) must be split once the cap forces the threshold above 1.0."""
    rows = []
    nodes = list(range(12))
    for i in nodes:
        for j in nodes:
            if i < j:
                w = 2.0 if (i < 4 and j < 4) or (i >= 8 and j >= 8) else 1.0
                rows.append((i, j, w))
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    out = size_capped_components(edges, max_pairs=10, threshold=0.0, incr=1.0).toPandas()
    comp = dict(zip(out["node"], out["component"]))
    # after raising the threshold, the two w=2.0 cores separate
    assert comp[0] == comp[1] == comp[2] == comp[3]
    assert comp[8] == comp[9] == comp[10] == comp[11]
    assert comp[0] != comp[8]
    sizes = out.groupby("component").size()
    assert (sizes <= 5).all()


def test_size_capped_flags_unsplittable(spark):
    """All-equal weights on an oversized clique cannot be split -> flagged."""
    rows = [(i, j, 1.0) for i in range(10) for j in range(10) if i < j]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    out = size_capped_components(edges, max_pairs=5, threshold=0.0, incr=0.5).toPandas()
    assert out["capped"].any()


def test_size_capped_no_node_loss_on_round_exhaustion(spark):
    """max_rounds=1 on an unsplittable oversized clique: every node must
    still appear in the output, flagged capped=true (previously they
    silently vanished)."""
    rows = [(i, j, 1.0) for i in range(10) for j in range(10) if i < j]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    out = size_capped_components(
        edges, max_pairs=5, threshold=0.0, incr=0.25, max_rounds=1
    ).toPandas()
    assert set(out["node"]) == set(range(10))
    assert out["capped"].all()
    assert len(out) == 10  # exactly once each


def test_size_capped_emits_isolated_nodes_as_singletons(spark):
    """Nodes whose every edge drops below the raised threshold must come
    back as singleton components, not disappear: star hub 0 with w=1.0
    spokes (oversized at cap 3) + a w=2.0 core pair."""
    rows = [(0, i, 1.0) for i in range(1, 8)] + [(0, 100, 2.0), (100, 101, 2.0)]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    out = size_capped_components(
        edges, max_pairs=3, threshold=0.0, incr=1.0
    ).toPandas()
    expect = set(range(8)) | {100, 101}
    assert set(out["node"]) == expect
    assert len(out) == len(expect)  # exactly once each
    comp = dict(zip(out["node"], out["component"]))
    # spokes 1..7 end as singletons once the threshold passes 1.0
    for i in range(1, 8):
        assert comp[i] == i
    assert comp[100] == comp[101]


def test_threshold_sensitivity(spark):
    rows = [(1, 2, 0.9), (2, 3, 0.5), (4, 5, 0.2)]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    stats = threshold_sensitivity(edges, [0.1, 0.4, 0.8])
    assert stats[0]["n_components"] == 2  # {1,2,3}, {4,5}
    assert stats[1]["n_components"] == 1  # {1,2,3}
    assert stats[2]["n_components"] == 1  # {1,2}
    assert [s["threshold"] for s in stats] == [0.1, 0.4, 0.8]


def test_driver_helpers():
    assert get_mids([1.0, 2.0, 4.0]) == [1.5, 3.0]
    assert em.minimum_margin([1.0, 1.5, 3.0]) == pytest.approx(0.5)
    dv = pd.DataFrame({"vec_id": [1, 2], "g1": [1, 0], "g2": [2, 1], "n_pairs": [1, 1]})
    oh = em.one_hot_counts(dv, ["g1", "g2"], {"g1": 2, "g2": 2})
    assert oh.tolist() == [[1, 0, 0, 1], [0, 0, 1, 0]]
    assert em.observed_mask(dv, ["g1", "g2"]).tolist() == [[1, 1], [0, 1]]


def test_size_capped_exhaustion_flushes_at_measured_threshold(spark):
    """On max_rounds exhaustion the capped flush must run at the threshold
    the final oversized-check MEASURED, not one incr above it (which would
    fragment the component and mislabel sub-cap pieces as capped).

    Chain 1-2(.005) 2-3(.015) 3-4(.025) 4-5(.035), cap 1, incr .01,
    max_rounds=2: round 1 measures at t=0 (drops nothing yet), round 2
    measures at t=.01 where {2,3,4,5} is one oversized component. The buggy
    flush at t=.02 would split off node 2 as a singleton."""
    rows = [(1, 2, 0.005), (2, 3, 0.015), (3, 4, 0.025), (4, 5, 0.035)]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    out = size_capped_components(
        edges, max_pairs=1, threshold=0.0, incr=0.01, max_rounds=2
    ).toPandas()
    assert set(out["node"]) == {1, 2, 3, 4, 5}
    assert len(out) == 5
    comp = dict(zip(out["node"], out["component"]))
    capped = dict(zip(out["node"], out["capped"]))
    # node 1 dropped out at t=.01 as an uncapped singleton
    assert comp[1] == 1 and not capped[1]
    # {2,3,4,5} stays ONE capped component (measured state at t=.01)
    assert comp[2] == comp[3] == comp[4] == comp[5]
    assert capped[2] and capped[3] and capped[4] and capped[5]
