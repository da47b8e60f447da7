"""Connected components by iterative large-star / small-star DataFrame joins.

Reference analog: bipartite_cluster BFS over the thresholded weight graph
(/root/reference/src/clustering_functions.jl:15-280) and the size-capped
iterative variants (:294-489). The reference BFS is single-machine and
queue-based; here we use the Kiveris et al. (2014) alternating large-star /
small-star algorithm — O(log n) rounds of shuffle joins, the standard
distributed formulation — with localCheckpoint per round to truncate
lineage and convergence detected by an edge-set-stability count.

Node ids are bigint. For bipartite graphs callers encode sides disjointly
(e.g. row ids even / col ids odd, or offset by max id) — helpers provided.
Component label = min node id in the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonicalize: (u > v) ordered pairs, no self-loops, distinct."""
    u, v = F.col("src"), F.col("dst")
    return (
        edges.select(
            F.greatest(u, v).alias("src"), F.least(u, v).alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: connect every strictly-larger neighbor of u to u's
    min(neighborhood ∪ {u})."""
    bidir = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = bidir.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("mnn")
    )
    # join neighbor lists back; emit (v, mnn(u)) for v > u
    return (
        bidir.join(m, on="src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mnn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: for each u, connect all neighbors <= u (and u) to the min."""
    # operate on (u > v) canonical orientation: neighbors smaller than u
    e = _canon(edges)
    m = e.groupBy("src").agg(F.min("dst").alias("mnn"))
    out = (
        e.join(m, on="src")
        .select(F.col("dst").alias("src"), F.col("mnn").alias("dst"))
        .union(m.select("src", F.col("mnn").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """-> DataFrame(node bigint, component bigint); component = min node id.

    Isolated nodes don't appear (no edges) — callers union them back with
    component = own id (matching the reference's label-0-isolated
    convention, /root/reference/src/clustering_functions.jl:30).
    """
    e = _canon(
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
    ).localCheckpoint()
    for _ in range(max_iter):
        e2 = _canon(_small_star(_large_star(e))).localCheckpoint()
        # converged when edge sets identical: same count and same sym-diff 0
        if e2.count() == e.count():
            diff = e2.exceptAll(e).limit(1).count()
            if diff == 0:
                e = e2
                break
        e = e2
    # at fixpoint every edge is (node, root)
    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def components_with_isolated(
    edges: DataFrame, nodes: DataFrame, node_col: str = "node"
) -> DataFrame:
    """CC plus isolated nodes labeled by their own id."""
    cc = connected_components(edges)
    allnodes = nodes.select(F.col(node_col).cast("long").alias("node")).distinct()
    return (
        allnodes.join(cc, on="node", how="left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )


def summarize_components(components: DataFrame) -> DataFrame:
    """Component-size statistics (summarize_components / count_pairs /
    maxcomponent_pairs / count_singleton analogs,
    /root/reference/src/connectedcomponents.jl:63-186)."""
    sizes = components.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_components"),
        F.sum(F.when(F.col("n_nodes") == 1, 1).otherwise(0)).alias("n_singletons"),
        F.max("n_nodes").alias("max_nodes"),
        F.sum("n_nodes").alias("total_nodes"),
    )
