"""Connected components by iterative large-star / small-star DataFrame joins.

Reference analog: bipartite_cluster BFS over the thresholded weight graph
(/root/reference/src/clustering_functions.jl:15-280) and the size-capped
iterative variants (:294-489). The reference BFS is single-machine and
queue-based; here we use the Kiveris et al. (2014) alternating large-star /
small-star algorithm — O(log n) rounds of shuffle joins, the standard
distributed formulation — with localCheckpoint per round to truncate
lineage and convergence detected by an edge-set-stability count.

Node ids are bigint. For bipartite graphs callers encode sides disjointly
(the two-source pipeline hashes ids with side-distinct prefixes —
plans/pipeline.py:link_two_sources). Component label = min node id in the
component.
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
    min(neighborhood ∪ {u}).

    No output distinct: duplicates are tolerated under bag semantics (the
    downstream small-star groupBy/min is duplicate-insensitive) and the
    round ends with one distinct — one shuffle per round instead of three.
    """
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
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: for each u, connect all neighbors <= u (and u) to the min.

    Output is canonical (src > dst, no self-loops) and distinct — callers
    need no extra _canon pass."""
    # orientation-only canonicalization (no distinct — groupBy dedups)
    u, v = F.col("src"), F.col("dst")
    e = edges.select(
        F.greatest(u, v).alias("src"), F.least(u, v).alias("dst")
    ).where(F.col("src") != F.col("dst"))
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
    def _sig(df: DataFrame) -> tuple:
        """Edge-set signature in ONE map-side aggregate (count + order-
        insensitive hash sum) — convergence check without the full-shuffle
        exceptAll comparison, which would dominate at scale."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.col("src"), F.col("dst")).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    e = _canon(
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
    ).localCheckpoint()
    sig = _sig(e)
    for _ in range(max_iter):
        # small-star output is already canonical + distinct
        e2 = _small_star(_large_star(e)).localCheckpoint()
        sig2 = _sig(e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    # at fixpoint every edge is (node, root)
    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def components_with_isolated(
    edges: DataFrame, nodes: DataFrame, node_col: str = "node",
    cc: DataFrame | None = None,
) -> DataFrame:
    """CC plus isolated nodes labeled by their own id.

    `cc` lets a caller that already materialized connected_components(edges)
    (e.g. the catalog's session memo) reuse it instead of re-iterating."""
    if cc is None:
        cc = connected_components(edges)
    allnodes = nodes.select(F.col(node_col).cast("long").alias("node")).distinct()
    return (
        allnodes.join(cc, on="node", how="left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )


def size_capped_components(
    weighted_edges: DataFrame,
    max_pairs: int,
    threshold: float = 0.0,
    incr: float = 0.01,
    max_rounds: int = 50,
) -> DataFrame:
    """iterative_bipartite_cluster2 analog
    (/root/reference/src/clustering_functions.jl:390-489): cluster at the
    base threshold, then re-cluster every oversized component (pair count >
    max_pairs) at progressively higher thresholds until all components fit
    or an unsplittable hot block remains (the reference warns, :465 — we
    return it flagged with `capped = true` so callers can salt/prune it).

    This IS the skew-splitting stage: at web scale a boilerplate-heavy hot
    block would otherwise blow up the per-block solver.

    weighted_edges: (src, dst, w). Returns (node, component, capped).
    """
    e = weighted_edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w")
    ).localCheckpoint()
    done_parts: list[DataFrame] = []
    cur_t = threshold
    active = e

    def _flush_capped(edges_df: DataFrame, t: float) -> DataFrame:
        """Remaining oversized components, flagged capped=true (incl. nodes
        isolated at threshold t). t must be the threshold the cap check was
        MEASURED at — flushing one incr higher would fragment components and
        mislabel sub-cap pieces as capped."""
        nodes = (
            edges_df.select(F.col("src").alias("node"))
            .union(edges_df.select(F.col("dst").alias("node")))
            .distinct()
        )
        return components_with_isolated(edges_df.where(F.col("w") > t), nodes).select(
            "node", "component", F.lit(True).alias("capped")
        )

    # threshold at which the most recent oversized-check was evaluated
    # (cur_t gets raised at the END of each round, so on max_rounds
    # exhaustion cur_t is one incr above the measured level)
    measured_t = cur_t
    for _ in range(max_rounds):
        measured_t = cur_t
        cc = connected_components(active.where(F.col("w") > cur_t))
        # nodes whose every edge fell below the raised threshold become
        # singletons NOW — without this they appear in no component and
        # vanish from the output
        nodes_active = (
            active.select(F.col("src").alias("node"))
            .union(active.select(F.col("dst").alias("node")))
            .distinct()
        )
        isolated = nodes_active.join(cc, on="node", how="left_anti").select(
            "node",
            F.col("node").alias("component"),
            F.lit(False).alias("capped"),
        )
        done_parts.append(isolated.localCheckpoint())
        # pair count per component = edges above threshold per component
        ec = (
            active.where(F.col("w") > cur_t)
            .join(cc.withColumnRenamed("node", "src"), on="src")
            .groupBy("component")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
        labeled = cc.join(ec, on="component")
        ok = labeled.where(F.col("n_pairs") <= max_pairs).select(
            "node", "component", F.lit(False).alias("capped")
        )
        done_parts.append(ok.localCheckpoint())
        over = labeled.where(F.col("n_pairs") > max_pairs).select("node")
        if over.limit(1).count() == 0:
            break
        # restrict to edges with BOTH endpoints inside oversized components
        # (a src-only restriction leaks below-threshold edges into nodes
        # already emitted, double-counting them next round); raise threshold
        active = (
            active.join(
                over.withColumnRenamed("node", "src"), on="src", how="left_semi"
            )
            .join(over.withColumnRenamed("node", "dst"), on="dst", how="left_semi")
            .localCheckpoint()
        )
        new_t = cur_t + incr
        # unsplittable: no edge would be dropped by the higher threshold
        if active.where((F.col("w") > cur_t) & (F.col("w") <= new_t)).limit(1).count() == 0 and \
           active.where(F.col("w") <= cur_t).limit(1).count() == 0:
            done_parts.append(_flush_capped(active, cur_t))
            break
        cur_t = new_t
    else:
        # max_rounds exhausted with oversized components still active: flush
        # them flagged rather than dropping their nodes from the output, at
        # the threshold the final cap check actually used
        done_parts.append(_flush_capped(active, measured_t))
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out


def threshold_sensitivity(
    weighted_edges: DataFrame, thresholds: list[float]
) -> list[dict]:
    """threshold_sensitivity analog
    (/root/reference/src/weight_functions.jl:471-484): component-size
    statistics at each candidate blocking threshold (driver diagnostic).

    Cost model: one CC fixpoint (several Spark jobs) PER threshold — O(len
    (thresholds)) sequential jobs by design, matching the reference's loop.
    Fine as a diagnostic over a shortlist of candidate thresholds; for a
    dense grid, prefer one size_capped_components run (single pass,
    thresholds discovered adaptively) or localCheckpoint the edge table
    before calling so each round starts from materialized edges."""
    out = []
    for t in thresholds:
        cc = connected_components(weighted_edges.where(F.col("w") > t))
        row = summarize_components(cc).collect()[0]
        out.append({"threshold": t, **row.asDict()})
    return out


def get_mids(values: list[float]) -> list[float]:
    """Midpoints between sorted distinct values (threshold grid,
    /root/reference/src/connectedcomponents.jl:116-119). Driver-side."""
    s = sorted(set(values))
    return [(a + b) / 2.0 for a, b in zip(s, s[1:])]


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
