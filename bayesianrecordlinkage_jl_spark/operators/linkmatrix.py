"""Matching-state set operations (LinkMatrix analogs).

Reference semantics (re-expressed, not ported):
  - row2col_removed / row2col_added / row2col_difference: diff two matchings
    (/root/reference/src/linkmatrix.jl:344-427)
  - matched_comparisons: which distinct vectors appear in >=1 match
    (/root/reference/src/linkmatrix.jl:435-447)
  - dropoutside: restrict pairs to within-block (row and col share a
    component label) (/root/reference/src/mcmc.jl:12-54)

The reference mutates an in-memory bipartite matching; here matchings are
(id_a, id_b) DataFrames and diffs are anti-joins / full-outer joins —
shuffle-free when both sides share partitioning, broadcastable when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KEYS = ["id_a", "id_b"]


def links_removed(old: DataFrame, new: DataFrame) -> DataFrame:
    """Links present in `old` but not `new` (anti-join)."""
    return old.select(*KEYS).join(new.select(*KEYS), on=KEYS, how="left_anti")


def links_added(old: DataFrame, new: DataFrame) -> DataFrame:
    return new.select(*KEYS).join(old.select(*KEYS), on=KEYS, how="left_anti")


def links_difference(old: DataFrame, new: DataFrame) -> DataFrame:
    """Full diff -> (id_a, id_b, status in {'removed','added','kept'})."""
    o = old.select(*KEYS).withColumn("_in_old", F.lit(True))
    n = new.select(*KEYS).withColumn("_in_new", F.lit(True))
    j = o.join(n, on=KEYS, how="full_outer")
    return j.select(
        *KEYS,
        F.when(F.col("_in_old") & F.col("_in_new"), "kept")
        .when(F.col("_in_old"), "removed")
        .otherwise("added")
        .alias("status"),
    )


def matched_comparisons(dvecs: DataFrame, links: DataFrame) -> DataFrame:
    """Distinct vectors that occur in at least one match (semi-join);
    links must carry vec_id."""
    return dvecs.join(
        links.select("vec_id").distinct(), on="vec_id", how="left_semi"
    )


def drop_outside(
    pairs: DataFrame, components: DataFrame
) -> DataFrame:
    """Keep pairs whose endpoints share a (non-null) component label: the
    proposal-space sparsification the reference applies before restricted
    MCMC. Two equi-joins + label-equality filter."""
    ca = components.select(
        F.col("node").alias("id_a"), F.col("component").alias("_comp_a")
    )
    cb = components.select(
        F.col("node").alias("id_b"), F.col("component").alias("_comp_b")
    )
    return (
        pairs.join(ca, on="id_a")
        .join(cb, on="id_b")
        .where(F.col("_comp_a") == F.col("_comp_b"))
        .drop("_comp_b")
        .withColumnRenamed("_comp_a", "block_id")
    )
