"""Comparison-vector construction + deduplication (the ComparisonSummary analog).

Reference semantics (re-expressed, not ported):
  - comparison_variables: deduplicate comparison vectors, map every pair to
    its distinct-vector id, count multiplicities
    (/root/reference/src/comparisonsummary.jl:84-209)
  - count_variables: per-field per-level marginal counts
    (/root/reference/src/comparisonsummary.jl:220-252)
  - merge_comparisonsummary: combine two summaries
    (/root/reference/src/comparisonsummary.jl:422-488)

This dedup is THE core performance trick of the whole engine (and of the
reference): all EM / weight / likelihood math runs once per DISTINCT
comparison vector (tiny table, collected to the driver) instead of once per
candidate pair (huge table). The pairs table only ever carries a vec_id
that is broadcast-joined back to per-vector results.

Deterministic vec_id assignment: row_number over the vectors ordered
lexicographically (g1..gK) — stable across runs and engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def comparison_vectors(
    pairs: DataFrame, field_exprs: dict[str, Column]
) -> DataFrame:
    """Append agreement-level columns g1..gK (tinyint, 0=missing) to pairs."""
    return pairs.withColumns({name: expr for name, expr in field_exprs.items()})


def distinct_vectors(pairs: DataFrame, gcols: list[str]) -> DataFrame:
    """Dedup comparison vectors -> (vec_id, g1..gK, n_pairs).

    vec_id is a deterministic dense id: row_number over lexicographic vector
    order. The distinct-vector table is tiny (bounded by prod(nlevels+1)),
    so the single-partition window is a non-issue at any scale.
    """
    agg = pairs.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_pairs"))
    w = Window.orderBy(*[F.col(g) for g in gcols])
    return agg.withColumn("vec_id", F.row_number().over(w).cast("long")).select(
        "vec_id", *gcols, "n_pairs"
    )


def attach_vec_ids(
    pairs: DataFrame, dvecs: DataFrame, gcols: list[str]
) -> DataFrame:
    """Broadcast-join vec_id back onto the pairs table."""
    return pairs.join(
        F.broadcast(dvecs.select("vec_id", *gcols)), on=gcols, how="left"
    )


def marginal_counts(dvecs: DataFrame, gcols: list[str]) -> DataFrame:
    """count_variables analog: (field, level, n_pairs) from distinct vectors.

    Level 0 rows carry the missing-count; callers skip them in likelihoods.
    Implemented as an explode (stack) + re-aggregation of the already-tiny
    distinct-vector table — never touches the pairs table.
    """
    stacked = dvecs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("field"),
                        F.col(g).cast("int").alias("level"),
                        F.col("n_pairs").alias("n"),
                    )
                    for g in gcols
                ]
            )
        ).alias("x")
    ).select("x.*")
    return (
        stacked.groupBy("field", "level")
        .agg(F.sum("n").alias("n_pairs"))
        .orderBy("field", "level")
    )


def merge_summaries(
    dvecs_a: DataFrame, dvecs_b: DataFrame, gcols: list[str]
) -> DataFrame:
    """merge_comparisonsummary analog: combine two distinct-vector tables,
    re-keying ids deterministically and summing multiplicities."""
    both = dvecs_a.select(*gcols, "n_pairs").unionByName(
        dvecs_b.select(*gcols, "n_pairs")
    )
    agg = both.groupBy(*gcols).agg(F.sum("n_pairs").alias("n_pairs"))
    w = Window.orderBy(*[F.col(g) for g in gcols])
    return agg.withColumn("vec_id", F.row_number().over(w).cast("long")).select(
        "vec_id", *gcols, "n_pairs"
    )


@dataclass
class ComparisonSummary:
    """Driver-side handle bundling the pairs table and the (small) distinct-
    vector table, mirroring the reference struct's role without its dense
    matrix representation."""

    pairs: DataFrame  # includes gcols + vec_id
    dvecs: DataFrame  # vec_id, gcols, n_pairs
    gcols: list[str]
    nlevels: dict[str, int]
    _dvecs_pd: pd.DataFrame | None = field(default=None, repr=False)

    @classmethod
    def build(
        cls,
        pairs: DataFrame,
        field_exprs: dict[str, Column],
        nlevels: dict[str, int],
    ) -> "ComparisonSummary":
        gcols = list(field_exprs)
        withg = comparison_vectors(pairs, field_exprs)
        dvecs = distinct_vectors(withg, gcols)
        keyed = attach_vec_ids(withg, dvecs, gcols)
        return cls(pairs=keyed, dvecs=dvecs, gcols=gcols, nlevels=nlevels)

    def dvecs_pd(self, refresh: bool = False) -> pd.DataFrame:
        """Distinct vectors collected to the driver (bounded-size table);
        the substrate for all EM / weight math (numpy, per SURVEY 2.7)."""
        if self._dvecs_pd is None or refresh:
            self._dvecs_pd = (
                self.dvecs.orderBy("vec_id").toPandas().reset_index(drop=True)
            )
        return self._dvecs_pd
