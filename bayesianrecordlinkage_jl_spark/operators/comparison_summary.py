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


# ---------------------------------------------------------------------------
# value-specific (frequency-based) agreement weights — Winkler 1989
# ---------------------------------------------------------------------------


def value_specific_weights(
    ra: DataFrame,
    rb: DataFrame,
    id_col: str,
    value_col: str,
    m_prob: float,
    n_a: int,
    n_b: int,
) -> DataFrame:
    """Frequency-based Fellegi-Sunter agreement weights (Winkler 1989 /
    Fellegi & Sunter 1969 §3.3.1): agreement on a RARE value is stronger
    evidence than agreement on a common one. For every A x B pair agreeing
    exactly on `value_col`, the value-specific chance-agreement probability
    is u_v = (f_A(v)/N_A) * (f_B(v)/N_B) and the emitted likelihood ratio
    is m_prob / u_v -> (rid_a, rid_b, value, f_a, f_b, u_v, ratio).

    The reference applies one global m/u per comparator
    (/root/reference/src/em_functions.jl:16); this is the standard
    value-frequency refinement for name-like fields layered on the same
    FS weight algebra (functions/weights.py).

    Scale shape: two map-side-combined value-count aggregates (vocabulary-
    sized, broadcast), then the agreement pairs themselves come from the
    value equi-join — the frequency tables ride along on the SAME join key,
    adding no extra shuffle of the record sides. Float order is pinned:
    u_v = (f_a / N_A) * (f_b / N_B), ratio = m / u_v — two divisions and
    one multiply, IEEE-identical in both engines.
    """
    fa = ra.groupBy(value_col).agg(F.count(F.lit(1)).alias("f_a"))
    fb = rb.groupBy(value_col).agg(F.count(F.lit(1)).alias("f_b"))
    a = ra.select(F.col(id_col).alias("rid_a"), value_col).join(
        F.broadcast(fa), on=value_col
    )
    b = rb.select(F.col(id_col).alias("rid_b"), value_col).join(
        F.broadcast(fb), on=value_col
    )
    pairs = a.join(b, on=value_col)
    u_v = (F.col("f_a").cast("double") / F.lit(float(n_a))) * (
        F.col("f_b").cast("double") / F.lit(float(n_b))
    )
    return pairs.select(
        "rid_a",
        "rid_b",
        F.col(value_col).alias("value"),
        "f_a",
        "f_b",
        u_v.alias("u_v"),
        (F.expr(f"CAST('{m_prob!r}' AS DOUBLE)") / u_v).alias("ratio"),
    )


def value_specific_weights_sql(
    table_a: str,
    table_b: str,
    id_col: str,
    value_col: str,
    m_prob: float,
    n_a: int,
    n_b: int,
) -> str:
    u_v = (
        f"((CAST(f_a AS DOUBLE) / CAST('{float(n_a)!r}' AS DOUBLE)) * "
        f"(CAST(f_b AS DOUBLE) / CAST('{float(n_b)!r}' AS DOUBLE)))"
    )
    return f"""
    WITH vsw_fa AS (SELECT {value_col} AS value, CAST(count(*) AS BIGINT) AS f_a
                    FROM {table_a} GROUP BY {value_col}),
    vsw_fb AS (SELECT {value_col} AS value, CAST(count(*) AS BIGINT) AS f_b
               FROM {table_b} GROUP BY {value_col}),
    vsw_a AS (SELECT a.{id_col} AS rid_a, fa.value, fa.f_a
              FROM {table_a} a JOIN vsw_fa fa ON a.{value_col} = fa.value),
    vsw_b AS (SELECT b.{id_col} AS rid_b, fb.value, fb.f_b
              FROM {table_b} b JOIN vsw_fb fb ON b.{value_col} = fb.value)
    SELECT rid_a, rid_b, a.value AS value, f_a, f_b,
           {u_v} AS u_v,
           (CAST('{m_prob!r}' AS DOUBLE) / {u_v}) AS ratio
    FROM vsw_a a JOIN vsw_b b ON a.value = b.value
    """
