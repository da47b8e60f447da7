"""Fellegi-Sunter weight functions as Catalyst column expressions.

Reference semantics (re-expressed, not ported):
  - weights_vector: w(gamma) = sum_k [log pM_k(level) - log pU_k(level)]
    over NON-MISSING levels only (level 0 contributes nothing)
    (/root/reference/src/weight_functions.jl:159-173, em_functions.jl:16)
  - shrink_weights: max(w - penalty, 0)
    (/root/reference/src/weight_functions.jl:192-201)
  - bayesrule_posterior: logistic(logit(p) + w)
    (/root/reference/src/weight_functions.jl:451)

The m/u parameter table is a plain Python structure; both the Spark
expression and the DuckDB oracle SQL are generated from the SAME literals
(rounded to 12 decimals) with the SAME left-to-right summation order, so
double-precision results agree bit-for-bit across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

# Default m/u probabilities per field kind. Keys are agreement levels
# (1-based; level 0 = missing is skipped by construction). These are the
# fixed seeds used before EM refinement (EM-estimated parameters replace
# them at runtime; oracle queries use these fixed literals).
DEFAULT_MU: dict[str, dict[int, tuple[float, float]]] = {
    # exact comparator (levels 1=agree, 2=disagree)
    "exact": {1: (0.95, 0.05), 2: (0.05, 0.95)},
    # levenshtein-binned comparator (levels 1..4)
    "lev": {1: (0.80, 0.02), 2: (0.14, 0.08), 3: (0.04, 0.30), 4: (0.02, 0.60)},
    # token-jaccard-binned comparator (levels 1..4)
    "jac": {1: (0.85, 0.01), 2: (0.10, 0.09), 3: (0.03, 0.30), 4: (0.02, 0.60)},
    # numeric band comparator (levels 1=equal, 2=near, 3=far)
    "band": {1: (0.90, 0.10), 2: (0.08, 0.30), 3: (0.02, 0.60)},
}


def level_log_ratios(kind: str, mu: dict | None = None) -> dict[int, float]:
    """Per-level log(m/u), rounded to 12 decimals for cross-engine parity."""
    table = (mu or DEFAULT_MU)[kind]
    return {lvl: round(math.log(m / u), 12) for lvl, (m, u) in table.items()}


def field_weight(g: Column, kind: str, mu: dict | None = None) -> Column:
    """Weight contribution of one field's agreement level; level 0 -> 0.0."""
    ratios = level_log_ratios(kind, mu)
    expr = F.when(g == 0, F.lit(0.0))
    for lvl, w in ratios.items():
        expr = expr.when(g == lvl, F.lit(w))
    return expr.otherwise(F.lit(0.0))


def _dlit(x: float) -> str:
    """Double literal for DuckDB: bare decimals parse as DECIMAL there, so
    force DOUBLE with scientific-notation suffix."""
    return f"{x!r}e0"


def field_weight_sql(g: str, kind: str, mu: dict | None = None) -> str:
    ratios = level_log_ratios(kind, mu)
    whens = " ".join(f"WHEN {g} = {lvl} THEN {_dlit(w)}" for lvl, w in ratios.items())
    return f"CASE WHEN {g} = 0 THEN 0.0e0 {whens} ELSE 0.0e0 END"


def fs_weight(fields: list[tuple[Column, str]], mu: dict | None = None) -> Column:
    """Total FS weight: left-to-right sum of per-field contributions."""
    total = None
    for g, kind in fields:
        term = field_weight(g, kind, mu)
        total = term if total is None else total + term
    return total.alias("w")


def fs_weight_sql(fields: list[tuple[str, str]], mu: dict | None = None) -> str:
    terms = [f"({field_weight_sql(g, kind, mu)})" for g, kind in fields]
    # Parenthesize left-to-right to force identical association order.
    expr = terms[0]
    for t in terms[1:]:
        expr = f"({expr} + {t})"
    return expr


def shrink_weights(w: Column, penalty: float) -> Column:
    """Soft-threshold (reference shrink_weights)."""
    return F.greatest(w - F.lit(float(penalty)), F.lit(0.0))


def shrink_weights_sql(w: str, penalty: float) -> str:
    return f"greatest({w} - {_dlit(float(penalty))}, 0.0e0)"


def bayesrule_posterior(w: Column, p: float) -> Column:
    """Match posterior per vector: logistic(logit(p) + w)."""
    logit_p = math.log(p / (1.0 - p))
    return 1.0 / (1.0 + F.exp(-(F.lit(logit_p) + w)))


def bayesrule_posterior_sql(w: str, p: float) -> str:
    logit_p = math.log(p / (1.0 - p))
    return f"1.0e0 / (1.0e0 + exp(-({_dlit(logit_p)} + {w})))"


def fs_decision(w: Column, lower: float, upper: float) -> Column:
    """Fellegi-Sunter three-way decision rule (the 1969 paper's A1/A2/A3
    regions; /root/reference applies single thresholds via weight cutoffs,
    e.g. src/weight_functions.jl shrink/penalized forms — the clerical
    band is the classical operating mode between them):
    'match' if w >= upper, 'nonmatch' if w < lower, else 'clerical'."""
    return (
        F.when(w >= F.lit(float(upper)), F.lit("match"))
        .when(w < F.lit(float(lower)), F.lit("nonmatch"))
        .otherwise(F.lit("clerical"))
    )


def fs_decision_sql(w: str, lower: float, upper: float) -> str:
    return (
        f"CASE WHEN {w} >= {_dlit(float(upper))} THEN 'match' "
        f"WHEN {w} < {_dlit(float(lower))} THEN 'nonmatch' "
        f"ELSE 'clerical' END"
    )
