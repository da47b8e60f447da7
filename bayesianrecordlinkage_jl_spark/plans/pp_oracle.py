"""DuckDB twin of the penalty-path MAP search (penalty_path_chain).

Replays penalized_likelihood_search(method="greedy") as static SQL:

  * entry parameters come from the embedded EM recursive CTE
    (plans/em_oracle.em_state_ctes) — nothing about the fit is frozen;
  * every coordinate-ascent solve is a GLOBAL greedy matching replayed as
    a recursive CTE over a (score DESC, id_a, id_b)-ordered list of pair
    structs: pick the head, drop conflicting pairs, repeat.  Global
    greedy equals Spark's per-block one_to_one(method="greedy") because
    connected components partition the node set, and the mutual fast
    path only fires where it provably equals greedy — asserted per solve
    at freeze time (scripts/freeze_pp_oracle.py, assert A);
  * scores live in PRODUCT space: per-vector likelihood-ratio products
    Π m/u instead of the log-weight sums Spark uses (exp/log are
    libm-dependent and banned from oracle decisions).  Product-space
    ordering and thresholding match the log-space run — asserted per
    solve at freeze time (asserts B and C), with the per-step penalty
    thresholds frozen as e^penalty literals (plans/pp_frozen.json);
  * the Dirichlet-MAP parameter update between solves mirrors
    em.max_mu's pinned arithmetic (counts are integers, so only the
    normalizer's left-to-right level fold matters);
  * the ascent iteration count per penalty step is frozen structure
    (assert D): each step runs until the matched-count fixpoint, which
    the greedy+max_mu composition reaches in the frozen number of
    solves; interval bookkeeping reduces to presence islands over the
    per-step link sets.

Scope: the frozen structure (penalties / ethetas / ascent iteration
counts) is DATA-derived, so pp_frozen.json is keyed by scale-factor
directory basename ("sf0.01", "sf0.1", ...) and scripts/freeze_pp_oracle.py
re-runs the full A-D assertion suite per scale.  The catalog's "sql" is
the sf0.01 gate twin (the driver's contract scale); "sql_by_sf" carries a
twin per additionally-frozen scale so scripts/parity_sweep.py value-checks
the flagship MAP path at sf0.1 too (VERDICT r3 "Next round" #3) instead of
skipping it.  Scales with no frozen block are still skipped (gate_only
fallback) — running a knowingly-wrong oracle is worse than a skip.

Reference: penalized_likelihood_search_* /root/reference/src/
sequence_map_functions.jl:91-240; coordinate ascent /root/reference/src/
map_functions.jl:1-324.
"""

from __future__ import annotations

import json
import os

from .em_oracle import em_state_ctes, flit, _chain_sum, _prod

_FROZEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "pp_frozen.json"
)


def _frozen_all() -> dict:
    with open(_FROZEN_PATH) as f:
        return json.load(f)


def _frozen(sf_key: str = "sf0.01") -> dict:
    return _frozen_all()[sf_key]


def frozen_sf_keys() -> list[str]:
    """Scale keys a penalty-path twin exists for (freeze script ran and
    its A-D equivalence asserts passed at that scale)."""
    return sorted(_frozen_all())


def _ratio_expr(pr: str, gcols: list[str], nlevels: dict[str, int]) -> str:
    """Product-space score for dv row d under params row `pr` — mirrors
    scripts/freeze_pp_oracle.ratio (missing level multiplies by 1.0, a
    bitwise no-op)."""

    def case(g: str) -> str:
        whens = " ".join(
            f"WHEN {l} THEN ({pr}.m_{g}_{l} / {pr}.u_{g}_{l})"
            for l in range(1, nlevels[g] + 1)
        )
        return f"(CASE d.{g} {whens} ELSE 1.0e0 END)"

    return _prod([case(g) for g in gcols])


def penalty_path_sql(
    vectors_sql: str,
    gcols: list[str],
    nlevels: dict[str, int],
    priorM: float = 1.01,
    priorU: float = 1.01,
    frozen: dict | None = None,
) -> str:
    """Static SQL returning (id_a, id_b, start, stop) bit-identical to the
    catalog's penalty_path_chain."""
    fz = frozen or _frozen()
    ethetas = fz["ethetas"]
    iters = fz["iters_per_step"]
    gl = [(g, l) for g in gcols for l in range(1, nlevels[g] + 1)]
    params = [f"m_{g}_{l}" for g, l in gl] + [f"u_{g}_{l}" for g, l in gl]
    pm_pseudo = priorM - 1.0
    pu_pseudo = priorU - 1.0
    join_on = " AND ".join(f"v.{g} = d.{g}" for g in gcols)

    ctes = [em_state_ctes(vectors_sql, gcols, nlevels).strip().rstrip()]
    ctes.append(
        f"pairs0 AS MATERIALIZED (SELECT v.id_a AS ia, v.id_b AS ib, "
        f"d.rn AS vec FROM ({vectors_sql}) v JOIN dv d ON {join_on})"
    )
    tc_cols = ", ".join(
        f"COALESCE((SELECT CAST(sum(n_pairs) AS DOUBLE) FROM dv "
        f"WHERE {g} = {l}), 0.0e0) AS tc_{g}_{l}"
        for g, l in gl
    )
    ctes.append(f"tc AS MATERIALIZED (SELECT {tc_cols})")
    ctes.append(
        "par_0 AS (SELECT " + ", ".join(f"{c} AS {c}" for c in params)
        + " FROM fin)"
    )

    struct_t = "STRUCT(ia BIGINT, ib BIGINT, vec BIGINT)[]"
    s = 0
    last_of_step = []
    for step, (etheta, n_it) in enumerate(zip(ethetas, iters)):
        for _ in range(n_it):
            s += 1
            prev = f"par_{s - 1}"
            ratio = _ratio_expr("pr", gcols, nlevels)
            ctes.append(
                f"rv_{s} AS (SELECT d.rn AS vec, {ratio} AS r "
                f"FROM dv d, {prev} pr)"
            )
            ctes.append(
                f"cand_{s} AS (SELECT list(struct_pack(ia := p.ia, "
                f"ib := p.ib, vec := p.vec) ORDER BY rv.r DESC, p.ia, p.ib) "
                f"AS rem FROM pairs0 p JOIN rv_{s} rv ON p.vec = rv.vec "
                f"WHERE rv.r > {flit(etheta)})"
            )
            ctes.append(
                f"g_{s} AS (SELECT 0 AS n, CAST([] AS {struct_t}) AS chosen, "
                f"(SELECT rem FROM cand_{s}) AS rem "
                f"UNION ALL SELECT n + 1, list_append(chosen, rem[1]), "
                f"list_filter(rem[2:], p -> p['ia'] != (rem[1])['ia'] "
                f"AND p['ib'] != (rem[1])['ib']) "
                f"FROM g_{s} WHERE len(rem) > 0)"
            )
            ctes.append(
                f"lk_{s} AS MATERIALIZED (SELECT u['ia'] AS ia, "
                f"u['ib'] AS ib, u['vec'] AS vec FROM (SELECT unnest(chosen) "
                f"AS u FROM (SELECT chosen FROM g_{s} ORDER BY n DESC "
                f"LIMIT 1)))"
            )
            # Dirichlet-MAP update (em.max_mu mirror)
            mc_cols = ", ".join(
                f"CAST(count(CASE WHEN d.{g} = {l} THEN 1 END) AS DOUBLE) "
                f"AS mc_{g}_{l}"
                for g, l in gl
            )
            upd_cols = []
            for g in gcols:
                ams = [
                    f"(c.mc_{g}_{l} + {flit(pm_pseudo)})"
                    for l in range(1, nlevels[g] + 1)
                ]
                aus = [
                    f"((tc.tc_{g}_{l} - c.mc_{g}_{l}) + {flit(pu_pseudo)})"
                    for l in range(1, nlevels[g] + 1)
                ]
                am_tot = _chain_sum(ams)
                au_tot = _chain_sum(aus)
                for l, (am, au) in enumerate(zip(ams, aus), start=1):
                    upd_cols.append(f"({am} / {am_tot}) AS m_{g}_{l}")
                    upd_cols.append(f"({au} / {au_tot}) AS u_{g}_{l}")
            ctes.append(
                f"par_{s} AS (SELECT {', '.join(upd_cols)} FROM "
                f"(SELECT {mc_cols} FROM lk_{s} l JOIN dv d ON l.vec = d.rn) "
                f"c, tc)"
            )
        last_of_step.append(s)

    pres = " UNION ALL ".join(
        f"SELECT ia, ib, {st} AS st FROM lk_{idx}"
        for st, idx in enumerate(last_of_step, start=1)
    )
    ctes.append(f"pres AS ({pres})")

    body = ",\n    ".join(ctes)
    return f"""
    WITH RECURSIVE
    {body}
    SELECT ia AS id_a, ib AS id_b,
           CAST(min(st) AS BIGINT) AS start, CAST(max(st) AS BIGINT) AS stop
    FROM (SELECT ia, ib, st,
                 st - row_number() OVER (PARTITION BY ia, ib ORDER BY st)
                 AS grp
          FROM pres)
    GROUP BY ia, ib, grp
    """
