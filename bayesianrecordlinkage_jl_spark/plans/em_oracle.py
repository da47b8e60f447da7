"""DuckDB twin of operators/em.estimate_em as ONE static recursive CTE.

The EM fit was `no_oracle` through round 2 because the E-step lived in
log-space (exp/log are libm-dependent and banned from oracle-checked
columns).  Round 3 rewrote estimate_em to the product form using only
+,-,*,/,max — all exactly rounded under IEEE-754 — with every fold order
pinned (left-to-right over vec_id-sorted vectors, levels 1..K).  This
module replays that exact operation sequence in SQL:

  * one recursion step per EM iteration; the working set is a single
    state row (it, delta, p, m_<g>_<l>.., u_<g>_<l>..);
  * the distinct-vector table is folded into LIST-typed state columns
    (per-field level lists + pair-count list, rn-ordered) computed once
    in the SEED row — the recursive term never touches the base tables.
    (A correlated-subquery formulation re-ran the comparator self-join
    ~2.6s per iteration: MATERIALIZED CTE hints are not honored inside
    DuckDB 1.0's recursive-term evaluation.  Lists make an iteration
    pure in-row arithmetic: 499 iterations in ~0.2s.)
  * per-vector responsibilities gm are recomputed inside each
    list_transform lambda — recomputation is safe because every
    operator is a deterministic function of the state row;
  * sums use `list_aggregate(lst, 'sum')`, which DuckDB evaluates as a
    0.0-seeded strict left-to-right fold (verified across sizes
    2..1000 in tests/test_em_oracle.py) — NOT plain SUM(), whose
    accumulation order over rows is unspecified.  Level-filtered sums
    pad non-matching slots with 0.0e0, which cannot perturb the
    accumulator (x + 0.0 is exact for the non-negative terms here);
  * float literals are emitted as `<repr>e0` so DuckDB lexes them as
    DOUBLE directly; a bare decimal literal is parsed as DECIMAL first
    and double-rounds (off by one ulp for e.g. 0.00044308006468156516).

Termination parity: the recursive term only expands rows with
delta > tol AND it < max_iter, so the last emitted row is exactly the
state after the Python loop's final iteration.

Reference: estimate_EM /root/reference/src/em_functions.jl:72-101.
"""

from __future__ import annotations


def flit(v: float) -> str:
    """Bit-exact DuckDB double literal (see module docstring)."""
    r = repr(float(v))
    return r if "e" in r or "inf" in r or "nan" in r else r + "e0"


def _prod(terms: list[str]) -> str:
    """Explicit left-assoc product ((t1*t2)*t3)... matching the Python fold."""
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} * {t})"
    return out


def _chain_sum(terms: list[str]) -> str:
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def _gm_expr(src: str, gcols: list[str], nlevels: dict[str, int]) -> str:
    """Responsibility gm for vector slot i of the state row `src`
    (product form; missing level 0 multiplies by 1.0 — a bitwise no-op,
    mirroring the Python skip)."""

    def case(g: str, cls: str) -> str:
        whens = " ".join(
            f"WHEN {lvl} THEN {src}.{cls}_{g}_{lvl}"
            for lvl in range(1, nlevels[g] + 1)
        )
        return f"(CASE {src}.lv_{g}[i] {whens} ELSE 1.0e0 END)"

    prod_m = _prod([case(g, "m") for g in gcols])
    prod_u = _prod([case(g, "u") for g in gcols])
    tm = f"({src}.p * {prod_m})"
    tu = f"((1.0e0 - {src}.p) * {prod_u})"
    return f"({tm} / ({tm} + {tu}))"


def _init(k: int, matchy: bool) -> list[float]:
    v = [1.0] * k
    if matchy:
        v[0] = 4.0 * k
    else:
        v[-1] = 4.0 * k
    s = float(4.0 * k + (k - 1))
    return [x / s for x in v]


def em_state_ctes(
    vectors_sql: str,
    gcols: list[str],
    nlevels: dict[str, int],
    p0: float = 0.1,
    tol: float = 1e-6,
    max_iter: int = 5000,
    prior_pseudo: float = 1.01,
) -> str:
    """CTE block `dv AS (...), em AS (...), fin AS (...)` (no WITH prefix;
    must be placed inside a WITH RECURSIVE).  `fin` is one row holding the
    converged EM state as scalar columns m_<g>_<l> / u_<g>_<l> (+ p), and
    `dv` is the rn-keyed distinct-vector table — both reusable by composite
    oracles (plans/pp_oracle.py embeds them as the penalty path's entry
    parameters)."""
    pseudo = prior_pseudo - 1.0
    gl = [(g, lvl) for g in gcols for lvl in range(1, nlevels[g] + 1)]
    params = [f"m_{g}_{l}" for g, l in gl] + [f"u_{g}_{l}" for g, l in gl]
    lists = [f"lv_{g}" for g in gcols] + ["nf", "idx"]
    gorder = ", ".join(gcols)
    gm = _gm_expr("s", gcols, nlevels)

    # seed row: iteration 0 with deterministic inits; the dv table is
    # captured as rn-ordered lists in ONE scan (each extra subquery over
    # dv would re-run the comparator self-join underneath it)
    seeds = [
        "CAST(0 AS BIGINT) AS it",
        "1e308 AS delta",
        f"{flit(p0)} AS p",
        "dvl.ntot AS ntot",
    ]
    for cls, matchy in (("m", True), ("u", False)):
        for g in gcols:
            for lvl, val in enumerate(_init(nlevels[g], matchy), start=1):
                seeds.append(f"{flit(val)} AS {cls}_{g}_{lvl}")
    seeds += [f"dvl.lv_{g} AS lv_{g}" for g in gcols]
    seeds += ["dvl.nf AS nf", "dvl.idx AS idx"]
    dvl_cols = ", ".join(
        [f"list({g} ORDER BY rn) AS lv_{g}" for g in gcols]
        + [
            "list(nf ORDER BY rn) AS nf",
            "list(rn ORDER BY rn) AS idx",
            "CAST(sum(n_pairs) AS DOUBLE) AS ntot",
        ]
    )
    seed = f"SELECT {', '.join(seeds)} FROM (SELECT {dvl_cols} FROM dv) dvl"

    # t0: advance counter, carry state, compute per-vector weight lists
    t0_cols = (
        ["s.it + 1 AS it", "s.p AS p", "s.ntot AS ntot"]
        + [f"s.{c} AS {c}" for c in params]
        + [f"s.{c} AS {c}" for c in lists]
        + [
            f"list_transform(s.idx, i -> ({gm} * s.nf[i])) AS wm",
            f"list_transform(s.idx, i -> ((1.0e0 - {gm}) * s.nf[i])) AS wu",
        ]
    )
    t0 = (
        f"SELECT {', '.join(t0_cols)} FROM em s "
        f"WHERE s.delta > {flit(tol)} AND s.it < {max_iter}"
    )

    # t1: ordered folds (level-filtered slots padded with exact 0.0)
    t1_cols = (
        ["t0.it AS it", "t0.p AS p", "t0.ntot AS ntot"]
        + [f"t0.{c} AS {c}" for c in params]
        + [f"t0.{c} AS {c}" for c in lists]
        + ["list_aggregate(t0.wm, 'sum') AS accp"]
    )
    for g, l in gl:
        for cls, w in (("am", "wm"), ("au", "wu")):
            t1_cols.append(
                f"list_aggregate(list_transform(t0.idx, i -> "
                f"CASE WHEN t0.lv_{g}[i] = {l} THEN t0.{w}[i] ELSE 0.0e0 END), "
                f"'sum') AS {cls}_{g}_{l}"
            )
    t1 = f"SELECT {', '.join(t1_cols)} FROM ({t0}) t0"

    # t2: normalize into new params (pseudo added AFTER each fold)
    t2_cols = (
        ["t1.it AS it", "t1.p AS p", "t1.ntot AS ntot",
         "(t1.accp / t1.ntot) AS p_new"]
        + [f"t1.{c} AS {c}" for c in params]
        + [f"t1.{c} AS {c}" for c in lists]
    )
    for cls, acc in (("m", "am"), ("u", "au")):
        for g in gcols:
            cs = [
                f"({flit(pseudo)} + t1.{acc}_{g}_{l})"
                for l in range(1, nlevels[g] + 1)
            ]
            total = _chain_sum(cs)
            for lvl, c in enumerate(cs, start=1):
                t2_cols.append(f"({c} / {total}) AS n{cls}_{g}_{lvl}")
    t2 = f"SELECT {', '.join(t2_cols)} FROM ({t1}) t1"

    # recursive select: new state row + convergence delta
    diffs = ["abs(t2.p_new - t2.p)"] + [
        f"abs(t2.n{c} - t2.{c})" for c in params
    ]
    rec = (
        f"SELECT t2.it AS it, GREATEST({', '.join(diffs)}) AS delta, "
        f"t2.p_new AS p, t2.ntot AS ntot, "
        + ", ".join(f"t2.n{c} AS {c}" for c in params)
        + ", "
        + ", ".join(f"t2.{c} AS {c}" for c in lists)
        + f" FROM ({t2}) t2"
    )

    return f"""
    dv AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY {gorder}) AS BIGINT) AS rn,
             {gorder}, n_pairs, CAST(n_pairs AS DOUBLE) AS nf
      FROM (SELECT {gorder}, CAST(count(*) AS BIGINT) AS n_pairs
            FROM ({vectors_sql}) GROUP BY {gorder})
    ),
    em AS (
      {seed}
      UNION ALL
      {rec}
    ),
    fin AS (SELECT * FROM em ORDER BY it DESC LIMIT 1)
    """


def estimate_em_sql(
    vectors_sql: str,
    gcols: list[str],
    nlevels: dict[str, int],
    **kw,
) -> str:
    """Static SQL returning (field, level, pM, pU) bit-identical to
    estimate_em over the distinct vectors of `vectors_sql` (a query with
    columns gcols; one row per pair)."""
    gl = [(g, lvl) for g in gcols for lvl in range(1, nlevels[g] + 1)]
    unpivot = " UNION ALL ".join(
        f"SELECT '{g}' AS field, CAST({l} AS INT) AS level, "
        f"m_{g}_{l} AS pM, u_{g}_{l} AS pU FROM fin"
        for g, l in gl
    )
    return (
        "WITH RECURSIVE "
        + em_state_ctes(vectors_sql, gcols, nlevels, **kw)
        + unpivot
    )
