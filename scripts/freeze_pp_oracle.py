"""Freeze the trained scalars + loop structure the penalty-path oracle
needs, and ASSERT the decision-equivalences it relies on (repo pattern:
data-derived quantities are trained once and frozen as literals, with the
simplifying properties proven on the fixture at freeze time — same as
plans/ivf_centroids.json and plans/e2e_frozen.json).

The catalog's penalty_path_chain runs penalized_likelihood_search at
sf0.01 (penalty0=0, min_incr=4, max_steps=3, method="greedy").  Its
DuckDB twin (plans/pp_oracle.py) replays every coordinate-ascent solve as
a GLOBAL greedy matching in PRODUCT space (per-vector likelihood-ratio
products instead of log-weight sums — logs are libm-dependent and banned
from oracle decisions).  That replay is exact iff, on this fixture:

  A. each Spark one_to_one(method="greedy") output equals a single global
     greedy over all its positive pairs (blocks partition nodes, and the
     mutual fast path only fires where it provably equals greedy);
  B. per solve, the candidate order (w DESC, id_a, id_b) equals the
     product-space order (r DESC, id_a, id_b) — incl. tie structure;
  C. per solve, the positive set {w - penalty > 0} equals {r > e^penalty}
     with e^penalty the frozen Python double;
  D. the ascent iteration counts per penalty step (frozen as structure)
     and the penalties themselves (frozen as literals) match the run.

Frozen: plans/pp_frozen.json {sf_key: {penalties, ethetas,
iters_per_step, n_links_per_step}} — keyed by SF_DIR basename; the full
A-D suite re-runs (and must pass) per scale.
Usage: python scripts/freeze_pp_oracle.py [SF_DIR]   (default sf0.01)
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bayesianrecordlinkage_jl_spark", "plans", "pp_frozen.json",
)


def ratio(params, gcols, levels) -> float:
    """Product-space pair score — MUST mirror plans/pp_oracle.py's SQL
    (left-to-right product of per-field m/u ratios, missing level skipped)."""
    r = 1.0
    for g in gcols:
        l = levels[g]
        if l > 0:
            r = r * (float(params.pM[g][l - 1]) / float(params.pU[g][l - 1]))
    return r


def greedy(cand):
    """cand: list of (ia, ib, vec) already sorted; global greedy."""
    ua, ub, keep = set(), set(), []
    for ia, ib, vec in cand:
        if ia not in ua and ib not in ub:
            ua.add(ia)
            ub.add(ib)
            keep.append((ia, ib, vec))
    return keep


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from bayesianrecordlinkage_jl_spark.operators import (
        assignment, em, map_solver,
    )
    from bayesianrecordlinkage_jl_spark.operators.comparison_summary import (
        attach_vec_ids, distinct_vectors,
    )
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq
    from bayesianrecordlinkage_jl_spark.session import get_spark

    s = get_spark("freeze_pp", cpus=8)

    solves = []
    orig = assignment.one_to_one

    def spy(pairs_df, method="hungarian", **kw):
        pdf = pairs_df.toPandas()
        out = orig(pairs_df, method=method, **kw)
        solves.append((pdf, out.toPandas()))
        return out

    assignment.one_to_one = spy
    try:
        v = oq._vectors_spark(s, SF)
        dvdf = distinct_vectors(v, oq.GCOLS)
        pairs_df = attach_vec_ids(v, dvdf, oq.GCOLS).select(
            "id_a", "id_b", "vec_id"
        ).localCheckpoint()
        dv = dvdf.orderBy("vec_id").toPandas()
        params0 = em.estimate_em(dv, oq.GCOLS, oq.NLEVELS)
        chain = map_solver.penalized_likelihood_search(
            s, pairs_df, dv, oq.GCOLS, oq.NLEVELS, params0,
            penalty0=0.0, min_incr=4.0, max_steps=3, method="greedy",
        )
    finally:
        assignment.one_to_one = orig

    pairs = [
        (int(r.id_a), int(r.id_b), int(r.vec_id))
        for r in pairs_df.toPandas().itertuples(index=False)
    ]
    vec_levels = {
        int(r.vec_id): {g: int(getattr(r, g)) for g in oq.GCOLS}
        for r in dv.itertuples(index=False)
    }

    penalties = [float(p) for p in chain.penalties]
    ethetas = [math.exp(p) for p in penalties]
    n_steps = len(penalties)

    # replay the whole path in product space, consuming the spy captures
    params = params0
    si = 0
    iters_per_step = []
    step_links = []
    for step in range(n_steps):
        etheta = ethetas[step]
        theta = penalties[step]
        prev_links = None
        iters = 0
        while True:
            iters += 1
            rvec = {
                vid: ratio(params, oq.GCOLS, lvs)
                for vid, lvs in vec_levels.items()
            }
            cand = [(ia, ib, vec) for ia, ib, vec in pairs if rvec[vec] > etheta]
            cand.sort(key=lambda t: (-rvec[t[2]], t[0], t[1]))

            inp, out = solves[si]
            si += 1
            # C: positive-set equivalence (Spark filtered on w-theta > 0)
            spark_pos = {
                (int(r.id_a), int(r.id_b)) for r in inp.itertuples(index=False)
            }
            assert spark_pos == {(ia, ib) for ia, ib, _ in cand}, (
                f"positive-set mismatch at solve {si - 1} (theta={theta})"
            )
            # B: order equivalence (w DESC, ia, ib) == (r DESC, ia, ib)
            worder = [
                (int(r.id_a), int(r.id_b))
                for r in inp.sort_values(
                    ["w", "id_a", "id_b"], ascending=[False, True, True]
                ).itertuples(index=False)
            ]
            assert worder == [(ia, ib) for ia, ib, _ in cand], (
                f"sort-order mismatch at solve {si - 1}"
            )
            links = greedy(cand)
            # A: Spark solver output == global greedy replay
            spark_links = {
                (int(r.id_a), int(r.id_b)) for r in out.itertuples(index=False)
            }
            assert spark_links == {(ia, ib) for ia, ib, _ in links}, (
                f"greedy mismatch at solve {si - 1}"
            )
            mc = {g: [0.0] * oq.NLEVELS[g] for g in oq.GCOLS}
            for _, _, vec in links:
                for g in oq.GCOLS:
                    l = vec_levels[vec][g]
                    if l > 0:
                        mc[g][l - 1] += 1
            import numpy as np

            total = map_solver._total_counts(dv, oq.GCOLS, oq.NLEVELS)
            pM, pU = em.max_mu(
                {g: np.array(mc[g]) for g in oq.GCOLS}, total, oq.GCOLS
            )
            delta = 0.0
            for g in oq.GCOLS:
                delta = max(
                    delta,
                    max(abs(a - b) for a, b in zip(pM[g], params.pM[g])),
                    max(abs(a - b) for a, b in zip(pU[g], params.pU[g])),
                )
            params = em.FSParams(pM=pM, pU=pU, p=params.p)
            if delta <= 1e-5 or iters >= 100:
                break
            prev_links = links
        iters_per_step.append(iters)
        step_links.append({(ia, ib) for ia, ib, _ in links})

    assert si == len(solves), f"consumed {si} of {len(solves)} solves"

    # D (intervals): chain.links == presence islands of the step link sets
    islands = {}
    for st, ls in enumerate(step_links, start=1):
        for key in ls:
            runs = islands.setdefault(key, [])
            if runs and runs[-1][1] == st - 1:
                runs[-1][1] = st
            else:
                runs.append([st, st])
    expect = {
        (ia, ib, a, b) for (ia, ib), rs in islands.items() for a, b in rs
    }
    got = {
        (int(r.id_a), int(r.id_b), int(r.start), int(r.stop))
        for r in chain.links.toPandas().itertuples(index=False)
    }
    assert got == expect, "interval table mismatch vs presence islands"

    frozen = {
        "penalties": penalties,
        "ethetas": ethetas,
        "iters_per_step": iters_per_step,
        "n_links_per_step": [len(ls) for ls in step_links],
    }
    key = os.path.basename(os.path.normpath(SF))
    allfz = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            allfz = json.load(f)
    allfz[key] = frozen
    with open(OUT, "w") as f:
        json.dump(allfz, f, indent=1)
    print(f"wrote {OUT}[{key}]: {frozen}")


if __name__ == "__main__":
    main()
