"""EM and Dirichlet-MAP parameter estimation on aggregated counts.

Reference semantics (re-expressed, not ported):
  - E_step / M_step / estimate_EM (/root/reference/src/em_functions.jl:7-101):
    responsibilities per DISTINCT comparison vector, missing levels (0)
    integrated out; EM to tol 1e-6 / maxIter 5000
  - prior_mode (/root/reference/src/maximization_functions.jl:6-11)
  - max_MU: Dirichlet-MAP pM,pU given a current matching's match counts
    (/root/reference/src/maximization_functions.jl:18-133)
  - weights_vector: FS log-likelihood-ratio per distinct vector
    (/root/reference/src/weight_functions.jl:159-173)

Everything here is driver-side numpy over the distinct-vector table (tiny
after the groupBy dedup) — the whole point of the comparison-vector dedup is
that parameter estimation NEVER touches the pairs table. The outputs
(per-vector weights) go back to Spark via a broadcast join on vec_id.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class FSParams:
    """pM/pU[field][level-1] for levels 1..nlevels[field]; p = match prob."""

    pM: dict[str, np.ndarray]
    pU: dict[str, np.ndarray]
    p: float
    iterations: int = 0
    converged: bool = True

    def log_ratio(self, field: str) -> np.ndarray:
        return np.log(self.pM[field]) - np.log(self.pU[field])


def prior_mode(prior: np.ndarray) -> np.ndarray:
    """Dirichlet prior mode: (a_i - 1) / (sum a - K)."""
    return (prior - 1.0) / (prior.sum() - len(prior))


def estimate_em(
    dvecs: pd.DataFrame,
    gcols: list[str],
    nlevels: dict[str, int],
    p0: float = 0.1,
    pM0: dict[str, np.ndarray] | None = None,
    pU0: dict[str, np.ndarray] | None = None,
    tol: float = 1e-6,
    max_iter: int = 5000,
    prior_pseudo: float = 1.01,
) -> FSParams:
    """EM over the distinct-vector table (columns gcols + n_pairs).

    Arithmetic contract (oracle parity): every float op here is +,-,*,/
    or max — all exactly rounded under IEEE-754, so the iteration is
    bit-reproducible in any engine that replays the same operation ORDER.
    The DuckDB twin (plans/em_oracle.py) replays it as a recursive CTE
    with ORDER-BY-fixed left-to-right list folds; keep the two in
    lockstep.  Concretely:

      * the E-step uses the PRODUCT form gm = p·Πm / (p·Πm + (1-p)·Πu)
        (not log-space — exp/log are libm-dependent and banned from
        oracle-checked columns); products fold left-to-right in gcols
        order.  Safe from underflow while Π stays above ~1e-300: the
        Dirichlet pseudocount floors every prob at ~1e-5, so ~60 fields
        is the practical limit (the reference fits 3-6).
      * all sums over vectors fold left-to-right in vec_id order from a
        0.0 accumulator (NOT numpy pairwise sums); dvecs is re-sorted by
        vec_id here so caller row order cannot change the result.
      * level pseudocounts are `pseudo + fold`, outer-added AFTER the
        fold; normalizers fold levels 1..K left-to-right.

    Reference: estimate_EM /root/reference/src/em_functions.jl:72-101
    (E_step/M_step :7-52; this adds Dirichlet pseudocounts to the M-step
    so probabilities stay off the simplex boundary).
    """
    if "vec_id" in dvecs.columns:
        dvecs = dvecs.sort_values("vec_id")
    n = [float(x) for x in dvecs["n_pairs"].tolist()]
    lv = {g: [int(x) for x in dvecs[g].tolist()] for g in gcols}
    nrow = len(n)
    ntot = float(int(dvecs["n_pairs"].sum()))  # integer sum: order-free
    pseudo = prior_pseudo - 1.0

    def init(field: str, matchy: bool) -> list[float]:
        k = nlevels[field]
        v = [1.0] * k
        if matchy:
            v[0] = 4.0 * k  # mass on agreement for M-class
        else:
            v[-1] = 4.0 * k  # mass on disagreement for U-class
        s = float(4.0 * k + (k - 1))  # exact: small-int arithmetic
        return [x / s for x in v]

    if pM0:
        pM = {g: [float(x) for x in pM0[g]] for g in gcols}
    else:
        pM = {g: init(g, True) for g in gcols}
    if pU0:
        pU = {g: [float(x) for x in pU0[g]] for g in gcols}
    else:
        pU = {g: init(g, False) for g in gcols}
    p = float(p0)
    it = 0
    converged = False
    for it in range(1, max_iter + 1):
        # E-step (per distinct vector, product form; see contract above)
        gm = [0.0] * nrow
        for i in range(nrow):
            prod_m = 1.0
            prod_u = 1.0
            for g in gcols:
                l = lv[g][i]
                if l > 0:
                    prod_m = prod_m * pM[g][l - 1]
                    prod_u = prod_u * pU[g][l - 1]
            tm = p * prod_m
            tu = (1.0 - p) * prod_u
            gm[i] = tm / (tm + tu)
        # M-step with Dirichlet pseudocounts (ordered folds)
        accp = 0.0
        for i in range(nrow):
            accp = accp + gm[i] * n[i]
        new_p = accp / ntot
        new_pM, new_pU = {}, {}
        delta = abs(new_p - p)
        for g in gcols:
            k = nlevels[g]
            cm = [0.0] * k
            cu = [0.0] * k
            for lvl in range(1, k + 1):
                am = 0.0
                au = 0.0
                for i in range(nrow):
                    if lv[g][i] == lvl:
                        am = am + gm[i] * n[i]
                        au = au + (1.0 - gm[i]) * n[i]
                cm[lvl - 1] = pseudo + am
                cu[lvl - 1] = pseudo + au
            cms = cm[0]
            cus = cu[0]
            for lvl in range(1, k):
                cms = cms + cm[lvl]
                cus = cus + cu[lvl]
            new_pM[g] = [x / cms for x in cm]
            new_pU[g] = [x / cus for x in cu]
            for lvl in range(k):
                delta = max(delta, abs(new_pM[g][lvl] - pM[g][lvl]))
                delta = max(delta, abs(new_pU[g][lvl] - pU[g][lvl]))
        pM, pU, p = new_pM, new_pU, new_p
        if delta <= tol:
            converged = True
            break
    return FSParams(
        pM={g: np.array(pM[g]) for g in gcols},
        pU={g: np.array(pU[g]) for g in gcols},
        p=p,
        iterations=it,
        converged=converged,
    )


def max_mu(
    match_counts: dict[str, np.ndarray],
    total_counts: dict[str, np.ndarray],
    gcols: list[str],
    priorM: float = 1.01,
    priorU: float = 1.01,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Dirichlet-MAP closed form given per-(field,level) matched counts and
    total observed counts (levels 1..K only; level 0 excluded upstream).

    Same arithmetic contract as estimate_em: only exactly-rounded ops,
    normalizer folded left-to-right over levels, so the DuckDB penalty-path
    oracle (plans/pp_oracle.py) can replay it bit-exactly."""
    pM, pU = {}, {}
    pm_pseudo = priorM - 1.0
    pu_pseudo = priorU - 1.0
    for g in gcols:
        am = [float(c) + pm_pseudo for c in match_counts[g]]
        au = [
            (float(t) - float(c)) + pu_pseudo
            for t, c in zip(total_counts[g], match_counts[g])
        ]
        ams = am[0]
        aus = au[0]
        for x in am[1:]:
            ams = ams + x
        for x in au[1:]:
            aus = aus + x
        pM[g] = np.array([x / ams for x in am])
        pU[g] = np.array([x / aus for x in au])
    return pM, pU


def weights_vector(
    dvecs: pd.DataFrame, gcols: list[str], params: FSParams
) -> pd.DataFrame:
    """FS weight per distinct vector -> DataFrame(vec_id, w) for broadcast
    join back to pairs. Missing levels contribute 0."""
    w = np.zeros(len(dvecs))
    for g in gcols:
        lr = params.log_ratio(g)
        lv = dvecs[g].to_numpy().astype(int)
        obs = lv > 0
        w[obs] += lr[lv[obs] - 1]
    return pd.DataFrame({"vec_id": dvecs["vec_id"].to_numpy(), "w": w})


def minimum_margin(weights, digits: int = 5) -> float:
    """Min gap between distinct rounded weights (auction epsilon tuning,
    /root/reference/src/weight_functions.jl:4-8). Driver-side."""
    s = np.unique(np.round(np.asarray(weights, dtype=float), digits))
    if len(s) < 2:
        return 0.0
    return float(np.diff(s).min())


def one_hot_counts(
    dvecs: pd.DataFrame, gcols: list[str], nlevels: dict[str, int]
) -> np.ndarray:
    """get_obsidxcounts analog (/root/reference/src/comparisonsummary.jl:503-511):
    one-hot expansion of each distinct vector over the flattened
    (field, level) axis — level 0 (missing) contributes no column."""
    width = sum(nlevels[g] for g in gcols)
    out = np.zeros((len(dvecs), width), dtype=np.int64)
    off = 0
    for g in gcols:
        lv = dvecs[g].to_numpy().astype(int)
        obs = lv > 0
        out[np.where(obs)[0], off + lv[obs] - 1] = 1
        off += nlevels[g]
    return out


def observed_mask(
    dvecs: pd.DataFrame, gcols: list[str]
) -> np.ndarray:
    """get_obsidxobs analog (:521-529): 0/1 per (vector, field) observed."""
    return np.stack(
        [(dvecs[g].to_numpy().astype(int) > 0).astype(np.int64) for g in gcols],
        axis=1,
    )


def maximum_weights_vector(
    dvecs: pd.DataFrame, gcols: list[str], params_path: list[FSParams]
) -> pd.DataFrame:
    """Max weight per vector across a sequence of parameter estimates —
    edge weights for post-hoc blocking
    (/root/reference/src/weight_functions.jl:248-263)."""
    ws = np.stack(
        [weights_vector(dvecs, gcols, prm)["w"].to_numpy() for prm in params_path]
    )
    return pd.DataFrame({"vec_id": dvecs["vec_id"].to_numpy(), "w": ws.max(axis=0)})
