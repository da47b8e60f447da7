"""Restricted MCMC over post-hoc blocks (mh_gibbs_count analog).

Reference semantics (re-expressed, not ported):
  - mh_gibbs_count: per sweep, update every post-hoc block (1x1 blocks by
    exact Gibbs, larger blocks by a random-walk MH kernel), then Gibbs-draw
    pM/pU; accumulate per-pair link counts
    (/root/reference/src/mcmc.jl:87-137)
  - randomwalk1 moves add/remove/rowswitch/colswitch/doubleswitch on the
    one-to-one matching with O(1) log-likelihood deltas from per-pair
    weights (/root/reference/src/move_functions.jl:429-642)
  - locally-balanced (barker) informed proposals, the reference's
    recommended kernel (/root/reference/src/move_functions.jl:772-914,
    vignette/example.jl:96) — kernel="barker"
  - singleton_gibbs exact toggle for 1x1 blocks
    (/root/reference/src/move_functions.jl:1177-1205)
  - dirichlet_draw / gibbs_MU_draw for conditional pM/pU
    (/root/reference/src/move_functions.jl:1385-1432)
  - Bayes estimate: keep pairs linked more than half the (post-burn-in)
    steps (/root/reference/README.md:148-151)

Distributed adaptation (the north_rule's MAP surrogate remains the primary
path; this sampler exists for posterior parity): blocks are conditionally
independent given (pM, pU), so each block's ENTIRE chain runs inside one
applyInPandas call with fixed per-pair log-likelihood-ratio weights —
a per-sweep global pM/pU Gibbs sync would serialize tens of thousands of
cluster-wide barriers. `mh_gibbs` re-draws pM/pU between distributed
rounds (outer Gibbs), which recovers the reference's hierarchy at round
granularity.

Determinism: each block's RNG is seeded with (seed, block_id), so results
are identical across reruns, task placement, and partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

COUNT_SCHEMA = "id_a long, id_b long, w double, block_id long, n_linked long"


def exppenalty_log_ratio(theta: float):
    """Exponential link-count penalty prior, ratio form
    (exppenalty_logratiopn analog, /root/reference/src/prior_functions.jl):
    log p(nlink+nadd) - log p(nlink) = -theta * nadd."""

    def f(nadd: int, nlink: int, nrow: int, ncol: int) -> float:
        return -theta * nadd

    return f


def betabipartite_log_ratio(alpha: float, beta: float):
    """Beta-bipartite prior on the number of links, ratio form
    (betabipartite_logratiopn analog,
    /root/reference/src/prior_functions.jl:234-247)."""
    from math import lgamma

    def lbeta(a: float, b: float) -> float:
        return lgamma(a) + lgamma(b) - lgamma(a + b)

    def f(nadd: int, nlink: int, nrow: int, ncol: int) -> float:
        if nadd == 0:
            return 0.0
        if nrow < ncol:
            nrow, ncol = ncol, nrow
        nnew = nlink + nadd
        if nnew > ncol or nnew < 0:
            return -np.inf
        c1 = lgamma(nrow - nnew + 1) - lgamma(nrow - nlink + 1)
        c2 = lbeta(nnew + alpha, ncol - nnew + beta) - lbeta(
            nlink + alpha, ncol - nlink + beta
        )
        return c1 + c2

    return f


def exppenalty_logprior(nlink: int, theta: float) -> float:
    """Absolute (unnormalized) log prior of the Green-Mardia exponential
    link penalty: log p(C) = -theta * nlink
    (exppenalty_logprior, /root/reference/src/prior_functions.jl:22-37;
    normalize via softmax over nlink = 0..min(nrow, ncol) if a proper
    pmf over link counts is needed, as the reference's header notes)."""
    return -theta * nlink


def exppenalty_prior(nlink: int, theta: float) -> float:
    """exp(exppenalty_logprior) — the reference's exppenalty_prior
    (/root/reference/src/prior_functions.jl:6-20)."""
    from math import exp

    return exp(-theta * nlink)


def exppenalty_logratio(nlink1: int, nlink2: int, theta: float) -> float:
    """log(p(C1) / p(C2)) for the exponential penalty prior
    (exppenalty_logratio, /root/reference/src/prior_functions.jl:67-88;
    note the reference returns 1.0 — not 0.0 — for nlink1 == nlink2, a
    bug in a branch its own samplers never take; this implementation
    returns the correct 0.0)."""
    return theta * (nlink2 - nlink1)


def _lbeta(a: float, b: float) -> float:
    from math import lgamma

    return lgamma(a) + lgamma(b) - lgamma(a + b)


def betabipartite_logprior(
    nlink: int, nrow: int, ncol: int, alpha: float, beta: float
) -> float:
    """Absolute log density of the Sadinle-2017 beta prior for bipartite
    matchings (betabipartite_logprior,
    /root/reference/src/prior_functions.jl:146-156):

      log p(C) = lgamma(nmax - nlink + 1) - lgamma(nmax + 1)
               + logbeta(nlink + a, nmin - nlink + b) - logbeta(a, b)

    with nmax = max(nrow, ncol), nmin = min(nrow, ncol). This is a PROPER
    density over all bipartite matchings:
    sum_L C(nrow,L) C(ncol,L) L! exp(logprior(L)) == 1 (asserted in
    tests/test_mcmc.py). The reference's non-log betabipartite_prior
    (prior_functions.jl:131-135) uses prod(nlink+1:nrow) = nrow!/nlink!
    where the log form uses (nrow-nlink)!/nrow! — the two disagree and
    only the log form normalizes, so the log form is canonical here and
    the non-log form is exp() of it."""
    from math import lgamma

    if nlink < 0 or nlink > min(nrow, ncol):
        return float("-inf")
    if nrow < ncol:
        nrow, ncol = ncol, nrow
    return (
        lgamma(nrow - nlink + 1)
        - lgamma(nrow + 1)
        + _lbeta(nlink + alpha, ncol - nlink + beta)
        - _lbeta(alpha, beta)
    )


def betabipartite_prior(
    nlink: int, nrow: int, ncol: int, alpha: float, beta: float
) -> float:
    """exp(betabipartite_logprior) — see that docstring for why the exp of
    the log form (not the reference's inconsistent direct product) is
    used."""
    from math import exp

    return exp(betabipartite_logprior(nlink, nrow, ncol, alpha, beta))


def betabipartite_logratio(
    nlink1: int, nlink2: int, nrow: int, ncol: int, alpha: float, beta: float
) -> float:
    """log(p(C1) / p(C2)) = logprior(nlink1) - logprior(nlink2) for the
    beta-bipartite prior (betabipartite_logratio,
    /root/reference/src/prior_functions.jl:210-225), computed in the
    reference's cancelled form (lgamma differences, no subtraction of two
    near-equal logpriors)."""
    from math import lgamma

    if nlink1 == nlink2:
        return 0.0
    if nrow < ncol:
        nrow, ncol = ncol, nrow
    return (
        lgamma(nrow - nlink1 + 1)
        - lgamma(nrow - nlink2 + 1)
        + _lbeta(nlink1 + alpha, ncol - nlink1 + beta)
        - _lbeta(nlink2 + alpha, ncol - nlink2 + beta)
    )


def _prior_fns(lp_link, nrow: int, ncol: int):
    """Normalize the lp_link prior spec into (lp_add(nlink), lp_remove(nlink))
    — the logpCRatios_add/_remove analog
    (/root/reference/src/move_functions.jl:367-407). Accepted forms:
      * float — constant log prior odds per link (as before)
      * sequence/array — arr[n] (0-based) is the log ratio of n+1 vs n
        links; adds beyond len(arr) links are -Inf (hard cap), removes
        from nlink=0 are -Inf
      * callable f(nadd, nlink, nrow, ncol) — function prior
        (exppenalty_log_ratio / betabipartite_log_ratio constructors)

    PER-BLOCK semantics (divergence from the reference): chains run
    independently per connected-component block, so nlink/nrow/ncol here are
    the BLOCK-local link count and distinct id_a/id_b counts — the
    reference's logpCRatio sees the global LinkMatrix. Consequences: an
    array prior capping links at N caps at N per block (global cap = sum of
    block caps), and betabipartite uses block-local dims. For the constant
    and exppenalty priors the two factorize identically (the ratio depends
    only on nadd), so only array/betabipartite callers must not assume a
    global cap.
    """
    if callable(lp_link):
        return (
            lambda n: lp_link(1, n, nrow, ncol),
            lambda n: lp_link(-1, n, nrow, ncol),
        )
    if isinstance(lp_link, (list, tuple, np.ndarray)):
        arr = np.asarray(lp_link, dtype=float).ravel()

        def add(n: int) -> float:
            return float(arr[n]) if n < arr.size else -np.inf

        def rem(n: int) -> float:
            return -float(arr[n - 1]) if n > 0 else -np.inf

        return add, rem
    c = float(lp_link)
    return (lambda n: c), (lambda n: -c)


def _run_block_chain(
    ids_a: np.ndarray,
    ids_b: np.ndarray,
    w: np.ndarray,
    nsteps: int,
    lp_link: float,
    rng: np.random.Generator,
    kernel: str = "rw1",
) -> list[tuple[int, int, int]]:
    """One block's restricted chain -> link-persistence intervals
    (pair_idx, start, stop), 1-based inclusive step indices. The single
    source of truth for BOTH the count and trace forms (their exact duality
    is by construction).

    State = one-to-one matching over the block's candidate pairs.
    Kernels:
      * "rw1" — uniform candidate pair; the move is determined by the state
        (add / remove / rowswitch / colswitch / DOUBLESWITCH). Doubleswitch
        swaps partners in one move when both endpoints are linked elsewhere
        (reference randomwalk1_move!,
        /root/reference/src/move_functions.jl:429-566); it is valid only
        when the complementary pair (i', j') is also a candidate (the
        sparse analog of the reference's loglikMissing = -Inf). The
        proposal stays symmetric (a doubleswitch is reachable by exactly
        two picks in each direction), so MH acceptance is the loglik+prior
        delta alone.
      * "barker" — locally-balanced informed proposal (Zanella 2019; the
        reference's recommended randomwalk1_locally_balanced_barker_update!,
        /root/reference/src/move_functions.jl:772-914): propose move m with
        probability sigmoid(delta_m)/Z (the barker_logx transform of the
        move's likelihood ratio, functions/balancing.py), accept with
        min(1, Z/Z') — the barker identity g(1/r)/g(r) = 1/r cancels the
        likelihood ratio out of the acceptance. O(npairs) per step: use on
        poorly-mixing dense blocks.
      * "gibbs" — singlerow/singlecol exact Gibbs scans (see inline note).
    """
    npairs = len(w)
    open_at: dict[int, int] = {}
    intervals: list[tuple[int, int, int]] = []
    nrow = len(set(int(x) for x in ids_a))
    ncol = len(set(int(x) for x in ids_b))
    lp_add, lp_remove = _prior_fns(lp_link, nrow, ncol)

    if npairs == 1:
        # singleton_gibbs: exact Bernoulli per step (both kernels)
        p_link = 1.0 / (1.0 + np.exp(-(w[0] + lp_add(0))))
        draws = rng.random(nsteps) < p_link
        for step in range(1, nsteps + 1):
            if draws[step - 1] and 0 not in open_at:
                open_at[0] = step
            elif not draws[step - 1] and 0 in open_at:
                intervals.append((0, open_at.pop(0), step - 1))
        if 0 in open_at:
            intervals.append((0, open_at.pop(0), nsteps))
        return intervals

    # dense local row/col indices for O(1) state lookup
    rows: dict[int, int] = {}
    cols: dict[int, int] = {}
    ra = np.empty(npairs, dtype=np.int64)
    ca = np.empty(npairs, dtype=np.int64)
    for k in range(npairs):
        ra[k] = rows.setdefault(int(ids_a[k]), len(rows))
        ca[k] = cols.setdefault(int(ids_b[k]), len(cols))
    pair_of = {(int(ra[k]), int(ca[k])): k for k in range(npairs)}
    row_link = np.full(len(rows), -1, dtype=np.int64)  # local row -> pair
    col_link = np.full(len(cols), -1, dtype=np.int64)

    nlink = [0]  # mutable so apply/revert keep it exact

    def move_delta(k: int, kr: int, kc: int) -> float:
        if kr == k:  # linked -> remove
            return -w[k] + lp_remove(nlink[0])
        if kr < 0 and kc < 0:  # add
            return w[k] + lp_add(nlink[0])
        if kr >= 0 and kc < 0:  # rowswitch (nlink unchanged)
            return w[k] - w[kr]
        if kr < 0 and kc >= 0:  # colswitch
            return w[k] - w[kc]
        k2 = pair_of.get((int(ra[kc]), int(ca[kr])))  # doubleswitch partner
        if k2 is None:
            return -np.inf
        return w[k] + w[k2] - w[kr] - w[kc]

    def move_events(k: int, kr: int, kc: int) -> list[tuple[str, int]]:
        if kr == k:
            return [("unlink", k)]
        if kr < 0 and kc < 0:
            return [("link", k)]
        if kr >= 0 and kc < 0:
            return [("unlink", kr), ("link", k)]
        if kr < 0 and kc >= 0:
            return [("unlink", kc), ("link", k)]
        k2 = pair_of[(int(ra[kc]), int(ca[kr]))]
        return [("unlink", kr), ("unlink", kc), ("link", k), ("link", k2)]

    def apply_arrays(events: list[tuple[str, int]]) -> None:
        for act, k in events:
            val = k if act == "link" else -1
            row_link[ra[k]] = val
            col_link[ca[k]] = val
            nlink[0] += 1 if act == "link" else -1

    def revert_arrays(events: list[tuple[str, int]]) -> None:
        for act, k in reversed(events):
            val = -1 if act == "link" else k
            row_link[ra[k]] = val
            col_link[ca[k]] = val
            nlink[0] += -1 if act == "link" else 1

    def record(events: list[tuple[str, int]], step: int) -> None:
        for act, k in events:
            if act == "link":
                open_at[k] = step
            else:
                intervals.append((k, open_at.pop(k), step - 1))

    if kernel == "rw1":
        picks = rng.integers(0, npairs, size=nsteps)
        laccepts = np.log(rng.random(nsteps))
        for step0 in range(nsteps):
            k = int(picks[step0])
            kr = int(row_link[ra[k]])
            kc = int(col_link[ca[k]])
            if laccepts[step0] < move_delta(k, kr, kc):
                ev = move_events(k, kr, kc)
                apply_arrays(ev)
                record(ev, step0 + 1)
    elif kernel == "rw2":
        # randomwalk2_update! analog
        # (/root/reference/src/move_functions.jl:936-1149): sample a row
        # uniformly; unlinked rows add to a uniform FREE candidate col,
        # linked rows remove (always when no free col; else with prob p)
        # or colswitch to a uniform free col. Asymmetric proposal — the
        # reference's move-count corrections are applied to the MH delta.
        P_REMOVE = 0.5
        row_cand: list[list[int]] = [[] for _ in range(len(rows))]
        for k in range(npairs):
            row_cand[int(ra[k])].append(k)
        for step0 in range(nsteps):
            r = int(rng.integers(0, len(rows)))
            cur = int(row_link[r])
            open_ks = [k for k in row_cand[r] if col_link[ca[k]] < 0]
            if cur < 0:
                if not open_ks:
                    continue  # reference recurses; a no-op step is the
                    # sparse-safe equivalent (self-loop proposal)
                k = open_ks[int(rng.integers(0, len(open_ks)))]
                d = w[k] + lp_add(nlink[0])
                if len(open_ks) > 1:
                    d += np.log(P_REMOVE) + np.log(len(open_ks))
                ev = [("link", k)]
            elif not open_ks:
                d = -w[cur] + lp_remove(nlink[0])
                ev = [("unlink", cur)]
            elif rng.random() < P_REMOVE:
                d = (
                    -w[cur]
                    + lp_remove(nlink[0])
                    - np.log(len(open_ks) + 1)
                    - np.log(P_REMOVE)
                )
                ev = [("unlink", cur)]
            else:
                k = open_ks[int(rng.integers(0, len(open_ks)))]
                d = w[k] - w[cur]
                ev = [("unlink", cur), ("link", k)]
            if np.log(rng.random()) < d:
                apply_arrays(ev)
                record(ev, step0 + 1)
    elif kernel == "gibbs":
        # singlerow_gibbs! / singlecol_gibbs! analog
        # (/root/reference/src/move_functions.jl:1229-1361): pick a random
        # row or column, then sample its assignment EXACTLY from the
        # conditional posterior given the rest of the matching — options
        # are its candidate pairs whose other endpoint is free (or itself)
        # plus "unlinked"; weights exp(w + lp_add(nlink_without_self))
        # relative to unlinked. Exact Gibbs: always invariant, no
        # accept/reject.
        row_pairs: list[list[int]] = [[] for _ in range(len(rows))]
        col_pairs: list[list[int]] = [[] for _ in range(len(cols))]
        for k in range(npairs):
            row_pairs[int(ra[k])].append(k)
            col_pairs[int(ca[k])].append(k)
        nsides = len(rows) + len(cols)
        picks = rng.integers(0, nsides, size=nsteps)
        for step0 in range(nsteps):
            t = int(picks[step0])
            if t < len(rows):
                cur = int(row_link[t])
                opts = [
                    k for k in row_pairs[t]
                    if col_link[ca[k]] < 0 or k == cur
                ]
            else:
                c = t - len(rows)
                cur = int(col_link[c])
                opts = [
                    k for k in col_pairs[c]
                    if row_link[ra[k]] < 0 or k == cur
                ]
            n_rest = nlink[0] - (1 if cur >= 0 else 0)
            lpa = lp_add(n_rest)
            logw = np.array([w[k] + lpa for k in opts] + [0.0])
            m = logw.max()
            p = np.exp(logw - m)
            p /= p.sum()
            choice = int(rng.choice(len(opts) + 1, p=p))
            new = opts[choice] if choice < len(opts) else -1
            if new == cur:
                continue
            ev: list[tuple[str, int]] = []
            if cur >= 0:
                ev.append(("unlink", cur))
            if new >= 0:
                ev.append(("link", new))
            apply_arrays(ev)
            record(ev, step0 + 1)
    elif kernel in ("barker", "sqrt", "min1", "max1"):
        # locally-balanced informed proposal for the whole balancing-g
        # family (functions/balancing.py log-space forms). Any valid g
        # satisfies g(t) = t*g(1/t), so r * g(1/r)/g(r) = 1 and the MH
        # acceptance reduces to min(1, Z/Z') for every member.
        ks = np.arange(npairs)

        def log_g(d: np.ndarray) -> np.ndarray:
            if kernel == "barker":  # lbarker: stable log-sigmoid
                out = np.where(
                    d > 0,
                    -np.log1p(np.exp(-np.clip(d, 0, None))),
                    d - np.log1p(np.exp(np.clip(d, None, 0))),
                )
            elif kernel == "sqrt":  # lsqrt
                out = 0.5 * d
            elif kernel == "min1":  # lmin1
                out = np.minimum(d, 0.0)
            else:  # lmax1
                out = np.maximum(d, 0.0)
            # invalid moves (delta = -inf, e.g. missing doubleswitch
            # partner) must stay weight-0 under every g
            return np.where(np.isneginf(d), -np.inf, out)

        def log_weights() -> np.ndarray:
            d = np.array(
                [
                    move_delta(k, int(row_link[ra[k]]), int(col_link[ca[k]]))
                    for k in range(npairs)
                ]
            )
            return log_g(d)

        def logsumexp(lw: np.ndarray) -> float:
            m = lw.max()
            if np.isneginf(m):  # no valid move at all
                return -np.inf
            return float(m + np.log(np.exp(lw - m).sum()))

        for step0 in range(nsteps):
            lw = log_weights()
            lz = logsumexp(lw)
            if np.isneginf(lz):
                # every move is prior-forbidden (e.g. hard cap 0, or a
                # function prior returning -inf for all adds from the empty
                # state): the informed chain self-loops, matching rw1's
                # all-reject behavior instead of sampling NaN probabilities
                continue
            p = np.exp(lw - lz)
            k = int(rng.choice(ks, p=p / p.sum()))
            ev = move_events(k, int(row_link[ra[k]]), int(col_link[ca[k]]))
            apply_arrays(ev)
            lz2 = logsumexp(log_weights())
            if np.log(rng.random()) < lz - lz2:
                record(ev, step0 + 1)
            else:
                revert_arrays(ev)
    else:
        raise ValueError(f"unknown kernel: {kernel!r}")

    for k in list(open_at):
        intervals.append((k, open_at.pop(k), nsteps))
    return intervals


def _block_chain(
    pdf: pd.DataFrame,
    nsteps: int,
    burnin: int,
    lp_link: float,
    seed: int,
    kernel: str = "rw1",
) -> pd.DataFrame:
    """Per-pair linked-step counts (post burn-in) for one block's chain.

    Pairs are canonicalized to (id_a, id_b) order before the chain runs:
    applyInPandas hands rows in shuffle arrival order, and the proposal
    stream indexes pairs positionally — without the sort the realized
    chain (and a borderline Bayes estimate) would depend on upstream
    partitioning (the total-order tie-break invariant)."""
    pdf = pdf.sort_values(["id_a", "id_b"], ignore_index=True)
    block_id = int(pdf["block_id"].iloc[0])
    rng = np.random.default_rng((seed, block_id))
    w = pdf["w"].to_numpy(dtype=float)
    intervals = _run_block_chain(
        pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy(), w, nsteps, lp_link,
        rng, kernel,
    )
    counts = np.zeros(len(pdf), dtype=np.int64)
    for k, s, e in intervals:
        counts[k] += max(0, e - max(s, burnin + 1) + 1)
    out = pdf[["id_a", "id_b", "w", "block_id"]].copy()
    out["n_linked"] = counts
    return out


TRACE_SCHEMA = "id_a long, id_b long, block_id long, start long, stop long"


def _block_chain_trace(
    pdf: pd.DataFrame,
    nsteps: int,
    lp_link: float,
    seed: int,
    kernel: str = "rw1",
) -> pd.DataFrame:
    """Trace variant (mh_gibbs_trace analog,
    /root/reference/src/mcmc.jl:170-254): link-persistence INTERVALS
    [start, stop] from the SAME chain as _block_chain (shared
    _run_block_chain core, same RNG stream) — sum(stop - start + 1) per
    pair reconstructs _block_chain's counts exactly by construction.
    Same canonical (id_a, id_b) pair order as _block_chain (the duality
    requires an identical positional indexing of the proposal stream)."""
    pdf = pdf.sort_values(["id_a", "id_b"], ignore_index=True)
    block_id = int(pdf["block_id"].iloc[0])
    rng = np.random.default_rng((seed, block_id))
    ids_a = pdf["id_a"].to_numpy()
    ids_b = pdf["id_b"].to_numpy()
    intervals = _run_block_chain(
        ids_a, ids_b, pdf["w"].to_numpy(dtype=float), nsteps, lp_link, rng,
        kernel,
    )
    rows = [
        {
            "id_a": int(ids_a[k]),
            "id_b": int(ids_b[k]),
            "block_id": block_id,
            "start": s,
            "stop": e,
        }
        for k, s, e in intervals
    ]
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "block_id", "start", "stop"]
    )


def mh_gibbs_trace(
    blocked_pairs: DataFrame,
    nsteps: int = 1000,
    lp_link=0.0,  # float | array (capped) | callable(nadd, nlink, nrow, ncol)
    seed: int = 42,
    kernel: str = "rw1",
) -> DataFrame:
    """Link-persistence intervals [id_a id_b start stop] from the same
    chains as mh_gibbs_count — the ParameterChain trace form. Feed into
    the chain interval aggregations (get_linkcounts/get_steplinks analogs,
    catalog queries chain_link_counts / steplinks / chain_stage_counts)."""
    p = blocked_pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w").cast("double"),
        F.col("block_id").cast("long"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _block_chain_trace(pdf, nsteps, lp_link, seed, kernel)

    return p.repartition("block_id").groupBy("block_id").applyInPandas(
        fn, schema=TRACE_SCHEMA
    )


def mh_gibbs_count(
    blocked_pairs: DataFrame,
    nsteps: int = 1000,
    burnin: int = 0,
    lp_link=0.0,  # float | array (capped) | callable(nadd, nlink, nrow, ncol)
    seed: int = 42,
    kernel: str = "rw1",
) -> DataFrame:
    """Per-pair posterior link counts from per-block restricted chains.

    blocked_pairs: (id_a, id_b, w, block_id) where block_id partitions the
    graph (connected components) and w is the pair's log-likelihood ratio.
    lp_link: log prior odds of a link (logpCRatio analog). NOTE: array /
    callable priors are evaluated on BLOCK-LOCAL nlink/nrow/ncol, not the
    global LinkMatrix the reference sees — see _prior_fns for the exact
    semantics (constant / exppenalty priors are unaffected).
    kernel: "rw1" (symmetric, incl. doubleswitch) or "barker"
    (locally-balanced informed proposal — see _run_block_chain).
    """
    p = blocked_pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w").cast("double"),
        F.col("block_id").cast("long"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _block_chain(pdf, nsteps, burnin, lp_link, seed, kernel)

    return p.repartition("block_id").groupBy("block_id").applyInPandas(
        fn, schema=COUNT_SCHEMA
    )


def bayes_estimate_links(counts: DataFrame, nsteps: int, burnin: int = 0) -> DataFrame:
    """Pairs linked in more than half the post-burn-in steps
    (/root/reference/README.md:148-151)."""
    return counts.where(
        F.col("n_linked") * 2 > F.lit(nsteps - burnin)
    ).select("id_a", "id_b", "w", "block_id")


def gibbs_mu_draw(
    match_counts: dict[str, np.ndarray],
    total_counts: dict[str, np.ndarray],
    gcols: list[str],
    rng: np.random.Generator,
    priorM: float = 1.01,
    priorU: float = 1.01,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Conditional Dirichlet draw of pM, pU given matched/unmatched counts
    (dirichlet_draw / gibbs_MU_draw analog)."""
    pM, pU = {}, {}
    for g in gcols:
        mc = match_counts[g].astype(float)
        uc = total_counts[g].astype(float) - mc
        pM[g] = rng.dirichlet(mc + priorM)
        pU[g] = rng.dirichlet(uc + priorU)
    return pM, pU


def mh_gibbs(
    spark,
    pairs_with_vecid: DataFrame,
    blocked_pairs: DataFrame,
    dvecs: pd.DataFrame,
    gcols: list[str],
    nlevels: dict[str, int],
    params,
    rounds: int = 3,
    nsteps_per_round: int = 500,
    lp_link=0.0,  # float | array (capped) | callable(nadd, nlink, nrow, ncol)
    seed: int = 42,
    kernel: str = "rw1",
):
    """Outer-Gibbs driver: alternate {distributed per-block chains} with
    {driver Dirichlet re-draw of pM/pU} — the reference hierarchy at round
    granularity. Returns (total_counts_df, final (pM, pU))."""
    from . import em
    from .map_solver import _total_counts

    rng = np.random.default_rng(seed)
    total = _total_counts(dvecs, gcols, nlevels)
    pM = {g: params.pM[g].copy() for g in gcols}
    pU = {g: params.pU[g].copy() for g in gcols}
    acc = None
    for r in range(rounds):
        cur = em.FSParams(pM=pM, pU=pU, p=params.p)
        wpd = em.weights_vector(dvecs, gcols, cur)
        wdf = spark.createDataFrame(wpd, schema="vec_id long, w double")
        weighted = blocked_pairs.drop("w").join(F.broadcast(wdf), on="vec_id")
        counts = mh_gibbs_count(
            weighted, nsteps=nsteps_per_round, lp_link=lp_link, seed=seed + r,
            kernel=kernel,
        ).localCheckpoint()
        acc = counts.select("id_a", "id_b", "n_linked") if acc is None else (
            acc.unionByName(counts.select("id_a", "id_b", "n_linked"))
            .groupBy("id_a", "id_b")
            .agg(F.sum("n_linked").alias("n_linked"))
        )
        # matched counts from this round's Bayes-estimate state
        est = bayes_estimate_links(counts, nsteps_per_round).join(
            pairs_with_vecid.select("id_a", "id_b", "vec_id"), on=["id_a", "id_b"]
        )
        from .map_solver import _match_counts

        mc = _match_counts(est, dvecs, gcols, nlevels)
        pM, pU = gibbs_mu_draw(mc, total, gcols, rng)
    return acc, (pM, pU)


def exact_posterior_links(
    pairs: DataFrame,
    max_pairs_per_block: int = 10,
    prior_link_ratio: float = 1.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact posterior one-to-one matching by per-block enumeration — the
    distribution the mh_gibbs chains SAMPLE, computed in closed form where
    the block is small enough to enumerate.

    pairs: (id_a, id_b, r, block_id) with r the PRODUCT-SPACE likelihood
    ratio of the pair (left-to-right Π m/u over fields — e^w without any
    libm exp, the same arithmetic as plans/pp_oracle._ratio_expr) and
    block_id partitioning the positive graph (connected components).

    pi(M) ∝ Π_{p∈M} (r_p · prior_link_ratio) over all one-to-one
    matchings M of the block (prior_link_ratio = θ is the exppenalty
    link-count prior; θ=1 ⇒ uniform prior over matchings — reference
    posterior /root/reference/src/mcmc.jl:56-130 at convergence). Emits
    (id_a, id_b, block_id, marginal) for pairs whose exact marginal
    P(p ∈ M) exceeds `threshold`.

    Exact inference is exponential by nature, so the domain is explicit:
    blocks with more than max_pairs_per_block pairs are EXCLUDED (route
    them to mh_gibbs / one_to_one); the cap is static and mirrored in the
    DuckDB oracle. Per-block work is one bitmask sweep over ≤ 2^cap
    subsets inside applyInPandas — embarrassingly parallel across blocks,
    nothing reaches the driver. Marginal VALUES are sums of per-matching
    products whose accumulation order differs between engines (last-ulp),
    so oracle-checked columns carry only the ids; the > threshold decision
    is protected by a margin certificate (tests/test_mcmc.py)."""
    p = pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("r").cast("double"),
        F.col("block_id").cast("long"),
    )
    sizes = p.groupBy("block_id").agg(F.count(F.lit(1)).alias("_np"))
    small = p.join(
        sizes.where(F.col("_np") <= max_pairs_per_block).select("block_id"),
        on="block_id",
        how="left_semi",
    )
    theta = float(prior_link_ratio)
    thr = float(threshold)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        n = len(pdf)
        ia = pdf["id_a"].tolist()
        ib = pdf["id_b"].tolist()
        r = [float(x) * theta for x in pdf["r"]]
        z = 0.0
        num = [0.0] * n
        for mask in range(1 << n):
            rows: set = set()
            cols: set = set()
            ok = True
            prod = 1.0
            for k in range(n):
                if mask >> k & 1:
                    if ia[k] in rows or ib[k] in cols:
                        ok = False
                        break
                    rows.add(ia[k])
                    cols.add(ib[k])
                    prod *= r[k]
            if not ok:
                continue
            z += prod
            for k in range(n):
                if mask >> k & 1:
                    num[k] += prod
        keep = [k for k in range(n) if num[k] / z > thr]
        out = pdf.iloc[keep][["id_a", "id_b", "block_id"]].copy()
        out["marginal"] = [num[k] / z for k in keep]
        return out

    return (
        small.repartition("block_id")
        .groupBy("block_id")
        .applyInPandas(fn, schema="id_a long, id_b long, block_id long, marginal double")
    )


def exact_posterior_links_global(
    pairs: DataFrame,
    logprior,
    max_pairs_per_block: int = 10,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact posterior one-to-one matching under a GLOBAL link-count prior
    — the posterior the reference's restricted MCMC samples when its prior
    ratio depends on the total nlink (the vignette's own configuration:
    betabipartite_logratiopn, /root/reference/vignette/example.jl:96-99),
    computed in closed form. Where exact_posterior_links factorizes over
    blocks (valid only for the constant-odds exppenalty prior), a count
    prior couples blocks through |M|; the coupling is resolved EXACTLY by
    generating functions: per block b enumerate matchings into a degree
    polynomial Z_b(x) = sum_{M_b} (prod_{p in M_b} r_p) x^{|M_b|} and
    per-pair numerators N_p(x) (distributed, one applyInPandas sweep per
    block), then

      Z        = sum_L exp(logprior(L)) [x^L] prod_b Z_b(x)
      P(p in M) = sum_L exp(logprior(L)) [x^L] (N_p(x) prod_{b'!=b} Z_b'(x)) / Z

    with the cross-block products formed by log-domain prefix/suffix
    convolution on the driver. The reference can only approximate this
    distribution by MCMC; here it is exact.

    pairs: (id_a, id_b, r, block_id) as in exact_posterior_links.
    logprior: callable L -> log prior of a matching with L total links
    (e.g. lambda L: mcmc.betabipartite_logprior(L, nrow, ncol, 1.0, 1.0),
    or lambda L: -theta * L for exppenalty — which factorizes, so the
    result then matches exact_posterior_links(prior_link_ratio=e^-theta)
    exactly; asserted in tests/test_mcmc.py). Evaluated ONLY on the
    driver at 0..D (D = max total degree); executors see the values as a
    broadcast literal table.

    Scale contract: the driver materializes only the per-block Z
    polynomials (sum of block max-matching sizes + blocks rows — the same
    order as the link count itself, a driver-scale aggregate like the
    distinct-vector table); enumeration (the exponential part) and the
    per-pair marginal reduction stay distributed. Blocks above
    max_pairs_per_block pairs are EXCLUDED in both the product and the
    output (same explicit-domain contract as exact_posterior_links);
    at 100 TB route big blocks to mh_gibbs / one_to_one and prefer the
    factorizing exppenalty prior. Marginal VALUES accumulate in
    engine-specific order (last ulp), so only ids are oracle-comparable
    and the > threshold decision carries a margin certificate
    (tests/test_mcmc.py)."""
    import math

    spark = pairs.sparkSession
    p = pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("r").cast("double"),
        F.col("block_id").cast("long"),
    )
    sizes = p.groupBy("block_id").agg(F.count(F.lit(1)).alias("_np"))
    small = p.join(
        sizes.where(F.col("_np") <= max_pairs_per_block).select("block_id"),
        on="block_id",
        how="left_semi",
    )

    def gf(pdf: pd.DataFrame) -> pd.DataFrame:
        # take/skip DFS over the (id_a, id_b)-ordered pair list; log-space
        # accumulation per degree. Emits Z rows (id_a/id_b NULL) and
        # per-pair numerator rows.
        pdf = pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        n = len(pdf)
        ia = pdf["id_a"].tolist()
        ib = pdf["id_b"].tolist()
        lw = [math.log(float(x)) for x in pdf["r"]]
        bid = int(pdf["block_id"].iloc[0])
        zterms: list[list[float]] = [[] for _ in range(n + 1)]
        nterms: list[dict[int, list[float]]] = [dict() for _ in range(n)]

        def dfs(i, ua, ub, logw, chosen):
            if i == n:
                d = len(chosen)
                zterms[d].append(logw)
                for j in chosen:
                    nterms[j].setdefault(d, []).append(logw)
                return
            dfs(i + 1, ua, ub, logw, chosen)
            if ia[i] not in ua and ib[i] not in ub:
                dfs(i + 1, ua | {ia[i]}, ub | {ib[i]}, logw + lw[i], chosen + [i])

        dfs(0, frozenset(), frozenset(), 0.0, [])

        def lse(ts: list[float]) -> float:
            m = max(ts)
            return m + math.log(sum(math.exp(t - m) for t in ts))

        rows = []
        for d in range(n + 1):
            if zterms[d]:
                rows.append((None, None, bid, d, lse(zterms[d])))
        for j in range(n):
            for d, ts in sorted(nterms[j].items()):
                rows.append((ia[j], ib[j], bid, d, lse(ts)))
        return pd.DataFrame(
            rows, columns=["id_a", "id_b", "block_id", "deg", "lcoef"]
        )

    polys = (
        small.repartition("block_id")
        .groupBy("block_id")
        .applyInPandas(
            gf, schema="id_a long, id_b long, block_id long, deg int, lcoef double"
        )
        .localCheckpoint()  # consumed twice: Z collect + numerator join
    )
    zrows = polys.where(F.col("id_a").isNull()).select(
        "block_id", "deg", "lcoef"
    ).collect()
    if not zrows:
        return polys.sparkSession.createDataFrame(
            [], schema="id_a long, id_b long, block_id long, marginal double"
        )

    # driver: per-block log-polynomials -> prefix/suffix log-convolution
    NEG = float("-inf")
    zp: dict[int, dict[int, float]] = {}
    for r_ in zrows:
        zp.setdefault(r_["block_id"], {})[r_["deg"]] = r_["lcoef"]
    bids = sorted(zp)
    arrs = []
    for b in bids:
        d = max(zp[b])
        a = np.full(d + 1, NEG)
        for k, v in zp[b].items():
            a[k] = v
        arrs.append(a)

    def lconv(la: np.ndarray, lb: np.ndarray) -> np.ndarray:
        out = np.full(len(la) + len(lb) - 1, NEG)
        for j in range(len(lb)):
            if lb[j] == NEG:
                continue
            out[j : j + len(la)] = np.logaddexp(out[j : j + len(la)], la + lb[j])
        return out

    nb = len(arrs)
    pre = [np.array([0.0])]
    for a in arrs:
        pre.append(lconv(pre[-1], a))
    suf = [np.array([0.0])]
    for a in reversed(arrs):
        suf.append(lconv(suf[-1], a))
    suf.reverse()
    ptot = pre[nb]
    dtot = len(ptot) - 1
    lp = np.array([float(logprior(L)) for L in range(dtot + 1)])
    with np.errstate(invalid="ignore"):
        terms = lp + ptot
    fin = terms[np.isfinite(terms)]
    lz = float(np.logaddexp.reduce(fin))

    # rest_b = prod_{b' != b} Z_b' ; ship (block_id, rdeg, rl) + the prior
    # table (tdeg -> lprior) back as broadcast literals. Marginal reduces
    # RELATIONALLY: each numerator row joins every rest coefficient of its
    # block and every prior row at tdeg = deg + rdeg; terms are exp'd
    # after subtracting lz (all <= marginal <= 1, no overflow) so the
    # reduction is a plain SUM groupBy.
    rest_rows = []
    for i, b in enumerate(bids):
        rb = lconv(pre[i], suf[i + 1])
        for d_, v in enumerate(rb):
            if v != NEG:
                rest_rows.append((b, d_, float(v)))
    prior_rows = [
        (L, float(lp[L])) for L in range(dtot + 1) if np.isfinite(lp[L])
    ]
    rest_df = spark.createDataFrame(rest_rows, schema="block_id long, rdeg int, rl double")
    prior_df = spark.createDataFrame(prior_rows, schema="tdeg int, lprior double")
    num = polys.where(F.col("id_a").isNotNull())
    out = (
        num.join(F.broadcast(rest_df), on="block_id")
        .withColumn("tdeg", F.col("deg") + F.col("rdeg"))
        .join(F.broadcast(prior_df), on="tdeg")
        .groupBy("id_a", "id_b", "block_id")
        .agg(
            F.sum(
                F.exp(F.col("lcoef") + F.col("rl") + F.col("lprior") - F.lit(lz))
            ).alias("marginal")
        )
        .where(F.col("marginal") > F.lit(float(threshold)))
    )
    return out


def mh_gibbs_global(
    blocked_pairs: DataFrame,
    logprior,
    rounds: int = 6,
    nsteps: int = 1000,
    burnin: int = 0,
    seed: int = 42,
    kernel: str = "barker",
    tol: float = 0.5,
):
    """Mean-field global-count sampler — the AT-SCALE path for the
    count-coupled priors exact_posterior_links_global handles exactly on
    its small-block domain. The reference's restricted MCMC evaluates the
    count prior at the GLOBAL nlink (mcmc.jl:87-137 with
    betabipartite_logratiopn, vignette/example.jl:96-99), which would
    serialize every cross-block move through shared state on a cluster.
    Instead, alternate:

      (a) distributed per-block chains under a CONSTANT per-link log
          odds theta_r — a prior that factorizes over blocks, so the
          per-block chains are exact for it (no approximation inside a
          round);
      (b) a driver re-fit theta_{r+1} = logprior(L+1) - logprior(L) at
          L = the expected global link count aggregated from round r's
          counts (one driver scalar per round — the same
          hierarchy-at-round-granularity pattern as mh_gibbs's outer
          pM/pU Gibbs).

    The fixed point is the self-consistent exppenalty surrogate of the
    count prior — the construction shown (tests/test_reference_vignette)
    to reproduce the reference posterior's Bayes-estimate link set
    exactly on the reference's own vignette, and validated here against
    exact_posterior_links_global marginals on the gate fixtures
    (tests/test_mcmc.py::test_mh_gibbs_global_matches_exact).

    Returns (counts_df, info) where counts_df is the LAST round's
    (id_a, id_b, w, block_id, n_linked) — feed to bayes_estimate_links —
    and info = {"theta_log": final per-link log odds, "L": final expected
    link count, "rounds_run": r+1, "converged": bool}.
    """
    import math

    theta_log = float(logprior(1) - logprior(0))
    denom = float(nsteps - burnin)
    prev_l = None
    counts = None
    converged = False
    rounds_run = 0
    for r in range(rounds):
        counts = mh_gibbs_count(
            blocked_pairs,
            nsteps=nsteps,
            burnin=burnin,
            lp_link=theta_log,
            seed=seed + r,
            kernel=kernel,
        ).localCheckpoint()  # consumed by the L aggregate AND the caller
        row = counts.agg(
            (F.sum("n_linked") / F.lit(denom)).alias("l_hat")
        ).first()
        l_hat = float(row["l_hat"] or 0.0)
        rounds_run = r + 1
        # damped re-fit (the map L -> theta(L) -> E[links] has positive
        # feedback; undamped iteration can overshoot), clamped into the
        # prior's finite add-ratio support: near a truncated prior's
        # boundary (L -> min(nrow, ncol)) the add-one odds diverge and a
        # factorized surrogate cannot represent the hard count cap —
        # callers needing the truncation exactly belong on
        # exact_posterior_links_global's domain instead.
        l_tgt = l_hat if prev_l is None else 0.5 * (prev_l + l_hat)
        l_int = max(0, int(round(l_tgt)))
        while l_int > 0 and not math.isfinite(
            float(logprior(l_int + 1) - logprior(l_int))
        ):
            l_int -= 1
        theta_log = float(logprior(l_int + 1) - logprior(l_int))
        if prev_l is not None and abs(l_hat - prev_l) <= tol:
            converged = True
            break
        prev_l = l_hat
    return counts, {
        "theta_log": theta_log,
        "L": l_hat,
        "rounds_run": rounds_run,
        "converged": converged,
    }
