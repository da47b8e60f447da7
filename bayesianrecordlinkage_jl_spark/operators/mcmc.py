"""Restricted MCMC over post-hoc blocks (mh_gibbs_count analog).

Reference semantics (re-expressed, not ported):
  - mh_gibbs_count: per sweep, update every post-hoc block (1x1 blocks by
    exact Gibbs, larger blocks by a random-walk MH kernel), then Gibbs-draw
    pM/pU; accumulate per-pair link counts
    (/root/reference/src/mcmc.jl:87-137)
  - randomwalk1 moves add/remove/rowswitch/colswitch on the one-to-one
    matching with O(1) log-likelihood deltas from per-pair weights
    (/root/reference/src/move_functions.jl:429-642)
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


def _block_chain(
    pdf: pd.DataFrame, nsteps: int, burnin: int, lp_link: float, seed: int
) -> pd.DataFrame:
    """Run one block's restricted chain; returns per-pair linked-step counts.

    State = one-to-one matching over the block's candidate pairs. Proposal:
    uniform candidate pair (i, j); the move is determined by the state
    (add / remove / rowswitch / colswitch), which makes the proposal
    symmetric — MH acceptance is exp(delta loglik + delta prior) alone.
    """
    block_id = int(pdf["block_id"].iloc[0])
    rng = np.random.default_rng((seed, block_id))
    ids_a = pdf["id_a"].to_numpy()
    ids_b = pdf["id_b"].to_numpy()
    w = pdf["w"].to_numpy(dtype=float)
    npairs = len(pdf)
    counts = np.zeros(npairs, dtype=np.int64)

    if npairs == 1:
        # singleton_gibbs: exact Bernoulli per step
        p_link = 1.0 / (1.0 + np.exp(-(w[0] + lp_link)))
        draws = rng.random(nsteps) < p_link
        counts[0] = int(draws[burnin:].sum())
        out = pdf[["id_a", "id_b", "w", "block_id"]].copy()
        out["n_linked"] = counts
        return out

    # pair index maps for switch moves
    row_pairs: dict[int, list[int]] = {}
    col_pairs: dict[int, list[int]] = {}
    for k in range(npairs):
        row_pairs.setdefault(int(ids_a[k]), []).append(k)
        col_pairs.setdefault(int(ids_b[k]), []).append(k)
    row2pair: dict[int, int] = {}  # row id -> linked pair idx
    col2pair: dict[int, int] = {}
    linked = np.zeros(npairs, dtype=bool)

    def do_link(k: int) -> None:
        linked[k] = True
        row2pair[int(ids_a[k])] = k
        col2pair[int(ids_b[k])] = k

    def do_unlink(k: int) -> None:
        linked[k] = False
        del row2pair[int(ids_a[k])]
        del col2pair[int(ids_b[k])]

    picks = rng.integers(0, npairs, size=nsteps)
    accepts = np.log(rng.random(nsteps))
    for step in range(nsteps):
        k = int(picks[step])
        i, j = int(ids_a[k]), int(ids_b[k])
        kr = row2pair.get(i)
        kc = col2pair.get(j)
        if linked[k]:
            # remove
            if accepts[step] < -(w[k] + lp_link):
                do_unlink(k)
        elif kr is None and kc is None:
            # add
            if accepts[step] < w[k] + lp_link:
                do_link(k)
        elif kr is not None and kc is None:
            # rowswitch: i re-links from its current col to j
            if accepts[step] < w[k] - w[kr]:
                do_unlink(kr)
                do_link(k)
        elif kr is None and kc is not None:
            # colswitch
            if accepts[step] < w[k] - w[kc]:
                do_unlink(kc)
                do_link(k)
        # both endpoints matched elsewhere: doubleswitch omitted (RW2-style
        # kernel, /root/reference/src/move_functions.jl:936-1149)
        if step >= burnin:
            counts[linked] += 1

    out = pdf[["id_a", "id_b", "w", "block_id"]].copy()
    out["n_linked"] = counts
    return out


TRACE_SCHEMA = "id_a long, id_b long, block_id long, start long, stop long"


def _block_chain_trace(
    pdf: pd.DataFrame, nsteps: int, lp_link: float, seed: int
) -> pd.DataFrame:
    """Trace variant (mh_gibbs_trace analog,
    /root/reference/src/mcmc.jl:170-254): identical chain to _block_chain
    (same RNG stream, same moves), but records link-persistence INTERVALS
    [start, stop] (1-based step indices, inclusive) instead of counts.
    sum(stop - start + 1) per pair reconstructs _block_chain's counts
    exactly (pytest-asserted)."""
    block_id = int(pdf["block_id"].iloc[0])
    rng = np.random.default_rng((seed, block_id))
    ids_a = pdf["id_a"].to_numpy()
    ids_b = pdf["id_b"].to_numpy()
    w = pdf["w"].to_numpy(dtype=float)
    npairs = len(pdf)
    open_at = {}  # pair idx -> start step of the open interval
    intervals: list[tuple[int, int, int]] = []  # (pair idx, start, stop)

    def close(k: int, step: int) -> None:
        intervals.append((k, open_at.pop(k), step))

    if npairs == 1:
        p_link = 1.0 / (1.0 + np.exp(-(w[0] + lp_link)))
        draws = rng.random(nsteps) < p_link
        for step in range(1, nsteps + 1):
            linked = bool(draws[step - 1])
            if linked and 0 not in open_at:
                open_at[0] = step
            elif not linked and 0 in open_at:
                close(0, step - 1)
        if 0 in open_at:
            close(0, nsteps)
    else:
        row_pairs: dict[int, int] = {}
        col_pairs: dict[int, int] = {}
        linked = np.zeros(npairs, dtype=bool)
        row2pair: dict[int, int] = {}
        col2pair: dict[int, int] = {}

        def do_link(k: int, step: int) -> None:
            linked[k] = True
            row2pair[int(ids_a[k])] = k
            col2pair[int(ids_b[k])] = k
            open_at[k] = step

        def do_unlink(k: int, step: int) -> None:
            linked[k] = False
            del row2pair[int(ids_a[k])]
            del col2pair[int(ids_b[k])]
            close(k, step - 1)

        picks = rng.integers(0, npairs, size=nsteps)
        accepts = np.log(rng.random(nsteps))
        for step0 in range(nsteps):
            step = step0 + 1
            k = int(picks[step0])
            i, j = int(ids_a[k]), int(ids_b[k])
            kr = row2pair.get(i)
            kc = col2pair.get(j)
            if linked[k]:
                if accepts[step0] < -(w[k] + lp_link):
                    do_unlink(k, step)
            elif kr is None and kc is None:
                if accepts[step0] < w[k] + lp_link:
                    do_link(k, step)
            elif kr is not None and kc is None:
                if accepts[step0] < w[k] - w[kr]:
                    do_unlink(kr, step)
                    do_link(k, step)
            elif kr is None and kc is not None:
                if accepts[step0] < w[k] - w[kc]:
                    do_unlink(kc, step)
                    do_link(k, step)
        for k in list(open_at):
            close(k, nsteps)

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
    lp_link: float = 0.0,
    seed: int = 42,
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
        return _block_chain_trace(pdf, nsteps, lp_link, seed)

    return p.repartition("block_id").groupBy("block_id").applyInPandas(
        fn, schema=TRACE_SCHEMA
    )


def mh_gibbs_count(
    blocked_pairs: DataFrame,
    nsteps: int = 1000,
    burnin: int = 0,
    lp_link: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-pair posterior link counts from per-block restricted chains.

    blocked_pairs: (id_a, id_b, w, block_id) where block_id partitions the
    graph (connected components) and w is the pair's log-likelihood ratio.
    lp_link: log prior odds of a link (logpCRatio analog).
    """
    p = blocked_pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w").cast("double"),
        F.col("block_id").cast("long"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _block_chain(pdf, nsteps, burnin, lp_link, seed)

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
    lp_link: float = 0.0,
    seed: int = 42,
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
            weighted, nsteps=nsteps_per_round, lp_link=lp_link, seed=seed + r
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
