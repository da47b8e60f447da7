"""Penalized-likelihood MAP coordinate ascent + penalty-path search.

Reference semantics (re-expressed, not ported):
  - penalized_likelihood_* coordinate ascent: alternate {weights -> CC ->
    per-block LSAP} with {max_MU Dirichlet-MAP update} until pM/pU stable
    (/root/reference/src/map_functions.jl:1-324, tol/maxIter :6,103)
  - incr_penalty: next penalty = midpoint between surrounding distinct
    weights above the current one (/root/reference/src/sequence_map_functions.jl:13-89)
  - penalized_likelihood_search_*: penalty-path driver recording a
    ParameterChain of [id_a id_b start stop] link-persistence intervals +
    per-step (pM, pU, nlinks) (/root/reference/src/sequence_map_functions.jl:91-240)

Spark decomposition: per iteration, ONLY two distributed jobs run — the
positive-edge CC and the per-block assignment; everything else (weights,
match counts, max_MU) is driver numpy over the distinct-vector table.
Match counts per field/level come from the matched pairs' vec_ids
(matches2veccounts / veccounts2matchcounts analog) — a groupBy on the small
links table. Chain tables checkpoint per penalty step for resume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import assignment, em
from .connected_components import connected_components


@dataclass
class ParameterChain:
    """Chain of penalty-path steps (ParameterChain analog,
    /root/reference/src/parameterchain.jl:14-37).

    `links` is a DataFrame of (id_a, id_b, start, stop) persistence
    intervals — it stays distributed end-to-end (links ~ #matched records;
    collecting it per step would be a driver-memory bottleneck at web
    scale). The scalar traces (nlinks/penalties/pM/pU) are O(steps) and
    live on the driver."""

    links: DataFrame  # id_a, id_b, start, stop (step indices, 1-based)
    nlinks: list[int] = field(default_factory=list)
    penalties: list[float] = field(default_factory=list)
    pM: list[dict] = field(default_factory=list)
    pU: list[dict] = field(default_factory=list)

    def steplinks(self, step: int) -> DataFrame:
        """Links alive at a step (get_steplinks analog)."""
        return self.links.where(
            (F.col("start") <= step) & (F.col("stop") >= step)
        ).select("id_a", "id_b")

    def link_counts(self, burnin: int = 0) -> DataFrame:
        """Per-pair persistence counts with burn-in (get_linkcounts analog)."""
        eff = F.greatest(F.col("start"), F.lit(burnin + 1))
        return (
            self.links.where(F.col("stop") >= eff)
            .select("id_a", "id_b", (F.col("stop") - eff + 1).alias("n_steps"))
            .groupBy("id_a", "id_b")
            .agg(F.sum("n_steps").alias("n_steps"))
        )


def group_id_counts(
    chain_links: DataFrame, groups: DataFrame, on: list[str]
) -> DataFrame:
    """Per-(step, group) link counts from a chain's persistence intervals
    (get_groupidcounts_row/_column/_pair analog,
    /root/reference/src/parameterchain.jl:146-253 — keyed by id_a for the
    row form, id_b for the column form, both for the pair form).

    groups: mapping DataFrame (on..., group_id); rows with group_id <= 0 or
    null are ignored (the reference's zero-id convention). Returns
    (step, group_id, n). The interval explode is sequence()+groupBy —
    map-side combinable, no driver state."""
    return (
        chain_links.join(groups, on=on)
        .where(F.col("group_id") > 0)
        .select(
            "group_id",
            F.explode(F.sequence(F.col("start"), F.col("stop"))).alias("step"),
        )
        .groupBy("step", "group_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def segment_links(chain_links: DataFrame, nstart: int, nstop: int) -> DataFrame:
    """Pairs linked over EVERY step in [nstart, nstop]
    (get_segmentlinks analog, /root/reference/src/parameterchain.jl:299-313):
    a single persistence interval must cover the whole segment."""
    if nstart > nstop:
        raise ValueError("nstart must be <= nstop")
    return chain_links.where(
        (F.col("start") <= nstart) & (F.col("stop") >= nstop)
    ).select("id_a", "id_b")


def incr_penalty(
    weights: np.ndarray, penalty: float, min_incr: float, frac: float = 0.5
) -> tuple[float, int]:
    """Next penalty on the path (reference semantics,
    /root/reference/src/sequence_map_functions.jl:13-89): among weights above
    the current penalty, step to at least minnext = max(penalty+min_incr,
    smallest such weight); the new penalty is the frac-average of the two
    weights surrounding minnext (>= minnext). Returns (new_penalty, n_above)."""
    wv = np.sort(weights[weights > penalty])
    if len(wv) == 0:
        return penalty + min_incr, 0
    minnext = max(penalty + min_incr, float(wv[0]))
    above = wv[wv > minnext]
    if len(above) == 0:
        return minnext, 0
    if above[0] == wv[0]:  # every remaining weight already above minnext
        return minnext, len(wv)
    below = float(wv[wv <= minnext].max())
    new_pen = max((1.0 - frac) * below + frac * float(above[0]), minnext)
    return float(new_pen), int(len(above))


def _match_counts(
    links: DataFrame, dvecs: pd.DataFrame, gcols: list[str], nlevels: dict[str, int]
) -> dict[str, np.ndarray]:
    """Matched-pair counts per (field, level) from the links' vec_ids
    (matches2veccounts + veccounts2matchcounts analog,
    /root/reference/src/weight_functions.jl:16-56)."""
    vc = (
        links.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index("vec_id")["n"]
    )
    out = {g: np.zeros(nlevels[g]) for g in gcols}
    dv = dvecs.set_index("vec_id")
    for vec_id, n in vc.items():
        for g in gcols:
            lvl = int(dv.loc[vec_id, g])
            if lvl > 0:
                out[g][lvl - 1] += n
    return out


def _total_counts(
    dvecs: pd.DataFrame, gcols: list[str], nlevels: dict[str, int]
) -> dict[str, np.ndarray]:
    out = {g: np.zeros(nlevels[g]) for g in gcols}
    for g in gcols:
        lv = dvecs[g].to_numpy().astype(int)
        n = dvecs["n_pairs"].to_numpy()
        for lvl in range(1, nlevels[g] + 1):
            out[g][lvl - 1] = n[lv == lvl].sum()
    return out


def penalized_likelihood(
    spark: SparkSession,
    pairs: DataFrame,
    dvecs: pd.DataFrame,
    gcols: list[str],
    nlevels: dict[str, int],
    params: em.FSParams,
    penalty: float = 0.0,
    tol: float = 1e-5,
    max_iter: int = 100,
    method: str = "hungarian",
    prices: DataFrame | None = None,
) -> tuple[DataFrame, em.FSParams, int] | tuple[DataFrame, em.FSParams, int, DataFrame]:
    """One coordinate-ascent solve at a fixed penalty
    (penalized_likelihood_auction analog). pairs must carry (id_a, id_b,
    vec_id). Returns (links, params, n_iter); with method="auction_warm"
    returns (links, params, n_iter, prices) — the per-column auction price
    state, recycled across coordinate-ascent iterations here and across
    penalty steps by penalized_likelihood_search (the reference's
    update=true path, /root/reference/src/map_functions.jl:121-151)."""
    warm = method == "auction_warm"
    total = _total_counts(dvecs, gcols, nlevels)
    links = None
    for it in range(1, max_iter + 1):
        wpd = em.weights_vector(dvecs, gcols, params)
        wpd["w"] = wpd["w"] - penalty  # shrink
        wdf = spark.createDataFrame(wpd, schema="vec_id long, w double")
        pos = pairs.join(F.broadcast(wdf), on="vec_id").where(F.col("w") > 0)
        comps = connected_components(
            pos.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        )
        blocked = pos.join(
            comps.withColumnRenamed("node", "id_a"), on="id_a"
        ).withColumnRenamed("component", "block_id")
        if warm:
            links, prices = assignment.one_to_one_auction_warm(
                blocked.select("id_a", "id_b", "w", "block_id"), prices
            )
            prices = prices.localCheckpoint()
        else:
            links = assignment.one_to_one(
                blocked.select("id_a", "id_b", "w", "block_id"), method=method
            )
        links = links.join(
            blocked.select("id_a", "id_b", "vec_id"), on=["id_a", "id_b"]
        )
        links = links.localCheckpoint()
        mc = _match_counts(links, dvecs, gcols, nlevels)
        pM, pU = em.max_mu(mc, total, gcols)
        delta = 0.0
        for g in gcols:
            delta = max(
                delta,
                np.abs(pM[g] - params.pM[g]).max(),
                np.abs(pU[g] - params.pU[g]).max(),
            )
        params = em.FSParams(pM=pM, pU=pU, p=params.p)
        if delta <= tol:
            return (links, params, it, prices) if warm else (links, params, it)
    return (links, params, max_iter, prices) if warm else (links, params, max_iter)


def penalized_likelihood_search(
    spark: SparkSession,
    pairs: DataFrame,
    dvecs: pd.DataFrame,
    gcols: list[str],
    nlevels: dict[str, int],
    params0: em.FSParams,
    penalty0: float = 0.0,
    min_incr: float = 0.5,
    max_steps: int = 20,
    method: str = "hungarian",
    checkpoint_store=None,
) -> ParameterChain:
    """Penalty-path driver (penalized_likelihood_search_auction analog):
    solve at each penalty, record link persistence intervals, raise the
    penalty between distinct weight values, stop when no links survive.

    The interval table stays a DataFrame throughout: each step's update is
    a semi/anti-join of the previous OPEN intervals against the current
    links (extend / close / open — the links_difference statuses), never a
    driver collect of the links table.

    method="auction_warm" recycles the per-column auction prices across
    penalty steps (reference update=true): consecutive penalties shift all
    weights by the same delta, so the previous step's prices are
    near-optimal seeds and each re-solve runs a couple of auction phases
    instead of a full epsilon schedule. The price table is persisted in the
    chain checkpoint alongside the step links."""
    intervals = spark.createDataFrame(
        [], schema="id_a long, id_b long, start int, stop int"
    )
    chain = ParameterChain(links=intervals)
    params = params0
    penalty = penalty0
    step = 0
    prices: DataFrame | None = None
    while step < max_steps:
        step += 1
        if method == "auction_warm":
            links, params, _, prices = penalized_likelihood(
                spark, pairs, dvecs, gcols, nlevels, params, penalty,
                method=method, prices=prices,
            )
        else:
            links, params, _ = penalized_likelihood(
                spark, pairs, dvecs, gcols, nlevels, params, penalty,
                method=method,
            )
        cur = links.select("id_a", "id_b")
        open_prev = intervals.where(F.col("stop") == step - 1)
        rest = intervals.where(F.col("stop") != step - 1)
        extended = open_prev.join(cur, ["id_a", "id_b"], "left_semi").withColumn(
            "stop", F.lit(step)
        )
        closed = open_prev.join(cur, ["id_a", "id_b"], "left_anti")
        opened = cur.join(
            open_prev.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        ).select(
            "id_a",
            "id_b",
            F.lit(step).alias("start"),
            F.lit(step).alias("stop"),
        )
        intervals = (
            rest.unionByName(extended).unionByName(closed).unionByName(opened)
            .localCheckpoint()  # truncate lineage across penalty steps
        )
        n_cur = cur.count()
        chain.nlinks.append(n_cur)
        chain.penalties.append(penalty)
        chain.pM.append({g: params.pM[g].copy() for g in gcols})
        chain.pU.append({g: params.pU[g].copy() for g in gcols})
        if checkpoint_store is not None:
            checkpoint_store.write(
                f"chain_step_{step}",
                links.select("id_a", "id_b", "w", "block_id"),
                {"penalty": penalty, "step": step},
            )
            if prices is not None:
                checkpoint_store.write(
                    f"chain_prices_step_{step}", prices,
                    {"penalty": penalty, "step": step},
                )
        if n_cur == 0:
            break
        w = em.weights_vector(dvecs, gcols, params)["w"].to_numpy()
        penalty, n_above = incr_penalty(w, penalty, min_incr)
        if n_above == 0:
            break
    chain.links = intervals
    return chain
