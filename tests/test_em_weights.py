"""EM / max_MU / weights_vector on aggregated counts (em_functions.jl and
weight_functions.jl analogs): hand-computed weight sums with missing levels
skipped, EM separation recovery, Dirichlet-MAP closed form."""

import math

import numpy as np
import pandas as pd
import pytest

from bayesianrecordlinkage_jl_spark.operators import em

GCOLS = ["g1", "g2"]
NLEV = {"g1": 2, "g2": 3}


def test_weights_vector_hand_computed():
    params = em.FSParams(
        pM={"g1": np.array([0.9, 0.1]), "g2": np.array([0.7, 0.2, 0.1])},
        pU={"g1": np.array([0.2, 0.8]), "g2": np.array([0.1, 0.3, 0.6])},
        p=0.1,
    )
    dv = pd.DataFrame(
        {"vec_id": [1, 2, 3], "g1": [1, 0, 2], "g2": [1, 2, 0], "n_pairs": [5, 5, 5]}
    )
    w = em.weights_vector(dv, GCOLS, params)["w"].tolist()
    assert w[0] == pytest.approx(math.log(0.9 / 0.2) + math.log(0.7 / 0.1))
    # missing g1 (level 0) contributes nothing
    assert w[1] == pytest.approx(math.log(0.2 / 0.3))
    assert w[2] == pytest.approx(math.log(0.1 / 0.8))


def test_em_recovers_separation():
    """Construct counts from known m/u mixture; EM must separate: matches
    (agree-heavy vectors) get pM(agree) high."""
    rng = np.random.default_rng(0)
    pM = {
        "g1": np.array([0.92, 0.08]),
        "g2": np.array([0.85, 0.10, 0.05]),
        "g3": np.array([0.95, 0.05]),
    }
    pU = {
        "g1": np.array([0.10, 0.90]),
        "g2": np.array([0.05, 0.15, 0.80]),
        "g3": np.array([0.05, 0.95]),
    }
    p = 0.05
    rows = {}
    for _ in range(200_000):
        is_m = rng.random() < p
        src = pM if is_m else pU
        v = (
            1 + rng.choice(2, p=src["g1"]),
            1 + rng.choice(3, p=src["g2"]),
            1 + rng.choice(2, p=src["g3"]),
        )
        rows[v] = rows.get(v, 0) + 1
    dv = pd.DataFrame(
        [
            {"vec_id": i + 1, "g1": k[0], "g2": k[1], "g3": k[2], "n_pairs": n}
            for i, (k, n) in enumerate(sorted(rows.items()))
        ]
    )
    gcols = ["g1", "g2", "g3"]
    nlev = {"g1": 2, "g2": 3, "g3": 2}
    est = em.estimate_em(dv, gcols, nlev, p0=0.2)
    assert est.converged
    assert est.p == pytest.approx(p, abs=0.02)
    assert est.pM["g1"][0] == pytest.approx(0.92, abs=0.05)
    assert est.pU["g1"][1] == pytest.approx(0.90, abs=0.05)
    assert est.pM["g2"][0] == pytest.approx(0.85, abs=0.07)


def test_max_mu_closed_form():
    mc = {"g1": np.array([90.0, 10.0])}
    tc = {"g1": np.array([100.0, 900.0])}
    pM, pU = em.max_mu(mc, tc, ["g1"], priorM=1.0, priorU=1.0)
    assert pM["g1"] == pytest.approx([0.9, 0.1])
    assert pU["g1"] == pytest.approx([10.0 / 900.0, 890.0 / 900.0])


def test_prior_mode():
    out = em.prior_mode(np.array([2.0, 2.0, 2.0]))
    assert out == pytest.approx([1 / 3, 1 / 3, 1 / 3])


def test_maximum_weights_vector():
    p1 = em.FSParams(pM={"g1": np.array([0.9, 0.1])}, pU={"g1": np.array([0.5, 0.5])}, p=0.1)
    p2 = em.FSParams(pM={"g1": np.array([0.6, 0.4])}, pU={"g1": np.array([0.1, 0.9])}, p=0.1)
    dv = pd.DataFrame({"vec_id": [1, 2], "g1": [1, 2], "n_pairs": [1, 1]})
    w = em.maximum_weights_vector(dv, ["g1"], [p1, p2])["w"].tolist()
    assert w[0] == pytest.approx(max(math.log(0.9 / 0.5), math.log(0.6 / 0.1)))
    assert w[1] == pytest.approx(max(math.log(0.1 / 0.5), math.log(0.4 / 0.9)))


def test_max_weights_path_monotone_equivalent(spark):
    """The catalog's max_weights_path lives in PRODUCT space (log-free, for
    the DuckDB twin); this asserts it is monotone-equivalent to the
    reference's log-space maximum_weights_vector over the same 2-element
    parameter path on the gate fixture: log(r_max) == w_max (up to libm
    rounding) and the path element attaining the max agrees everywhere."""
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq

    d = "/root/testdata/sf0.001"
    cat = oq.build_catalog()
    out = (
        cat["max_weights_path"]["spark"](spark, d)
        .orderBy("vec_id")
        .toPandas()
    )

    dv = (
        oq.distinct_vectors(oq._vectors_cached(spark, d), oq.GCOLS)
        .orderBy("vec_id")
        .toPandas()
    )
    fit = em.estimate_em(dv, oq.GCOLS, oq.NLEVELS)
    prior = em.FSParams(pM=oq._MW_PM_EXPORT, pU=oq._MW_PU_EXPORT, p=fit.p)
    wmax = em.maximum_weights_vector(dv, oq.GCOLS, [fit, prior])["w"].to_numpy()

    assert np.allclose(np.log(out["r_max"].to_numpy()), wmax, atol=1e-12)
    # argmax-agreement (strict comparisons only; exact ties trivially agree)
    w_em = em.weights_vector(dv, oq.GCOLS, fit)["w"].to_numpy()
    w_pr = em.weights_vector(dv, oq.GCOLS, prior)["w"].to_numpy()
    strict = ~np.isclose(w_em, w_pr)
    assert (
        (out["r_em"].to_numpy() > out["r_prior"].to_numpy())[strict]
        == (w_em > w_pr)[strict]
    ).all()


def test_fs_decision_band_edges(spark):
    from bayesianrecordlinkage_jl_spark.functions import weights as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(2.0,), (1.999999,), (-1.0,), (-1.000001,), (5.0,), (-9.0,)],
        "w double",
    )
    got = [
        r["d"]
        for r in df.select(
            F.col("w"), W.fs_decision(F.col("w"), -1.0, 2.0).alias("d")
        ).orderBy(F.desc("w")).collect()
    ]
    # 5.0, 2.0 -> match (upper inclusive); 1.999999, -1.0 -> clerical
    # (lower inclusive); -1.000001, -9.0 -> nonmatch
    assert got == [
        "match", "match", "clerical", "clerical", "nonmatch", "nonmatch"
    ]


def test_u_probability_estimates_replica(spark):
    """u_probability_estimates == a pandas replica of the full chain:
    hash-rank pairing (each doc in <= 2 pairs), comparator binning, and
    integer-micro rates. Also pins the pairing invariants the estimate's
    'random pairs' claim rests on."""
    import hashlib

    import pandas as pd

    from bayesianrecordlinkage_jl_spark.plans.oracle_queries import (
        build_catalog,
    )

    d = "/root/testdata/sf0.001"
    out = (
        build_catalog()["u_probability_estimates"]["spark"](spark, d)
        .toPandas()
        .sort_values(["field", "level"], ignore_index=True)
    )
    docs = pd.read_parquet(f"{d}/documents.parquet")
    docs["_key"] = docs.doc_id.map(
        lambda i: hashlib.md5(f"usamp:{i}".encode()).hexdigest()[:15]
    )
    docs = docs.sort_values(["_key", "doc_id"], ignore_index=True)
    # ONE global chain in (key, id) order (the SNM global rank is composed
    # from bucketed ranks + offsets, so adjacent ranks cross bucket
    # boundaries too): N-1 pairs, each doc in at most 2
    pairs = [
        (docs.doc_id[i], docs.doc_id[i + 1]) for i in range(len(docs) - 1)
    ]
    from collections import Counter

    occ = Counter(x for p in pairs for x in p)
    assert max(occ.values()) <= 2
    assert len(pairs) == len(docs) - 1

    bydoc = docs.set_index("doc_id")

    def lev(a, b):
        # plain DP levenshtein on the 64-char prefixes
        a, b = a[:64], b[:64]
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = []
    for ia, ib in pairs:
        ra, rb = bydoc.loc[ia], bydoc.loc[ib]
        mx = max(len(ra.text[:64]), len(rb.text[:64]))
        lv = lev(ra.text, rb.text)
        g1 = (1 if mx == 0 or lv == 0 else
              2 if (mx - lv) * 4 >= mx * 3 else
              3 if (mx - lv) * 2 >= mx else 4)
        ta, tb = set(ra.text.split(" ")), set(rb.text.split(" "))
        i_, u_ = len(ta & tb), len(ta | tb)
        g2 = (1 if i_ * 10 >= u_ * 9 else 2 if i_ * 10 >= u_ * 6 else
              3 if i_ * 10 >= u_ * 3 else 4)
        d = abs(ra.n_chars - rb.n_chars)
        g3 = 1 if d == 0 else 2 if d <= 50 else 3
        rows.append((g1, g2, g3))
    rep = pd.DataFrame(rows, columns=["g1", "g2", "g3"])
    exp = []
    for f in ["g1", "g2", "g3"]:
        c = rep[f].value_counts()
        tot = int(c.sum())
        for lvl, n in sorted(c.items()):
            exp.append((f, int(lvl), int(n), (1_000_000 * int(n)) // tot))
    exp = pd.DataFrame(
        exp, columns=["field", "level", "n_pairs", "u_micro"]
    ).sort_values(["field", "level"], ignore_index=True)
    pd.testing.assert_frame_equal(
        out.astype({"level": "int64", "n_pairs": "int64", "u_micro": "int64"}),
        exp.astype({"level": "int64", "n_pairs": "int64", "u_micro": "int64"}),
    )
    # u-rates per field sum to ~1e6 (floor rounding only)
    s = out.groupby("field").u_micro.sum()
    assert ((s > 999_990) & (s <= 1_000_000)).all()
