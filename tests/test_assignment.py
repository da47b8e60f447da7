"""Per-block one-to-one assignment: exact Hungarian vs brute force,
greedy/Hungarian agreement on unique-optimum blocks, fast paths, and the
global one-to-one invariant (FIXTURES.md §7)."""

import itertools
import random

import numpy as np
import pandas as pd
import pytest

from bayesianrecordlinkage_jl_spark.operators import assignment as A


def _brute_force_max(w: np.ndarray) -> float:
    n, m = w.shape
    best = 0.0
    cols = list(range(m))
    for k in range(0, min(n, m) + 1):
        for rows in itertools.combinations(range(n), k):
            for perm in itertools.permutations(cols, k):
                s = sum(w[r, c] for r, c in zip(rows, perm) if w[r, c] > 0)
                best = max(best, s)
    return best


@pytest.mark.parametrize("seed", range(8))
def test_hungarian_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n, m = rng.integers(1, 5, size=2)
    w = rng.uniform(-1, 3, size=(n, m)).round(3)
    picks = A.hungarian_max(w)
    total = sum(w[i, j] for i, j in picks)
    assert all(w[i, j] > 0 for i, j in picks)
    rows = [i for i, _ in picks]
    cols = [j for _, j in picks]
    assert len(set(rows)) == len(rows) and len(set(cols)) == len(cols)
    assert total == pytest.approx(_brute_force_max(w), abs=1e-9)


def test_hungarian_rectangular_and_padding():
    w = np.array([[5.0, 1.0]])
    assert A.hungarian_max(w) == [(0, 0)]
    w = np.array([[5.0], [4.0]])  # 2 rows, 1 col -> best row wins
    assert A.hungarian_max(w) == [(0, 0)]
    w = np.array([[-1.0, -2.0]])  # all negative -> unmatched
    assert A.hungarian_max(w) == []


def test_greedy_total_order():
    pairs = pd.DataFrame(
        {
            "id_a": [1, 1, 2, 2],
            "id_b": [10, 11, 10, 11],
            "w": [2.0, 2.0, 2.0, 1.0],
            "block_id": [1, 1, 1, 1],
        }
    )
    out = A.greedy_max(pairs)
    # tie-break (w desc, id_a asc, id_b asc): (1,10) first, then (2,11)
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {(1, 10), (2, 11)}


def _random_blocks(rng, n_blocks=6):
    rows = []
    for b in range(n_blocks):
        na, nb = rng.randint(1, 6), rng.randint(1, 6)
        for i in range(na):
            for j in range(nb):
                if rng.random() < 0.7:
                    rows.append(
                        {
                            "id_a": b * 100 + i,
                            "id_b": 10_000 + b * 100 + j,
                            "w": round(rng.uniform(-0.5, 2.0), 3),
                            "block_id": b,
                        }
                    )
    return pd.DataFrame(rows)


def test_one_to_one_invariants_and_optimality(spark):
    rng = random.Random(3)
    pdf = _random_blocks(rng)
    df = spark.createDataFrame(pdf)
    links = A.one_to_one(df, method="hungarian").toPandas()
    assert links["id_a"].is_unique and links["id_b"].is_unique
    assert (links["w"] > 0).all()
    # per-block optimality vs brute force
    for b, grp in pdf[pdf["w"] > 0].groupby("block_id"):
        ia = {v: i for i, v in enumerate(sorted(grp["id_a"].unique()))}
        ib = {v: i for i, v in enumerate(sorted(grp["id_b"].unique()))}
        w = np.zeros((len(ia), len(ib)))
        for r in grp.itertuples():
            w[ia[r.id_a], ib[r.id_b]] = r.w
        want = _brute_force_max(w)
        got = links[links["block_id"] == b]["w"].sum()
        assert got == pytest.approx(want, abs=1e-9), f"block {b}"


def test_one_to_one_greedy_method(spark):
    rng = random.Random(4)
    df = spark.createDataFrame(_random_blocks(rng))
    links = A.one_to_one(df, method="greedy").toPandas()
    assert links["id_a"].is_unique and links["id_b"].is_unique
    assert (links["w"] > 0).all()


def test_mutual_best(spark):
    pdf = pd.DataFrame(
        {
            "id_a": [1, 1, 2],
            "id_b": [10, 11, 10],
            "w": [3.0, 2.0, 1.0],
        }
    )
    out = A.mutual_best(spark.createDataFrame(pdf)).toPandas()
    assert set(zip(out["id_a"], out["id_b"])) == {(1, 10)}


@pytest.mark.parametrize("seed", range(8))
def test_auction_matches_brute_force(seed):
    rng = np.random.default_rng(100 + seed)
    n, m = rng.integers(1, 5, size=2)
    w = rng.uniform(-1, 3, size=(n, m)).round(3)
    picks = A.auction_max(w)
    total = sum(w[i, j] for i, j in picks)
    assert all(w[i, j] > 0 for i, j in picks)
    rows = [i for i, _ in picks]
    cols = [j for _, j in picks]
    assert len(set(rows)) == len(rows) and len(set(cols)) == len(cols)
    assert total == pytest.approx(_brute_force_max(w), abs=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_auction_agrees_with_hungarian_larger(seed):
    rng = np.random.default_rng(200 + seed)
    n, m = int(rng.integers(5, 20)), int(rng.integers(5, 20))
    w = rng.uniform(-1, 3, size=(n, m)).round(3)
    th = sum(w[i, j] for i, j in A.hungarian_max(w))
    ta = sum(w[i, j] for i, j in A.auction_max(w))
    assert ta == pytest.approx(th, abs=1e-6)


def test_auction_edge_cases():
    assert A.auction_max(np.array([[-1.0, -2.0]])) == []
    assert A.auction_max(np.array([[5.0, 1.0]])) == [(0, 0)]
    assert A.auction_max(np.zeros((0, 3))) == []


@pytest.mark.parametrize("seed", range(3))
def test_solvers_agree_at_block_scale(seed):
    """Hungarian vs auction at realistic post-hoc block sizes (up to 60x60,
    the reference's 2500-pair cap regime): totals agree to auction's
    epsilon bound; both are strictly one-to-one."""
    rng = np.random.default_rng(1000 + seed)
    n, m = int(rng.integers(30, 61)), int(rng.integers(30, 61))
    w = rng.uniform(-1, 5, size=(n, m))
    w[rng.random((n, m)) < 0.5] = -1.0  # sparse positives
    ph = A.hungarian_max(w)
    pa = A.auction_max(w)
    th = sum(w[i, j] for i, j in ph)
    ta = sum(w[i, j] for i, j in pa)
    assert ta == pytest.approx(th, abs=1e-5)
    for picks in (ph, pa):
        rows = [i for i, _ in picks]
        cols = [j for _, j in picks]
        assert len(set(rows)) == len(rows) and len(set(cols)) == len(cols)
        assert all(w[i, j] > 0 for i, j in picks)


def test_mutual_fast_path_agrees_with_solver_route(spark):
    """The distributed mutual fast path must not change the operator's
    output: same links as the all-solver route on random blocks (tie-free
    weights -> unique optimum), and resolved_by labels partition the
    output."""
    rng = random.Random(11)
    pdf = _random_blocks(rng)
    # add blocks the fast path provably resolves: a 1x1, a 1xn, and a
    # mutual-total 2x2 (diagonal dominant)
    extra = pd.DataFrame(
        [
            {"id_a": 900_001, "id_b": 950_001, "w": 1.0, "block_id": 901},
            {"id_a": 900_101, "id_b": 950_101, "w": 1.0, "block_id": 902},
            {"id_a": 900_101, "id_b": 950_102, "w": 2.0, "block_id": 902},
            {"id_a": 900_201, "id_b": 950_201, "w": 5.0, "block_id": 903},
            {"id_a": 900_201, "id_b": 950_202, "w": 1.0, "block_id": 903},
            {"id_a": 900_202, "id_b": 950_201, "w": 1.0, "block_id": 903},
            {"id_a": 900_202, "id_b": 950_202, "w": 4.0, "block_id": 903},
        ]
    )
    pdf = pd.concat([pdf, extra], ignore_index=True)
    df = spark.createDataFrame(pdf)
    fast = A.one_to_one(df, method="hungarian", with_resolved_by=True).toPandas()
    slow = A.one_to_one(df, method="hungarian", mutual_fast_path=False).toPandas()
    key = lambda d: sorted(zip(d["id_a"], d["id_b"], d["w"]))
    assert key(fast) == key(slow)
    assert set(fast["resolved_by"]) <= {"mutual", "hungarian"}
    assert (fast["resolved_by"] == "mutual").any()  # fast path actually fires


def test_mutual_pair_outside_optimum_routes_to_solver(spark):
    """Canonical trap block: (a1,b1)=10 is mutual-best but the optimum is
    (a1,b2)+(a2,b1)=18 — mutual is NOT total here, so the block must reach
    the Hungarian solver and return the 18-weight matching."""
    pdf = pd.DataFrame(
        [
            {"id_a": 1, "id_b": 101, "w": 10.0, "block_id": 1},
            {"id_a": 1, "id_b": 102, "w": 9.0, "block_id": 1},
            {"id_a": 2, "id_b": 101, "w": 9.0, "block_id": 1},
        ]
    )
    out = A.one_to_one(
        spark.createDataFrame(pdf), method="hungarian", with_resolved_by=True
    ).toPandas()
    assert sorted(zip(out["id_a"], out["id_b"])) == [(1, 102), (2, 101)]
    assert (out["resolved_by"] == "hungarian").all()


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_one_to_one_greedy_hungarian_certificate(spark, sf):
    """Certificate backing the one_to_one_links DuckDB oracle: on the gate
    fixtures the global greedy matching (the oracle's recursive-CTE replay)
    picks the IDENTICAL link set as the catalog's mutual-fast-path +
    Hungarian run.  Greedy optimality is not a theorem — this assertion is
    what licenses the SQL twin (plans/oracle_queries.py one_to_one_links);
    if a fixture change breaks it, the oracle must be demoted, not the
    test."""
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq
    from pyspark.sql import functions as F

    d = f"/root/testdata/{sf}"
    hung = oq.build_catalog()["one_to_one_links"]["spark"](spark, d).toPandas()

    wp = oq._scored_pairs_spark(spark, d).where(F.col("w") > oq.EDGE_THRESHOLD)
    from bayesianrecordlinkage_jl_spark.operators.connected_components import (
        connected_components,
    )

    comps = connected_components(
        wp.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    blocked = (
        wp.join(comps.withColumnRenamed("node", "id_a"), on="id_a")
        .withColumnRenamed("component", "block_id")
        .select("id_a", "id_b", "w", "block_id")
    )
    greedy = A.one_to_one(
        blocked, method="greedy", mutual_fast_path=False
    ).toPandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"], df["w"], df["block_id"]))
    assert key(hung) == key(greedy)

    # the same certificate licenses one_to_one_links_auction's reuse of
    # the greedy replay oracle: epsilon-scaling auction is exactly optimal
    # and the fixture optimum is unique, so all three methods must agree
    # link-for-link (if this breaks, demote the auction oracle too)
    auc = oq.build_catalog()["one_to_one_links_auction"]["spark"](
        spark, d
    ).toPandas()
    assert key(hung) == key(auc)

    # warm-start price recycling cannot change the solution, only the
    # phase schedule — the recycled-price re-solve must agree too
    warm = oq.build_catalog()["one_to_one_links_auction_warm"]["spark"](
        spark, d
    ).toPandas()
    assert key(hung) == key(warm)


def test_mutual_best_edge_cases(spark):
    """Agg-form mutual_best: empty input, single pair, and extra payload
    columns all behave; output column order is preserved."""
    schema = "id_a long, id_b long, w double, block_id long"
    empty = spark.createDataFrame([], schema)
    assert A.mutual_best(empty).count() == 0
    one = spark.createDataFrame([(1, 10, 2.5, 7)], schema)
    out = A.mutual_best(one).toPandas()
    assert out.columns.tolist() == ["id_a", "id_b", "w", "block_id"]
    assert out.values.tolist() == [[1, 10, 2.5, 7]]


def test_mutual_best_property_random_tables(spark):
    """Property guard for the agg-form mutual_best: on random pair tables
    it equals the definitional filter (rank 1 within BOTH id groups under
    (w desc, other-id asc)) computed in pandas."""
    rng = random.Random(77)
    for trial in range(8):
        n_a, n_b = rng.randint(1, 12), rng.randint(1, 12)
        rows = []
        seen = set()
        for _ in range(rng.randint(1, 40)):
            a, b = rng.randint(0, n_a), 100 + rng.randint(0, n_b)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            # duplicate weights on purpose: ties must resolve by id
            rows.append((a, b, float(rng.choice([1.0, 2.0, 3.0, 2.0]))))
        pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "w"])
        got = A.mutual_best(
            spark.createDataFrame(pdf.assign(block_id=1))
        ).toPandas()

        def best_side(df, key, other):
            df = df.sort_values(
                ["w", other], ascending=[False, True]
            ).groupby(key, as_index=False).first()
            return set(zip(df["id_a"], df["id_b"]))

        want = best_side(pdf, "id_a", "id_b") & best_side(pdf, "id_b", "id_a")
        assert set(zip(got["id_a"], got["id_b"])) == want, (trial, rows)


# --- capacitated one-to-many (right capacity cap_b) ------------------------


def _brute_force_capped(w: np.ndarray, cap: int) -> float:
    """Max-weight b-matching by enumeration: each row picks one column (or
    none), each column taken at most cap times, only w>0 picks allowed."""
    n, m = w.shape
    best = 0.0
    choices = [
        [None] + [c for c in range(m) if w[r, c] > 0] for r in range(n)
    ]
    for pick in itertools.product(*choices):
        used = [c for c in pick if c is not None]
        if any(used.count(c) > cap for c in set(used)):
            continue
        best = max(best, sum(w[r, c] for r, c in enumerate(pick) if c is not None))
    return best


@pytest.mark.parametrize("seed", range(8))
def test_solve_block_capped_matches_brute_force(seed):
    """_solve_block_capped (duplicate-right-nodes Hungarian reduction) is
    exactly optimal vs enumeration, and respects both constraints."""
    rng = np.random.default_rng(100 + seed)
    n, m = rng.integers(1, 5, size=2)
    cap = int(rng.integers(1, 4))
    w = rng.uniform(-1, 3, size=(n, m)).round(3)
    rows = [
        {"id_a": r, "id_b": 100 + c, "w": float(w[r, c]), "block_id": 1}
        for r in range(n)
        for c in range(m)
        if w[r, c] != 0
    ]
    pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "w", "block_id"])
    out = A._solve_block_capped(pdf, cap_b=cap, exact_max_pairs=10_000)
    assert (out["w"] > 0).all()
    assert out["id_a"].is_unique
    assert (out.groupby("id_b").size() <= cap).all()
    assert out["w"].sum() == pytest.approx(_brute_force_capped(w, cap), abs=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_greedy_capped_cap1_equals_greedy(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(1, 25))
    pdf = pd.DataFrame(
        {
            "id_a": rng.integers(0, 8, size=n),
            "id_b": 100 + rng.integers(0, 8, size=n),
            "w": rng.choice([1.0, 2.0, 3.0], size=n),
            "block_id": 1,
        }
    ).drop_duplicates(["id_a", "id_b"])
    got = A.greedy_max_capped(pdf, cap_b=1)
    want = A.greedy_max(pdf)
    assert got.values.tolist() == want.values.tolist()


def test_one_to_many_capacity_binds(spark):
    """A hot right node absorbs exactly cap_b links (the top-cap_b a's by
    weight), and the displaced a's fall back to their runner-up target."""
    rows = [
        (1, 10, 9.0, 1),
        (2, 10, 8.0, 1),
        (3, 10, 7.0, 1),
        (3, 20, 1.0, 1),
        (4, 10, 6.0, 1),
    ]
    df = spark.createDataFrame(rows, "id_a long, id_b long, w double, block_id long")
    for method in ("greedy", "hungarian", "auction"):
        out = (
            A.one_to_many(df, cap_b=2, method=method)
            .toPandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        assert list(zip(out["id_a"], out["id_b"])) == [(1, 10), (2, 10), (3, 20)]


@pytest.mark.parametrize("seed", range(4))
def test_one_to_many_cap1_equals_one_to_one(spark, seed):
    """cap_b=1 degenerates to the one-to-one solver link-for-link (untied
    random weights, so the optimum is unique a.s.)."""
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(4, 30))
    pdf = pd.DataFrame(
        {
            "id_a": rng.integers(0, 10, size=n),
            "id_b": 100 + rng.integers(0, 10, size=n),
            "w": rng.uniform(0.1, 5.0, size=n).round(6),
            "block_id": 1,
        }
    ).drop_duplicates(["id_a", "id_b"])
    df = spark.createDataFrame(pdf)
    key = lambda d: sorted(zip(d["id_a"], d["id_b"]))
    got = A.one_to_many(df, cap_b=1, method="hungarian").toPandas()
    want = A.one_to_one(df, method="hungarian", mutual_fast_path=False).toPandas()
    assert key(got) == key(want)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_one_to_many_greedy_hungarian_certificate(spark, sf):
    """Certificate backing the one_to_many_links DuckDB oracle (capped
    greedy replay): on the gate fixtures the capacitated greedy picks the
    IDENTICAL link set as the Hungarian duplicate-right-nodes run. Same
    convention as the one_to_one certificate — if a fixture change breaks
    this, demote the oracle, don't weaken the test."""
    from bayesianrecordlinkage_jl_spark.plans import oracle_queries as oq
    from pyspark.sql import functions as F
    from bayesianrecordlinkage_jl_spark.operators.connected_components import (
        connected_components,
    )

    d = f"/root/testdata/{sf}"
    hung = oq.build_catalog()["one_to_many_links"]["spark"](spark, d).toPandas()

    wp = oq._scored_pairs_spark(spark, d).where(F.col("w") > oq.EDGE_THRESHOLD)
    comps = connected_components(
        wp.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    blocked = (
        wp.join(comps.withColumnRenamed("node", "id_a"), on="id_a")
        .withColumnRenamed("component", "block_id")
        .select("id_a", "id_b", "w", "block_id")
    )
    greedy = A.one_to_many(blocked, cap_b=2, method="greedy").toPandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"], df["w"], df["block_id"]))
    assert key(hung) == key(greedy)


# --- Gale-Shapley stable matching -------------------------------------------


def _brute_stable(pairs):
    """All-matchings brute force: returns the a-optimal stable matching.
    pairs: list of (a, b, wa, wb). Stability: no listed pair (a,b) where
    a strictly prefers b to its partner (or is unmatched) AND b strictly
    prefers a to its partner (or is unmatched)."""
    import itertools

    arank = {(a, b): (-wa, b) for a, b, wa, wb in pairs}
    brankk = {(b, a): (-wb, a) for a, b, wa, wb in pairs}
    legal = {(a, b) for a, b, _, _ in pairs}
    As = sorted({a for a, *_ in pairs})
    Bs = sorted({b for _, b, *_ in pairs})

    def is_stable(match: dict) -> bool:
        rb = {b: a for a, b in match.items()}
        for a, b in legal:
            if match.get(a) == b:
                continue
            pa = match.get(a)
            pb = rb.get(b)
            a_pref = pa is None or arank[(a, b)] < arank[(a, pa)]
            b_pref = pb is None or brankk[(b, a)] < brankk[(b, pb)]
            if a_pref and b_pref:
                return False
        return True

    best = None
    stables = []
    for r in range(min(len(As), len(Bs)) + 1):
        for asub in itertools.combinations(As, r):
            for bperm in itertools.permutations(Bs, r):
                match = dict(zip(asub, bperm))
                if any((a, b) not in legal for a, b in match.items()):
                    continue
                if is_stable(match):
                    stables.append(match)
    assert stables, "at least the GS matching is stable"
    # a-optimal: for every a, partner rank is the best over stable matchings
    def key(match):
        return sorted(match.items())
    best = None
    for m in stables:
        if best is None:
            best = m
            continue
        # lattice: compare per-a preference; the a-optimal dominates all
        better = worse = False
        for a in As:
            pa, qa = m.get(a), best.get(a)
            ra = arank.get((a, pa)) if pa is not None else (float("inf"),)
            rq = arank.get((a, qa)) if qa is not None else (float("inf"),)
            if ra < rq:
                better = True
            elif ra > rq:
                worse = True
        if better and not worse:
            best = m
    return set(best.items())


def test_gale_shapley_differs_from_greedy_and_is_stable():
    import pandas as pd

    from bayesianrecordlinkage_jl_spark.operators.assignment import (
        gale_shapley,
        greedy_max,
    )

    rows = [
        (1, 11, 10.0, 1.0, 0),   # a1's favorite, b1's least favorite
        (1, 12, 5.0, 10.0, 0),
        (2, 11, 8.0, 10.0, 0),
    ]
    pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "w_a", "w_b", "block_id"])
    gs = {
        (r.id_a, r.id_b)
        for r in gale_shapley(pdf).itertuples(index=False)
    }
    assert gs == {(2, 11), (1, 12)}
    greedy = {
        (r.id_a, r.id_b)
        for r in greedy_max(
            pdf.rename(columns={"w_a": "w"})[["id_a", "id_b", "w", "block_id"]]
        ).itertuples(index=False)
    }
    assert greedy == {(1, 11)}  # unstable: (2,11) is a blocking pair


@pytest.mark.parametrize("seed", range(8))
def test_gale_shapley_is_a_optimal_stable(seed):
    import random

    import pandas as pd

    from bayesianrecordlinkage_jl_spark.operators.assignment import gale_shapley

    rng = random.Random(6200 + seed)
    na, nb = rng.randrange(1, 5), rng.randrange(1, 5)
    rows = []
    for a in range(na):
        for b in range(nb):
            if rng.random() < 0.7:
                rows.append(
                    (a, 100 + b, rng.randrange(1, 30) / 3.0,
                     rng.randrange(1, 30) / 3.0, 0)
                )
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "w_a", "w_b", "block_id"])
    gs = {
        (r.id_a, r.id_b) for r in gale_shapley(pdf).itertuples(index=False)
    }
    want = _brute_stable([(a, b, wa, wb) for a, b, wa, wb, _ in rows])
    assert gs == want


def test_stable_links_spark_matches_per_block(spark):
    import pandas as pd

    from bayesianrecordlinkage_jl_spark.operators.assignment import (
        gale_shapley,
        stable_links,
    )

    import random

    rng = random.Random(99)
    rows = []
    for blk in range(6):
        na, nb = rng.randrange(1, 6), rng.randrange(1, 6)
        for a in range(na):
            for b in range(nb):
                if rng.random() < 0.6:
                    rows.append(
                        (blk * 100 + a, blk * 100 + 50 + b,
                         rng.randrange(1, 40) / 7.0,
                         rng.randrange(1, 40) / 7.0, blk)
                    )
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, w_a double, w_b double, block_id long"
    )
    got = {
        (r["id_a"], r["id_b"]) for r in stable_links(df).collect()
    }
    pdf = pd.DataFrame(
        rows, columns=["id_a", "id_b", "w_a", "w_b", "block_id"]
    )
    want = set()
    for _, grp in pdf.groupby("block_id"):
        want |= {
            (r.id_a, r.id_b)
            for r in gale_shapley(grp.reset_index(drop=True)).itertuples(
                index=False
            )
        }
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_gale_shapley_shared_score_degenerates_to_greedy(seed):
    """With w_b == w_a both sides rank by the same pair weight; the unique
    stable matching is the greedy one (the heaviest pair blocks unless
    matched; induction on removal)."""
    import random

    import pandas as pd

    from bayesianrecordlinkage_jl_spark.operators.assignment import (
        gale_shapley,
        greedy_max,
    )

    rng = random.Random(7300 + seed)
    rows = []
    seen_w = set()
    for a in range(rng.randrange(2, 6)):
        for b in range(rng.randrange(2, 6)):
            if rng.random() < 0.7:
                w = rng.randrange(1, 1000) / 9.0
                while w in seen_w:  # strict prefs: unique weights
                    w = rng.randrange(1, 1000) / 9.0
                seen_w.add(w)
                rows.append((a, 100 + b, w, w, 0))
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "w_a", "w_b", "block_id"])
    gs = {(r.id_a, r.id_b) for r in gale_shapley(pdf).itertuples(index=False)}
    gr = {
        (r.id_a, r.id_b)
        for r in greedy_max(
            pdf.rename(columns={"w_a": "w"})[["id_a", "id_b", "w", "block_id"]]
        ).itertuples(index=False)
    }
    assert gs == gr


# --- doubly-capacitated (many-to-many) greedy -------------------------------


def _brute_doubly_capped(rows, cap_a, cap_b):
    order = sorted(rows, key=lambda r: (-r[2], r[0], r[1]))
    ca, cb, keep = {}, {}, set()
    for a, b, w, blk in order:
        if ca.get(a, 0) < cap_a and cb.get(b, 0) < cap_b:
            ca[a] = ca.get(a, 0) + 1
            cb[b] = cb.get(b, 0) + 1
            keep.add((a, b))
    return keep


@pytest.mark.parametrize("caps", [(1, 1), (1, 2), (2, 1), (2, 3)])
def test_greedy_doubly_capped_matches_replica(caps):
    import random

    import pandas as pd

    from bayesianrecordlinkage_jl_spark.operators.assignment import (
        greedy_max,
        greedy_max_capped,
        greedy_max_doubly_capped,
    )

    cap_a, cap_b = caps
    rng = random.Random(500 + cap_a * 10 + cap_b)
    rows = [
        (rng.randrange(0, 6), 100 + rng.randrange(0, 6),
         rng.randrange(1, 500) / 9.0, 0)
        for _ in range(25)
    ]
    rows = list({(a, b): (a, b, w, blk) for a, b, w, blk in rows}.values())
    pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "w", "block_id"])
    got = {
        (r.id_a, r.id_b)
        for r in greedy_max_doubly_capped(pdf, cap_a, cap_b).itertuples(
            index=False
        )
    }
    assert got == _brute_doubly_capped(rows, cap_a, cap_b)
    if caps == (1, 1):
        assert got == {
            (r.id_a, r.id_b) for r in greedy_max(pdf).itertuples(index=False)
        }
    if cap_a == 1:
        assert got == {
            (r.id_a, r.id_b)
            for r in greedy_max_capped(pdf, cap_b).itertuples(index=False)
        }


def test_many_to_many_spark_caps_bind(spark):
    from bayesianrecordlinkage_jl_spark.operators.assignment import many_to_many

    # star: one a connected to 4 b's and vice versa, cap 2 each way
    rows = (
        [(1, 100 + i, 10.0 - i, 0) for i in range(4)]
        + [(2 + i, 200, 20.0 - i, 1) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "id_a long, id_b long, w double, block_id long")
    got = {
        (r["id_a"], r["id_b"]) for r in many_to_many(df, 2, 2).collect()
    }
    assert got == {(1, 100), (1, 101), (2, 200), (3, 200)}
