"""One-to-one resolution per block (the max_C_cluster_* analog).

Reference semantics (re-expressed, not ported):
  - decompose the LSAP by connected component, with 1x1 / 1xn / nx1 fast
    paths (/root/reference/src/maximization_functions.jl:203-244)
  - exact LSAP solvers (Hungarian/auction) wrapped from AssignmentSolver.jl
    (/root/reference/src/maximization_functions.jl:137-189) — here a clean
    numpy Kuhn-Munkres (potentials formulation) written from the standard
    public algorithm, plus a vectorized greedy
  - zero-weight assignments stripped (:148-153): only links with w > 0 kept
  - the north_rule replaces the reference's MCMC with this deterministic
    per-block greedy/Hungarian resolution

Spark shape: blocks are disjoint connected components of the positive-weight
graph, so per-block solves are embarrassingly parallel —
groupBy(block_id).applyInPandas with Arrow batching. Deterministic
tie-break everywhere: (w desc, id_a asc, id_b asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

MATCH_SCHEMA = "id_a long, id_b long, w double, block_id long"


def hungarian_max(weights: np.ndarray) -> list[tuple[int, int]]:
    """Max-weight one-to-one assignment on a dense weight matrix, rows may
    stay unmatched (equivalent to padding with zero-weight dummy columns).
    Kuhn-Munkres with row/col potentials, O(n^2 m). Returns [(row, col)]
    for assignments with weight > 0 only."""
    n, m = weights.shape
    # minimize cost = -w, padded with n dummy columns of cost 0 (= weight 0)
    cost = np.full((n, m + n), 0.0)
    cost[:, :m] = -weights
    INF = float("inf")
    mt = m + n
    u = np.zeros(n + 1)
    v = np.zeros(mt + 1)
    p = np.zeros(mt + 1, dtype=np.int64)  # p[j] = row matched to col j (1-based)
    way = np.zeros(mt + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(mt + 1, INF)
        used = np.zeros(mt + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            better = (~used[1:]) & (cur < minv[1:])
            minv[1:][better] = cur[better]
            way[1:][better] = j0
            free = ~used[1:]
            if not free.any():
                break
            j1 = int(np.argmin(np.where(free, minv[1:], INF))) + 1
            delta = minv[j1]
            u[p[used]] += delta
            v[used] -= delta
            minv[1:][free] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    out = []
    for j in range(1, m + 1):  # ignore dummy columns
        if p[j] != 0 and weights[p[j] - 1, j - 1] > 0:
            out.append((int(p[j] - 1), int(j - 1)))
    return out


def auction_max(
    weights: np.ndarray,
    eps_min: float = 1e-8,
    scaling: float = 0.2,
    start_prices: np.ndarray | None = None,
    return_prices: bool = False,
    stats: dict | None = None,
) -> list[tuple[int, int]] | tuple[list[tuple[int, int]], np.ndarray]:
    """Max-weight assignment by forward auction with epsilon-scaling
    (Bertsekas), the reference's preferred solver family
    (/root/reference/src/maximization_functions.jl:157-189; auction
    recommended over Hungarian at README.md:21).

    The rectangular allow-unmatched problem is padded to a COMPLETE
    (n+m)x(n+m) problem (dummy rows/cols at value 0, negatives floored to
    0) — completeness keeps every positive price owned at phase ends, which
    is what makes the textbook "clear assignment, keep prices" scaling
    sound. Result is within (n+m)*eps_min of optimal; dummy and
    non-positive assignments are stripped, matching hungarian_max on any
    block whose weight margins exceed ~(n+m)*eps_min.

    Warm starts (the reference's update=true price-recycling path,
    /root/reference/src/maximization_functions.jl:598-644 and
    map_functions.jl:121-151): `start_prices` seeds the REAL columns'
    prices (dummies at 0). eps-CS at termination holds for ANY starting
    prices (every row bids at least once per phase after the assignment is
    cleared), so warm starts change the PHASE SCHEDULE, not the guarantee:
    near-optimal seeds skip the coarse phases and enter close to eps_min,
    which is where the penalty-path reuse pays. `stats["phases"]` /
    `stats["bids"]` are incremented when a dict is passed (test/telemetry
    hook). return_prices additionally returns the final real-column prices
    for recycling into the next solve."""
    n, m = weights.shape
    if n == 0 or m == 0:
        out0 = []
        return (out0, np.zeros(m)) if return_prices else out0
    size = n + m
    W = np.zeros((size, size))
    W[:n, :m] = np.maximum(weights, 0.0)
    wmax = float(W.max())
    if wmax <= 0:
        out0 = []
        return (out0, np.zeros(m)) if return_prices else out0
    prices = np.zeros(size)
    if start_prices is not None:
        prices[:m] = np.maximum(np.asarray(start_prices, dtype=float), 0.0)
        # near-optimal seed: enter the schedule two decades above eps_min
        # (not AT eps_min — a poor seed at tiny eps would crawl)
        eps = max(wmax * 1e-2, eps_min)
    else:
        eps = max(wmax / 2.0, eps_min)
    row2col = np.full(size, -1, dtype=np.int64)
    col2row = np.full(size, -1, dtype=np.int64)
    while True:
        if stats is not None:
            stats["phases"] = stats.get("phases", 0) + 1
        row2col[:] = -1
        col2row[:] = -1
        unassigned = list(range(size))
        while unassigned:
            i = unassigned.pop()
            net = W[i, :] - prices
            j = int(np.argmax(net))
            best = net[j]
            net[j] = -np.inf
            second = float(net.max())
            prices[j] += best - second + eps
            prev = col2row[j]
            col2row[j] = i
            row2col[i] = j
            if prev >= 0:
                row2col[prev] = -1
                unassigned.append(int(prev))
            if stats is not None:
                stats["bids"] = stats.get("bids", 0) + 1
        if eps <= eps_min:
            break
        eps = max(eps * scaling, eps_min)
    out = [
        (int(i), int(row2col[i]))
        for i in range(n)
        if 0 <= row2col[i] < m and weights[i, row2col[i]] > 0
    ]
    return (out, prices[:m].copy()) if return_prices else out


def greedy_max(pairs: pd.DataFrame) -> pd.DataFrame:
    """Greedy one-to-one: repeatedly take the best remaining pair under the
    total order (w desc, id_a asc, id_b asc)."""
    df = pairs.sort_values(
        ["w", "id_a", "id_b"], ascending=[False, True, True]
    ).reset_index(drop=True)
    used_a: set = set()
    used_b: set = set()
    keep = []
    for row in df.itertuples(index=False):
        if row.id_a not in used_a and row.id_b not in used_b:
            used_a.add(row.id_a)
            used_b.add(row.id_b)
            keep.append(row)
    return pd.DataFrame(keep, columns=df.columns) if keep else df.iloc[0:0]


def _solve_block(
    pdf: pd.DataFrame, exact_max_pairs: int, solver=hungarian_max
) -> pd.DataFrame:
    """Per-block solve with the reference's fast paths."""
    pdf = pdf[pdf["w"] > 0]
    if len(pdf) == 0:
        return pdf[["id_a", "id_b", "w", "block_id"]]
    if len(pdf) == 1:  # 1x1 fast path (singleton block)
        return pdf[["id_a", "id_b", "w", "block_id"]]
    na, nb = pdf["id_a"].nunique(), pdf["id_b"].nunique()
    if na == 1 or nb == 1:  # 1xn / nx1 fast path: argmax with tie-break
        best = pdf.sort_values(
            ["w", "id_a", "id_b"], ascending=[False, True, True]
        ).iloc[:1]
        return best[["id_a", "id_b", "w", "block_id"]]
    if len(pdf) > exact_max_pairs:
        out = greedy_max(pdf[["id_a", "id_b", "w", "block_id"]])
        return out
    # exact Hungarian on the dense block matrix
    ra = {v: i for i, v in enumerate(sorted(pdf["id_a"].unique()))}
    rb = {v: i for i, v in enumerate(sorted(pdf["id_b"].unique()))}
    wmat = np.zeros((na, nb))
    for row in pdf.itertuples(index=False):
        wmat[ra[row.id_a], rb[row.id_b]] = row.w
    inv_a = {i: v for v, i in ra.items()}
    inv_b = {i: v for v, i in rb.items()}
    picks = solver(wmat)
    block_id = pdf["block_id"].iloc[0]
    rows = [
        {
            "id_a": inv_a[i],
            "id_b": inv_b[j],
            "w": wmat[i, j],
            "block_id": block_id,
        }
        for i, j in picks
    ]
    return pd.DataFrame(rows, columns=["id_a", "id_b", "w", "block_id"])


def one_to_one(
    pairs: DataFrame,
    method: str = "hungarian",
    exact_max_pairs: int = 10_000,
    mutual_fast_path: bool = True,
    with_resolved_by: bool = False,
) -> DataFrame:
    """Per-block one-to-one matching.

    pairs: DataFrame(id_a long, id_b long, w double, block_id long) —
    block_id must partition the positive-weight graph (connected components),
    which guarantees GLOBAL one-to-one-ness of the union of per-block
    solutions (SURVEY 7.4 risk 1).

    Distributed mutual fast path (on by default): a block whose mutual-best
    pairs cover every node (or with a single node on one side) is PROVABLY
    solved by those pairs — each pair attains its row/column maximum, so the
    matching's weight equals the sum of row maxima, an upper bound for any
    matching. Such blocks resolve with two window passes (pure Catalyst,
    SQL-oracle-able, tie-break (w desc, id asc)) and never reach the
    applyInPandas solver; on organically-blocked corpora this is the vast
    majority of blocks (measured r5: 58/61 blocks at sf0.1, 2/2 at
    sf0.01), so the Python-solver path handles only the ambiguous residue.

    Coverage caveat (measured at sf1, BENCH/BASELINE.md round-5):
    EXACT-DUPLICATE CLIQUES defeat the fast path — in a k x k equal-weight
    clique the (w desc, id asc) tie-break makes only (a_min, b_min)
    mutual, so the clique routes to the solver. A replicated corpus (or a
    web crawl full of mirrored pages) can therefore send ~all pairs down
    the solver path; the residue stays CHEAP because blocks are bounded
    upstream (size-capped CC) and per-block cost is O(n^3) in nodes on
    <= exact_max_pairs pairs with a greedy fallback above it (sf1
    evidence: 4,864 solver blocks, max 445 pairs, 227,786 pairs solved in
    ~10 s at local[32]). Dedup-before-linkage is the real 100 TB answer
    to mirror cliques, not a faster matcher. On
    tie-degenerate blocks with several optimal matchings the fast path
    DEFINES the output as the mutual-best one (greedy would pick the same;
    Hungarian/auction might pick another equally-optimal set).

    with_resolved_by adds a `resolved_by` column: 'mutual' for fast-path
    blocks, the method name for solver blocks.
    """
    p = pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w").cast("double"),
        F.col("block_id").cast("long"),
    ).where(F.col("w") > 0)

    if method == "greedy":
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            sub = pdf[pdf["w"] > 0]
            return greedy_max(sub[["id_a", "id_b", "w", "block_id"]])
    elif method == "hungarian":
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _solve_block(pdf, exact_max_pairs)
    elif method == "auction":
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _solve_block(pdf, exact_max_pairs, solver=auction_max)
    else:
        raise ValueError(f"unknown method {method!r}")

    if not mutual_fast_path:
        out = p.repartition("block_id").groupBy("block_id").applyInPandas(
            fn, schema=MATCH_SCHEMA
        )
        if with_resolved_by:
            out = out.withColumn("resolved_by", F.lit(method))
        return out

    # consumed by the stats agg, the mutual windows, and the solver residue
    p = p.localCheckpoint()
    mut = mutual_best(p, materialized=True)
    stats = p.groupBy("block_id").agg(
        F.countDistinct("id_a").alias("_na"), F.countDistinct("id_b").alias("_nb")
    )
    resolved_blocks = (
        stats.join(
            mut.groupBy("block_id").agg(F.count(F.lit(1)).alias("_nm")),
            on="block_id",
            how="left",
        )
        .where(
            (F.col("_na") == 1)
            | (F.col("_nb") == 1)
            | ((F.col("_nm") == F.col("_na")) & (F.col("_na") == F.col("_nb")))
        )
        .select("block_id")
    )
    fast = mut.join(resolved_blocks, on="block_id", how="left_semi").select(
        "id_a", "id_b", "w", "block_id"
    )
    residue = p.join(resolved_blocks, on="block_id", how="left_anti")
    solved = residue.repartition("block_id").groupBy("block_id").applyInPandas(
        fn, schema=MATCH_SCHEMA
    )
    if with_resolved_by:
        fast = fast.withColumn("resolved_by", F.lit("mutual"))
        solved = solved.withColumn("resolved_by", F.lit(method))
    return fast.unionByName(solved.select(*fast.columns))


def greedy_max_capped(pairs: pd.DataFrame, cap_b: int) -> pd.DataFrame:
    """Greedy capacitated matching: each id_a at most once, each id_b at
    most cap_b times. Pairs taken in the total order (w desc, id_a, id_b).
    cap_b=1 degenerates to greedy_max exactly."""
    df = pairs.sort_values(
        ["w", "id_a", "id_b"], ascending=[False, True, True]
    ).reset_index(drop=True)
    used_a: set = set()
    cnt_b: dict = {}
    keep = []
    for row in df.itertuples(index=False):
        if row.id_a not in used_a and cnt_b.get(row.id_b, 0) < cap_b:
            used_a.add(row.id_a)
            cnt_b[row.id_b] = cnt_b.get(row.id_b, 0) + 1
            keep.append(row)
    return pd.DataFrame(keep, columns=df.columns) if keep else df.iloc[0:0]


def _solve_block_capped(
    pdf: pd.DataFrame, cap_b: int, exact_max_pairs: int, solver=hungarian_max
) -> pd.DataFrame:
    """Per-block capacitated solve via the standard reduction: duplicate
    each right node into cap_b copies and run the one-to-one solver on the
    expanded dense matrix. Expansion happens HERE, in block-local memory —
    the shuffled pair set is never multiplied by cap_b."""
    pdf = pdf[pdf["w"] > 0]
    if len(pdf) <= 1:
        return pdf[["id_a", "id_b", "w", "block_id"]]
    if len(pdf) * cap_b > exact_max_pairs:
        return greedy_max_capped(pdf[["id_a", "id_b", "w", "block_id"]], cap_b)
    na = pdf["id_a"].nunique()
    bs = sorted(pdf["id_b"].unique())
    ra = {v: i for i, v in enumerate(sorted(pdf["id_a"].unique()))}
    # column j*cap_b + r = r-th copy of bs[j]; ties between copies are
    # broken toward r=0 by the solver's column order, harmless either way
    wmat = np.zeros((na, len(bs) * cap_b))
    rb = {v: j for j, v in enumerate(bs)}
    for row in pdf.itertuples(index=False):
        for r in range(cap_b):
            wmat[ra[row.id_a], rb[row.id_b] * cap_b + r] = row.w
    inv_a = {i: v for v, i in ra.items()}
    block_id = pdf["block_id"].iloc[0]
    rows = [
        {
            "id_a": inv_a[i],
            "id_b": bs[j // cap_b],
            "w": wmat[i, j],
            "block_id": block_id,
        }
        for i, j in solver(wmat)
    ]
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "w", "block_id"]
    ).sort_values(["id_a", "id_b"], ignore_index=True)


def one_to_many(
    pairs: DataFrame,
    cap_b: int = 2,
    method: str = "hungarian",
    exact_max_pairs: int = 10_000,
) -> DataFrame:
    """Capacitated per-block matching (b-matching, right capacity cap_b):
    each id_a links at most once, each id_b absorbs up to cap_b id_a's.
    Generalizes one_to_one (cap_b=1 is identical); models directory-style
    linkage where one canonical entity may absorb several page versions.

    Reference anchor: the max_C_cluster_* decomposition of
    /root/reference/src/maximization_functions.jl:203-244, generalized by
    the standard duplicate-right-nodes reduction (solved per block, so the
    expansion never hits the shuffle).

    pairs: (id_a, id_b, w, block_id) with block_id partitioning the
    positive-weight graph — per-block solutions union to a valid global
    capacitated matching for the same reason as one_to_one.

    method="greedy" is exactly replayable in SQL (capped greedy over the
    (w desc, id_a, id_b) order); method="hungarian"/"auction" are optimal
    and equal greedy wherever the per-block optimum is unique (certified
    per fixture, same convention as one_to_one's oracle).
    """
    if cap_b < 1:
        raise ValueError("cap_b must be >= 1")
    p = pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w").cast("double"),
        F.col("block_id").cast("long"),
    ).where(F.col("w") > 0)

    if method == "greedy":
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return greedy_max_capped(
                pdf[pdf["w"] > 0][["id_a", "id_b", "w", "block_id"]], cap_b
            )
    elif method == "hungarian":
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _solve_block_capped(pdf, cap_b, exact_max_pairs)
    elif method == "auction":
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _solve_block_capped(
                pdf, cap_b, exact_max_pairs, solver=auction_max
            )
    else:
        raise ValueError(f"unknown method {method!r}")

    return p.repartition("block_id").groupBy("block_id").applyInPandas(
        fn, schema=MATCH_SCHEMA
    )


_PRICED_SCHEMA = (
    "id_a long, id_b long, w double, block_id long, price double, "
    "is_price boolean"
)


def one_to_one_auction_warm(
    pairs: DataFrame,
    prices: DataFrame | None = None,
    eps_min: float = 1e-8,
) -> tuple[DataFrame, DataFrame]:
    """Per-block auction solve with price recycling (the reference's
    update=true path across penalty steps). `prices` is (id_b, price) from
    the PREVIOUS solve; blocks whose columns have seeds enter the auction
    two decades above eps_min instead of at wmax/2 (see auction_max), so a
    penalty-path step re-solves in a couple of phases instead of a full
    epsilon schedule. Returns (links, new_prices) — both DataFrames; the
    price table is the recycling state to feed the next call (and to
    persist in the chain checkpoint).

    Single applyInPandas pass per block emitting union-typed rows (link
    rows + price rows discriminated by is_price) so the price state flows
    back relationally, never via a driver loop."""
    p = pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w").cast("double"),
        F.col("block_id").cast("long"),
    ).where(F.col("w") > 0)
    if prices is not None:
        p = p.join(
            prices.select(
                F.col("id_b").cast("long"),
                F.col("price").cast("double").alias("_seed"),
            ),
            on="id_b",
            how="left",
        )
    else:
        p = p.withColumn("_seed", F.lit(None).cast("double"))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[pdf["w"] > 0]
        empty = pd.DataFrame(
            columns=["id_a", "id_b", "w", "block_id", "price", "is_price"]
        )
        if len(sub) == 0:
            return empty
        block_id = sub["block_id"].iloc[0]
        ra = {v: i for i, v in enumerate(sorted(sub["id_a"].unique()))}
        rb = {v: i for i, v in enumerate(sorted(sub["id_b"].unique()))}
        wmat = np.zeros((len(ra), len(rb)))
        for row in sub.itertuples(index=False):
            wmat[ra[row.id_a], rb[row.id_b]] = row.w
        seed_by_b = (
            sub.dropna(subset=["_seed"]).groupby("id_b")["_seed"].first()
        )
        warm = len(seed_by_b) > 0
        sp = None
        if warm:
            sp = np.zeros(len(rb))
            for v, i in rb.items():
                sp[i] = float(seed_by_b.get(v, 0.0))
        picks, fin = auction_max(
            wmat, eps_min=eps_min, start_prices=sp, return_prices=True
        )
        inv_a = {i: v for v, i in ra.items()}
        inv_b = {i: v for v, i in rb.items()}
        link_rows = [
            {"id_a": inv_a[i], "id_b": inv_b[j], "w": wmat[i, j],
             "block_id": block_id, "price": np.nan, "is_price": False}
            for i, j in picks
        ]
        price_rows = [
            {"id_a": -1, "id_b": inv_b[j], "w": np.nan, "block_id": block_id,
             "price": float(fin[j]), "is_price": True}
            for j in range(len(rb))
        ]
        return pd.DataFrame(link_rows + price_rows, columns=empty.columns)

    res = (
        p.repartition("block_id")
        .groupBy("block_id")
        .applyInPandas(fn, schema=_PRICED_SCHEMA)
        .localCheckpoint()  # consumed twice (links + prices)
    )
    links = res.where(~F.col("is_price")).select("id_a", "id_b", "w", "block_id")
    new_prices = res.where(F.col("is_price")).select("id_b", "price")
    return links, new_prices


def mutual_best(pairs: DataFrame, materialized: bool = False) -> DataFrame:
    """One round of mutual-argmax (pure DataFrame; SQL-oracle-able): keep
    pairs that are best within BOTH their id_a and id_b groups under
    (w desc, other-id asc). This is the distributed fast path covering the
    vast majority of links; the applyInPandas solver handles the rest.

    Shape: per-side argmax as a deterministic struct-MAX aggregation
    (lexicographic on (w, -other-id, ...), so ties are impossible for
    unique (id_a, id_b) and the result is partitioning-independent), then
    a semi-join of the two one-row-per-id argmax tables. The aggregate
    combines map-side, so the shuffle carries ~|ids| rows instead of the
    |pairs| rows a row_number window would sort twice — at web scale
    (hot blocks: pairs grow quadratically in block size while ids grow
    linearly) this is the difference between shuffling the pair graph
    twice and shuffling the id set twice (sf1 measured: 100x pair growth
    per 10x docs, see BENCH/BASELINE.md).

    CONTRACT (structural since r4): the input is consumed twice (one
    argmax per side), so handing an unmaterialized comparator subtree
    here would double the scoring cost (sf1: 82s vs 43s). The function
    therefore localCheckpoints its input ITSELF unless the caller passes
    materialized=True to attest the upstream is already materialized
    (checkpointed / cached / a plain scan) — a naive external caller can
    no longer double-run 100 TB of comparator work by accident."""
    if not materialized:
        pairs = pairs.localCheckpoint()
    cols = pairs.columns

    def best(group_key: str, other: str) -> DataFrame:
        sel = F.struct(
            F.col("w").alias("_w"),
            (-F.col(other)).alias("_no"),
            *[F.col(c).alias(c) for c in cols],
        )
        return (
            pairs.groupBy(group_key)
            .agg(F.max(sel).alias("_s"))
            .select("_s.*")
            .drop("_w", "_no")
        )

    return best("id_a", "id_b").join(
        best("id_b", "id_a").select("id_a", "id_b"),
        on=["id_a", "id_b"],
        how="left_semi",
    )


def assert_one_to_one(matches: DataFrame) -> bool:
    """Invariant check: no id appears twice on a side."""
    dup_a = matches.groupBy("id_a").count().where("count > 1").limit(1).count()
    dup_b = matches.groupBy("id_b").count().where("count > 1").limit(1).count()
    return dup_a == 0 and dup_b == 0


# ---------------------------------------------------------------------------
# Gale-Shapley stable matching (asymmetric per-side preferences)
# ---------------------------------------------------------------------------

STABLE_SCHEMA = "id_a long, id_b long, w_a double, w_b double, block_id long"


def gale_shapley(pdf: pd.DataFrame) -> pd.DataFrame:
    """Proposer-optimal stable matching on one block (pure pandas/python).

    pdf: (id_a, id_b, w_a, w_b, block_id) — only listed pairs are
    acceptable. a-side preference: (w_a desc, id_b asc); b-side:
    (w_b desc, id_a asc). Strict total orders => the a-optimal stable
    matching is unique and any proposal schedule reaches it
    (Gale-Shapley 1962; McVitie-Wilson 1971 order-independence).
    Returns the matched subset of pdf's rows."""
    cols = ["id_a", "id_b", "w_a", "w_b", "block_id"]
    if len(pdf) == 0:
        return pdf[cols]
    prefs: dict = {}
    for r in pdf.sort_values(
        ["id_a", "w_a", "id_b"], ascending=[True, False, True]
    ).itertuples(index=False):
        prefs.setdefault(r.id_a, []).append(r.id_b)
    brank: dict = {}
    for b, grp in pdf.sort_values(
        ["id_b", "w_b", "id_a"], ascending=[True, False, True]
    ).groupby("id_b", sort=False):
        for rank, a in enumerate(grp["id_a"]):
            brank[(b, a)] = rank
    nxt = {a: 0 for a in prefs}
    hold: dict = {}  # b -> a
    free = sorted(prefs)
    while free:
        a = free.pop()
        while nxt[a] < len(prefs[a]):
            b = prefs[a][nxt[a]]
            cur = hold.get(b)
            if cur is None:
                hold[b] = a
                break
            if brank[(b, a)] < brank[(b, cur)]:
                hold[b] = a
                nxt[cur] += 1
                free.append(cur)
                break
            nxt[a] += 1
    matched = pd.DataFrame(
        [(a, b) for b, a in hold.items()], columns=["id_a", "id_b"]
    )
    if len(matched) == 0:
        return pdf.iloc[0:0][cols]
    return pdf.merge(matched, on=["id_a", "id_b"])[cols]


def stable_links(pairs: DataFrame) -> DataFrame:
    """Per-block Gale-Shapley stable one-to-one matching with ASYMMETRIC
    per-side scores — the matching semantics for two-directory alignment
    where each side ranks counterparts by its OWN similarity signal
    (e.g. forward vs backward retrieval margins). With a single shared
    score both sides' preferences coincide and the unique stable matching
    degenerates to greedy_max; the operator exists exactly for the
    asymmetric case greedy/Hungarian cannot express: it returns the
    a-optimal STABLE matching (no blocking pair), not a weight optimum.

    pairs: (id_a, id_b, w_a, w_b, block_id); block_id must partition the
    pair graph (connected components), so per-block stability composes to
    global stability — a blocking pair would have to be a listed pair,
    and every listed pair is inside one block.

    Scale shape: same as one_to_one — blocks are disjoint, solved in
    parallel via applyInPandas (Arrow batches); GS is O(sum deg) per
    block with dict state; the shuffle moves each pair row once."""
    p = pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w_a").cast("double"),
        F.col("w_b").cast("double"),
        F.col("block_id").cast("long"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return gale_shapley(pdf)

    return p.repartition("block_id").groupBy("block_id").applyInPandas(
        fn, schema=STABLE_SCHEMA
    )


def stable_links_sql(pairs_sql: str, max_rounds: int = 10_000) -> str:
    """DuckDB twin: ROUND-BASED Gale-Shapley replay as a recursive CTE.

    Each round every proposer with a live preference (held rows stand as
    proposals to their current b; free rows propose to pref[a][idx])
    competes per b on the b-side rank; per-b winners (row_number = 1 over
    (b, brank)) stay/become held, losers advance idx. McVitie-Wilson
    order-independence makes this parallel schedule reach the same
    a-optimal stable matching as the Spark side's sequential loop. The
    recursive term reads the state exactly ONCE (DuckDB's single-
    reference rule) — winners AND the stop condition are window
    functions over that one scan: when no free proposer with remaining
    preferences exists the round emits nothing and recursion ends, so
    the max-iteration state is the stable one. Exhausted proposers drop
    out of the state via the pref join. max_rounds is a defensive cap
    only (every emitted round makes progress)."""
    return f"""
    WITH RECURSIVE
    sm_pairs AS MATERIALIZED (
      SELECT id_a, id_b, w_a, w_b FROM ({pairs_sql})
    ),
    sm_prefs AS MATERIALIZED (
      SELECT id_a, id_b, w_a, w_b,
             CAST(row_number() OVER (PARTITION BY id_a
                    ORDER BY w_a DESC, id_b ASC) - 1 AS BIGINT) AS pos,
             CAST(row_number() OVER (PARTITION BY id_b
                    ORDER BY w_b DESC, id_a ASC) AS BIGINT) AS brank
      FROM sm_pairs
    ),
    sm_st(it, a, idx, held) AS (
      SELECT 0, id_a, CAST(0 AS BIGINT), false
      FROM (SELECT DISTINCT id_a FROM sm_pairs)
      UNION ALL
      SELECT it + 1, a,
             CASE WHEN rn = 1 THEN idx ELSE idx + 1 END,
             rn = 1
      FROM (
        SELECT s.it, s.a, s.idx, s.held,
               row_number() OVER (PARTITION BY p.id_b
                                  ORDER BY p.brank ASC) AS rn,
               count(CASE WHEN NOT s.held THEN 1 END) OVER () AS n_free
        FROM sm_st s
        JOIN sm_prefs p ON p.id_a = s.a AND p.pos = s.idx
      ) c
      WHERE n_free > 0 AND it < {max_rounds}
    )
    SELECT p.id_a, p.id_b, p.w_a, p.w_b
    FROM (SELECT a, idx FROM sm_st
          WHERE held AND it = (SELECT max(it) FROM sm_st)) f
    JOIN sm_prefs p ON p.id_a = f.a AND p.pos = f.idx
    """


# ---------------------------------------------------------------------------
# doubly-capacitated matching (many-to-many b-matching, greedy)
# ---------------------------------------------------------------------------


def greedy_max_doubly_capped(
    pairs: pd.DataFrame, cap_a: int, cap_b: int
) -> pd.DataFrame:
    """Greedy b-matching with BOTH side capacities: pairs taken in the
    total order (w desc, id_a, id_b); a pair is kept iff id_a has been
    used < cap_a times and id_b < cap_b times. (cap_a=1, cap_b=1)
    degenerates to greedy_max; (1, k) to greedy_max_capped."""
    df = pairs.sort_values(
        ["w", "id_a", "id_b"], ascending=[False, True, True]
    ).reset_index(drop=True)
    cnt_a: dict = {}
    cnt_b: dict = {}
    keep = []
    for row in df.itertuples(index=False):
        if cnt_a.get(row.id_a, 0) < cap_a and cnt_b.get(row.id_b, 0) < cap_b:
            cnt_a[row.id_a] = cnt_a.get(row.id_a, 0) + 1
            cnt_b[row.id_b] = cnt_b.get(row.id_b, 0) + 1
            keep.append(row)
    return pd.DataFrame(keep, columns=df.columns) if keep else df.iloc[0:0]


def many_to_many(
    pairs: DataFrame, cap_a: int = 2, cap_b: int = 2
) -> DataFrame:
    """Per-block doubly-capacitated greedy b-matching: each id_a links to
    at most cap_a id_b's AND each id_b absorbs at most cap_b id_a's —
    household-to-household / directory-to-directory linkage where both
    sides may legitimately fan out, bounded. Greedy on the global
    (w desc, id_a, id_b) order is exactly replayable in SQL (the oracle
    contract); it is the 1/2-approximation of optimal b-matching and the
    standard production choice (optimal needs min-cost flow, which no
    relational engine expresses).

    pairs: (id_a, id_b, w, block_id) with block_id partitioning the
    positive-weight graph; per-block greedy equals global greedy because
    blocks share no ids (same argument as one_to_one).

    Scale shape: identical to one_to_many — one repartition(block_id),
    one applyInPandas, dict-counter state linear in the block's pairs."""
    if cap_a < 1 or cap_b < 1:
        raise ValueError("caps must be >= 1")
    p = pairs.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("w").cast("double"),
        F.col("block_id").cast("long"),
    ).where(F.col("w") > 0)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[pdf["w"] > 0]
        return greedy_max_doubly_capped(
            sub[["id_a", "id_b", "w", "block_id"]], cap_a, cap_b
        )

    return p.repartition("block_id").groupBy("block_id").applyInPandas(
        fn, schema=MATCH_SCHEMA
    )
