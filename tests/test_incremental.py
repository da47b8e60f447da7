"""Incremental entity resolution: link_increment assignment semantics,
merge_components == full-recompute equivalence, and pair-counting metrics
against brute-force replicas."""

import itertools

from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import incremental
from bayesianrecordlinkage_jl_spark.operators.connected_components import (
    components_with_isolated,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cluster_representatives_min_id(spark):
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 30), (4, 30), (5, 50)],
        "doc_id long, cluster_id long",
    )
    docs = _docs(spark, [(i, f"text {i}") for i in range(1, 6)])
    reps = {
        r["cluster_id"]: (r["rep_id"], r["rep_text"])
        for r in incremental.cluster_representatives(
            clusters, docs, "doc_id", "cluster_id", "text"
        ).collect()
    }
    assert reps == {10: (1, "text 1"), 30: (3, "text 3"), 50: (5, "text 5")}


def test_link_increment_assigns_and_mints(spark):
    # cluster 1's rep is a long sentence; new doc 100 is a near-dup of it,
    # new doc 101 shares nothing -> singleton mint
    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    reps = spark.createDataFrame(
        [(1, 1, base), (2, 2, "completely different content about spark joins and shuffles here")],
        "cluster_id long, rep_id long, rep_text string",
    )
    new = _docs(
        spark,
        [
            (100, base + " today"),  # near-dup of cluster 1
            (101, "unrelated text with zero overlap whatsoever in vocabulary terms"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in incremental.link_increment(
            reps, new, "doc_id", "text", min_jaccard_pct=50
        ).collect()
    }
    assert out[100]["matched"] and out[100]["cluster_id"] == 1
    assert out[100]["best_jac_e4"] > 5000
    assert not out[101]["matched"]
    assert out[101]["cluster_id"] == 101 + incremental.NEW_CLUSTER_OFFSET
    assert out[101]["best_jac_e4"] == -1


def test_link_increment_tie_breaks_to_smaller_cluster(spark):
    # two reps with IDENTICAL text -> identical jaccard; smaller cluster wins
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    reps = spark.createDataFrame(
        [(7, 70, txt), (3, 30, txt)],
        "cluster_id long, rep_id long, rep_text string",
    )
    new = _docs(spark, [(500, txt)])
    row = incremental.link_increment(
        reps, new, "doc_id", "text", min_jaccard_pct=50
    ).collect()[0]
    assert row["matched"] and row["cluster_id"] == 3
    assert row["best_jac_e4"] == 10000


def test_link_increment_hot_key_cap_drops_boilerplate(spark):
    # many reps sharing one boilerplate text: with the cap below the rep
    # count, every band key they emit is dropped -> no candidates -> mint
    boiler = "one two three four five six seven eight nine ten"
    reps = spark.createDataFrame(
        [(i, i, boiler) for i in range(1, 12)],
        "cluster_id long, rep_id long, rep_text string",
    )
    new = _docs(spark, [(900, boiler)])
    row = incremental.link_increment(
        reps, new, "doc_id", "text", min_jaccard_pct=50, max_rep_key_df=5
    ).collect()[0]
    assert not row["matched"]  # bounded-compute trade, documented


def _cc_brute(edges, nodes):
    """Union-find over explicit edges; returns {node: min-id component}."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_merge_components_equals_full_recompute(spark):
    # property: CC(star(CC(E1)) ∪ E2) == CC(E1 ∪ E2), several seeds
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        nodes = list(range(1, 31))
        e1 = [tuple(rng.sample(nodes, 2)) for _ in range(18)]
        e2 = [tuple(rng.sample(nodes, 2)) for _ in range(7)]
        lab1 = _cc_brute(e1, nodes)
        labels = spark.createDataFrame(
            [(n, c) for n, c in lab1.items()], "node long, component long"
        )
        delta = spark.createDataFrame(e2, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in incremental.merge_components(labels, delta).collect()
        }
        want = _cc_brute(e1 + e2, nodes)
        assert got == want, seed


def test_merge_components_keeps_singletons(spark):
    labels = spark.createDataFrame(
        [(1, 1), (2, 2), (5, 5)], "node long, component long"
    )
    delta = spark.createDataFrame([(2, 5)], "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in incremental.merge_components(labels, delta).collect()
    }
    assert got == {1: 1, 2: 2, 5: 2}


def _brute_pair_metrics(pred, truth):
    nodes = sorted(set(pred) & set(truth))
    tp = pp = tg = 0
    for a, b in itertools.combinations(nodes, 2):
        same_p = pred[a] == pred[b]
        same_t = truth[a] == truth[b]
        tp += same_p and same_t
        pp += same_p
        tg += same_t
    prec = tp / pp if pp else 0.0
    rec = tp / tg if tg else 0.0
    f1 = 2 * tp / (pp + tg) if (pp + tg) else 0.0
    return tp, pp, tg, prec, rec, f1


def test_cluster_pair_metrics_brute_force(spark):
    pred = {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5, 7: 7}
    truth = {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7}
    p = spark.createDataFrame(list(pred.items()), "node long, component long")
    t = spark.createDataFrame(list(truth.items()), "node long, component long")
    row = incremental.cluster_pair_metrics(p, t).collect()[0]
    tp, pp, tg, prec, rec, f1 = _brute_pair_metrics(pred, truth)
    assert (row["tp"], row["pred_pairs"], row["true_pairs"]) == (tp, pp, tg)
    assert row["precision"] == prec
    assert row["recall"] == rec
    assert row["f1"] == f1


def test_cluster_pair_metrics_perfect_and_empty(spark):
    lab = {1: 1, 2: 1, 3: 3}
    p = spark.createDataFrame(list(lab.items()), "node long, component long")
    row = incremental.cluster_pair_metrics(p, p).collect()[0]
    assert row["precision"] == row["recall"] == row["f1"] == 1.0
    # all-singleton vs all-singleton: zero pairs everywhere -> 0.0 by convention
    s = spark.createDataFrame([(i, i) for i in (1, 2, 3)], "node long, component long")
    row = incremental.cluster_pair_metrics(s, s).collect()[0]
    assert (row["tp"], row["precision"], row["f1"]) == (0, 0.0, 0.0)


def test_isolated_new_doc_components_round_trip(spark):
    # a minted singleton then merged with a later delta edge joins clusters
    labels = spark.createDataFrame([(1, 1)], "node long, component long")
    delta = spark.createDataFrame(
        [(incremental.NEW_CLUSTER_OFFSET + 9, 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in incremental.merge_components(labels, delta).collect()
    }
    assert got[incremental.NEW_CLUSTER_OFFSET + 9] == 1


# --- B-cubed metrics ----------------------------------------------------------


def _brute_bcubed(pred, truth):
    """Per-record replica with the SAME per-cell micro floor contract."""
    from collections import Counter

    t_of = dict(truth)
    cells = Counter((p, t_of[n]) for n, p in pred if n in t_of)
    c_p = Counter()
    c_t = Counter()
    for (p, t), c in cells.items():
        c_p[p] += c
        c_t[t] += c
    ps = sum((c * c * 1_000_000) // c_p[p] for (p, t), c in cells.items())
    rs = sum((c * c * 1_000_000) // c_t[t] for (p, t), c in cells.items())
    n = sum(cells.values())
    bp, br = ps // n, rs // n
    f1 = (2 * bp * br) // (bp + br) if bp + br else 0
    return (n, bp, br, f1)


def test_bcubed_matches_replica_and_separates_from_pairwise(spark):
    # classic case: predicted lumps two truth clusters of 4 into one of 8
    # plus 4 correct singletons; B^3 penalizes the lump per-record
    pred = [(i, 100) for i in range(8)] + [(i, i) for i in range(8, 12)]
    truth = [(i, 0) for i in range(4)] + [(i, 1) for i in range(4, 8)] + [
        (i, i) for i in range(8, 12)
    ]
    pdf = spark.createDataFrame(pred, "node long, component long")
    tdf = spark.createDataFrame(truth, "node long, component long")
    [r] = incremental.bcubed_metrics(pdf, tdf).collect()
    got = (r["n_nodes"], r["b3p_micro"], r["b3r_micro"], r["b3f1_micro"])
    assert got == _brute_bcubed(pred, truth)
    # B^3 precision: 8 lumped records at 4/8 each + 4 perfect = 2/3 overall
    assert got[1] == 666_666
    assert got[2] == 1_000_000  # recall perfect: every truth mate co-lives


def test_bcubed_perfect_and_degenerate(spark):
    rows = [(1, 5), (2, 5), (3, 9)]
    df = spark.createDataFrame(rows, "node long, component long")
    [r] = incremental.bcubed_metrics(df, df).collect()
    assert (r["b3p_micro"], r["b3r_micro"], r["b3f1_micro"]) == (
        1_000_000, 1_000_000, 1_000_000
    )
    # disjoint node universes -> empty join -> zero row, no crash
    other = spark.createDataFrame([(99, 1)], "node long, component long")
    [z] = incremental.bcubed_metrics(df, other).collect()
    assert (z["n_nodes"], z["b3f1_micro"]) == (0, 0)


# --- ARI / Fowlkes-Mallows ----------------------------------------------------


def _brute_ari(pred, truth):
    """Replica using the SAME IEEE double op sequence as _ARI_TAIL."""
    import math
    from collections import Counter

    t_of = dict(truth)
    cells = Counter((p, t_of[n]) for n, p in pred if n in t_of)
    c_p, c_t = Counter(), Counter()
    for (p, t), c in cells.items():
        c_p[p] += c
        c_t[t] += c
    idx2 = sum(c * (c - 1) for c in cells.values())
    sa2 = sum(c * (c - 1) for c in c_p.values())
    sb2 = sum(c * (c - 1) for c in c_t.values())
    n = sum(cells.values())
    if n < 2:
        ari = 1_000_000
    else:
        t2 = n * (n - 1)
        exp = float(sa2) * float(sb2) / float(t2)
        den = (float(sa2) + float(sb2)) / 2.0 - exp
        num = float(idx2) - exp
        if den == 0.0:
            ari = 1_000_000 if num == 0.0 else 0
        else:
            ari = int(math.floor(num * 1_000_000.0 / den))
    fm = (
        0 if idx2 == 0
        else int(math.floor(
            float(idx2) * 1_000_000.0 / math.sqrt(float(sa2) * float(sb2))
        ))
    )
    return (n, idx2, sa2, sb2, ari, fm)


def _ari_row(spark, pred, truth):
    pdf = spark.createDataFrame(pred, "node long, component long")
    tdf = spark.createDataFrame(truth, "node long, component long")
    [r] = incremental.ari_metrics(pdf, tdf).collect()
    return (
        r["n_nodes"], r["both_pairs2"], r["pred_pairs2"], r["truth_pairs2"],
        r["ari_micro"], r["fm_micro"],
    )


def test_ari_matches_replica_and_chance_corrects(spark):
    # the lump case: pair RECALL is perfect but ARI discounts the merge
    pred = [(i, 100) for i in range(8)] + [(i, i) for i in range(8, 12)]
    truth = [(i, 0) for i in range(4)] + [(i, 1) for i in range(4, 8)] + [
        (i, i) for i in range(8, 12)
    ]
    got = _ari_row(spark, pred, truth)
    assert got == _brute_ari(pred, truth)
    assert 0 < got[4] < 1_000_000  # penalized but better than chance

    # degenerate one-big-cluster prediction: pair recall 1, ARI ~ 0
    lump = [(i, 0) for i in range(12)]
    lumped = _ari_row(spark, lump, truth)
    assert lumped == _brute_ari(lump, truth)
    assert lumped[4] < 220_000

    # all-singleton prediction: exactly chance-level agreement -> 0
    single = [(i, i) for i in range(12)]
    assert _ari_row(spark, single, truth)[4] == 0


def test_ari_perfect_negative_and_empty(spark):
    truth = [(0, 0), (1, 0), (2, 1), (3, 1)]
    assert _ari_row(spark, truth, truth)[4] == 1_000_000
    # anti-correlated prediction: worse than chance -> negative micro
    anti = [(0, 0), (2, 0), (1, 1), (3, 1)]
    got = _ari_row(spark, anti, truth)
    assert got == _brute_ari(anti, truth)
    assert got[4] == -500_000
    # both trivial one-cluster partitions -> den == 0, num == 0 -> 1.0
    one = [(i, 7) for i in range(4)]
    assert _ari_row(spark, one, one)[4] == 1_000_000
    # disjoint node universes -> n = 0 -> conventionally identical
    other = [(99, 1)]
    n, i2, a2, b2, ari, fm = _ari_row(spark, truth, other)
    assert (n, ari, fm) == (0, 1_000_000, 0)


def test_ari_replica_on_seeded_random_labelings(spark):
    import random

    rng = random.Random(41)
    for trial in range(4):
        n = 60
        pred = [(i, rng.randrange(1 + trial * 3)) if trial else (i, i)
                for i in range(n)]
        truth = [(i, rng.randrange(5)) for i in range(n)]
        assert _ari_row(spark, pred, truth) == _brute_ari(pred, truth)


# --- stable cluster-id relabeling -----------------------------------------------


def _brute_relabel(new, old, offset=incremental.NEW_CLUSTER_OFFSET):
    from collections import Counter

    o_of = dict(old)
    cells = Counter((c, o_of[n]) for n, c in new if n in o_of)
    fwd = {}
    for (nc, oc), ov in cells.items():
        cur = fwd.get(nc)
        if cur is None or (ov, -oc) > (cur[1], -cur[0]):
            fwd[nc] = (oc, ov)
    bwd = {}
    for (nc, oc), ov in cells.items():
        cur = bwd.get(oc)
        if cur is None or (ov, -nc) > (cur[1], -cur[0]):
            bwd[oc] = (nc, ov)
    nsize = Counter(c for _, c in new)
    osize = Counter(c for _, c in old)
    out = {}
    for nc, size in nsize.items():
        if nc in fwd:
            oc, ov = fwd[nc]
            if bwd[oc][0] == nc:
                out[nc] = (oc, oc, ov, size, osize[oc], "carried")
            else:
                out[nc] = (nc + offset, oc, ov, size, osize[oc], "split")
        else:
            out[nc] = (nc + offset, -1, 0, size, -1, "new")
    return out


def _relabel_rows(spark, new, old):
    ndf = spark.createDataFrame(new, "node long, component long")
    odf = spark.createDataFrame(old, "node long, component long")
    return {
        r["new_cluster"]: (
            r["stable_id"], r["matched_old"], r["overlap"], r["new_size"],
            r["old_size"], r["status"],
        )
        for r in incremental.stable_relabel(ndf, odf).collect()
    }


def test_stable_relabel_carried_split_new(spark):
    old = [(i, 10) for i in range(5)] + [(i, 20) for i in range(5, 10)]
    new = (
        [(i, 100) for i in range(3)] + [(i, 101) for i in (3, 4)]  # split
        + [(i, 200) for i in range(5, 10)] + [(12, 200)]           # carried
        + [(20, 300), (21, 300)]                                    # new
    )
    got = _relabel_rows(spark, new, old)
    assert got == _brute_relabel(new, old)
    assert got[100][5] == "carried" and got[100][0] == 10
    assert got[101][5] == "split" and got[101][0] == 101 + incremental.NEW_CLUSTER_OFFSET
    assert got[200] == (20, 20, 5, 6, 5, "carried")
    assert got[300] == (300 + incremental.NEW_CLUSTER_OFFSET, -1, 0, 2, -1, "new")
    # stable ids are unique (the carried/minted contract)
    ids = [v[0] for v in got.values()]
    assert len(ids) == len(set(ids))


def test_stable_relabel_merge_and_tiebreak(spark):
    # two old clusters of equal overlap merged into one new cluster:
    # mutual argmax ties break to the SMALLER old id
    old = [(0, 7), (1, 7), (2, 3), (3, 3)]
    new = [(i, 50) for i in range(4)]
    got = _relabel_rows(spark, new, old)
    assert got == _brute_relabel(new, old)
    assert got[50][5] == "carried" and got[50][0] == 3
    # replica agreement on seeded random clusterings (incl. partial overlap)
    import random

    rng = random.Random(23)
    for _ in range(3):
        old_r = [(i, rng.randrange(6) * 10) for i in range(40)]
        new_r = [(i, rng.randrange(8)) for i in range(5, 45)]
        assert _relabel_rows(spark, new_r, old_r) == _brute_relabel(
            new_r, old_r
        )


# --- pair PR curve --------------------------------------------------------------


def _brute_pr(scored, truth, ths):
    w_of = {(a, b): w for a, b, w in scored}
    universe = set(w_of) | set(truth)
    out = {}
    n_true = len(truth)
    for i, t in enumerate(ths, start=1):
        pred = {p for p in universe if p in w_of and w_of[p] >= t}
        tp = len(pred & set(truth))
        fp = len(pred) - tp
        fn = n_true - tp
        prec = (tp * 1_000_000) // (tp + fp) if tp + fp else 0
        rec = (tp * 1_000_000) // n_true if n_true else 0
        f1 = (2 * prec * rec) // (prec + rec) if prec + rec else 0
        out[i] = (tp, fp, fn, prec, rec, f1)
    return out


def test_pair_pr_curve_matches_replica_and_counts_blocking_misses(spark):
    import random

    rng = random.Random(31)
    scored = [
        (a, a + 1 + rng.randrange(5), round(rng.uniform(-4, 9), 3))
        for a in range(0, 120, 2)
    ]
    scored = [(a, b, w) for a, b, w in scored if a < b]
    truth = [(a, b) for a, b, w in scored if w > 2.0 or rng.random() < 0.2]
    truth += [(500, 501), (502, 503)]  # unscored truth: blocking misses
    ths = (-2.0, 0.0, 2.0, 5.0)
    sdf = spark.createDataFrame(scored, "id_a long, id_b long, w double")
    tdf = spark.createDataFrame(truth, "id_a long, id_b long")
    got = {
        r["thr_idx"]: (
            r["tp"], r["fp"], r["fn"], r["prec_micro"], r["rec_micro"],
            r["f1_micro"],
        )
        for r in incremental.pair_pr_curve(sdf, tdf, ths).collect()
    }
    assert got == _brute_pr(scored, truth, ths)
    # blocking misses hold recall below 1 even at the loosest threshold
    assert got[1][2] >= 2
    # monotone: precision non-decreasing is NOT guaranteed, but predicted
    # count (tp+fp) must be non-increasing in the threshold
    pred_counts = [got[i][0] + got[i][1] for i in sorted(got)]
    assert pred_counts == sorted(pred_counts, reverse=True)


def test_pair_pr_curve_empty_truth_and_perfect(spark):
    scored = [(1, 2, 3.0), (3, 4, -1.0)]
    sdf = spark.createDataFrame(scored, "id_a long, id_b long, w double")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["thr_idx"]: (r["tp"], r["fp"], r["rec_micro"])
        for r in incremental.pair_pr_curve(sdf, empty, (0.0,)).collect()
    }
    assert got == {1: (0, 1, 0)}
    perfect = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = incremental.pair_pr_curve(sdf, perfect, (0.0,)).collect()
    assert (r["tp"], r["fp"], r["fn"], r["f1_micro"]) == (1, 0, 0, 1_000_000)


def test_pr_bootstrap_properties(spark):
    """Poisson-bootstrap replicates: a pure-Python replay of the hash
    channel on a hand pair set."""
    import hashlib

    from bayesianrecordlinkage_jl_spark.operators import incremental as I_

    pred = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (4, 5), (8, 9)], "id_a long, id_b long"
    )
    got = {
        r["rep"]: (r["tp"], r["n_pred"], r["n_true"])
        for r in I_.pr_bootstrap_replicates(pred, truth, n_reps=8).collect()
    }
    cuts = I_._poisson1_cuts()

    def w(rep, nid):
        u = int(
            hashlib.md5(f"{I_.BOOTSTRAP_SALT}:{rep}:{nid}".encode())
            .hexdigest()[:15], 16
        ) % 1_000_000
        for k, c in enumerate(cuts):
            if u < c:
                return k
        return 6

    P = [(1, 2), (2, 3), (4, 5), (6, 7)]
    T = [(1, 2), (4, 5), (8, 9)]
    B = [p for p in P if p in T]
    for rep in range(8):
        want = (
            sum(w(rep, a) * w(rep, b) for a, b in B),
            sum(w(rep, a) * w(rep, b) for a, b in P),
            sum(w(rep, a) * w(rep, b) for a, b in T),
        )
        assert got[rep] == want, (rep, got[rep], want)
    # mean Poisson weight ~1: total replicate mass stays near the point
    # counts (loose sanity, deterministic)
    import statistics

    assert 0.3 * len(P) <= statistics.mean(
        g[1] for g in got.values()
    ) <= 3 * len(P)


def test_entity_disjoint_splits(spark):
    """Same cluster -> same split (never straddles); hash replica;
    rough proportions on many clusters."""
    import hashlib

    from bayesianrecordlinkage_jl_spark.operators import incremental as I_

    rows = [(i, i // 3) for i in range(3000)]  # 1000 clusters of 3
    df = spark.createDataFrame(rows, "node long, component long")
    got = I_.entity_disjoint_splits(df).toPandas()
    per_cluster = got.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()

    def bucket(cid):
        return int(
            hashlib.md5(f"{I_.SPLIT_SALT}:{cid}".encode()).hexdigest()[:15],
            16,
        ) % 100

    for r in got.head(50).itertuples():
        assert r.bucket == bucket(r.cluster_id)
        want = "train" if r.bucket < 80 else ("val" if r.bucket < 90 else "test")
        assert r.split == want
    frac = got.drop_duplicates("cluster_id")["split"].value_counts(
        normalize=True
    )
    assert 0.7 < frac["train"] < 0.9
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15
