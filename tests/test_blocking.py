"""Blocking operators: key blocking, LSH blocking recall, hot-key salting
block-size caps, and pair-orientation invariants."""

import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import blocking
from bayesianrecordlinkage_jl_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def docs(spark):
    pages = generate_pages(spark, n_clusters=120)
    return pages.select(
        F.monotonically_increasing_id().alias("rid"),
        "url", "text", "lang", "host", "cluster_id",
    ).localCheckpoint()


def test_key_blocking_pairs_oriented_and_complete(spark, docs):
    pairs = blocking.key_blocking(docs, "rid", ["lang"])
    assert pairs.where(F.col("id_a") >= F.col("id_b")).count() == 0
    # per-key pair count == n*(n-1)/2
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r["block_key"]: r["n_pairs"]
        for r in blocking.block_pair_stats(pairs).collect()
    }
    for lang, n in sizes.items():
        expected = n * (n - 1) // 2
        if expected:
            assert got[lang] == expected


def test_lsh_blocking_finds_planted_duplicates(spark, docs):
    """Cluster members are near-duplicates (one typo + one swapped token of
    40) — LSH with 1-row bands must recover a large majority of the
    within-cluster pairs without the cross product."""
    pairs = blocking.lsh_blocking(
        docs, "rid", "text", n_bands=6, rows_per_band=1, carry_cols=["cluster_id"]
    )
    n_docs = docs.count()
    n_pairs = pairs.count()
    assert n_pairs < n_docs * (n_docs - 1) // 4  # nowhere near cross product
    truth = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("a.cluster_id") == F.col("b.cluster_id"))
        .where(F.col("a.rid") < F.col("b.rid"))
        .count()
    )
    found = pairs.where(F.col("cluster_id_a") == F.col("cluster_id_b")).count()
    assert truth > 0
    assert found / truth >= 0.8


def test_salt_hot_keys_caps_block_sizes(spark, docs):
    cap = 8
    salted = blocking.salt_hot_keys(docs, "rid", ["lang"], max_block_rows=cap)
    sizes = (
        salted.groupBy("lang", "_salt").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    # deterministic hash split: buckets hold ~cap rows; allow hash variance
    assert max(r["n"] for r in sizes) <= int(cap * 2.5)
    # salting preserves every row exactly once
    assert salted.count() == docs.count()
    # salted key blocking caps per-block PAIR counts
    pairs = blocking.key_blocking(salted, "rid", ["lang", "_salt"])
    stats = blocking.block_pair_stats(pairs).collect()
    mx = int(cap * 2.5)
    assert max(r["n_pairs"] for r in stats) <= mx * (mx - 1) // 2


def test_salting_deterministic(spark, docs):
    a = blocking.salt_hot_keys(docs, "rid", ["host"], 16).select("rid", "_salt")
    b = blocking.salt_hot_keys(docs, "rid", ["host"], 16).select("rid", "_salt")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# --- TF-adjusted agreement pairs -----------------------------------------------


def _brute_tf(rows, m=0.95, cap_bits=10, max_value_df=200):
    """Replica of tf_weighted_agreement_pairs on (id, lang, source, value)."""
    import math
    from collections import Counter

    live = [r for r in rows if r[3]]
    n = len(live)
    dfv = Counter(v for *_, v in live)
    base = int(round(math.log(m) * 1_000_000))
    out = {}
    for i, (ia, la, sa, va) in enumerate(live):
        for ib, lb, sb, vb in live[i + 1:]:
            if (la, sa, va) != (lb, sb, vb) or dfv[va] > max_value_df:
                continue
            lo, hi = min(ia, ib), max(ia, ib)
            bits = min(int(math.floor(math.log2(n // dfv[va]))), cap_bits)
            out[(lo, hi)] = (va, dfv[va], n, bits, base + bits * 693_147)
    return out


def test_tf_agreement_matches_replica_and_orders_by_rarity(spark):
    rows = (
        [(i, "en", "web", "john") for i in range(9)]
        + [(10, "en", "web", "zbigniew"), (11, "en", "web", "zbigniew")]
        + [(20, "en", "web", "mary"), (21, "en", "web", "mary"),
           (22, "en", "web", "mary")]
        + [(30, "fr", "web", "john")]          # other block: no pair
        + [(40, "en", "web", "")]               # empty value: excluded
        + [(41, "en", "web", "alone")]          # df=1: no pair
    )
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, name string"
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["value"], r["df_v"], r["n_docs"], r["surprisal_bits"],
            r["w_tf_micro"],
        )
        for r in blocking.tf_weighted_agreement_pairs(
            df, "doc_id", F.col("name"), block_cols=("lang", "source")
        ).collect()
    }
    assert got == _brute_tf(rows)
    # rarity ordering: zbigniew (df 2) outweighs mary (df 3) outweighs john
    w = {got[k][0]: got[k][4] for k in got}
    assert w["zbigniew"] > w["mary"] > w["john"]


def test_tf_agreement_hot_value_dropped_and_bits_capped(spark):
    rows = [(i, "en", "web", "hot") for i in range(10)] + [
        (100, "en", "web", "rare"), (101, "en", "web", "rare")
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, name string"
    )
    out = blocking.tf_weighted_agreement_pairs(
        df, "doc_id", F.col("name"), block_cols=("lang", "source"),
        max_value_df=5, cap_bits=2,
    ).collect()
    # hot value (df 10 > 5) contributes NO pairs; rare pair capped at 2 bits
    assert len(out) == 1
    [r] = out
    assert (r["value"], r["df_v"], r["surprisal_bits"]) == ("rare", 2, 2)
    assert r["w_tf_micro"] == _brute_tf(rows, cap_bits=2, max_value_df=5)[
        (100, 101)
    ][4]


# --- canopy clustering ----------------------------------------------------------


def _brute_canopy(rows, t1, t2, rounds=10):
    import hashlib
    from collections import defaultdict

    loose = defaultdict(dict)
    tight = defaultdict(set)
    for a, b, s in rows:
        if s >= t1:
            loose[a][b] = s
            loose[b][a] = s
        if s >= t2:
            tight[a].add(b)
            tight[b].add(a)
    key = {
        v: hashlib.md5(f"cn|{v}".encode()).hexdigest()[:15]
        + "|" + str(v).zfill(19)
        for v in loose
    }
    active = set(loose)
    out = set()
    for r in range(1, rounds + 1):
        if not active:
            break
        ctr = {
            v for v in active
            if all(key[v] < key[u] for u in tight[v] if u in active)
        }
        rem = set(ctr)
        for c in ctr:
            out.add((c, c, -1, r))
            for u, s in loose[c].items():
                if u in active:
                    out.add((c, u, s, r))
            for u in tight[c]:
                if u in active:
                    rem.add(u)
        active -= rem
    for v in active:
        out.add((v, v, -1, -1))
    return out


def _canopy_rows(spark, rows, t1, t2, rounds=10):
    df = spark.createDataFrame(rows, "id_a long, id_b long, sim long")
    return {
        (r["canopy"], r["node"], r["sim"], r["assigned_round"])
        for r in blocking.canopy_clusters(
            df, t1, t2, sim_col="sim", rounds=rounds
        ).collect()
    }


def test_canopy_matches_replica_and_overlaps(spark):
    import random

    rng = random.Random(12)
    edges = sorted({
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(40), rng.randrange(40)) for _ in range(90))
        if a != b
    })
    rows = [(a, b, rng.randrange(20, 100)) for a, b in edges]
    got = _canopy_rows(spark, rows, 30, 60)
    assert got == _brute_canopy(rows, 30, 60)
    loose_nbr = {}
    for a, b, s in rows:
        if s >= 30:
            loose_nbr.setdefault(a, set()).add(b)
            loose_nbr.setdefault(b, set()).add(a)
    tight = {(min(a, b), max(a, b)) for a, b, s in rows if s >= 60}
    centers = {c for c, n, s, r in got if c == n and r != -1}
    # every member is loose-adjacent to its center; centers never
    # tight-adjacent; every loose node lands in >= 1 canopy
    for c, n, s, r in got:
        if c != n:
            assert n in loose_nbr[c]
    for a, b in tight:
        assert not (a in centers and b in centers)
    covered = {n for _, n, _, _ in got}
    assert covered == set(loose_nbr)
    # the loose/tight gap produces genuine overlap on this fixture
    from collections import Counter

    memb = Counter(n for c, n, s, r in got)
    assert max(memb.values()) >= 2


def test_canopy_two_entity_bridge_lands_in_both(spark):
    # u is loose-close to both centers a and d, tight to neither: the
    # record-near-two-entities case single-assignment blocking loses
    rows = [(1, 2, 90), (4, 5, 90), (1, 3, 40), (2, 3, 40),
            (3, 4, 40), (3, 5, 40)]
    got = _canopy_rows(spark, rows, 30, 60)
    assert got == _brute_canopy(rows, 30, 60)
    canopies_of_3 = {c for c, n, _, _ in got if n == 3 and c != 3}
    assert len(canopies_of_3) == 2


# --- blocking-rule learning (greedy weighted set cover) ---------------------


def _replica_select(mask_rows, pos_rows, bits):
    """Pure-Python replica of select_blocking_rules' greedy."""
    masks = {(a, b): m for a, b, m in mask_rows}
    hist = {}
    for p in pos_rows:
        m = masks.get(p, 0)
        hist[m] = hist.get(m, 0) + 1
    costs = {
        b: sum(1 for m in masks.values() if m & b) for b in bits
    }
    out, chosen, cum = [], 0, 0
    for step in range(1, len(bits) + 1):
        cands = []
        for b in sorted(bits):
            if b & chosen:
                continue
            gain = sum(n for m, n in hist.items() if (m & b) and not (m & chosen))
            cands.append((-gain, costs[b], b))
        if not cands:
            break
        ng, cost, bit = min(cands)
        if ng == 0:
            break
        cum += -ng
        out.append((step, bit, -ng, cum, cost))
        chosen |= bit
    return out


def _run_select(spark, mask_rows, pos_rows, bits):
    masks = spark.createDataFrame(
        mask_rows, "id_a long, id_b long, rule_mask int"
    )
    pos = spark.createDataFrame(pos_rows, "id_a long, id_b long")
    out = blocking.select_blocking_rules(masks, pos, bits).toPandas()
    return [tuple(int(x) for x in r) for r in out.itertuples(index=False)]


def test_select_blocking_rules_known_answer(spark):
    """Rule 1 covers 3 positives (cost 4), rule 2 covers 2 (cost 2), rule 4
    covers the same 2 as rule 2 plus nothing new. Greedy: pick 1 (gain 3),
    then 2 (gain 2, cheaper than 4 at equal gain), then stop (4 adds 0)."""
    mask_rows = [
        (1, 2, 1), (1, 3, 1), (1, 4, 1), (1, 5, 1),  # rule 1 pairs
        (2, 3, 2 | 4), (2, 4, 2 | 4),                # rules 2+4 overlap
    ]
    pos_rows = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (9, 10)]
    got = _run_select(spark, mask_rows, pos_rows, [1, 2, 4])
    assert got == [(1, 1, 3, 3, 4), (2, 2, 2, 5, 2)]


def test_select_blocking_rules_no_coverage_is_empty(spark):
    got = _run_select(spark, [(1, 2, 1)], [(5, 6)], [1, 2, 4])
    assert got == []


@pytest.mark.parametrize("seed", range(6))
def test_select_blocking_rules_matches_replica(spark, seed):
    import numpy as np

    rng = np.random.default_rng(8800 + seed)
    bits = [1, 2, 4, 8][: int(rng.integers(2, 5))]
    mask_rows = []
    seen = set()
    for _ in range(int(rng.integers(5, 40))):
        a, b = sorted(rng.integers(0, 15, size=2))
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        m = int(rng.integers(1, 2 ** len(bits)))
        mask_rows.append((int(a), int(b), m))
    pos_rows = []
    pseen = set()
    for _ in range(int(rng.integers(3, 25))):
        a, b = sorted(rng.integers(0, 15, size=2))
        if a == b or (a, b) in pseen:
            continue
        pseen.add((a, b))
        pos_rows.append((int(a), int(b)))
    if not mask_rows or not pos_rows:
        return
    got = _run_select(spark, mask_rows, pos_rows, bits)
    want = _replica_select(
        [(a, b, m) for a, b, m in mask_rows],
        [(a, b) for a, b in pos_rows],
        bits,
    )
    assert got == want, (mask_rows, pos_rows, bits)
