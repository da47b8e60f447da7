"""Semantics tests for the exact similarity joins (operators/simjoin.py):
brute-force replicas on hand-built fixtures. Cross-engine value parity is
covered by test_oracle_parity (tf_cosine_pairs / edit_similarity_pairs)."""

import itertools
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import simjoin

TOK = re.compile(r"[^a-z0-9]+")


def _toks(s):
    return [t for t in TOK.split(s.lower()) if t]


# --- tf_cosine_pairs --------------------------------------------------------


def _brute_cosine(rows, min_cos2_e4, min_df, max_df):
    tf = {i: Counter(_toks(t)) for i, t in rows}
    df = Counter(t for c in tf.values() for t in c)
    vocab = {t for t, n in df.items() if min_df <= n <= max_df}
    kept = {i: {t: n for t, n in c.items() if t in vocab} for i, c in tf.items()}
    out = {}
    for a, b in itertools.combinations(sorted(kept), 2):
        dot = sum(kept[a][t] * kept[b][t] for t in kept[a] if t in kept[b])
        if dot == 0:
            continue
        na = sum(v * v for v in kept[a].values())
        nb = sum(v * v for v in kept[b].values())
        cos2 = (dot * dot * simjoin.COS_SCALE) // (na * nb)
        if cos2 >= min_cos2_e4:
            out[(a, b)] = (dot, na, nb, cos2)
    return out


def test_tf_cosine_matches_brute_force(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "alpha beta gamma delta"),
        (3, "epsilon zeta eta theta"),
        (4, "epsilon zeta eta theta iota"),
        (5, "alpha alpha beta beta gamma gamma"),
        (6, "completely different words here"),
    ]
    df = spark.createDataFrame(rows, ["rid", "txt"])
    got = {
        (r["id_a"], r["id_b"]): (r["dot"], r["norm2_a"], r["norm2_b"], r["cos2_e4"])
        for r in simjoin.tf_cosine_pairs(
            df, "rid", "txt", min_cos2_e4=1000, min_df=2, max_df=10
        ).collect()
    }
    assert got == _brute_cosine(rows, 1000, 2, 10)


def test_tf_cosine_identical_docs_hit_scale(spark):
    rows = [(1, "x y z x"), (2, "x y z x"), (3, "x q")]
    df = spark.createDataFrame(rows, ["rid", "txt"])
    got = {r["id_a"]: r for r in simjoin.tf_cosine_pairs(
        df, "rid", "txt", min_cos2_e4=9999, min_df=2, max_df=10
    ).collect()}
    # identical tf vectors over the kept vocab -> cos^2 = 1.0 exactly
    assert got[1]["id_b"] == 2 and got[1]["cos2_e4"] == simjoin.COS_SCALE


def test_tf_cosine_stop_term_cap_bounds_pairs(spark):
    # 'common' appears in every doc; with max_df=3 it is dropped, so the
    # only surviving pair is the one sharing a rare term
    rows = [(i, f"common uniq{i}") for i in range(1, 8)]
    rows += [(8, "common rare"), (9, "common rare")]
    df = spark.createDataFrame(rows, ["rid", "txt"])
    got = simjoin.tf_cosine_pairs(
        df, "rid", "txt", min_cos2_e4=1, min_df=2, max_df=3
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(8, 9)}


# --- edit_similarity_pairs --------------------------------------------------


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def _brute_edit(rows, d, q):
    """Pairs the operator must return: lev <= d AND the gram-overlap lower
    bound max(|Ga|,|Gb|) - d*q is >= 1 (pairs below it can share zero
    grams and are out of the postings-join contract)."""
    out = {}
    for (a, ka), (b, kb) in itertools.combinations(sorted(rows), 2):
        bound = max(max(len(ka), len(kb)) - (q - 1), 0) - d * q
        if bound < 1:
            continue
        lv = _lev(ka, kb)
        if lv <= d and abs(len(ka) - len(kb)) <= d:
            out[(a, b)] = (len(ka), len(kb), lv)
    return out


@pytest.mark.parametrize("d", [1, 2, 3])
def test_edit_join_matches_brute_force(spark, d):
    rows = [
        (1, "spark structured streaming"),
        (2, "spark structured streamign"),   # transposed tail (2 subs)
        (3, "spark structured streaming x"), # 2 appended chars
        (4, "sparkструкured"),               # short + non-ascii noise
        (5, "flink structured streaming"),
        (6, "spark structured streaming"),   # exact dup of 1
        (7, "totally unrelated key text"),
    ]
    df = spark.createDataFrame(rows, ["rid", "k"])
    got = {
        (r["id_a"], r["id_b"]): (r["len_a"], r["len_b"], r["lev"])
        for r in simjoin.edit_similarity_pairs(
            df, "rid", F.col("k"), max_dist=d, q=2
        ).collect()
    }
    assert got == _brute_edit(rows, d, 2)


def test_edit_join_never_exceeds_band(spark):
    rows = [(i, f"prefix shared key {i % 4}{i}") for i in range(30)]
    df = spark.createDataFrame(rows, ["rid", "k"])
    got = simjoin.edit_similarity_pairs(
        df, "rid", F.col("k"), max_dist=2, q=2
    ).collect()
    assert got and all(0 <= r["lev"] <= 2 for r in got)
    assert all(abs(r["len_a"] - r["len_b"]) <= 2 for r in got)


def test_edit_join_survives_hot_grams(spark):
    """Every gram in the corpus is hot (shared by all 40 keys), yet true
    near pairs must still surface — the property a df-capped count filter
    silently breaks (prefix filtering needs no vocabulary cap)."""
    base = "aa" * 10
    rows = [(i, base) for i in range(1, 40)] + [(40, base[:-1] + "b")]
    df = spark.createDataFrame(rows, ["rid", "k"])
    got = {
        (r["id_a"], r["id_b"]): (r["len_a"], r["len_b"], r["lev"])
        for r in simjoin.edit_similarity_pairs(
            df, "rid", F.col("k"), max_dist=1, q=2
        ).collect()
    }
    assert got == _brute_edit(rows, 1, 2)
    assert got[(1, 40)][2] == 1  # the genuine edit pair, through hot grams


def test_edit_join_kernel_evaluates_once(spark):
    """The banded levenshtein must appear exactly once in the optimized
    plan (pair-key aggregate barrier stops filter inlining)."""
    rows = [(1, "abcdefgh"), (2, "abcdefgx"), (3, "abcdefgy")]
    df = spark.createDataFrame(rows, ["rid", "k"])
    out = simjoin.edit_similarity_pairs(
        df, "rid", F.col("k"), max_dist=2, q=2
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("levenshtein") == 1, plan


# ---------------------------------------------------------------------------
# Monge-Elkan token-set comparator
# ---------------------------------------------------------------------------


def _brute_monge_elkan(rows, max_tokens):
    """Pure-Python replica: lexicographic first-K distinct tokens, scalar
    JW reference kernel, integer micro floor at every stage."""
    from bayesianrecordlinkage_jl_spark.functions.comparators import (
        _jaro_winkler,
    )

    toks = {
        i: sorted(set(_toks(t)))[:max_tokens] for i, t, _ in rows
    }
    blocks = {}
    for i, _, blk in rows:
        blocks.setdefault(blk, []).append(i)
    out = {}
    for members in blocks.values():
        for a, b in itertools.combinations(sorted(members), 2):
            ta, tb = toks[a], toks[b]
            if not ta or not tb:
                continue
            jw = {
                (x, y): int(math.floor(
                    (1.0 if x == y else _jaro_winkler(x, y)) * 1e6))
                for x in ta for y in tb
            }
            s_ab = sum(max(jw[(x, y)] for y in tb) for x in ta)
            s_ba = sum(max(jw[(x, y)] for x in ta) for y in tb)
            me_ab = int(math.floor(s_ab / len(ta)))
            me_ba = int(math.floor(s_ba / len(tb)))
            out[(a, b)] = (
                len(ta), len(tb), me_ab, me_ba, (me_ab + me_ba) // 2
            )
    return out


def test_monge_elkan_matches_brute_force(spark):
    rows = [
        (1, "john smith lives here", "x"),
        (2, "smith john lives here", "x"),   # reordered tokens
        (3, "jon smyth lives here", "x"),    # typo variants
        (4, "completely different words", "x"),
        (5, "john smith", "y"),              # other block
        (6, "john smith lives here today now more words than the cap", "y"),
        (7, "", "y"),                        # empty: out of contract
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, blk string")
    got = {
        (r["id_a"], r["id_b"]): (
            r["n_tok_a"], r["n_tok_b"], r["me_ab_micro"],
            r["me_ba_micro"], r["me_sym_micro"],
        )
        for r in simjoin.monge_elkan_pairs(
            df, "doc_id", "text", block_cols=("blk",), max_tokens=4
        ).collect()
    }
    assert got == _brute_monge_elkan(rows, max_tokens=4)
    # reordering-invariance: identical token sets score 1.0 both ways
    assert got[(1, 2)][2:] == (1_000_000, 1_000_000, 1_000_000)
    # typo pair scores high but below 1.0, and above the unrelated pair
    assert 800_000 < got[(1, 3)][4] < 1_000_000
    assert got[(1, 3)][4] > got[(1, 4)][4]


def test_monge_elkan_token_cap_bounds_work(spark):
    # 20-token docs with cap 3: n_tok columns must report the CAP, not
    # the raw token count (per-pair work bounded at cap^2)
    long_a = " ".join(f"tok{i:02d}" for i in range(20))
    long_b = " ".join(f"tok{i:02d}" for i in range(10, 30))
    df = spark.createDataFrame(
        [(1, long_a, "x"), (2, long_b, "x")],
        "doc_id long, text string, blk string",
    )
    [r] = simjoin.monge_elkan_pairs(
        df, "doc_id", "text", block_cols=("blk",), max_tokens=3
    ).collect()
    assert r["n_tok_a"] == 3 and r["n_tok_b"] == 3


# ---------------------------------------------------------------------------
# Soft-TF-IDF hybrid comparator
# ---------------------------------------------------------------------------


def _brute_soft_tfidf(rows, max_tokens, theta_micro):
    """Pure-Python replica: clipped integer IDF weights, scalar JW kernel
    floored to micro-units, packed-argmax-free max over (jw, w_b), and the
    exact double tail floor(dot / sqrt(n2a * n2b))."""
    from bayesianrecordlinkage_jl_spark.functions.comparators import (
        _jaro_winkler,
    )

    toks = {i: sorted(set(_toks(t)))[:max_tokens] for i, t, _ in rows}
    n_docs = len(rows)
    df = Counter(t for ts in toks.values() for t in ts)
    w = {t: min(n_docs // n, simjoin.SOFT_TFIDF_W_CAP) for t, n in df.items()}
    norm2 = {i: sum(w[t] * w[t] for t in ts) for i, ts in toks.items()}
    blocks = {}
    for i, _, blk in rows:
        blocks.setdefault(blk, []).append(i)
    out = {}
    for members in blocks.values():
        for a, b in itertools.combinations(sorted(members), 2):
            ta, tb = toks[a], toks[b]
            jw = {
                (x, y): int(math.floor(
                    (1.0 if x == y else _jaro_winkler(x, y)) * 1e6))
                for x in ta for y in tb
            }

            def _dot(src, dst, flip):
                dot, n_close = 0, 0
                for x in src:
                    q = [
                        (jw[(y, x) if flip else (x, y)], w[y]) for y in dst
                        if jw[(y, x) if flip else (x, y)] >= theta_micro
                    ]
                    if q:
                        bj, bw = max(q)
                        dot += w[x] * bj * bw
                        n_close += 1
                return dot, n_close

            dot_ab, n_a = _dot(ta, tb, flip=False)
            dot_ba, n_b = _dot(tb, ta, flip=True)
            if n_a == 0 or n_b == 0:
                continue
            den = math.sqrt(float(norm2[a]) * float(norm2[b]))
            st_ab = int(math.floor(dot_ab / den))
            st_ba = int(math.floor(dot_ba / den))
            out[(a, b)] = (n_a, n_b, st_ab, st_ba, (st_ab + st_ba) // 2)
    return out


def test_soft_tfidf_matches_brute_force(spark):
    rows = [
        (1, "john smith market street", "x"),
        (2, "smith john market street", "x"),   # reordered: identical set
        (3, "jon smyth market street", "x"),    # typos on the RARE tokens
        (4, "mary jones market street", "x"),   # shares only common tokens
        (5, "unrelated words entirely", "x"),
        (6, "john smith", "y"),                 # other block: never pairs
        (7, "", "y"),                           # empty: out of contract
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, blk string")
    got = {
        (r["id_a"], r["id_b"]): (
            r["n_close_a"], r["n_close_b"], r["st_ab_e6"],
            r["st_ba_e6"], r["st_sym_e6"],
        )
        for r in simjoin.soft_tfidf_pairs(
            df, "doc_id", "text", block_cols=("blk",), max_tokens=4
        ).collect()
    }
    want = _brute_soft_tfidf(
        [r for r in rows if r[2] == "x"] + [r for r in rows if r[2] == "y"],
        max_tokens=4, theta_micro=850_000,
    )
    # brute replica blocks internally; restrict to same-block pairs only
    assert got == want
    # identical token sets -> the full normalized TF-IDF self-similarity
    assert got[(1, 2)][2] == got[(1, 2)][3] == 1_000_000
    # the typo pair must outscore the shares-only-stopwords pair: rarity
    # weighting is the point of soft-TF-IDF (plain Monge-Elkan would not
    # separate them as far)
    assert got[(1, 3)][4] > got[(1, 4)][4]
    # cross-block pair absent
    assert (6, 7) not in got and (1, 6) not in got


def test_soft_tfidf_theta_gates_contribution(spark):
    # two docs sharing one exact token; the others are far (< theta):
    # only the exact token contributes, n_close = 1 per side
    df = spark.createDataFrame(
        [(1, "alpha zzqqx", "x"), (2, "alpha wwvvu", "x")],
        "doc_id long, text string, blk string",
    )
    [r] = simjoin.soft_tfidf_pairs(
        df, "doc_id", "text", block_cols=("blk",), max_tokens=4
    ).collect()
    assert r["n_close_a"] == 1 and r["n_close_b"] == 1
    # w(alpha) = 2//2 = 1, w(zzqqx) = w(wwvvu) = 2//1 = 2
    # dot = 1 * 1e6 * 1 = 1e6; norm2 = 1 + 4 = 5 each side
    assert r["st_ab_e6"] == int(math.floor(1_000_000 / 5.0))
