"""Brute-force replicas for the round-4 ER-diagnostics catalog entries
(match_weight_waterfall, unlinkables_profile, rule_cascade_links,
capture_recapture_estimate, cluster_graph_stats, cluster_centroids,
contrastive_pair_mining, source_overlap_matrix,
embedding_label_consistency, lexical_diversity).

The DuckDB oracles pin cross-engine value parity; these tests pin the
SEMANTICS against independent pandas/numpy recomputations from the raw
parquet + the standalone catalog outputs they compose."""

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
FS_LOWER = -1.0
JACCARD_MIN_PCT = 30
EMB_COS_MIN = 0.3
SENTINEL_BIN = -9999


def q(spark, name):
    return entrymod.queries()[name](spark, SF).toPandas()


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def _tokens(text: str) -> list:
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _pairkey(df):
    return list(zip(df["id_a"].astype(int), df["id_b"].astype(int)))


# ---------------------------------------------------------------------------
# waterfall
# ---------------------------------------------------------------------------


def test_waterfall_reconstructs_weight(spark):
    wf = q(spark, "match_weight_waterfall")
    fs = q(spark, "fs_weights")
    band = fs[fs["w"] >= FS_LOWER]

    # exactly |fields| rows per review-band pair, nothing else
    assert sorted(set(_pairkey(wf))) == sorted(set(_pairkey(band)))
    counts = wf.groupby(["id_a", "id_b"]).size()
    assert (counts == 3).all()
    assert set(zip(wf["step"], wf["field"])) == {
        (1, "g1"), (2, "g2"), (3, "g3")
    }

    # levels echo the comparison vectors; cum replays left-to-right and
    # the final step IS the fs_weights w, bit-for-bit
    m = wf.merge(band, on=["id_a", "id_b"])
    for s_, g in [(1, "g1"), (2, "g2"), (3, "g3")]:
        sub = m[m["step"] == s_]
        assert (sub["level"] == sub[g]).all()
    for (_, _), grp in wf.groupby(["id_a", "id_b"]):
        grp = grp.sort_values("step")
        acc = 0.0
        for _, r in grp.iterrows():
            acc = acc + r["contrib"]
            assert acc == r["cum_w"]
    last = m[m["step"] == 3]
    assert (last["cum_w"].values == last["w"].values).all()


# ---------------------------------------------------------------------------
# unlinkables
# ---------------------------------------------------------------------------


def test_unlinkables_replica(spark):
    out = q(spark, "unlinkables_profile")
    fs = q(spark, "fs_weights")
    ends = pd.concat([
        fs[["id_a", "w"]].rename(columns={"id_a": "id"}),
        fs[["id_b", "w"]].rename(columns={"id_b": "id"}),
    ])
    best = ends.groupby("id")["w"].max()
    exp: dict = {}
    for did in _docs()["doc_id"]:
        b = (
            int(math.floor(best[did])) if did in best.index else SENTINEL_BIN
        )
        exp[b] = exp.get(b, 0) + 1
    got = dict(zip(out["w_bin"].astype(int), out["n_records"].astype(int)))
    assert got == exp
    assert SENTINEL_BIN in got  # fixture has candidate-less records


# ---------------------------------------------------------------------------
# rule cascade
# ---------------------------------------------------------------------------


def test_rule_cascade_replica(spark):
    out = q(spark, "rule_cascade_links")
    docs = _docs()
    byhash: dict = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        byhash.setdefault(hashlib.md5(txt.encode()).hexdigest(), []).append(
            int(did)
        )
    exp: dict = {}
    for ids in byhash.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j_ in range(i + 1, len(ids)):
                exp[(ids[i], ids[j_])] = 1
    cv = q(spark, "comparison_vectors")
    for a, b in _pairkey(cv[cv["g1"] == 1]):
        exp.setdefault((a, b), 2)
    jac = q(spark, "dedup_jaccard_lsh_verified")
    for a, b in _pairkey(jac):
        exp.setdefault((a, b), 3)
    got = {
        (a, b): r
        for (a, b), r in zip(_pairkey(out), out["rule_id"].astype(int))
    }
    assert got == exp
    # cascade actually multi-rule (sf0.001 has no exact-dup texts, so
    # rule 1 may be absent at this scale; 2 and 3 both fire)
    assert len(set(out["rule_id"])) >= 2


# ---------------------------------------------------------------------------
# capture-recapture
# ---------------------------------------------------------------------------


def test_capture_recapture_replica(spark):
    out = q(spark, "capture_recapture_estimate").iloc[0]
    fs = q(spark, "fs_weights")
    a = set(_pairkey(fs[fs["w"] > 0.0]))
    b = set(_pairkey(q(spark, "dedup_jaccard_lsh_verified")))
    n1, n2, m = len(a), len(b), len(a & b)
    assert (int(out["n_rule_a"]), int(out["n_rule_b"]),
            int(out["n_overlap"])) == (n1, n2, m)
    assert out["chapman_total"] == (n1 + 1) * (n2 + 1) / (m + 1) - 1.0
    # Chapman never estimates fewer pairs than either rule observed
    assert out["chapman_total"] >= max(n1, n2) - 1


# ---------------------------------------------------------------------------
# cluster graph stats
# ---------------------------------------------------------------------------


def test_cluster_graph_stats_replica(spark):
    out = q(spark, "cluster_graph_stats")
    cc = q(spark, "connected_components")
    lab = dict(zip(cc["node"].astype(int), cc["component"].astype(int)))
    fs = q(spark, "fs_weights")
    pos = fs[fs["w"] > 0.0]
    exp: dict = {}
    for (a, b), w in zip(_pairkey(pos), pos["w"]):
        comp = lab[a]
        assert lab[b] == comp  # edge endpoints share a component
        st = exp.setdefault(comp, [0, math.inf, -math.inf])
        st[0] += 1
        st[1] = min(st[1], w)
        st[2] = max(st[2], w)
    sizes = cc.groupby("component").size()
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        comp = int(r["component"])
        n_e, mn, mx = exp[comp]
        n_n = int(sizes[comp])
        assert int(r["n_edges"]) == n_e
        assert int(r["n_nodes"]) == n_n
        assert r["min_w"] == mn and r["max_w"] == mx
        assert r["density"] == 2 * n_e / (n_n * (n_n - 1))
        assert 0.0 < r["density"] <= 1.0 or n_e > n_n * (n_n - 1) // 2


# ---------------------------------------------------------------------------
# cluster centroids
# ---------------------------------------------------------------------------


def _union_find_components(nodes, edges):
    parent = {int(n): int(n) for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cluster_centroids_replica(spark):
    out = q(spark, "cluster_centroids")
    jac = q(spark, "dedup_jaccard_lsh_verified")
    docs = _docs()
    lab = _union_find_components(docs["doc_id"], _pairkey(jac))
    emb = _emb()
    vecs = {
        int(v): np.floor(np.asarray(e, dtype=np.float64) * 1e6 + 0.5)
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    members: dict = {}
    for n, c in lab.items():
        members.setdefault(c, []).append(n)
    exp = {}
    for c, ms in members.items():
        if len(ms) < 2:
            continue
        stack = np.stack([vecs[m] for m in ms])
        for dim in range(stack.shape[1]):
            s = int(stack[:, dim].sum())
            exp[(c, dim)] = (len(ms), s, s / len(ms))
    got = {
        (int(r["component"]), int(r["dim"])): (
            int(r["n_docs"]), int(r["sum_micro"]), r["centroid_micro"]
        )
        for _, r in out.iterrows()
    }
    assert got == exp
    assert exp  # fixture has at least one multi-doc cluster


# ---------------------------------------------------------------------------
# contrastive mining
# ---------------------------------------------------------------------------


def test_contrastive_pair_mining_replica(spark):
    out = q(spark, "contrastive_pair_mining")
    jac = set(_pairkey(q(spark, "dedup_jaccard_lsh_verified")))
    emb_pairs = set(_pairkey(q(spark, "dedup_embedding_cosine")))
    assert set(_pairkey(out)) == (jac | emb_pairs)

    docs = _docs()
    toksets = {
        int(d): set(_tokens(t))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    for _, r in out.iterrows():
        ta, tb = toksets[int(r["id_a"])], toksets[int(r["id_b"])]
        i = len(ta & tb)
        u = len(ta | tb)
        assert r["jac_pct"] == i * 100 / u
        lex_near = i * 100 >= u * JACCARD_MIN_PCT
        emb_near = r["sim"] >= EMB_COS_MIN
        if lex_near and not emb_near:
            assert r["label"] == "hard_negative"
        elif emb_near and not lex_near:
            assert r["label"] == "paraphrase_positive"
        else:
            assert r["label"] == "consistent"
    assert "hard_negative" in set(out["label"])


# ---------------------------------------------------------------------------
# source overlap / label consistency / lexical diversity
# ---------------------------------------------------------------------------


def test_source_overlap_replica(spark):
    out = q(spark, "source_overlap_matrix")
    jac = q(spark, "dedup_jaccard_lsh_verified")
    src = dict(zip(_docs()["doc_id"].astype(int), _docs()["source"]))
    exp: dict = {}
    for (a, b), jp in zip(_pairkey(jac), jac["jac_pct"]):
        key = tuple(sorted((src[a], src[b])))
        st = exp.setdefault(key, [0, -math.inf])
        st[0] += 1
        st[1] = max(st[1], jp)
    got = {
        (r["source_a"], r["source_b"]): [int(r["n_pairs"]), r["max_jac_pct"]]
        for _, r in out.iterrows()
    }
    assert got == exp


def test_embedding_label_consistency_replica(spark):
    out = q(spark, "embedding_label_consistency")
    pairs = q(spark, "dedup_embedding_cosine")
    lab = dict(zip(_emb()["vec_id"].astype(int), _emb()["label"].astype(int)))
    exp: dict = {}
    for (a, b), s_ in zip(_pairkey(pairs), pairs["sim"]):
        key = tuple(sorted((lab[a], lab[b])))
        st = exp.setdefault(key, [0, math.inf, -math.inf])
        st[0] += 1
        st[1] = min(st[1], s_)
        st[2] = max(st[2], s_)
    got = {
        (int(r["label_lo"]), int(r["label_hi"])): [
            int(r["n_pairs"]), r["min_sim"], r["max_sim"]
        ]
        for _, r in out.iterrows()
    }
    assert got == exp


def test_lexical_diversity_replica(spark):
    out = q(spark, "lexical_diversity")
    docs = _docs()
    tot: dict = {}
    types: dict = {}
    for s_, t in zip(docs["source"], docs["text"]):
        tk = _tokens(t)
        tot[s_] = tot.get(s_, 0) + len(tk)
        types.setdefault(s_, set()).update(tk)
    assert len(out) == len(tot)
    for _, r in out.iterrows():
        s_ = r["source"]
        assert int(r["n_tokens"]) == tot[s_]
        assert int(r["n_types"]) == len(types[s_])
        assert r["type_token_ratio"] == len(types[s_]) / tot[s_]


def test_posterior_calibration_replica(spark):
    out = q(spark, "posterior_calibration")
    fs = q(spark, "fs_weights")
    truth = set(_pairkey(q(spark, "dedup_jaccard_lsh_verified")))
    logit_p = round(math.log(0.01 / 0.99), 12)
    exp: dict = {}
    for (a, b), w in zip(_pairkey(fs), fs["w"]):
        bin_ = int(math.floor(logit_p + w))
        st = exp.setdefault(bin_, [0, 0])
        st[0] += 1
        st[1] += 1 if (a, b) in truth else 0
    got = {
        int(r["lo_bin"]): [int(r["n_pairs"]), int(r["n_true"])]
        for _, r in out.iterrows()
    }
    assert got == exp
    for _, r in out.iterrows():
        assert r["match_rate"] == int(r["n_true"]) / int(r["n_pairs"])
    # calibration signal: the top bin is purer than the bottom bin
    top, bot = out["lo_bin"].max(), out["lo_bin"].min()
    rt = out.set_index("lo_bin")["match_rate"]
    assert rt[top] >= rt[bot]
