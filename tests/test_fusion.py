"""record_fusion survivorship semantics on a hand-built fixture: champion
argmax (len desc, id asc), categorical mode (count desc, value asc), and
singleton/isolated-cluster passthrough."""

from bayesianrecordlinkage_jl_spark.operators.fusion import record_fusion


def _fixture(spark):
    # cluster 1: ids 1,2,3 — len tie 10/10 between ids 1,2 (champ -> id 1);
    #   lang mode tie en/fr 1-1-... actually en x2 vs fr x1 -> en;
    #   source tie a/b 1:1 within ids {1,2} plus c on id 3 -> lexicographic 'a'
    # cluster 2: singleton id 7
    docs = spark.createDataFrame(
        [
            (1, 10, "en", "a"),
            (2, 10, "en", "b"),
            (3, 4, "fr", "c"),
            (7, 99, "de", "z"),
        ],
        "doc_id long, n_chars long, lang string, source string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)],
        "node long, component long",
    )
    return docs, clusters


def test_record_fusion_rules(spark):
    docs, clusters = _fixture(spark)
    out = record_fusion(
        docs, clusters, "doc_id", "n_chars", ["lang", "source"]
    )
    rows = {r["cluster_id"]: r.asDict() for r in out.collect()}
    assert set(rows) == {1, 7}
    c1 = rows[1]
    assert c1["n_docs"] == 3 and c1["rep_id"] == 1
    # len tie 10/10 -> smaller id wins
    assert c1["best_len_id"] == 1 and c1["best_len"] == 10
    # lang: en x2 beats fr x1
    assert c1["top_lang"] == "en" and c1["lang_support"] == 2
    # source: a/b/c all x1 -> lexicographically smallest
    assert c1["top_source"] == "a" and c1["source_support"] == 1
    c7 = rows[7]
    assert c7["n_docs"] == 1 and c7["rep_id"] == 7
    assert c7["best_len_id"] == 7 and c7["best_len"] == 99
    assert c7["top_lang"] == "de" and c7["lang_support"] == 1


def test_record_fusion_no_cat_cols(spark):
    docs, clusters = _fixture(spark)
    out = record_fusion(docs, clusters, "doc_id", "n_chars", [])
    assert set(out.columns) == {
        "cluster_id", "n_docs", "rep_id", "best_len_id", "best_len"
    }
    assert out.count() == 2


# ---------------------------------------------------------------------------
# truth_discovery / source_trust (Sums-style fixed point)
# ---------------------------------------------------------------------------

from bayesianrecordlinkage_jl_spark.operators.fusion import (  # noqa: E402
    TD_SCALE, source_trust, truth_discovery,
)


def _td_brute(claims, iterations):
    """Exact integer replica of the fixed point. claims: set of (e,v,s)."""
    claims = sorted(set(claims))
    srcs = sorted({s for _, _, s in claims})
    nclaims = {s: sum(1 for c in claims if c[2] == s) for s in srcs}
    trust = {s: TD_SCALE for s in srcs}

    def scores(tr):
        sc = {}
        for e, v, s in claims:
            sc[(e, v)] = sc.get((e, v), 0) + tr[s]
        m = max(sc.values())
        return {k: (x * TD_SCALE) // m for k, x in sc.items()}

    for _ in range(iterations):
        nsc = scores(trust)
        traw = {s: 0 for s in srcs}
        for e, v, s in claims:
            traw[s] += nsc[(e, v)]
        traw = {s: traw[s] // nclaims[s] for s in srcs}
        tm = max(traw.values())
        trust = {s: (traw[s] * TD_SCALE) // tm for s in srcs}
    return scores(trust), trust, nclaims


# reliable sources r1/r2 agree with each other everywhere; noisy sources
# x1..x3 each claim a DIFFERENT wrong value on most entities, so their
# claims get low support; on the disputed entity 9 the three noisy
# sources AGREE on "bad" (majority 3-2) while r1/r2 say "good" —
# reliability weighting must overturn the majority
_TD_FIXTURE = (
    [(e, "t", s) for e in range(9) for s in ("r1", "r2")]
    + [(e, f"w{i}", f"x{i}") for e in range(9) for i in (1, 2, 3)]
    + [(9, "good", "r1"), (9, "good", "r2"),
       (9, "bad", "x1"), (9, "bad", "x2"), (9, "bad", "x3")]
)


def test_truth_discovery_matches_bruteforce(spark):
    df = spark.createDataFrame(_TD_FIXTURE, "e long, v string, s string")
    got = {
        r["entity"]: (r["value"], r["score_fp"], r["n_values"])
        for r in truth_discovery(df, "e", "v", "s").collect()
    }
    nsc, _, _ = _td_brute(_TD_FIXTURE, 4)
    for e in {c[0] for c in _TD_FIXTURE}:
        cand = {v: s for (ee, v), s in nsc.items() if ee == e}
        best = min(cand, key=lambda v: (-cand[v], v))
        assert got[e] == (best, cand[best], len(cand)), e


def test_truth_discovery_overturns_majority(spark):
    df = spark.createDataFrame(_TD_FIXTURE, "e long, v string, s string")
    got = {r["entity"]: r["value"]
           for r in truth_discovery(df, "e", "v", "s").collect()}
    # 3-of-5 majority on entity 9 is "bad"; learned reliability says "good"
    assert got[9] == "good"


def test_source_trust_matches_bruteforce_and_orders(spark):
    df = spark.createDataFrame(_TD_FIXTURE, "e long, v string, s string")
    got = {r["src"]: (r["trust_fp"], r["n_claims"])
           for r in source_trust(df, "e", "v", "s").collect()}
    _, trust, nclaims = _td_brute(_TD_FIXTURE, 4)
    assert got == {s: (trust[s], nclaims[s]) for s in trust}
    assert max(t for t, _ in got.values()) == TD_SCALE
    assert min(got["r1"][0], got["r2"][0]) > max(
        got["x1"][0], got["x2"][0], got["x3"][0]
    )
