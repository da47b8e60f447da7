"""HLL/KMV span-cardinality sketches: python md5 replica (exact equality,
doubles bitwise) + estimator-accuracy bounds vs exact distincts."""

import hashlib
import re

import pytest

from bayesianrecordlinkage_jl_spark.operators import sketches as SK

SF = "/root/testdata/sf0.01"


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _spans(text: str) -> list[int]:
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    n = max(len(toks) - (SK.SPAN_K - 1), 1)
    return [_ph(" ".join(toks[i : i + SK.SPAN_K])) for i in range(n)]


def _replica(rows) -> dict:
    groups: dict = {}
    for source, text in rows:
        groups.setdefault(source, []).extend(_spans(text))
    out = {}
    for g, hs in groups.items():
        regs: dict = {}
        for h in hs:
            j = h % SK.M_REG
            w = h // SK.M_REG
            rho = SK.RHO_CAP
            if w:
                z = (w & -w).bit_length() - 1
                rho = min(z + 1, SK.RHO_CAP)
            regs[j] = max(regs.get(j, 0), rho)
        sum_fp = sum(1 << (SK.RHO_CAP - m) for m in regs.values()) + (
            SK.M_REG - len(regs)
        ) * (1 << SK.RHO_CAP)
        dist = sorted(set(hs))
        hk = dist[SK.KMV_K - 1] if len(dist) >= SK.KMV_K else None
        out[g] = {
            "n_spans": len(hs),
            "exact_distinct": len(dist),
            "hll_n_zero": SK.M_REG - len(regs),
            "hll_sum_fp": sum_fp,
            "hll_est": SK.ALPHA_FP / float(sum_fp),
            "kmv_hk": hk,
            "kmv_est": SK.KMV_NUM / float(hk) if hk else None,
        }
    return out


@pytest.fixture(scope="module")
def result(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["grp"]: r.asDict()
        for r in SK.span_cardinality_sketches(df, "source", "text").collect()
    }
    rows = [
        (r["source"], r["text"])
        for r in df.select("source", "text").collect()
    ]
    return got, _replica(rows)


def test_matches_replica_bitwise(result):
    got, exp = result
    assert set(got) == set(exp)
    for g in exp:
        for col, v in exp[g].items():
            assert got[g][col] == v, (g, col, got[g][col], v)


def test_estimator_accuracy(result):
    got, _ = result
    hll_err, kmv_err = [], []
    for g, r in got.items():
        exact = r["exact_distinct"]
        assert exact > 2.5 * SK.M_REG  # raw-HLL regime on this fixture
        hll_err.append(abs(r["hll_est"] - exact) / exact)
        kmv_err.append(abs(r["kmv_est"] - exact) / exact)
    # m=256 -> sigma ~6.5%; k=64 -> sigma ~12.5%. Bound per-group at ~4
    # sigma and the mean tighter (20 groups).
    assert max(hll_err) < 0.30 and sum(hll_err) / len(hll_err) < 0.10
    assert max(kmv_err) < 0.50 and sum(kmv_err) / len(kmv_err) < 0.20


def test_short_text_and_missing_kmv(spark):
    # fewer than KMV_K distinct spans -> kmv columns NULL, HLL still sane
    df = spark.createDataFrame(
        [("s", "alpha beta"), ("s", "alpha beta")], "source string, text string"
    )
    row = (
        SK.span_cardinality_sketches(df, "source", "text").collect()[0]
    )
    assert row["n_spans"] == 2 and row["exact_distinct"] == 1
    assert row["kmv_hk"] is None and row["kmv_est"] is None
    assert row["hll_n_zero"] == SK.M_REG - 1


# --- Bloom-filter broadcast decontamination probe --------------------------


def _bloom_replica(bench_texts, probe_texts, m_bits=SK.BLOOM_M_BITS,
                   n_hashes=SK.BLOOM_HASHES):
    """Python replica: bitmap from benchmark spans, per-doc maybe counts."""
    bits = set()
    for t in bench_texts:
        for h in set(_spans(t)):
            h2 = 1 + (h >> 13) % (m_bits - 1)
            for j in range(n_hashes):
                bits.add((h % m_bits + j * h2) % m_bits)
    out = []
    for t in probe_texts:
        spans = _spans(t)
        maybe = 0
        for h in spans:
            h2 = 1 + (h >> 13) % (m_bits - 1)
            if all((h % m_bits + j * h2) % m_bits in bits
                   for j in range(n_hashes)):
                maybe += 1
        out.append((len(spans), maybe))
    return out


def test_bloom_probe_matches_python_replica(spark):
    bench = [
        "the quick brown fox jumps over the lazy dog every single day",
        "spark shuffles partition data across executors during wide joins",
    ]
    probe = [
        bench[0],                                              # full hit
        "completely different words that share nothing at all with them",
        "prefix words then the quick brown fox jumps over the lazy dog every single day",
    ]
    bdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(probe)], "doc_id long, text string"
    )
    bloom = SK.span_bloom(bdf, "doc_id", "text")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_maybe"])
        for r in SK.bloom_probe_flags(pdf, "doc_id", "text", bloom).collect()
    }
    want = _bloom_replica(bench, probe)
    for i, w in enumerate(want):
        assert got[i] == w, (i, got[i], w)
    assert got[0][1] == got[0][0]  # identical doc: every span hits
    assert got[1][1] == 0          # disjoint vocab: no false positives here


def test_bloom_is_superset_of_exact_flags(spark):
    """One-sided error: every exactly-contaminated doc is maybe-flagged and
    n_maybe >= n_hits per doc (same span counting)."""
    from bayesianrecordlinkage_jl_spark.operators import corpus as CO

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where("doc_id % 37 = 0")
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in CO.contamination_flags(
            docs, "doc_id", "text", bench, "doc_id", "text", k=SK.SPAN_K
        ).collect()
    }
    bloom = SK.span_bloom(bench, "doc_id", "text", k=SK.SPAN_K)
    maybe = {
        r["doc_id"]: r["n_maybe"]
        for r in SK.bloom_probe_flags(
            docs, "doc_id", "text", bloom, k=SK.SPAN_K
        ).collect()
    }
    assert set(exact) == set(maybe)
    for d, nh in exact.items():
        assert maybe[d] >= nh, d


def test_bloom_bitmap_shape(spark):
    bdf = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    rows = SK.span_bloom(bdf, "doc_id", "text").collect()
    assert all(0 <= r["word_idx"] < SK.BLOOM_M_BITS // 32 for r in rows)
    assert all(0 < r["bits"] < (1 << 32) for r in rows)


# --- HyperBall ----------------------------------------------------------------


def _hb_reg(host: str):
    h = _ph(host)
    j = h % SK.M_REG
    w = h // SK.M_REG
    rho = SK.RHO_CAP
    if w:
        rho = min((w & -w).bit_length(), SK.RHO_CAP)
    return j, rho


def _brute_hyperball(pairs, radius):
    """Exact BFS balls, then the HLL registers of each ball's member set."""
    adj: dict = {}
    nodes = set()
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            nodes.update((s, d))
    out = {}
    ball = {v: {v} for v in nodes}
    for r in range(radius + 1):
        if r > 0:
            ball = {
                v: b | set().union(*(ball.get(w, set()) for w in adj.get(v, ())) or [set()])
                for v, b in ball.items()
            }
        for v, b in ball.items():
            regs: dict = {}
            for m in b:
                j, rho = _hb_reg(m)
                regs[j] = max(regs.get(j, 0), rho)
            sum_fp = sum(1 << (SK.RHO_CAP - m) for m in regs.values()) + (
                SK.M_REG - len(regs)
            ) * (1 << SK.RHO_CAP)
            out[(v, r)] = (
                len(regs), SK.M_REG - len(regs), sum_fp,
                SK.ALPHA_FP / float(sum_fp),
            )
    return out


def test_hyperball_matches_exact_ball_registers(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),  # chain
        ("a", "f"), ("f", "a"),                          # 2-cycle
        ("g", "a"),                                      # feeder
    ]
    edges = spark.createDataFrame(
        [(s, d, 1) for s, d in pairs],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        (r["host"], r["radius"]): (
            r["n_regs"], r["hll_n_zero"], r["hll_sum_fp"], r["hll_est"]
        )
        for r in SK.hyperball_hosts(edges, radius=3).collect()
    }
    assert got == _brute_hyperball(pairs, 3)
    # ball growth sanity on the chain: a reaches {a,b,f} at r=1 but
    # {a,b,c,f} at r=2 -> estimate strictly grows
    assert got[("a", 2)][3] > got[("a", 1)][3] > got[("a", 0)][3]


def test_hyperball_ball_is_monotone_everywhere(spark):
    from bayesianrecordlinkage_jl_spark.operators import linkgraph as LG

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hb = SK.hyperball_hosts(
        LG.host_link_graph(docs, "doc_id", "text"), radius=2
    ).toPandas()
    piv = hb.pivot(index="host", columns="radius", values="hll_sum_fp")
    # register sums only shrink (more/greater registers) as radius grows
    assert (piv[1] <= piv[0]).all() and (piv[2] <= piv[1]).all()
