"""Link-graph operators vs pure-Python brute-force replicas (exact
integer equality everywhere — the ops are all-integer by design)."""

import hashlib

import pandas as pd
import pytest

from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import linkgraph as LG

SF = "/root/testdata/sf0.001"


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _skewed(salt: str, *keys) -> int:
    key = ":".join(str(k) for k in keys)
    h1 = _ph(f"lg:{salt}:a:{key}")
    h2 = _ph(f"lg:{salt}:b:{key}")
    return h1 % (1 + (h2 % LG.N_HOSTS))


def _expected_links(docs: pd.DataFrame) -> list[tuple]:
    out = []
    for doc_id in docs["doc_id"]:
        doc_id = int(doc_id)
        src = f"host{_skewed('self', doc_id)}.example.org"
        n_out = 1 + (_ph(f"lg:n:{doc_id}") % LG.MAX_OUT)
        for pos, i in enumerate(range(1, n_out + 1)):
            tgt = _skewed("t", doc_id, i)
            href = f"https://host{tgt}.example.org/p/{doc_id}"
            out.append((doc_id, pos, src, href))
    return out


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )


def test_extract_links_matches_replica(spark, docs_pdf):
    got = (
        LG.extract_links(
            spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
        )
        .toPandas()
        .sort_values(["doc_id", "pos"], ignore_index=True)
    )
    exp = pd.DataFrame(
        sorted(_expected_links(docs_pdf)),
        columns=["doc_id", "pos", "src_host", "href"],
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "pos": "int64"}),
        exp.astype({"doc_id": "int64", "pos": "int64"}),
    )


def _replica_pagerank(edges: dict, iterations: int) -> dict:
    nodes = set()
    outw: dict = {}
    for (s, d), w in edges.items():
        nodes.update((s, d))
        outw[s] = outw.get(s, 0) + w
    r = {h: LG.RANK_SCALE for h in nodes}
    for _ in range(iterations):
        s_in: dict = {}
        for (s, d), w in edges.items():
            s_in[d] = s_in.get(d, 0) + (r[s] * w) // outw[s]
        r = {
            h: LG.BASE_FP + (LG.DAMP_NUM * s_in.get(h, 0)) // LG.DAMP_DEN
            for h in nodes
        }
    return r


def test_pagerank_matches_replica(spark, docs_pdf):
    edges: dict = {}
    for doc_id, _pos, src, href in _expected_links(docs_pdf):
        dst = href.split("https://")[1].split("/")[0]
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    exp = _replica_pagerank(edges, LG.PAGERANK_ITERS)

    graph = LG.host_link_graph(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
    )
    got = {
        r["host"]: r["rank_fp"] for r in LG.pagerank_hosts(graph).collect()
    }
    assert got == exp
    # skew sanity: the modulus-of-modulus draw concentrates mass on host0
    assert max(exp, key=exp.get) == "host0.example.org"


def test_cocitation_matches_replica_and_cap_is_live(spark, docs_pdf):
    cites: dict = {}
    for _doc, _pos, src, href in _expected_links(docs_pdf):
        dst = href.split("https://")[1].split("/")[0]
        cites.setdefault(src, set()).add(dst)
    # pick a cap that splits this fixture so BOTH paths are exercised
    fanouts = sorted(len(ds) for ds in cites.values())
    cap = fanouts[len(fanouts) // 2]
    capped = {s for s, ds in cites.items() if len(ds) > cap}
    kept = {s: ds for s, ds in cites.items() if s not in capped}
    assert capped and kept
    deg: dict = {}
    for ds in kept.values():
        for d in ds:
            deg[d] = deg.get(d, 0) + 1
    exp = {}
    for ds in kept.values():
        for a in ds:
            for b in ds:
                if a < b:
                    exp[(a, b)] = exp.get((a, b), 0) + 1
    graph = LG.host_link_graph(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
    )
    rows = LG.host_cocitation(graph, max_fanout=cap).collect()
    got = {(r["host_a"], r["host_b"]): r for r in rows}
    assert set(got) == set(exp)
    for k, n in exp.items():
        r = got[k]
        assert r["n_common"] == n
        assert r["deg_a"] == deg[k[0]] and r["deg_b"] == deg[k[1]]
        assert r["jaccard"] == n / float(deg[k[0]] + deg[k[1]] - n)


def test_pagerank_dangling_and_base(spark):
    # a -> b only: b is dangling. After 1 iter: b gets the full damped mass
    # of a; a keeps only the base (dangling mass dropped by design).
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src_host string, dst_host string, n_links long"
    )
    got = {
        r["host"]: r["rank_fp"]
        for r in LG.pagerank_hosts(edges, iterations=1).collect()
    }
    assert got == {
        "a": LG.BASE_FP,
        "b": LG.BASE_FP + (LG.DAMP_NUM * LG.RANK_SCALE) // LG.DAMP_DEN,
    }


def test_pagerank_weighted_split(spark):
    # a -> b (3 links), a -> c (1 link): contributions floor-split 3:1.
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: r["rank_fp"]
        for r in LG.pagerank_hosts(edges, iterations=1).collect()
    }
    cb = (LG.RANK_SCALE * 3) // 4
    cc = (LG.RANK_SCALE * 1) // 4
    assert got["b"] == LG.BASE_FP + (LG.DAMP_NUM * cb) // LG.DAMP_DEN
    assert got["c"] == LG.BASE_FP + (LG.DAMP_NUM * cc) // LG.DAMP_DEN


def _replica_trustrank(edges: dict, seeds, iters: int) -> dict:
    nodes = {h for e in edges for h in e}
    outw: dict = {}
    for (s, _d), w in edges.items():
        outw[s] = outw.get(s, 0) + w
    r = {h: (LG.RANK_SCALE if h in seeds else 0) for h in nodes}
    for _ in range(iters):
        c = {h: 0 for h in nodes}
        for (s, d), w in edges.items():
            c[d] += (r[s] * w) // outw[s]
        r = {
            h: (LG.BASE_FP if h in seeds else 0)
            + (LG.DAMP_NUM * c[h]) // LG.DAMP_DEN
            for h in nodes
        }
    return r


def test_trustrank_matches_replica(spark, docs_pdf):
    edges: dict = {}
    for doc_id, _pos, src, href in _expected_links(docs_pdf):
        dst = href.split("https://")[1].split("/")[0]
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    exp = _replica_trustrank(edges, set(LG.SEED_HOSTS), LG.TRUST_ITERS)
    graph = LG.host_link_graph(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
    )
    got = {
        r["host"]: r["trust_fp"] for r in LG.trustrank_hosts(graph).collect()
    }
    assert got == exp
    # trust must be concentrated: seeds hold base mass even if uncited
    for s in LG.SEED_HOSTS:
        if s in got:
            assert got[s] >= LG.BASE_FP


def test_trustrank_decay_and_unreachable(spark):
    # seed -> a -> b, plus an isolated edge x -> y unreachable from seeds:
    # trust decays geometrically along the chain and x/y end at 0.
    edges = spark.createDataFrame(
        [("host0.example.org", "a", 1), ("a", "b", 1), ("x", "y", 1)],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: r["trust_fp"]
        for r in LG.trustrank_hosts(edges, iterations=2).collect()
    }
    seed0 = LG.RANK_SCALE
    a1 = (LG.DAMP_NUM * seed0) // LG.DAMP_DEN          # iter 1
    seed1 = LG.BASE_FP
    a2 = (LG.DAMP_NUM * seed1) // LG.DAMP_DEN          # iter 2
    b2 = (LG.DAMP_NUM * a1) // LG.DAMP_DEN
    assert got["host0.example.org"] == LG.BASE_FP
    assert got["a"] == a2
    assert got["b"] == b2
    assert got["x"] == 0 and got["y"] == 0


def _replica_seed_distance(edges: dict, seeds, max_hops: int) -> dict:
    nodes = {h for e in edges for h in e}
    adj: dict = {}
    for (s, d) in edges:
        adj.setdefault(s, set()).add(d)
    dist = {h: 0 for h in nodes if h in seeds}
    frontier = set(dist)
    for k in range(1, max_hops + 1):
        nxt = set()
        for h in frontier:
            for d in adj.get(h, ()):
                if d not in dist:
                    dist[d] = k
                    nxt.add(d)
        frontier = nxt
    return dist


def test_seed_distance_matches_replica(spark, docs_pdf):
    edges: dict = {}
    for doc_id, _pos, src, href in _expected_links(docs_pdf):
        dst = href.split("https://")[1].split("/")[0]
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    exp = _replica_seed_distance(edges, set(LG.SEED_HOSTS), LG.MAX_HOPS)
    graph = LG.host_link_graph(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
    )
    got = {
        r["host"]: r["dist"]
        for r in LG.host_seed_distance(graph).collect()
    }
    assert got == exp


def test_seed_distance_hop_cap_and_min(spark):
    # chain s -> a -> b -> c -> d -> e with a shortcut s -> c: distances
    # take the MIN path, and e (5 hops via chain) is absent at max_hops=4
    # ... except the shortcut makes e reachable in 3. Use a second chain
    # without a shortcut to also assert the cap truly truncates.
    edges = spark.createDataFrame(
        [
            ("host0.example.org", "a", 1), ("a", "b", 1), ("b", "c", 1),
            ("c", "d", 1), ("d", "e", 1), ("host0.example.org", "c", 1),
            ("p", "q", 1),  # unreachable island
        ],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: r["dist"]
        for r in LG.host_seed_distance(edges, max_hops=4).collect()
    }
    assert got == {
        "host0.example.org": 0, "a": 1, "b": 2,
        "c": 1, "d": 2, "e": 3,
    }
    # without the shortcut, e is 5 hops out and must be truncated
    edges2 = spark.createDataFrame(
        [
            ("host0.example.org", "a", 1), ("a", "b", 1), ("b", "c", 1),
            ("c", "d", 1), ("d", "e", 1),
        ],
        "src_host string, dst_host string, n_links long",
    )
    got2 = {
        r["host"]: r["dist"]
        for r in LG.host_seed_distance(edges2, max_hops=4).collect()
    }
    assert "e" not in got2 and got2["d"] == 4


def _replica_salsa(edges: dict, iters: int) -> dict:
    nodes = {h for e in edges for h in e}
    outw: dict = {}
    inw: dict = {}
    for (s, d), w in edges.items():
        outw[s] = outw.get(s, 0) + w
        inw[d] = inw.get(d, 0) + w
    h = {x: LG.RANK_SCALE for x in nodes}
    a = {x: 0 for x in nodes}
    for _ in range(iters):
        a = {x: 0 for x in nodes}
        for (s, d), w in edges.items():
            a[d] += (h[s] * w) // outw[s]
        h = {x: 0 for x in nodes}
        for (s, d), w in edges.items():
            h[s] += (a[d] * w) // inw[d]
    return {x: (h[x], a[x]) for x in nodes}


def test_salsa_matches_replica(spark, docs_pdf):
    edges: dict = {}
    for doc_id, _pos, src, href in _expected_links(docs_pdf):
        dst = href.split("https://")[1].split("/")[0]
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    exp = _replica_salsa(edges, LG.SALSA_ITERS)
    graph = LG.host_link_graph(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
    )
    got = {
        r["host"]: (r["hub_fp"], r["auth_fp"])
        for r in LG.salsa_hosts(graph).collect()
    }
    assert got == exp


def test_salsa_mass_bounded_and_sinks(spark):
    # pure chain a -> b -> c: c is a pure authority (hub 0), a a pure hub
    # (auth 0); every score stays within the initial mass (no blowup)
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1)],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: (r["hub_fp"], r["auth_fp"])
        for r in LG.salsa_hosts(edges, iterations=2).collect()
    }
    assert got["a"][1] == 0          # nothing points at a
    assert got["c"][0] == 0          # c points at nothing
    for hub, auth in got.values():
        assert 0 <= hub <= 2 * LG.RANK_SCALE
        assert 0 <= auth <= 2 * LG.RANK_SCALE


def _replica_triangles(edges: dict) -> dict:
    und = {tuple(sorted((s, d))) for (s, d) in edges if s != d}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b in und:
        for c in adj[a] & adj[b]:
            tri[a] += 1  # counts each triangle twice per node (via 2 edges)
    # each node's triangles were counted once per incident edge pair -> /2?
    # simpler: recount cleanly
    tri = {n: 0 for n in adj}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in sorted(adj[a]):
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for x in (a, b, c):
                        tri[x] += 1
    return {
        n: (len(adj[n]), tri[n],
            (2.0 * tri[n]) / (len(adj[n]) * (len(adj[n]) - 1))
            if len(adj[n]) >= 2 else 0.0)
        for n in adj
    }


def test_triangles_match_replica(spark, docs_pdf):
    edges: dict = {}
    for doc_id, _pos, src, href in _expected_links(docs_pdf):
        dst = href.split("https://")[1].split("/")[0]
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    exp = _replica_triangles(edges)
    graph = LG.host_link_graph(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
    )
    got = {
        r["host"]: (r["deg"], r["n_tri"], r["clustering"])
        for r in LG.host_triangles(graph).collect()
    }
    assert got == exp
    assert any(v[1] > 0 for v in got.values())  # fixture has real triangles


def test_triangles_units(spark):
    # K3 plus a pendant: triangle nodes have tri=1; the pendant has 0.
    # Self-loops and reverse duplicates must not create extra triangles.
    edges = spark.createDataFrame(
        [
            ("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
            ("b", "a", 5),   # reverse duplicate collapses
            ("a", "a", 9),   # self-loop dropped
            ("c", "d", 1),   # pendant
        ],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: (r["deg"], r["n_tri"], r["clustering"])
        for r in LG.host_triangles(edges).collect()
    }
    assert got["a"] == (2, 1, 1.0)
    assert got["b"] == (2, 1, 1.0)
    assert got["c"] == (3, 1, 2.0 / 6.0)
    assert got["d"] == (1, 0, 0.0)


# --- k-core (fixed-round peel) -----------------------------------------------


def _brute_kcore(pairs, k):
    """Full Batagelj-Zaversnik peel to convergence -> {host: core_degree}."""
    und = set()
    for s, d in pairs:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    alive = {s for s, _ in und}
    while True:
        deg = {}
        for s, d in und:
            if s in alive and d in alive:
                deg[s] = deg.get(s, 0) + 1
        nxt = {h for h, dg in deg.items() if dg >= k}
        if nxt == alive:
            return deg
        alive = nxt


def test_kcore_hand_fixture(spark):
    # triangle a-b-c (the 2-core) + tail a-d-e (peels off in 2 sweeps)
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
         ("a", "d", 1), ("d", "e", 1), ("a", "a", 9)],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: r["core_degree"]
        for r in LG.kcore_hosts(edges, k=2, rounds=4).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_matches_full_peel_and_converges(spark, docs_pdf):
    graph = LG.host_link_graph(
        spark.createDataFrame(docs_pdf), "doc_id", "text"
    ).localCheckpoint()
    pairs = [
        (r["src_host"], r["dst_host"])
        for _, r in graph.toPandas().iterrows()
    ]
    want = _brute_kcore(pairs, LG.KCORE_K)
    got = {
        r["host"]: r["core_degree"]
        for r in LG.kcore_hosts(graph).collect()
    }
    # fixed-round peel has converged on the fixture (one more sweep is a
    # no-op) and equals the run-to-convergence replica
    more = {
        r["host"]: r["core_degree"]
        for r in LG.kcore_hosts(graph, rounds=LG.KCORE_ROUNDS + 1).collect()
    }
    assert got == want == more
    assert got  # non-degenerate: the fixture has a real core


# --- HITS hubs & authorities ------------------------------------------------


def _replica_hits(edges: dict, iterations: int) -> dict:
    """Pure-Python fixed-point HITS replica (same integer recurrence)."""
    hosts = sorted({h for e in edges for h in e})
    h = {x: LG.RANK_SCALE for x in hosts}
    a = {x: 0 for x in hosts}
    for _ in range(iterations):
        araw = {x: 0 for x in hosts}
        for (s, d), w in edges.items():
            araw[d] += h[s] * w
        mx = max(araw.values())
        a = {x: v // (1 + mx // LG.RANK_SCALE) for x, v in araw.items()}
        hraw = {x: 0 for x in hosts}
        for (s, d), w in edges.items():
            hraw[s] += a[d] * w
        mx = max(hraw.values())
        h = {x: v // (1 + mx // LG.RANK_SCALE) for x, v in hraw.items()}
    return {x: (h[x], a[x]) for x in hosts}


def test_hits_matches_replica(spark, docs_pdf):
    edges: dict = {}
    for doc_id, _pos, src, href in _expected_links(docs_pdf):
        dst = href.split("https://")[1].split("/")[0]
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    exp = _replica_hits(edges, LG.HITS_ITERS)
    graph = LG.host_link_graph(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
    )
    got = {
        r["host"]: (r["hub_fp"], r["auth_fp"])
        for r in LG.hits_hosts(graph).collect()
    }
    assert got == exp
    # the skew-hot host must be the top authority
    assert max(exp, key=lambda x: exp[x][1]) == "host0.example.org"


def test_hits_star_graph_units(spark):
    """Star: spokes point at the hub. Hub = pure authority (hub score 0),
    spokes = pure hubs (authority 0)."""
    edges = spark.createDataFrame(
        [(f"s{i}", "center", 1) for i in range(4)],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: (r["hub_fp"], r["auth_fp"])
        for r in LG.hits_hosts(edges).collect()
    }
    assert got["center"][0] == 0 and got["center"][1] > 0
    for i in range(4):
        hub, auth = got[f"s{i}"]
        assert auth == 0 and hub > 0
    # symmetric spokes carry identical scores
    assert len({got[f"s{i}"] for i in range(4)}) == 1


def test_hits_weighted_preference(spark):
    """Two authorities, one receiving double edge weight -> higher auth."""
    edges = spark.createDataFrame(
        [("h1", "x", 2), ("h1", "y", 1), ("h2", "x", 2), ("h2", "y", 1)],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: (r["hub_fp"], r["auth_fp"])
        for r in LG.hits_hosts(edges).collect()
    }
    assert got["x"][1] > got["y"][1]
    assert got["h1"] == got["h2"]


def test_scc_hand_fixture(spark):
    """Known decomposition: 3-cycle, 2-cycle, and chain singletons, with
    cross edges that must NOT merge SCCs."""
    edges = spark.createDataFrame(
        [(s, d, 1) for s, d in [
            ("a", "b"), ("b", "c"), ("c", "a"),   # SCC {a,b,c}
            ("f", "g"), ("g", "f"),               # SCC {f,g}
            ("c", "f"),                           # DAG edge between SCCs
            ("d", "e"), ("e", "a"),               # chain: singletons
        ]],
        "src_host string, dst_host string, n_links long",
    )
    got = sorted(map(tuple, LG.scc_hosts(edges).collect()))
    assert got == sorted(
        [("a", "a"), ("b", "a"), ("c", "a"),
         ("d", "d"), ("e", "e"), ("f", "f"), ("g", "f")]
    )


def _tarjan_sccs(edges, nodes):
    """Iterative Tarjan — the independent brute-force replica."""
    import collections

    adj = collections.defaultdict(list)
    for s, d in edges:
        if s != d:
            adj[s].append(d)
    index, low, onstk = {}, {}, set()
    stack, out, ctr = [], {}, [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = ctr[0]; ctr[0] += 1
                stack.append(v); onstk.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in onstk:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop(); onstk.discard(w); comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
    return out


def test_scc_random_instances_match_tarjan(spark):
    """50 random digraphs (varying density, including descending chains —
    the min-label adversarial case) against an iterative Tarjan."""
    import random

    rnd = random.Random(41)
    for trial in range(50):
        n = rnd.randint(2, 14)
        nodes = [f"h{i:02d}" for i in range(n)]
        m = rnd.randint(1, 3 * n)
        edges = {(rnd.choice(nodes), rnd.choice(nodes)) for _ in range(m)}
        if trial % 5 == 0:  # force a descending chain segment
            edges |= {(f"h{i:02d}", f"h{i - 1:02d}") for i in range(1, n)}
        df = spark.createDataFrame(
            [(s, d, 1) for s, d in sorted(edges)],
            "src_host string, dst_host string, n_links long",
        )
        got = dict(map(tuple, LG.scc_hosts(df).collect()))
        seen = {x for e in edges for x in e}
        want = _tarjan_sccs(sorted(edges), sorted(seen))
        assert got == want, (trial, sorted(edges), got, want)


def test_scc_determinism_under_partitioning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hg = LG.host_link_graph(docs, "doc_id", "text")
    a = sorted(map(tuple, LG.scc_hosts(hg.repartition(3)).collect()))
    b = sorted(map(tuple, LG.scc_hosts(hg.repartition(17)).collect()))
    assert a == b and len(a) > 0


def test_wl_roles_star_and_refinement(spark):
    """Symmetric star: spokes share a color, center differs. A weight
    perturbation on one spoke must split it from the others (weighted
    multiset sensitivity) and propagate to the center only as a multiset
    change, keeping the remaining spokes equal."""
    sym = [("c", f"s{i}", 1) for i in range(4)] + [
        (f"s{i}", "c", 1) for i in range(4)
    ]
    df = spark.createDataFrame(
        sym, "src_host string, dst_host string, n_links long"
    )
    got = dict(map(tuple, LG.wl_host_roles(df).collect()))
    assert len({got[f"s{i}"] for i in range(4)}) == 1
    assert got["c"] != got["s0"]

    bumped = [("c", "s0", 2)] + sym[1:]
    df2 = spark.createDataFrame(
        bumped, "src_host string, dst_host string, n_links long"
    )
    got2 = dict(map(tuple, LG.wl_host_roles(df2).collect()))
    assert got2["s0"] != got2["s1"]
    assert len({got2[f"s{i}"] for i in range(1, 4)}) == 1


def test_wl_roles_replica(spark):
    """Pure-Python WL replica (same phash chain, sorted token multisets)
    on a random digraph."""
    import hashlib
    import random

    def ph(s):
        # phash = first 15 md5 hex chars as a 60-bit BIGINT; its string
        # form in concat chains is therefore the DECIMAL rendering
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rnd = random.Random(5)
    nodes = [f"h{i}" for i in range(12)]
    edges = {}
    for _ in range(30):
        s, d = rnd.choice(nodes), rnd.choice(nodes)
        edges[(s, d)] = edges.get((s, d), 0) + 1
    elist = [(s, d, w) for (s, d), w in sorted(edges.items())]
    df = spark.createDataFrame(
        elist, "src_host string, dst_host string, n_links long"
    )
    got = dict(map(tuple, LG.wl_host_roles(df).collect()))

    seen = sorted({x for s, d, _ in elist for x in (s, d)})
    outd = {n: 0 for n in seen}
    ind = {n: 0 for n in seen}
    for s, d, w in elist:
        outd[s] += w
        ind[d] += w
    col = {n: ph(f"d:{outd[n]}:{ind[n]}") for n in seen}
    for _ in range(LG.WL_ITERS):
        toks = {n: [] for n in seen}
        for s, d, w in elist:
            toks[s].append(f"o{w}:{col[d]}")
            toks[d].append(f"i{w}:{col[s]}")
        col = {
            n: ph(f"{col[n]}|" + ",".join(sorted(toks[n]))) for n in seen
        }
    assert got == col


def test_wl_roles_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hg = LG.host_link_graph(docs, "doc_id", "text")
    a = sorted(map(tuple, LG.wl_host_roles(hg.repartition(3)).collect()))
    b = sorted(map(tuple, LG.wl_host_roles(hg.repartition(19)).collect()))
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# Round-5 ADVICE regressions (scc convergence / node universe / empty input)
# ---------------------------------------------------------------------------


def test_scc_long_cycle_converges(spark):
    """A directed cycle deeper than the fixed 3*max_rounds inner bound is
    ONE SCC. The min-label fixpoint now scales its round budget to the
    active node count, so this must come back as a single component (the
    ADVICE r4 repro — a 100-cycle at default bounds — returned 100
    singletons; 30 nodes at max_rounds=5 exercises the same overflow with
    3x fewer Spark rounds)."""
    n = 30
    edges = spark.createDataFrame(
        [(f"h{i:03d}", f"h{(i + 1) % n:03d}", 1) for i in range(n)],
        "src_host string, dst_host string, n_links long",
    )
    got = dict(map(tuple, LG.scc_hosts(edges, max_rounds=5).collect()))
    assert got == {f"h{i:03d}": "h000" for i in range(n)}


def test_scc_empty_edges(spark):
    """Empty edge input -> empty (host, scc_id) result, not IndexError."""
    edges = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long"
    )
    out = LG.scc_hosts(edges)
    assert out.columns == ["host", "scc_id"]
    assert out.count() == 0


def test_scc_self_loop_only_host_cross_engine(spark):
    """A host whose ONLY edge is a self-loop must be a singleton SCC in
    BOTH engines. The Spark side builds its node universe from raw edges
    (self-loops included); the SQL twin's nodes CTE must come from the
    unfiltered graph rows too (the r4 latent parity break)."""
    import duckdb

    rows = [
        ("a", "b", 1), ("b", "a", 1),   # 2-cycle SCC {a,b}
        ("a", "z", 1),                  # DAG edge to singleton z
        ("s", "s", 3),                  # self-loop-ONLY host s
    ]
    edges = spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )
    got = sorted(map(tuple, LG.scc_hosts(edges).collect()))
    want = sorted([("a", "a"), ("b", "a"), ("z", "z"), ("s", "s")])
    assert got == want

    vals = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in rows)
    graph_sql = (
        f"SELECT * FROM (VALUES {vals}) "
        "AS t(src_host, dst_host, n_links)"
    )
    con = duckdb.connect()
    sql_out = sorted(
        map(
            tuple,
            con.execute(
                LG.scc_hosts_sql("unused", "unused", "unused", graph_sql)
            ).fetchall(),
        )
    )
    assert sql_out == want
