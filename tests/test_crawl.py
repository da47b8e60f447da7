"""URL canonicalization + latest-snapshot dedup unit vectors."""

from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import crawl

VECTORS = [
    # scheme/host case + default port + www + fragment
    ("HTTPS://WWW.Example.ORG:443/A/B#frag", "https://example.org/A/B"),
    ("http://Example.org:80/", "http://example.org/"),
    # empty path -> "/"
    ("https://example.org", "https://example.org/"),
    # duplicate slashes collapse (path case preserved)
    ("https://example.org//a///B", "https://example.org/a/B"),
    # utm params dropped, others preserved in order, empty query loses "?"
    (
        "https://example.org/p?utm_source=x&id=7&utm_medium=y&z=1",
        "https://example.org/p?id=7&z=1",
    ),
    ("https://example.org/p?utm_campaign=z", "https://example.org/p"),
    ("https://example.org/p?", "https://example.org/p"),
    # non-default port kept; query case preserved
    ("https://example.org:8443/p?ID=7", "https://example.org:8443/p?ID=7"),
]


def test_url_normalize_vectors(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(VECTORS)],
                               "i int, u string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", crawl.url_normalize(F.col("u")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(VECTORS):
        assert got[i] == want, (VECTORS[i][0], got[i], want)


def test_url_normalize_sql_twin_matches(spark):
    import duckdb

    con = duckdb.connect()
    for raw, want in VECTORS:
        lit = raw.replace("'", "''")
        got = con.sql(
            f"SELECT {crawl.url_normalize_sql(f_str(lit))}"
        ).fetchone()[0]
        assert got == want, (raw, got, want)


def f_str(lit: str) -> str:
    return f"'{lit}'"


def test_crawl_delta_statuses(spark):
    old = spark.createDataFrame(
        [("u1", 10, 1), ("u2", 20, 2), ("u3", 30, 3)],
        "url string, fp long, doc_id long",
    )
    new = spark.createDataFrame(
        [("u1", 10, 5), ("u2", 99, 6), ("u4", 40, 7)],
        "url string, fp long, doc_id long",
    )
    from bayesianrecordlinkage_jl_spark.operators.crawl import crawl_delta

    got = {
        r["url"]: (r["status"], r["old_doc"], r["new_doc"])
        for r in crawl_delta(old, new).collect()
    }
    assert got == {
        "u1": ("unchanged", 1, 5),  # same content, different winning row
        "u2": ("changed", 2, 6),
        "u3": ("removed", 3, -1),
        "u4": ("added", -1, 7),
    }


def test_crawl_delta_catalog_has_all_statuses(spark):
    import __spark_entry__ as e

    counts = {
        r["status"]: r["n"]
        for r in e.queries()["crawl_delta"](spark, "/root/testdata/sf0.001")
        .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {"added", "removed", "changed", "unchanged"}


def test_latest_snapshot_struct_max_tiebreak(spark):
    rows = [
        # same canonical url, later ts wins
        (1, "https://A.example.org/x", 100),
        (2, "HTTPS://a.example.org/x", 200),
        # ts tie -> larger id wins
        (3, "https://b.example.org/y", 50),
        (4, "https://b.example.org/y?utm_source=t", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts long")
    got = {
        r["url"]: (r["ts_epoch"], r["doc_id"])
        for r in crawl.latest_snapshot(df, "url", "ts", "doc_id").collect()
    }
    assert got == {
        "https://a.example.org/x": (200, 2),
        "https://b.example.org/y": (50, 4),
    }


# ---------------------------------------------------------------------------
# scd2_intervals
# ---------------------------------------------------------------------------


def _scd2_brute(rows):
    """rows: (url, ts, fp, sid). Returns the SCD2 interval list."""
    out = []
    by_url = {}
    for r in rows:
        by_url.setdefault(r[0], []).append(r)
    for url, rs in by_url.items():
        rs.sort(key=lambda r: (r[1], r[3]))  # (ts, sid) total order
        runs = []
        for _, ts, fp, _sid in rs:
            if not runs or runs[-1]["fp"] != fp:
                runs.append({"fp": fp, "from": ts, "n": 1})
            else:
                runs[-1]["n"] += 1
        for v, run in enumerate(runs, start=1):
            nxt = runs[v]["from"] if v < len(runs) else crawl.SCD2_OPEN_TS
            out.append((url, v, run["fp"], run["from"], nxt, run["n"],
                        1 if v == len(runs) else 0))
    return sorted(out)


def test_scd2_intervals_bruteforce(spark):
    rows = [
        # url A: fp 1,1,2,1 -> 3 versions (middle collapse)
        ("A", 100, 1, 1), ("A", 200, 1, 2), ("A", 300, 2, 3), ("A", 400, 1, 4),
        # url B: single snapshot -> one open version
        ("B", 50, 7, 5),
        # url C: ts tie broken by sid (fp order depends on it)
        ("C", 10, 3, 9), ("C", 10, 4, 8), ("C", 20, 4, 10),
    ]
    df = spark.createDataFrame(rows, "url string, ts long, fp long, sid long")
    got = sorted(
        tuple(r) for r in crawl.scd2_intervals(
            df, "url", "ts", "fp", "sid"
        ).collect()
    )
    assert got == _scd2_brute(rows)
    # C's tie: sid 8 (fp 4) precedes sid 9 (fp 3) at ts 10, then fp 4 again
    c = [g for g in got if g[0] == "C"]
    assert [v[2] for v in c] == [4, 3, 4] and len(c) == 3


def test_scd2_intervals_contiguous_and_open(spark):
    rows = [("A", 100, 1, 1), ("A", 200, 2, 2), ("A", 300, 3, 3)]
    df = spark.createDataFrame(rows, "url string, ts long, fp long, sid long")
    out = crawl.scd2_intervals(df, "url", "ts", "fp", "sid").toPandas()
    out = out.sort_values("version_no")
    # half-open chain: valid_to == next valid_from; final open sentinel
    assert list(out["valid_from"]) == [100, 200, 300]
    assert list(out["valid_to"]) == [200, 300, crawl.SCD2_OPEN_TS]
    assert list(out["is_current"]) == [0, 0, 1]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["A", "B", "C"]),      # url
                st.integers(min_value=0, max_value=5),  # ts (ties likely)
                st.integers(min_value=0, max_value=2),  # fp
            ),
            min_size=1, max_size=14, unique=True,
        )
    )
    def test_scd2_sql_twin_property(raw):
        """Property: the DuckDB twin equals the python replica on random
        snapshot logs with heavy ts ties (sid = insertion index keeps the
        (ts, sid) order total)."""
        import duckdb

        rows = [(u, ts, fp, i) for i, (u, ts, fp) in enumerate(raw)]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE s2 (url VARCHAR, ts BIGINT, fp BIGINT, sid BIGINT)"
        )
        for r in rows:
            con.execute("INSERT INTO s2 VALUES (?, ?, ?, ?)", list(r))
        out = con.execute(
            crawl.scd2_intervals_sql("s2", "url", "ts", "fp", "sid")
        ).df()
        got = sorted(
            (r["url"], int(r["version_no"]), int(r["fp"]),
             int(r["valid_from"]), int(r["valid_to"]), int(r["n_snaps"]),
             int(r["is_current"]))
            for _, r in out.iterrows()
        )
        assert got == _scd2_brute(rows)

except ImportError:  # pragma: no cover
    pass
