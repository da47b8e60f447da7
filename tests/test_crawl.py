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
