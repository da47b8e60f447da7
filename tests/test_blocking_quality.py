"""Blocking-evaluation metrics: synthetic replica + monotonicity."""

from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.operators import blocking


def test_blocking_quality_replica(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "s0"), (2, "en", "s0"), (3, "en", "s1"),
            (4, "de", "s0"), (5, "de", "s0"), (6, "de", "s1"),
        ],
        "doc_id long, lang string, source string",
    )
    truth = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 6), (2, 5)], "id_a long, id_b long"
    )
    rows = {
        r["scheme"]: r
        for r in blocking.blocking_quality(
            docs, "doc_id", [("lang",), ("lang", "source")], truth
        ).collect()
    }
    n_all = 6 * 5 // 2
    lang = rows["lang"]
    # blocks en(3), de(3) -> 3+3 candidate pairs
    assert lang["n_blocks"] == 2 and lang["n_candidate_pairs"] == 6
    # co-blocked truth: (1,2),(1,3),(4,6) same lang; (2,5) crosses
    assert lang["n_true_pairs"] == 4 and lang["n_true_coblocked"] == 3
    assert lang["reduction_ratio"] == 1.0 - 6 / float(n_all)
    assert lang["completeness"] == 3 / 4.0
    ls = rows["lang+source"]
    # blocks en+s0(2), en+s1(1), de+s0(2), de+s1(1) -> 1+0+1+0 pairs
    assert ls["n_blocks"] == 4 and ls["n_candidate_pairs"] == 2
    assert ls["n_true_coblocked"] == 1  # only (1,2)
    # finer schemes: higher reduction, lower-or-equal completeness
    assert ls["reduction_ratio"] > lang["reduction_ratio"]
    assert ls["completeness"] <= lang["completeness"]


def test_blocking_quality_catalog_monotone(spark):
    import __spark_entry__ as e

    rows = {
        r["scheme"]: r
        for r in e.queries()["blocking_quality"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"lang", "source", "lang+source"}
    for r in rows.values():
        assert 0.0 <= r["completeness"] <= 1.0
        assert 0.0 < r["reduction_ratio"] < 1.0
    assert (
        rows["lang+source"]["n_candidate_pairs"]
        <= min(rows["lang"]["n_candidate_pairs"],
               rows["source"]["n_candidate_pairs"])
    )
    assert (
        rows["lang+source"]["completeness"]
        <= min(rows["lang"]["completeness"], rows["source"]["completeness"])
    )


def test_blocking_rule_coverage_set_algebra(spark):
    """blocking_rule_coverage's mask histogram == set algebra over the
    three standalone rule queries' own pair sets (same catalog constants),
    and the mask totals are consistent: sum over masks containing bit b ==
    |rule b's distinct normalized pair set|."""
    from collections import Counter

    from bayesianrecordlinkage_jl_spark.plans.oracle_queries import (
        build_catalog,
    )

    d = "/root/testdata/sf0.001"
    cat = build_catalog()

    def pairset(name):
        df = cat[name]["spark"](spark, d).select("id_a", "id_b").toPandas()
        return {
            (min(a, b), max(a, b)) for a, b in zip(df.id_a, df.id_b)
        }

    r = {1: pairset("candidate_pairs"), 2: pairset("dedup_minhash_lsh"),
         4: pairset("snm_pairs")}
    exp = Counter()
    for p in r[1] | r[2] | r[4]:
        exp[sum(bit for bit, s in r.items() if p in s)] += 1
    got = cat["blocking_rule_coverage"]["spark"](spark, d).toPandas()
    assert {int(m): int(n) for m, n in zip(got.rule_mask, got.n_pairs)} == dict(exp)
    # at least one pair is multi-rule and one is single-rule on the fixture
    assert any(m > 4 or m == 3 for m in exp) and any(m in (1, 2, 4) for m in exp)
