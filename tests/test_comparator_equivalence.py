"""Equivalence of the performance forms with the definitional forms:
  lev_ord_from_raw(levenshtein(a,b,thr), mx)  ==  lev_ord(a, b)
  token_jaccard_ord_from_counts(i, u)         ==  token_jaccard_ord(a, b)
  token_jaccard_ord_arrays(ta, tb)            ==  token_jaccard_ord(a, b)
on adversarial string batches (empty strings, nulls, identical, near-dup,
disjoint, unicode) — the guarantees the single-evaluation scoring path
rests on. Also: per-block solver agreement (hungarian == auction totals;
greedy optimal on unique-margin blocks) mirroring the reference's
all-variants-agree check (/root/reference/test/runtests.jl:107-225)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.functions import comparators as C

PREFIX = 24
THRESHOLD = PREFIX // 2


def _rand_text(rng: random.Random) -> str | None:
    mode = rng.random()
    if mode < 0.06:
        return None
    if mode < 0.12:
        return ""
    alpha = "ab dé"  # tiny alphabet incl. space + unicode
    n = rng.randint(1, 40)
    return "".join(rng.choice(alpha) for _ in range(n))


@pytest.fixture(scope="module")
def string_pairs(spark):
    rng = random.Random(1234)
    rows = []
    for _ in range(400):
        a = _rand_text(rng)
        if rng.random() < 0.4 and a:
            b = a if rng.random() < 0.3 else a[: max(0, len(a) - 2)] + "xx"
        else:
            b = _rand_text(rng)
        rows.append((a, b))
    return spark.createDataFrame(rows, "a string, b string").localCheckpoint()


def test_lev_raw_bin_equivalence(string_pairs):
    pa = F.substring("a", 1, PREFIX)
    pb = F.substring("b", 1, PREFIX)
    df = string_pairs.select(
        C.lev_ord(pa, pb).alias("ref"),
        C.lev_ord_from_raw(
            F.levenshtein(pa, pb, THRESHOLD),
            F.greatest(F.length(pa), F.length(pb)),
        ).alias("fast"),
    )
    assert df.where(
        ~(F.col("ref").eqNullSafe(F.col("fast")))
    ).count() == 0


def test_jaccard_forms_equivalence(string_pairs):
    ta = F.array_distinct(F.split("a", " "))
    tb = F.array_distinct(F.split("b", " "))
    i = F.size(F.array_intersect(ta, tb))
    u = F.size(ta) + F.size(tb) - i
    df = string_pairs.select(
        C.token_jaccard_ord(F.col("a"), F.col("b")).alias("ref"),
        C.token_jaccard_ord_arrays(ta, tb).alias("arrays"),
        C.token_jaccard_ord_from_counts(i, u).alias("counts"),
    )
    assert df.where(~(F.col("ref").eqNullSafe(F.col("arrays")))).count() == 0
    assert df.where(~(F.col("ref").eqNullSafe(F.col("counts")))).count() == 0


def test_jaro_winkler_bit_parity():
    """Batch JW kernel == scalar reference == DuckDB jaro_winkler_similarity,
    bit-exact, on adversarial pairs incl. multibyte UTF-8 (the comparator is
    defined over UTF-8 bytes precisely so the DuckDB oracle is strict)."""
    import duckdb

    rng = random.Random(11)

    def rnd():
        if rng.random() < 0.08:
            return ""
        alpha = "abc dé12猫"
        return "".join(rng.choice(alpha) for _ in range(rng.randint(1, 48)))

    pairs = []
    for _ in range(20000):
        a = rnd()
        r = rng.random()
        if r < 0.2:
            b = a
        elif r < 0.5 and a:
            b = a[: max(0, len(a) - 2)] + rng.choice("ab1é")
        elif r < 0.7 and a:
            lst = list(a)
            for _ in range(rng.randint(1, 3)):
                i = rng.randrange(len(lst))
                lst[i] = rng.choice("abc dé1")
            b = "".join(lst)
        else:
            b = rnd()
        pairs.append((a, b))
    sa = np.array([p[0] for p in pairs], dtype=object)
    sb = np.array([p[1] for p in pairs], dtype=object)
    batch = C._jaro_winkler_batch(sa, sb)
    sub = random.Random(7).sample(range(len(pairs)), 2000)
    scal = np.array([C._jaro_winkler(*pairs[i]) for i in sub])
    assert (batch[sub] == scal).all()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", pairs)
    dk = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT CASE WHEN a = b THEN 1.0 "
                "ELSE jaro_winkler_similarity(a, b) END FROM t"
            ).fetchall()
        ]
    )
    assert (batch == dk).all()
    # and the production kernel (_jw_sims: DuckDB C++ with numpy fallback)
    sims = C._jw_sims(sa, sb)
    assert (sims == batch).all()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.tuples(st.text(max_size=24), st.text(max_size=24)),
            min_size=1,
            max_size=40,
        )
    )
    def test_jw_batch_equals_scalar_hypothesis(pairs):
        """Property: the batch JW kernel is bit-identical to the scalar
        reference on arbitrary unicode inputs (hypothesis-generated)."""
        sa = np.array([p[0] for p in pairs], dtype=object)
        sb = np.array([p[1] for p in pairs], dtype=object)
        batch = C._jaro_winkler_batch(sa, sb)
        scal = np.array([C._jaro_winkler(a, b) for a, b in pairs])
        assert (batch == scal).all()

except ImportError:  # pragma: no cover
    pass


@pytest.mark.parametrize("seed", range(4))
def test_solver_variants_agree_on_blocks(spark, seed):
    """All one-to-one methods produce the same total weight per block (the
    reference asserts its six penalized-likelihood variants agree on pM and
    nassigned; here hungarian and auction are both exact so totals match,
    and block decomposition guarantees one-to-one globally)."""
    from bayesianrecordlinkage_jl_spark.operators import assignment

    rng = np.random.default_rng(seed)
    rows = []
    for blk in range(5):
        na, nb = int(rng.integers(1, 8)), int(rng.integers(1, 8))
        for ia in range(na):
            for ib in range(nb):
                if rng.random() < 0.6:
                    rows.append(
                        (blk * 100 + ia, 10_000 + blk * 100 + ib,
                         round(float(rng.uniform(-1, 3)), 3), blk)
                    )
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, w double, block_id long"
    )
    totals = {}
    for method in ("hungarian", "auction", "greedy"):
        links = assignment.one_to_one(df, method=method)
        assert assignment.assert_one_to_one(links)
        agg = links.groupBy("block_id").agg(F.sum("w").alias("tw")).collect()
        totals[method] = {r["block_id"]: r["tw"] for r in agg}
    for blk, tw in totals["hungarian"].items():
        assert totals["auction"].get(blk, 0.0) == pytest.approx(tw, abs=1e-6)
        # greedy is a lower bound but never exceeds the optimum
        assert totals["greedy"].get(blk, 0.0) <= tw + 1e-9


def test_damerau_levenshtein_parity():
    """Production DL batch kernel (_dl_dists: DuckDB C++ with scalar-DP
    fallback) == the scalar Lowrance-Wagner reference, exact, on
    adversarial pairs incl. transposition-heavy edits and multibyte UTF-8
    (the comparator is defined over UTF-8 BYTES, DuckDB's convention —
    'café' vs 'cafe' is distance 2, not 1)."""
    rng = random.Random(23)

    def rnd():
        if rng.random() < 0.08:
            return ""
        alpha = "abc dé12猫"
        return "".join(rng.choice(alpha) for _ in range(rng.randint(1, 32)))

    pairs = []
    for _ in range(4000):
        a = rnd()
        r = rng.random()
        if r < 0.2:
            b = a
        elif r < 0.5 and len(a) >= 2:
            lst = list(a)
            i = rng.randrange(len(lst) - 1)
            lst[i], lst[i + 1] = lst[i + 1], lst[i]  # adjacent transpose
            b = "".join(lst)
        elif r < 0.7 and a:
            b = a[: max(0, len(a) - 2)] + rng.choice("ab1é")
        else:
            b = rnd()
        pairs.append((a, b))
    sa = np.array([p[0] for p in pairs], dtype=object)
    sb = np.array([p[1] for p in pairs], dtype=object)
    got = C._dl_dists(sa, sb)
    ref = np.array(
        [
            C._damerau_levenshtein_bytes(a.encode("utf-8"), b.encode("utf-8"))
            for a, b in pairs
        ]
    )
    assert (got == ref).all()
    # unrestricted (not OSA): a transposed pair may be edited again
    assert C._dl_dists(np.array(["CA"], object), np.array(["ABC"], object))[0] == 2
    # byte convention on multibyte chars
    assert C._dl_dists(np.array(["café"], object), np.array(["cafe"], object))[0] == 2
    # transposition beats substitution-twice
    assert C._dl_dists(np.array(["teh"], object), np.array(["the"], object))[0] == 1
