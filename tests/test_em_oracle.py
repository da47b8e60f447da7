"""estimate_em <-> plans/em_oracle.py recursive-CTE parity.

Two layers:
  * pin the DuckDB evaluation semantics the oracle's docstring claims
    (list_aggregate('sum') = 0.0-seeded strict left-to-right fold;
    `<repr>e0` literals parse bit-exactly while bare decimals double-
    round through DECIMAL) — if a DuckDB upgrade breaks either, these
    fail before any parity test mysteriously does;
  * bit-exact parity of the full EM fit on synthetic distinct-vector
    tables, including non-converged (max_iter-capped) runs.

The sf0.01 end-to-end parity of the `em_estimates` catalog entry is
covered by tests/test_oracle_parity.py like every other catalog row.
"""

import random

import duckdb
import pandas as pd
import pytest

from bayesianrecordlinkage_jl_spark.operators import em
from bayesianrecordlinkage_jl_spark.plans.em_oracle import estimate_em_sql, flit


def test_duckdb_list_sum_is_left_to_right_fold():
    con = duckdb.connect()
    rng = random.Random(9)
    for n in (2, 5, 13, 47, 200, 1000):
        xs = [rng.uniform(-1, 1) * 10 ** rng.randint(-15, 15) for _ in range(n)]
        lit = "[" + ",".join(flit(v) for v in xs) + "]"
        got = con.sql(f"SELECT list_aggregate({lit}, 'sum')").fetchone()[0]
        acc = 0.0
        for x in xs:
            acc += x
        assert got == acc, n
        # and list_reduce agrees (first-element-seeded variant)
        got_r = con.sql(f"SELECT list_reduce({lit}, (a, b) -> a + b)").fetchone()[0]
        acc_r = xs[0]
        for x in xs[1:]:
            acc_r += x
        assert got_r == acc_r, n


def test_duckdb_literal_forms():
    con = duckdb.connect()
    # the ulp trap: bare decimal literals go through DECIMAL and double-round
    v = 0.00044308006468156516
    bare = con.sql(f"SELECT CAST({v!r} AS DOUBLE)").fetchone()[0]
    assert bare != v  # this WRONG behavior is why flit appends e0
    rng = random.Random(123)
    for _ in range(2000):
        v = rng.uniform(-1, 1) * 10 ** rng.randint(-300, 300)
        assert con.sql(f"SELECT {flit(v)}").fetchone()[0] == v


GCOLS = ["ga", "gb"]
NLEV = {"ga": 3, "gb": 2}


def _run_both(dv: pd.DataFrame, **kw) -> tuple[pd.DataFrame, pd.DataFrame]:
    con = duckdb.connect()
    con.register("pairs_tbl", dv.loc[dv.index.repeat(dv["n_pairs"])][GCOLS])
    sql = estimate_em_sql("SELECT ga, gb FROM pairs_tbl", GCOLS, NLEV, **kw)
    ddf = con.sql(sql).df().sort_values(["field", "level"], ignore_index=True)
    params = em.estimate_em(dv, GCOLS, NLEV, **kw)
    rows = [
        (g, lvl + 1, float(params.pM[g][lvl]), float(params.pU[g][lvl]))
        for g in GCOLS
        for lvl in range(NLEV[g])
    ]
    pdf = pd.DataFrame(rows, columns=["field", "level", "pM", "pU"]).sort_values(
        ["field", "level"], ignore_index=True
    )
    return pdf, ddf


@pytest.mark.parametrize("kw", [{}, {"max_iter": 7}, {"p0": 0.31, "tol": 1e-4}])
def test_em_bitexact_synthetic(kw):
    rng = random.Random(5)
    rows = []
    vid = 0
    for ga in range(NLEV["ga"] + 1):  # level 0 = missing included
        for gb in range(NLEV["gb"] + 1):
            vid += 1
            rows.append(
                {"vec_id": vid, "ga": ga, "gb": gb, "n_pairs": rng.randint(1, 500)}
            )
    dv = pd.DataFrame(rows)
    pdf, ddf = _run_both(dv, **kw)
    assert list(pdf["field"]) == list(ddf["field"])
    assert list(pdf["level"]) == list(ddf["level"])
    for c in ("pM", "pU"):
        for a, b in zip(pdf[c], ddf[c]):
            assert a == b  # bitwise
