"""Driver-contract parity: every queries() entry matches its oracle_sql()
on DuckDB at sf0.01 — row count, sorted-column schema, and exact values
(floats compared bitwise; literals/association order are engineered for it)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only contract
        return
    ddf = duck.sql(sql).df()
    a, b = _canon(sdf), _canon(ddf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        x, y = a[c].values, b[c].values
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            assert np.array_equal(x.astype(float), y.astype(float)), c
        else:
            assert (pd.Series(x).astype(str) == pd.Series(y).astype(str)).all(), c


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"node", "component"}
