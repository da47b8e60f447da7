#!/usr/bin/env python
"""Extended oracle-parity sweep at a larger scale factor (default sf0.1,
10x the driver's correctness gate): every oracle-backed catalog query is
checked value-identical against DuckDB — row count, sorted-column schema,
exact values (floats bitwise). Prints one line per query + a summary.

Usage: python scripts/parity_sweep.py [SF_DIR] [query_name ...]
(trailing args restrict the sweep to the named queries)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bayesianrecordlinkage_jl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark("parity-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    from bayesianrecordlinkage_jl_spark.plans.oracle_queries import (
        build_catalog,
    )

    cat = build_catalog()
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    at_gate = os.path.normpath(sf).endswith("sf0.01")
    sf_key = os.path.basename(os.path.normpath(sf))
    ok = bad = skipped = gate_locked = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            skipped += 1
            continue
        if cat.get(name, {}).get("gate_only") and not at_gate:
            # data-derived oracle structure: use the twin frozen for THIS
            # scale if the freeze script produced one, else skip
            by_sf = cat[name].get("sql_by_sf", {})
            if sf_key in by_sf:
                sql = by_sf[sf_key]
            else:
                gate_locked += 1
                print(f"SKIP {name}: no oracle structure frozen for {sf_key}")
                continue
        t0 = time.time()
        try:
            a = canon(queries[name](spark, sf).toPandas())
            t1 = time.time()
            b = canon(con.sql(sql).df())
            t2 = time.time()
            assert list(a.columns) == list(b.columns), "schema"
            assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
            for c in a.columns:
                x, y = a[c].values, b[c].values
                if x.dtype.kind == "f" or y.dtype.kind == "f":
                    assert np.array_equal(
                        x.astype(float), y.astype(float)
                    ), f"values {c}"
                else:
                    assert (
                        pd.Series(x).astype(str) == pd.Series(y).astype(str)
                    ).all(), f"values {c}"
            ok += 1
            print(
                f"PASS {name}: {len(a)} rows "
                f"(spark {t1 - t0:.1f}s, duckdb {t2 - t1:.1f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"FAIL {name}: {e}", flush=True)
    print(
        f"SUMMARY sf={sf}: {ok} pass, {bad} fail, {skipped} rows-only, "
        f"{gate_locked} gate-locked"
    )


if __name__ == "__main__":
    main()
