"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship linkage query — candidate-pair blocking over the
sf0.001 documents table, Fellegi-Sunter scoring, connected-components
entity clustering — returning the cluster assignment table.

queries()/oracle_sql(): the operator catalog from
bayesianrecordlinkage_jl_spark.plans.oracle_queries — every SQL-expressible
stage of the SURVEY.md §2 inventory has a DuckDB oracle generated from the
same constants as the Spark implementation (value-identical incl. doubles).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from bayesianrecordlinkage_jl_spark.plans.oracle_queries import build_catalog

_CATALOG = build_catalog()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: FS-scored candidate pairs
    -> positive-weight graph -> connected-components entity clusters."""
    return _CATALOG["connected_components"]["spark"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: ent["spark"] for name, ent in _CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: ent["sql"] for name, ent in _CATALOG.items() if ent.get("sql")
    }
