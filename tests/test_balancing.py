"""Balancing-function identities (reference parity:
/root/reference/src/balancing_functions.jl:8-99): for every family the three
calling conventions agree, and values match the mathematical definition."""

import math

import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.functions import balancing as B

LOGX = [-30.0, -3.5, -1.0, -1e-9, 0.0, 1e-9, 0.75, 4.0, 30.0]


@pytest.fixture(scope="module")
def vals(spark):
    df = spark.createDataFrame([(lx,) for lx in LOGX], "logx double")
    out = df.select(
        "logx",
        B.lsqrt(F.col("logx")).alias("lsqrt"),
        B.sqrt_logx(F.col("logx")).alias("sqrt_logx"),
        B.lbarker(F.col("logx")).alias("lbarker"),
        B.barker_logx(F.col("logx")).alias("barker_logx"),
        B.barker(F.exp(F.col("logx"))).alias("barker"),
        B.lmin1(F.col("logx")).alias("lmin1"),
        B.min1_logx(F.col("logx")).alias("min1_logx"),
        B.min1(F.exp(F.col("logx"))).alias("min1"),
        B.lmax1(F.col("logx")).alias("lmax1"),
        B.max1_logx(F.col("logx")).alias("max1_logx"),
        B.max1(F.exp(F.col("logx"))).alias("max1"),
    ).collect()
    return {r["logx"]: r for r in out}


@pytest.mark.parametrize("lx", LOGX)
def test_definitions(vals, lx):
    r = vals[lx]
    x = math.exp(lx)
    assert r["lsqrt"] == pytest.approx(0.5 * lx)
    assert r["sqrt_logx"] == pytest.approx(math.sqrt(x))
    assert r["barker_logx"] == pytest.approx(x / (1.0 + x), rel=1e-12)
    assert r["lbarker"] == pytest.approx(math.log(x / (1.0 + x)), rel=1e-12)
    assert r["min1_logx"] == pytest.approx(min(x, 1.0))
    assert r["lmin1"] == pytest.approx(min(lx, 0.0))
    assert r["max1_logx"] == pytest.approx(max(x, 1.0))
    assert r["lmax1"] == pytest.approx(max(lx, 0.0))


@pytest.mark.parametrize("lx", LOGX)
def test_convention_consistency(vals, lx):
    """log-space, log-in, and plain conventions agree per family."""
    r = vals[lx]
    assert math.exp(r["lbarker"]) == pytest.approx(r["barker_logx"], rel=1e-12)
    assert r["barker"] == pytest.approx(r["barker_logx"], rel=1e-9)
    assert math.exp(r["lmin1"]) == pytest.approx(r["min1_logx"], rel=1e-12)
    assert r["min1"] == pytest.approx(r["min1_logx"], rel=1e-9)
    assert math.exp(r["lmax1"]) == pytest.approx(r["max1_logx"], rel=1e-12)
    assert r["max1"] == pytest.approx(r["max1_logx"], rel=1e-9)
    assert math.exp(r["lsqrt"]) == pytest.approx(r["sqrt_logx"], rel=1e-12)


def test_lbarker_stable_extremes(vals):
    """No overflow/NaN at |logx| = 30 (the naive lx - log(1+exp(lx)) form
    overflows much earlier than the stable identity)."""
    assert vals[30.0]["lbarker"] == pytest.approx(-math.log1p(math.exp(-30.0)))
    assert vals[-30.0]["lbarker"] == pytest.approx(-30.0 - math.log1p(math.exp(-30.0)))
