"""Balancing transforms for locally-balanced proposals (Zanella 2019).

Reference semantics (re-expressed, not ported): the full exported family of
/root/reference/src/balancing_functions.jl:8-99 — each balancing function
g(x) applied to a likelihood ratio x, in three calling conventions:
plain x, log-space in/out (l*), and log-in/plain-out (*_logx).

All are scalar Catalyst column expressions (no UDFs). The numerically
stable identities used:
  lbarker(lx)  = -log1p(exp(-|lx|)) + min(lx, 0)   (== lx - log1pexp(lx))
  barker_logx  = logistic(lx) = 1 / (1 + exp(-lx))
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


# -- sqrt family: g(x) = sqrt(x) --------------------------------------------


def lsqrt(logx: Column) -> Column:
    """log g(x) from log x: 0.5 * logx."""
    return logx * 0.5


def sqrt_logx(logx: Column) -> Column:
    """g(x) from log x."""
    return F.exp(logx * 0.5)


# -- barker family: g(x) = x / (1 + x) --------------------------------------


def lbarker(logx: Column) -> Column:
    """log g(x) from log x, stable for large |logx|."""
    return F.least(logx, F.lit(0.0)) - F.log1p(F.exp(-F.abs(logx)))


def barker_logx(logx: Column) -> Column:
    """g(x) from log x — the logistic function."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logx))


def barker(x: Column) -> Column:
    return x / (x + F.lit(1.0))


# -- min1 family: g(x) = min(x, 1) -------------------------------------------


def lmin1(logx: Column) -> Column:
    return F.least(logx, F.lit(0.0))


def min1_logx(logx: Column) -> Column:
    return F.when(logx > 0, F.lit(1.0)).otherwise(F.exp(logx))


def min1(x: Column) -> Column:
    return F.least(x, F.lit(1.0))


# -- max1 family: g(x) = max(x, 1) -------------------------------------------


def lmax1(logx: Column) -> Column:
    return F.greatest(logx, F.lit(0.0))


def max1_logx(logx: Column) -> Column:
    return F.when(logx < 0, F.lit(1.0)).otherwise(F.exp(logx))


def max1(x: Column) -> Column:
    return F.greatest(x, F.lit(1.0))
