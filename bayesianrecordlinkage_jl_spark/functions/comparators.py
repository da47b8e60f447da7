"""Field comparators producing ordinal agreement levels (tinyint), level 0 = missing.

Reference semantics (NOT a port — re-expressed as Catalyst expressions):
  - levOrd: Levenshtein similarity binned at cuts {1.0, .75, .5} -> levels 1..4
    (/root/reference/vignette/example.jl:21-32, README.md:57-68)
  - boolOrd: exact match with missing -> level 0
    (/root/reference/vignette/example.jl:34-42)
  - level-0-is-missing convention (/root/reference/src/comparisonsummary.jl:11-12)

Every comparator here has TWO emitters from one definition:
  * a PySpark Column expression (JVM-side, whole-stage-codegen — no Python UDF)
  * an equivalent DuckDB SQL string (for the driver's oracle checks)
Similarity binning uses INTEGER arithmetic (e.g. sim >= .75  <=>
4*(maxlen-lev) >= 3*maxlen) so both engines bin identically with no float
edge cases.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# boolOrd: exact-match comparator. 0=missing, 1=agree, 2=disagree.
# ---------------------------------------------------------------------------


def bool_ord(a: Column, b: Column) -> Column:
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0))
        .when(a == b, F.lit(1))
        .otherwise(F.lit(2))
        .cast("tinyint")
    )


def bool_ord_sql(a: str, b: str) -> str:
    return (
        f"CAST(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 0 "
        f"WHEN {a} = {b} THEN 1 ELSE 2 END AS TINYINT)"
    )


# ---------------------------------------------------------------------------
# levOrd: Levenshtein-similarity comparator binned at {1.0, .75, .5}.
# sim = 1 - lev(a,b)/max(len(a),len(b));  levels: 1 sim==1, 2 sim>=.75,
# 3 sim>=.5, 4 otherwise, 0 missing.  Integer-arithmetic binning:
#   sim >= t  <=>  (maxlen - lev) * q >= p * maxlen  for t = p/q.
# ---------------------------------------------------------------------------


def lev_ord(a: Column, b: Column) -> Column:
    lev = F.levenshtein(a, b)
    mx = F.greatest(F.length(a), F.length(b))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0))
        .when(mx == 0, F.lit(1))  # both empty -> perfect agreement
        .when(lev == 0, F.lit(1))
        .when((mx - lev) * 4 >= mx * 3, F.lit(2))
        .when((mx - lev) * 2 >= mx, F.lit(3))
        .otherwise(F.lit(4))
        .cast("tinyint")
    )


def lev_ord_from_raw(lev: Column, mx: Column) -> Column:
    """lev_ord binning from precomputed raw measures: lev from
    F.levenshtein(a, b, threshold) — banded DP with early abandon, where
    -1 means distance > threshold — and mx = greatest(length(a),
    length(b)). Value-identical to lev_ord whenever threshold >= mx/2
    (every bin boundary is at distance <= mx/2; beyond it the level is 4
    regardless of the exact distance). Splitting raw-measure computation
    from binning lets the expensive DP run exactly once per pair (the
    binning CASE references lev/mx several times; inlined, each reference
    re-evaluates the whole DP)."""
    return (
        F.when(lev.isNull(), F.lit(0))
        .when(lev == 0, F.lit(1))  # covers mx == 0 (both empty)
        .when(lev < 0, F.lit(4))  # early-abandoned: distance > mx/2
        .when((mx - lev) * 4 >= mx * 3, F.lit(2))
        .when((mx - lev) * 2 >= mx, F.lit(3))
        .otherwise(F.lit(4))
        .cast("tinyint")
    )


def token_jaccard_ord_from_counts(i: Column, u: Column) -> Column:
    """token_jaccard_ord binning from precomputed intersection size i and
    union size u (= |A|+|B|-i for distinct arrays); i NULL marks a missing
    side. Same single-evaluation rationale as lev_ord_from_raw."""
    return (
        F.when(i.isNull(), F.lit(0))
        .when(u == 0, F.lit(1))
        .when(i * 10 >= u * 9, F.lit(1))
        .when(i * 10 >= u * 6, F.lit(2))
        .when(i * 10 >= u * 3, F.lit(3))
        .otherwise(F.lit(4))
        .cast("tinyint")
    )


def lev_ord_sql(a: str, b: str) -> str:
    lev = f"levenshtein({a}, {b})"
    mx = f"greatest(length({a}), length({b}))"
    return (
        f"CAST(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 0 "
        f"WHEN {mx} = 0 THEN 1 "
        f"WHEN {lev} = 0 THEN 1 "
        f"WHEN ({mx} - {lev}) * 4 >= {mx} * 3 THEN 2 "
        f"WHEN ({mx} - {lev}) * 2 >= {mx} THEN 3 "
        f"ELSE 4 END AS TINYINT)"
    )


# ---------------------------------------------------------------------------
# jaccardOrd: distinct-token Jaccard binned at {0.9, 0.6, 0.3}.
# |I|/|U| >= p/q  <=>  |I|*q >= |U|*p  (integer).
# Levels: 1 >= .9, 2 >= .6, 3 >= .3, 4 otherwise, 0 missing.
# ---------------------------------------------------------------------------


def token_jaccard_ord(a: Column, b: Column, sep: str = " ") -> Column:
    ta = F.array_distinct(F.split(a, sep))
    tb = F.array_distinct(F.split(b, sep))
    i = F.size(F.array_intersect(ta, tb))
    u = F.size(F.array_union(ta, tb))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0))
        .when(u == 0, F.lit(1))
        .when(i * 10 >= u * 9, F.lit(1))
        .when(i * 10 >= u * 6, F.lit(2))
        .when(i * 10 >= u * 3, F.lit(3))
        .otherwise(F.lit(4))
        .cast("tinyint")
    )


def token_jaccard_ord_arrays(ta: Column, tb: Column) -> Column:
    """token_jaccard_ord over PRE-tokenized distinct-token array columns.

    Value-identical to token_jaccard_ord(a, b) when
    ta = array_distinct(split(a, sep)) is computed upstream (per record,
    before the candidate-pair join) — the scale-critical form: tokenization
    runs once per document instead of once per candidate pair, and the
    union size is pure arithmetic |A|+|B|-|A∩B| (no union array built).
    """
    i = F.size(F.array_intersect(ta, tb))
    u = F.size(ta) + F.size(tb) - i
    return (
        F.when(ta.isNull() | tb.isNull(), F.lit(0))
        .when(u == 0, F.lit(1))
        .when(i * 10 >= u * 9, F.lit(1))
        .when(i * 10 >= u * 6, F.lit(2))
        .when(i * 10 >= u * 3, F.lit(3))
        .otherwise(F.lit(4))
        .cast("tinyint")
    )


def token_jaccard_ord_sql(a: str, b: str, sep: str = " ") -> str:
    ta = f"list_distinct(string_split({a}, '{sep}'))"
    tb = f"list_distinct(string_split({b}, '{sep}'))"
    i = f"len(list_intersect({ta}, {tb}))"
    u = f"len(list_distinct(list_concat({ta}, {tb})))"
    return (
        f"CAST(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 0 "
        f"WHEN {u} = 0 THEN 1 "
        f"WHEN {i} * 10 >= {u} * 9 THEN 1 "
        f"WHEN {i} * 10 >= {u} * 6 THEN 2 "
        f"WHEN {i} * 10 >= {u} * 3 THEN 3 "
        f"ELSE 4 END AS TINYINT)"
    )


# ---------------------------------------------------------------------------
# numeric band comparator: |a-b| binned by absolute cuts. 0 missing,
# 1 equal, 2 within first cut, ..., len(cuts)+2 beyond all cuts.
# ---------------------------------------------------------------------------


def num_band_ord(a: Column, b: Column, cuts: list[int]) -> Column:
    d = F.abs(a - b)
    expr = F.when(a.isNull() | b.isNull(), F.lit(0)).when(d == 0, F.lit(1))
    lvl = 2
    for c in cuts:
        expr = expr.when(d <= F.lit(c), F.lit(lvl))
        lvl += 1
    return expr.otherwise(F.lit(lvl)).cast("tinyint")


def num_band_ord_sql(a: str, b: str, cuts: list[int]) -> str:
    d = f"abs({a} - {b})"
    parts = [f"WHEN {a} IS NULL OR {b} IS NULL THEN 0", f"WHEN {d} = 0 THEN 1"]
    lvl = 2
    for c in cuts:
        parts.append(f"WHEN {d} <= {c} THEN {lvl}")
        lvl += 1
    return "CAST(CASE " + " ".join(parts) + f" ELSE {lvl} END AS TINYINT)"


# ---------------------------------------------------------------------------
# Jaro-Winkler comparator. Canonical Winkler convention (prefix bonus only
# when jaro > 0.7) — verified BIT-EXACT against DuckDB's
# jaro_winkler_similarity on 17k random/near-dup pairs, which makes the
# binned comparator DuckDB-oracle-checkable. Implemented as an
# Arrow-batched pandas UDF (the only Python-side comparator; everything
# above is pure Catalyst).
# ---------------------------------------------------------------------------


def _jaro_winkler(
    s1: str, s2: str, p: float = 0.1, boost_threshold: float = 0.7
) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * p * (1.0 - jaro)


def jaro_winkler_ord_sql(a: str, b: str) -> str:
    """DuckDB twin of jaro_winkler_ord. The a = b shortcut handles the one
    convention difference (DuckDB scores '' vs '' as 0); for a != b both
    engines' values are bit-identical, and jw = 1.0 <=> a = b (any
    difference forces matches < max or a transposition), so the bins align
    exactly."""
    jw = f"jaro_winkler_similarity({a}, {b})"
    return (
        f"CAST(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 0 "
        f"WHEN {a} = {b} THEN 1 "
        f"WHEN {jw} >= 0.92e0 THEN 2 "
        f"WHEN {jw} >= 0.85e0 THEN 3 "
        f"ELSE 4 END AS TINYINT)"
    )


def jaro_winkler_ord(a: Column, b: Column) -> Column:
    """JW similarity binned at {1.0, .92, .85} -> levels 1..4; 0 missing."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("tinyint")
    def _jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(sa, sb):
            if x is None or y is None:
                out.append(0)
                continue
            s = _jaro_winkler(x, y)
            if s == 1.0:
                out.append(1)
            elif s >= 0.92:
                out.append(2)
            elif s >= 0.85:
                out.append(3)
            else:
                out.append(4)
        return pd.Series(out, dtype="int8")

    return _jw(a, b)
