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
# when jaro > 0.7), computed over UTF-8 BYTES — the same convention as
# DuckDB's jaro_winkler_similarity (verified bit-exact incl. multibyte
# input; codepoint-level JW diverges from DuckDB on non-ASCII), which makes
# the binned comparator DuckDB-oracle-checkable with a strict value hash.
# Identical to codepoint JW on ASCII fields. Implemented as an
# Arrow-batched pandas UDF around a vectorized numpy kernel (the only
# Python-side comparator; everything above is pure Catalyst).
# ---------------------------------------------------------------------------


def _jaro_winkler(
    s1: str, s2: str, p: float = 0.1, boost_threshold: float = 0.7
) -> float:
    """Scalar reference implementation (byte-level); the hot path uses
    _jaro_winkler_batch, which is asserted bit-identical to this."""
    if s1 == s2:
        return 1.0
    s1, s2 = s1.encode("utf-8"), s2.encode("utf-8")
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


def jaro_winkler_micro(a: Column, b: Column) -> Column:
    """Raw JW similarity as a BIGINT in micro-units: floor(jw * 1e6).

    Bit-strict across engines because the underlying jw double is
    bit-identical (the batch kernel IS DuckDB's C++ implementation, with
    numpy/scalar fallbacks asserted bit-equal by
    test_comparator_equivalence), the * 1e6 is one IEEE op on that double,
    and floor is exact. Integer outputs make downstream sums/maxes
    order-free — the building block for Monge-Elkan (operators/simjoin.py),
    where per-token maxes are summed per pair."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _jw_micro(sa: pd.Series, sb: pd.Series) -> pd.Series:
        valid = sa.notna().to_numpy() & sb.notna().to_numpy()
        out = np.zeros(len(sa), dtype=np.int64)
        if valid.any():
            vi = np.nonzero(valid)[0]
            sims = _jw_sims(
                sa.to_numpy(dtype=object)[vi], sb.to_numpy(dtype=object)[vi]
            )
            out[vi] = np.floor(sims * 1e6).astype(np.int64)
        return pd.Series(out, dtype="int64")

    return _jw_micro(a, b)


def jaro_winkler_micro_sql(a: str, b: str) -> str:
    """DuckDB twin of jaro_winkler_micro (same '' vs '' convention fix as
    jaro_winkler_ord_sql: the kernel scores a = b as exactly 1.0)."""
    return (
        f"CAST(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 0 "
        f"WHEN {a} = {b} THEN 1000000 "
        f"ELSE floor(jaro_winkler_similarity({a}, {b}) * 1000000.0e0) "
        f"END AS BIGINT)"
    )


def _pad_codes(bstrs, lens, pad: int):
    """UTF-8 byte strings -> (n, Lmax) int16 byte matrix, padded with `pad`.
    One join + one frombuffer for the whole batch."""
    import numpy as np

    n = len(bstrs)
    L = int(lens.max()) if n else 0
    M = np.full((n, L), pad, dtype=np.int16)
    if L:
        buf = np.frombuffer(b"".join(bstrs), dtype=np.uint8).astype(np.int16)
        mask = np.arange(L) < lens[:, None]
        M[mask] = buf
    return M


def _jaro_winkler_batch(sa, sb, p: float = 0.1, boost_threshold: float = 0.7):
    """Vectorized Jaro-Winkler over two object arrays of non-null strings.

    Bit-identical to _jaro_winkler (same IEEE operation order); the per-row
    greedy match loop is replaced by a loop over CHARACTER POSITIONS with
    numpy masks over the whole batch — O(L1max) vectorized steps instead of
    O(n_rows * L1 * window) interpreted Python. Intended for bounded-length
    fields (the scoring path compares fixed prefixes); memory per step is
    O(batch * L2max)."""
    import numpy as np

    sa = np.asarray(sa, dtype=object)
    sb = np.asarray(sb, dtype=object)
    out = np.zeros(len(sa), dtype=np.float64)
    eq = sa == sb
    out[eq] = 1.0
    l1_all = np.fromiter((len(x) for x in sa), np.int64, len(sa))
    l2_all = np.fromiter((len(x) for x in sb), np.int64, len(sb))
    todo = ~eq & (l1_all > 0) & (l2_all > 0)
    if not todo.any():
        return out
    idx = np.nonzero(todo)[0]
    # byte-level (see header comment): C-encode once per row, then all
    # remaining work is vectorized over the batch
    ba = [x.encode("utf-8") for x in sa[idx]]
    bb = [x.encode("utf-8") for x in sb[idx]]
    l1 = np.fromiter((len(x) for x in ba), np.int64, len(ba))
    l2 = np.fromiter((len(x) for x in bb), np.int64, len(bb))
    # pads differ (-1 vs -2) so padding never matches padding or real chars
    A = _pad_codes(ba, l1, -1)
    B = _pad_codes(bb, l2, -2)
    n, L1 = A.shape
    L2 = B.shape[1]

    window = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    m1 = np.zeros((n, L1), dtype=bool)
    m2 = np.zeros((n, L2), dtype=bool)
    jidx = np.arange(L2)
    for i in range(L1):
        c = A[:, i]  # pad rows have c == -1, which never matches B
        lo = i - window
        hi = np.minimum(l2, i + window + 1)
        cand = (B == c[:, None]) & ~m2
        cand &= (jidx >= lo[:, None]) & (jidx < hi[:, None])
        found = cand.any(axis=1)
        j = cand.argmax(axis=1)  # first unmatched in-window occurrence
        m1[found, i] = True
        m2[found, j[found]] = True

    matches = m1.sum(axis=1)
    W = int(matches.max()) if n else 0
    M1 = np.full((n, W), -1, dtype=np.int64)
    M2 = np.full((n, W), -1, dtype=np.int64)
    if W:
        k1 = np.cumsum(m1, axis=1) - 1
        k2 = np.cumsum(m2, axis=1) - 1
        r, cidx = np.nonzero(m1)
        M1[r, k1[r, cidx]] = A[r, cidx]
        r, cidx = np.nonzero(m2)
        M2[r, k2[r, cidx]] = B[r, cidx]
    t = (((M1 != M2) & (M1 != -1)).sum(axis=1) // 2).astype(np.float64)

    mf = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / l1 + mf / l2 + (mf - t) / mf) / 3.0
    jaro = np.where(matches == 0, 0.0, jaro)

    w4 = min(4, L1, L2)
    if w4:
        pref = np.cumprod(A[:, :w4] == B[:, :w4], axis=1).sum(axis=1)
    else:
        pref = np.zeros(n, dtype=np.int64)
    jw = np.where(
        jaro > boost_threshold, jaro + pref * p * (1.0 - jaro), jaro
    )
    out[idx] = jw
    return out


_DUCK_JW = None  # per-worker cached DuckDB connection for the C++ JW kernel


def _jw_sims(va, vb):
    """Batch JW similarities for non-null string arrays. Primary kernel:
    DuckDB's C++ jaro_winkler_similarity on the whole Arrow batch
    (~0.4us/pair, measured ~180x the interpreted loop; threads=1 because
    Spark already parallelizes across tasks). Bit-parity of the three
    implementations (DuckDB / numpy batch / scalar reference) is asserted
    by test_comparator_equivalence. Falls back to the numpy batch kernel
    if duckdb is absent."""
    import numpy as np

    try:
        import duckdb
    except ImportError:
        maxlen = max((len(x) for x in np.concatenate([va, vb])), default=1)
        chunk = max(256, int(4_000_000 / max(maxlen, 1)))
        sims = np.empty(len(va), dtype=np.float64)
        for s0 in range(0, len(va), chunk):
            sl = slice(s0, s0 + chunk)
            sims[sl] = _jaro_winkler_batch(va[sl], vb[sl])
        return sims

    global _DUCK_JW
    if _DUCK_JW is None:
        _DUCK_JW = duckdb.connect()
        _DUCK_JW.execute("SET threads TO 1")
    df = pd.DataFrame({"a": va, "b": vb})
    _DUCK_JW.register("_jw_batch", df)
    out = _DUCK_JW.execute(
        "SELECT CASE WHEN a = b THEN CAST(1.0 AS DOUBLE) "
        "ELSE jaro_winkler_similarity(a, b) END AS s FROM _jw_batch"
    ).fetchnumpy()["s"]
    _DUCK_JW.unregister("_jw_batch")
    return np.asarray(out, dtype=np.float64)


def jaro_winkler_ord(a: Column, b: Column) -> Column:
    """JW similarity binned at {1.0, .92, .85} -> levels 1..4; 0 missing.
    Arrow-batched pandas UDF around a C (DuckDB) batch kernel — no per-row
    Python in the hot path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("tinyint")
    def _jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        valid = sa.notna().to_numpy() & sb.notna().to_numpy()
        lvl = np.zeros(len(sa), dtype=np.int8)
        if valid.any():
            vi = np.nonzero(valid)[0]
            sims = _jw_sims(
                sa.to_numpy(dtype=object)[vi], sb.to_numpy(dtype=object)[vi]
            )
            lv = np.full(len(vi), 4, dtype=np.int8)
            lv[sims >= 0.85] = 3
            lv[sims >= 0.92] = 2
            lv[sims == 1.0] = 1
            lvl[vi] = lv
        return pd.Series(lvl, dtype="int8")

    return _jw(a, b)


# ---------------------------------------------------------------------------
# Phonetic blocking key — a Soundex-style code as ONE expression string
# valid verbatim in BOTH Spark SQL and DuckDB (upper/substr/translate/
# replace/rpad only; no regex, because DuckDB's RE2 lacks the backreference
# a collapse pattern needs). Deliberate, documented divergence from classic
# Soundex: adjacent equal codes are collapsed AFTER vowel mapping, so
# vowel-separated repeats also collapse — the SAME rule in both engines,
# which is exactly what the oracle certifies. Standard blocking function
# for person-name linkage (Fellegi-Sunter practice; the reference blocks on
# exact fields only).

_PHONETIC_SRC = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_PHONETIC_DST = "11112222222233455600000000"


def phonetic_key_sql(col: str) -> str:
    """4-char phonetic code: first letter + first 3 consonant classes.
    Repeat collapse = 5 passes of pairwise replaces (each pass halves any
    run of equal digits, exact for runs <= 32 => names <= 32 chars)."""
    up = f"upper({col})"
    first = f"substr({up}, 1, 1)"
    s = f"translate(substr({up}, 2), '{_PHONETIC_SRC}', '{_PHONETIC_DST}')"
    for _ in range(5):
        for d in "0123456":
            s = f"replace({s}, '{d}{d}', '{d}')"
    s = f"replace({s}, '0', '')"
    return f"rpad({first} || {s}, 4, '0')"


def phonetic_key(col: str) -> Column:
    """Column form of phonetic_key_sql (col is a column NAME — the
    expression is server-parsed as one string, per the literal-construction
    invariant)."""
    return F.expr(phonetic_key_sql(col))


# --- Damerau-Levenshtein (unrestricted, UTF-8 bytes) --------------------
#
# The reference's string model is plain Levenshtein (levOrd,
# /root/reference/src/... vignette comparators); adjacent-transposition
# typos ("teh", "recieve") cost 2 there but 1 under Damerau-Levenshtein —
# the standard typo model for name/field linkage. UNRESTRICTED DL (a
# transposed pair may be edited again later) rather than the easier OSA
# restriction, because the cross-engine kernel (DuckDB damerau_levenshtein)
# implements unrestricted DL over UTF-8 BYTES — same byte convention as the
# JW comparator above, and the same hot-path design: the C kernel runs
# inside the Arrow-batched pandas UDF (threads=1; Spark parallelizes across
# tasks), with a pure-Python scalar reference for environments without
# duckdb and for three-way bit-parity tests.


def _damerau_levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Scalar reference: unrestricted Damerau-Levenshtein over byte
    strings (Lowrance-Wagner 1975 alphabet-array DP). O(|a||b|)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxd = la + lb
    da: dict[int, int] = {}
    # matrix with sentinel row/col at index 0 (maxd) and offset +1 rows
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxd
    for i in range(la + 1):
        d[i + 1][0] = maxd
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxd
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            k = da.get(cb, 0)
            ell = db
            if ca == cb:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,            # substitute
                d[i + 1][j] + 1,           # insert
                d[i][j + 1] + 1,           # delete
                d[k][ell] + (i - k - 1) + 1 + (j - ell - 1),  # transpose
            )
        da[ca] = i
    return d[la + 1][lb + 1]


_DUCK_DL = None  # per-worker cached DuckDB connection for the C++ DL kernel


def _dl_dists(va, vb):
    """Batch unrestricted-DL distances for non-null string arrays.
    Primary kernel: DuckDB's C++ damerau_levenshtein over the whole Arrow
    batch; fallback: the scalar reference. Bit parity asserted by
    test_comparator_equivalence."""
    import numpy as np

    try:
        import duckdb
    except ImportError:
        return np.fromiter(
            (
                _damerau_levenshtein_bytes(
                    x.encode("utf-8"), y.encode("utf-8")
                )
                for x, y in zip(va, vb)
            ),
            np.int64,
            len(va),
        )

    global _DUCK_DL
    if _DUCK_DL is None:
        _DUCK_DL = duckdb.connect()
        _DUCK_DL.execute("SET threads TO 1")
    df = pd.DataFrame({"a": va, "b": vb})
    _DUCK_DL.register("_dl_batch", df)
    out = _DUCK_DL.execute(
        "SELECT CASE WHEN a = b THEN 0 "
        "ELSE damerau_levenshtein(a, b) END AS dist FROM _dl_batch"
    ).fetchnumpy()["dist"]
    _DUCK_DL.unregister("_dl_batch")
    return np.asarray(out, dtype=np.int64)


def damerau_ord(a: Column, b: Column) -> Column:
    """Unrestricted-DL distance binned {0, 1, 2, >2} -> levels 1..4;
    0 missing — the levOrd convention with the typo-aware metric.
    Arrow-batched pandas UDF around the DuckDB C kernel; no per-row
    Python in the hot path (the scalar DP is the no-duckdb fallback)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("tinyint")
    def _dl(sa: pd.Series, sb: pd.Series) -> pd.Series:
        valid = sa.notna().to_numpy() & sb.notna().to_numpy()
        lvl = np.zeros(len(sa), dtype=np.int8)
        if valid.any():
            vi = np.nonzero(valid)[0]
            dist = _dl_dists(
                sa.to_numpy(dtype=object)[vi], sb.to_numpy(dtype=object)[vi]
            )
            lv = np.full(len(vi), 4, dtype=np.int8)
            lv[dist <= 2] = 3
            lv[dist <= 1] = 2
            lv[dist == 0] = 1
            lvl[vi] = lv
        return pd.Series(lvl, dtype="int8")

    return _dl(a, b)


def damerau_ord_sql(a: str, b: str) -> str:
    """DuckDB twin of damerau_ord (the oracle IS the primary kernel, so
    parity is structural)."""
    return (
        f"CAST(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 0 "
        f"WHEN {a} = {b} THEN 1 "
        f"WHEN damerau_levenshtein({a}, {b}) <= 1 THEN 2 "
        f"WHEN damerau_levenshtein({a}, {b}) <= 2 THEN 3 "
        f"ELSE 4 END AS TINYINT)"
    )
