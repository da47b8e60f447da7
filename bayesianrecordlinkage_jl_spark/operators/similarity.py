"""Similarity search over embedding columns (array<float>).

  - brute_force_topk: exact cosine top-k via JVM-side F.aggregate/zip_with
    dot products (no Python in the hot path); the baseline.
  - lsh_bucketed_topk: random-hyperplane (sign-LSH) bucketing, exact rerank
    within buckets — the scale path (equi-join on bucket key instead of the
    full cross product; at 100 TB buckets bound the join fan-out).

Dot products run on doubles with left-to-right array order in BOTH engines
(Spark F.aggregate over zip_with; DuckDB list_sum over list_transform) so
the oracle compare is bit-stable.
"""

from __future__ import annotations

import pandas as pd  # annotation target for the Arrow band-key kernel
from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import phash


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_kernel():
    """Arrow-batched numpy twin of `cosine` for high-volume reranks —
    bit-identical values: elementwise products are exact, np.cumsum
    accumulates strictly left-to-right like the aggregate fold, np.sqrt
    and the final division are single IEEE ops shared by both engines.
    The fold's leading 0.0 means its dot can never be -0.0, so the kernel
    adds +0.0 to the dot (turns -0.0 into +0.0, leaves every other value
    unchanged). Bit parity is property-asserted by
    test_dedup_similarity::test_cosine_kernel_matches_expression.
    Fixed-size chunks bound per-batch numpy memory."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    chunk = 4096

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        out = []
        a_, b_ = a.to_numpy(), b.to_numpy()
        for lo in range(0, len(a_), chunk):
            A = np.stack(a_[lo : lo + chunk]).astype(np.float64)
            B = np.stack(b_[lo : lo + chunk]).astype(np.float64)
            dot = np.cumsum(A * B, axis=1)[:, -1] + 0.0
            na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
            nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
            out.append(dot / (na * nb))
        return pd.Series(np.concatenate(out))

    return _cos


def _dot_sql(a: str, b: str) -> str:
    # element-wise via index map to keep left-to-right order identical
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"


def cosine_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)}))"


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of `queries` against `df`.

    queries: (id_col, vec_col) subset. Broadcast the (small) query side and
    scan the corpus once; rank per query with a window.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism * 2
    corpus = df.repartition(n_part, id_col).select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("_v")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"))
    joined = corpus.crossJoin(F.broadcast(q)).where(
        F.col("item_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "item_id",
        cosine(F.col("_q"), F.col("_v")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "sim", "rank")
    )


def brute_force_topk_sql(
    table: str, id_col: str, vec_col: str, query_filter: str, k: int = 5
) -> str:
    cos = cosine_sql("q._q", "c._v")
    return f"""
    WITH corpus AS (SELECT {id_col} AS item_id, {vec_col} AS _v FROM {table}),
    q AS (SELECT {id_col} AS query_id, {vec_col} AS _q FROM {table} WHERE {query_filter}),
    scored AS (
      SELECT q.query_id, c.item_id, {cos} AS sim
      FROM corpus c CROSS JOIN q WHERE c.item_id != q.query_id
    )
    SELECT query_id, item_id, sim, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, item_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _py_phash(s: str) -> int:
    """Driver-side replica of functions.text.phash (first 15 hex digits of
    md5 as int) — lets plane constants be computed once in Python and
    embedded as identical literals in both emitters."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane components in [-1, 1]."""
    return [
        [
            (_py_phash(f"hp{seed}:{b}:{i}") % 2_000_001) / 1_000_000.0 - 1.0
            for i in range(dim)
        ]
        for b in range(n_planes)
    ]


def _flit(x: float) -> str:
    """DuckDB double literal robust to exponent reprs."""
    r = repr(x)
    return f"CAST('{r}' AS DOUBLE)" if "e" in r or "E" in r else f"{r}e0"


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-LSH bucket key: bit b = (dot(vec, h_b) > 0); plane components
    are Python-computed constants (literals in the plan — zero per-row
    hashing)."""
    bits = []
    for b, plane in enumerate(hyperplanes(dim, n_planes, seed)):
        arr = F.array(*[F.lit(x) for x in plane])
        bits.append(F.when(_dot(vec, arr) > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out.cast("int")


def hyperplane_bucket_sql(vec: str, dim: int, n_planes: int = 8, seed: int = 42) -> str:
    terms = []
    for b, plane in enumerate(hyperplanes(dim, n_planes, seed)):
        arr = "[" + ", ".join(_flit(x) for x in plane) + "]"
        dot = (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({arr})[i]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS INT)"


def band_set_keys(
    vec_expr: str, dim: int, n_planes: int, n_band_sets: int, seed: int = 42
) -> Column:
    """Array of `n_band_sets` INDEPENDENT sign-LSH keys (set s uses planes
    seeded seed+s; the set index is folded into the key so different sets
    never equi-join). OR-ing several plane sets is the sign-LSH analog of
    MinHash bands: a pair at angle theta collides in >= 1 set with
    probability 1 - (1 - (1-theta/pi)^n_planes)^n_band_sets, which drives
    near-dup recall -> 1 where a single plane set plateaus around 0.5.

    `vec_expr` is the COLUMN NAME (or SQL expression) of the vector: the
    whole key array is emitted as ONE F.expr string parsed server-side.
    Building the same tree with nested F.lit/F.array/zip_with costs one
    py4j round trip per literal — 4096 of them took ~6s of DRIVER time per
    DataFrame build at the 8x8x64 default (execution itself is ~1.6s);
    the string form parses in milliseconds and produces the IDENTICAL
    expression (CAST('repr' AS DOUBLE) literals, left-to-right aggregate),
    so oracle parity is unchanged."""
    keys = []
    for s in range(n_band_sets):
        bits = []
        for b, plane in enumerate(hyperplanes(dim, n_planes, seed + s)):
            arr = ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in plane)
            dot = (
                f"aggregate(zip_with({vec_expr}, array({arr}), "
                f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
        keys.append(
            f"(CAST({s << n_planes} AS BIGINT) "
            f"+ CAST(({' + '.join(bits)}) AS BIGINT))"
        )
    return F.expr("array(" + ", ".join(keys) + ")")


def band_set_keys_kernel(
    dim: int, n_planes: int = 8, n_band_sets: int = 8, seed: int = 42
):
    """Arrow-batched numpy twin of band_set_keys — the hot-path key
    emitter (measured ~2x the interpreted aggregate/zip_with expression
    form at sf0.1; the expression form stays as the reference twin and
    the shape the SQL oracle shares).

    Bit parity: products are elementwise-exact and np.cumsum along the
    vector axis accumulates strictly left-to-right, matching the
    aggregate fold's ((0+v1)+v2)+... order, so every partial sum is
    IEEE-identical to the expression form. The only representable
    divergence is the fold's leading 0.0 turning a -0.0 dot into +0.0 —
    and a +/-0.0 dot fails the `> 0` sign test either way, so emitted
    keys are bit-identical (property-asserted by
    test_dedup_similarity::test_band_key_kernel_matches_expression).

    Rows are processed in fixed chunks so the (chunk, n_hashes, dim)
    product tensor stays ~30 MB per Python worker regardless of Arrow
    batch size."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.array(
        [
            p
            for s in range(n_band_sets)
            for p in hyperplanes(dim, n_planes, seed + s)
        ],
        dtype=np.float64,
    )
    W = 1 << np.arange(n_planes, dtype=np.int64)
    OFF = np.arange(n_band_sets, dtype=np.int64) << n_planes
    ns, npl, chunk = n_band_sets, n_planes, 1024

    @pandas_udf("array<long>")
    def _keys(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        out = []
        arr = v.to_numpy()
        for lo in range(0, len(arr), chunk):
            V = np.stack(arr[lo : lo + chunk]).astype(np.float64)
            dots = np.cumsum(V[:, None, :] * P[None, :, :], axis=2)[:, :, -1]
            bits = (dots > 0).reshape(len(V), ns, npl)
            out.append((bits * W).sum(axis=2) + OFF)
        return pd.Series(list(np.concatenate(out)))

    return _keys


def band_set_keys_sql(
    vec: str, dim: int, n_planes: int, n_band_sets: int, seed: int = 42
) -> str:
    keys = ", ".join(
        f"CAST({s << n_planes} + {hyperplane_bucket_sql(vec, dim, n_planes, seed + s)} AS BIGINT)"
        for s in range(n_band_sets)
    )
    return f"unnest([{keys}])"


def lsh_bucketed_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_filter: str,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_band_sets: int = 8,
) -> str:
    bucket = band_set_keys_sql("_vv", dim, n_planes, n_band_sets)
    cos = cosine_sql("_q", "_v")
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT {id_col} AS _id, {vec_col} AS _vv, {bucket} AS _bk FROM {table}
    ),
    corpus AS (SELECT _id AS item_id, _vv AS _v, _bk FROM hashed),
    q AS (SELECT _id AS query_id, _vv AS _q, _bk FROM hashed
          WHERE {query_filter.replace(id_col, '_id')}),
    cand AS (
      SELECT q.query_id, c.item_id,
             any_value(q._q) AS _q, any_value(c._v) AS _v
      FROM corpus c JOIN q ON c._bk = q._bk AND c.item_id != q.query_id
      GROUP BY q.query_id, c.item_id
    ),
    scored AS (SELECT query_id, item_id, {cos} AS sim FROM cand)
    SELECT query_id, item_id, sim, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, item_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def train_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 8,
    iters: int = 5,
    sample_rows: int = 2048,
) -> list[list[float]]:
    """Deterministic spherical k-means on a bounded id-ordered sample —
    the IVF coarse quantizer. Driver numpy on <= sample_rows vectors;
    deterministic (evenly-spaced init over the ordered sample, fixed
    iteration count), so the centroid table is a pure literal that both
    the Spark plan and the DuckDB oracle can share. At full scale use
    train_centroids_distributed (below) — full-corpus passes, nothing but
    the k x dim centroid table on the driver; the serving path is
    unchanged (centroids are a broadcast literal either way)."""
    import numpy as np

    pdf = df.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).toPandas()
    X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    idx = np.linspace(0, len(X) - 1, n_centroids).astype(int)
    C = X[idx].copy()
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        for c in range(n_centroids):
            m = X[a == c]
            if len(m):
                v = m.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return [[float(x) for x in row] for row in C]


def train_centroids_distributed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 8,
    iters: int = 5,
) -> list[list[float]]:
    """Distributed spherical k-means — the at-scale twin of
    train_centroids (which samples to the driver). Every pass is one
    narrow job over the FULL corpus, never a driver-side sample:

      * init: the n_centroids rows with the smallest md5(id) — a
        distributed top-k (TakeOrdered), deterministic, no full sort;
      * assign: map-side argmax over a literal centroid-dot array (the
        same one-F.expr scorer the ivf_topk serving path uses — no
        explode, no corpus shuffle, ties to the smaller cid);
      * update: per-element F.sum over the dim array slots + a count —
        partial aggregation combines map-side, so the shuffle carries
        n_centroids x (dim+1) doubles per map partition and nothing else;
        the k x dim means are re-normalized on the driver.

    The normalized corpus is localCheckpoint'ed once (consumed by every
    iteration). Driver loop = `iters` jobs on purpose (like
    threshold_sensitivity) — each job is a full-corpus scan, which is the
    point at 100 TB: nothing ever funnels through the driver except the
    k x dim centroid table itself. Output feeds the same freeze path as
    train_centroids (oracle centroids stay frozen literals,
    plans/ivf_centroids.json — a trainer can never run at query time).
    Empty clusters keep their previous centroid. Float sums are
    partitioning-order-dependent, so cross-partitioning determinism is
    approximate (unlike the frozen serving literals, which are exact).

    Reference analog: the coarse-quantizer training the IVF literature
    assumes (Jegou et al.); the reference repo has no ANN surface.
    """
    import numpy as np

    n = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_nv", F.greatest(_norm(F.col("_v")), F.lit(1e-12)))
    vn = n.select(
        "_id",
        F.expr("transform(_v, x -> CAST(x AS DOUBLE) / _nv)").alias("_vn"),
    ).localCheckpoint()

    seed_rows = (
        vn.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .select("_vn")
        .collect()
    )
    C = np.array([r["_vn"] for r in seed_rows], dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    dim = C.shape[1]

    for _ in range(iters):
        dots = []
        for c in C:
            arr = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in c)
            dots.append(
                f"aggregate(zip_with(_vn, array({arr}), "
                f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        sc = F.expr("array(" + ", ".join(dots) + ")")
        assigned = vn.select(
            (F.array_position(sc, F.array_max(sc)) - 1).cast("int").alias("cid"),
            "_vn",
        )
        stats = (
            assigned.groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at("_vn", i + 1)).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        for r in stats:
            v = np.array([r[f"_s{i}"] for i in range(dim)]) / r["_n"]
            nv = np.linalg.norm(v)
            if nv > 0:
                C[r["cid"]] = v / nv
    return [[float(x) for x in row] for row in C]


def _py_seq_norm(c: list[float]) -> float:
    """Centroid norm computed with the SAME sequential IEEE op order as
    both engines' folds (left-to-right acc += x*x, then sqrt), so
    embedding it as a literal keeps the cosine bit-exact."""
    import math

    acc = 0.0
    for x in c:
        acc += x * x
    return math.sqrt(acc)


def centroid_scores(v: str, nv: str, centroids: list[list[float]]) -> Column:
    """Per-row cosine-to-every-centroid as ONE array column: 1 hoisted
    vector-norm + k literal-dot products per row (centroid norms are
    Python constants); an argmax over it is a MAP-SIDE assignment
    (array_position of the max — first occurrence, i.e. ties to the
    smaller cid, identical to the oracles' ORDER BY cscore DESC, cid ASC).
    No explode, no shuffle of the (huge) corpus side. Emitted as ONE
    F.expr string (a nested-F.lit build pays a py4j round trip per
    literal — see band_set_keys); CAST('repr' AS DOUBLE) literals keep
    values bit-identical to the F.lit form and the oracle."""
    terms = []
    for c in centroids:
        arr = ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c)
        dot = (
            f"aggregate(zip_with({v}, array({arr}), "
            f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"({dot} / ({nv} * CAST('{_py_seq_norm(c)!r}' AS DOUBLE)))")
    return F.expr("array(" + ", ".join(terms) + ")")


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN top-k: corpus vectors live in the inverted list of their
    nearest centroid (cosine argmax, ties to the smaller cid); each query
    probes its `nprobe` nearest lists and reranks exactly inside them.

    The candidate join is an equi-join on cid — the IVF analog of the
    sign-LSH bucket join; recall is controlled by nprobe (the standard
    IVF knob). Centroids ride as a broadcast literal table."""
    corpus = df.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("_v"))

    def _cent_scores(v: str, nv: str) -> Column:
        return centroid_scores(v, nv, centroids)

    corpus = corpus.withColumn("_nv", _norm(F.col("_v")))
    sc = _cent_scores("_v", "_nv")
    assign = corpus.select(
        "item_id",
        "_v",
        (F.array_position(sc, F.array_max(sc)) - 1).cast("int").alias("cid"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    ).withColumn("_nq", _norm(F.col("_q")))
    qa = q.select(
        "query_id", "_q", F.posexplode(_cent_scores("_q", "_nq"))
    ).withColumnsRenamed({"pos": "cid", "col": "cscore"})
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cscore"), F.asc("cid"))
    probes = (
        qa.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= nprobe)
        .select("query_id", "_q", F.col("cid").cast("int").alias("cid"))
    )
    cand = assign.join(probes, on="cid").where(
        F.col("item_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "item_id", cosine(F.col("_q"), F.col("_v")).alias("sim")
    )
    w3 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w3))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "sim", "rank")
    )


def ivf_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_filter: str,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
) -> str:
    vals = ", ".join(
        "(" + str(i) + ", [" + ", ".join(_flit(x) for x in c) + "])"
        for i, c in enumerate(centroids)
    )
    cos_assign = cosine_sql("c._v", "ct._c")
    cos_probe = cosine_sql("q._q", "ct._c")
    cos = cosine_sql("p._q", "a._v")
    return f"""
    WITH cents(cid, _c) AS (VALUES {vals}),
    corpus AS (SELECT {id_col} AS item_id, {vec_col} AS _v FROM {table}),
    ca AS (SELECT c.item_id, c._v, ct.cid, {cos_assign} AS cscore
           FROM corpus c CROSS JOIN cents ct),
    assign AS (SELECT item_id, _v, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY item_id
                  ORDER BY cscore DESC, cid ASC) AS _r FROM ca) WHERE _r = 1),
    q AS (SELECT {id_col} AS query_id, {vec_col} AS _q FROM {table}
          WHERE {query_filter}),
    qa AS (SELECT q.query_id, q._q, ct.cid, {cos_probe} AS cscore
           FROM q CROSS JOIN cents ct),
    probes AS (SELECT query_id, _q, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cscore DESC, cid ASC) AS _r FROM qa)
        WHERE _r <= {nprobe}),
    scored AS (SELECT p.query_id, a.item_id, {cos} AS sim
               FROM assign a JOIN probes p
                 ON a.cid = p.cid AND a.item_id != p.query_id)
    SELECT query_id, item_id, sim, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, item_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def lsh_bucketed_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_band_sets: int = 8,
    key_impl: str = "arrow",
) -> DataFrame:
    """ANN: exact rerank within sign-LSH buckets, OR-ed over `n_band_sets`
    independent plane sets (equi-join on (set, bucket) key).

    Each corpus/query row explodes into n_band_sets keyed (id, key) rows —
    the band join itself is NARROW (ids and 8-byte keys only; the vector
    payload never rides the explode). Candidate pairs hit in several sets
    are deduped (distinct) before vectors are re-attached: the query side
    by broadcast (queries are small by contract, as in brute_force_topk),
    the corpus side by one id-keyed equi-join. Each survivor then pays
    exactly one exact-cosine rerank. With the 8x8 default a true-neighbor
    pair at cos >= 0.95 is recalled with p ~ 0.99 (vs ~0.43 for one
    8-plane set).

    key_impl: "arrow" (default) = band_set_keys_kernel, the numpy batch
    kernel; "expr" = the pure-Catalyst expression twin (bit-identical
    keys — see the kernel docstring)."""
    if key_impl == "arrow":
        kern = band_set_keys_kernel(dim, n_planes, n_band_sets)
        keys = kern(F.col(vec_col))
    else:
        keys = band_set_keys(vec_col, dim, n_planes, n_band_sets)
    corpus_keyed = df.select(
        F.col(id_col).alias("item_id"), F.explode(keys).alias("_bk")
    )
    q_keyed = queries.select(
        F.col(id_col).alias("query_id"), F.explode(keys).alias("_bk")
    )
    pairs = (
        corpus_keyed.join(q_keyed, on="_bk")
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    )
    cvec = df.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("_v"))
    cand = pairs.join(cvec, on="item_id").join(F.broadcast(qvec), on="query_id")
    sim = (
        cosine_kernel()(F.col("_q"), F.col("_v"))
        if key_impl == "arrow"
        else cosine(F.col("_q"), F.col("_v"))
    )
    scored = cand.select("query_id", "item_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: compressed-domain asymmetric-distance scan
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    sample_rows: int = 2048,
) -> list[list[list[float]]]:
    """Deterministic per-subspace L2 k-means — the PQ codebooks (Jegou,
    Douze & Schmid 2011, "Product quantization for nearest neighbor
    search"). The dim-length vector is split into n_sub contiguous
    subvectors; each subspace gets its own n_codes-entry codebook, so a
    corpus vector compresses to n_sub small integers (n_sub=8, n_codes=16
    => 8 codes of 4 bits: 64 float32 dims -> 4 bytes, a 64x corpus-memory
    reduction — the knob that lets an ANN index over 100 TB of embeddings
    live in executor memory).

    Driver numpy on an id-ordered <= sample_rows sample, evenly-spaced
    init, fixed iteration count — deterministic, so the codebook table is
    a pure literal both the Spark plan and the DuckDB oracle can share
    (frozen to plans/pq_codebooks.json; the freeze-don't-train-at-query-
    time rule of plans/ivf_centroids.json). At full scale train each
    subspace with the same distributed pattern as
    train_centroids_distributed (map-side literal argmin + per-slot sums);
    the serving path below is unchanged either way.

    Reference analog: ANN scale path beyond the reference's surface (the
    reference repo has no similarity-search operators); completes the
    brute-force / sign-LSH / IVF family with the compressed-domain scan.
    """
    import numpy as np

    pdf = df.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).toPandas()
    X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    dsub = dim // n_sub
    books: list[list[list[float]]] = []
    for m in range(n_sub):
        S = X[:, m * dsub : (m + 1) * dsub]
        idx = np.linspace(0, len(S) - 1, n_codes).astype(int)
        C = S[idx].copy()
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d, axis=1)
            for c in range(n_codes):
                rows = S[a == c]
                if len(rows):
                    C[c] = rows.mean(0)
        books.append([[float(x) for x in row] for row in C])
    return books


def _pq_elem(engine: str):
    if engine == "spark":
        return lambda v, i: f"element_at({v}, {i})"
    return lambda v, i: f"{v}[{i}]"


def _pq_sq_dists(vec: str, book: list[list[float]], lo: int, engine: str) -> list[str]:
    """Unrolled ||v_sub - c||^2 per codeword: left-to-right sum of
    squared differences, every operand CAST AS DOUBLE — the identical
    token stream (modulo element-access syntax) in both engines, so
    encode argmins agree bitwise."""
    elem = _pq_elem(engine)
    out = []
    for cent in book:
        terms = []
        for j, c in enumerate(cent):
            e = f"(CAST({elem(vec, lo + j + 1)} AS DOUBLE) - CAST('{float(c)!r}' AS DOUBLE))"
            terms.append(f"({e} * {e})")
        out.append("(" + " + ".join(terms) + ")")
    return out


def _pq_dtab_entries(qvec: str, codebooks: list[list[list[float]]], engine: str) -> list[str]:
    """Flattened n_sub*n_codes ADC table: entry [m*K + k] is the unrolled
    dot of the query's m-th subvector with codeword k (left-to-right)."""
    elem = _pq_elem(engine)
    dsub = len(codebooks[0][0])
    entries = []
    for m, book in enumerate(codebooks):
        lo = m * dsub
        for cent in book:
            terms = [
                f"(CAST({elem(qvec, lo + j + 1)} AS DOUBLE) * CAST('{float(c)!r}' AS DOUBLE))"
                for j, c in enumerate(cent)
            ]
            entries.append("(" + " + ".join(terms) + ")")
    return entries


def pq_encode_kernel(codebooks: list[list[list[float]]]):
    """Arrow-batched numpy twin of the pq_encode expression path —
    bit-identical codes: squared differences are exact elementwise IEEE
    ops, np.cumsum accumulates strictly left-to-right like the unrolled
    `(t1) + (t2) + ...` left-association, np.argmin takes the first
    occurrence like array_position/list_position. This is the hot path:
    the 16-array unrolled encode projection exceeds janino's method
    limits (whole-stage codegen fails and falls back to interpreted
    eval), while the kernel encodes a 4096-row Arrow batch in one numpy
    broadcast. Parity is asserted by
    tests/test_pq.py::test_pq_encode_kernel_matches_expression."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.array(codebooks, dtype=np.float64)  # (M, K, dsub)
    M, _, dsub = C.shape
    chunk = 4096

    @pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        out = []
        v_ = v.to_numpy()
        for lo in range(0, len(v_), chunk):
            X = np.stack(v_[lo : lo + chunk]).astype(np.float64)
            codes = np.empty((len(X), M), dtype=np.int32)
            for m in range(M):
                S = X[:, m * dsub : (m + 1) * dsub]
                diff = S[:, None, :] - C[m][None, :, :]
                d = np.cumsum(diff * diff, axis=2)[:, :, -1]
                codes[:, m] = np.argmin(d, axis=1)
            out.extend(list(codes))
        return pd.Series(out)

    return _enc


def pq_dtab_kernel(codebooks: list[list[list[float]]]):
    """Arrow-batched numpy twin of the _pq_dtab_entries expression: the
    flattened n_sub*n_codes ADC table per query vector. Bit-identical to
    the unrolled form (exact elementwise products, cumsum left-to-right);
    same janino-limit rationale as pq_encode_kernel."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.array(codebooks, dtype=np.float64)  # (M, K, dsub)
    M, K, dsub = C.shape

    @pandas_udf("array<double>")
    def _dtab(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        out = np.empty((len(X), M * K), dtype=np.float64)
        for m in range(M):
            S = X[:, m * dsub : (m + 1) * dsub]  # (n, dsub)
            prod = S[:, None, :] * C[m][None, :, :]  # (n, K, dsub)
            out[:, m * K : (m + 1) * K] = np.cumsum(prod, axis=2)[:, :, -1]
        return pd.Series(list(out))

    return _dtab


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    impl: str = "arrow",
) -> DataFrame:
    """-> (item_id, _c0.._c{M-1}): each vector's PQ code — per subspace the
    argmin-L2 codeword index (ties to the smaller code, first-occurrence
    array_position, same rule as the oracle's list_position). Map-side
    only, no shuffle.

    impl: "arrow" (default) = pq_encode_kernel, the numpy batch kernel;
    "expr" = the pure-Catalyst unrolled-literal twin (bit-identical codes
    — see the kernel docstring). The expr form builds the per-subspace
    distance arrays in one projection and argmins them in a second (the
    array_min + array_position pair references the distance array twice —
    the same accepted double-reference as ivf_topk's assignment); its
    unrolled size is past janino's codegen limits, so it runs interpreted
    — kept as the oracle-shareable reference form. At production scale
    you encode ONCE and persist the codes, which is the point of the
    representation."""
    M = len(codebooks)
    dsub = len(codebooks[0][0])
    corpus = df.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("_v"))
    if impl == "arrow":
        kern = pq_encode_kernel(codebooks)
        coded = corpus.select("item_id", kern(F.col("_v")).alias("_code"))
        return coded.select(
            "item_id",
            *[
                F.element_at("_code", m + 1).alias(f"_c{m}")
                for m in range(M)
            ],
        )
    darr = corpus.select(
        "item_id",
        *[
            F.expr(
                "array(" + ", ".join(_pq_sq_dists("_v", codebooks[m], m * dsub, "spark")) + ")"
            ).alias(f"_d{m}")
            for m in range(M)
        ],
    )
    return darr.select(
        "item_id",
        *[
            (F.array_position(F.col(f"_d{m}"), F.array_min(F.col(f"_d{m}"))) - 1)
            .cast("int")
            .alias(f"_c{m}")
            for m in range(M)
        ],
    )


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    impl: str = "arrow",
) -> DataFrame:
    """PQ ANN top-k by asymmetric distance computation (ADC): corpus
    vectors are replaced by their n_sub codes (pq_encode); each query
    builds its n_sub x n_codes dot-product lookup table ONCE; the scan
    scores a candidate with n_sub table lookups instead of a dim-length
    dot. Ranking is by approximate inner product (adc_dot DESC, item_id
    ASC) — for L2-trained codebooks on roughly-normalized embeddings this
    orders like cosine up to quantization error; recall is bounded in
    tests against brute_force_topk.

    Scale shape: the scan side carries n_sub ints per corpus row (the
    64x compression that makes a 100 TB embedding corpus scannable); the
    query side (small by contract, like brute_force_topk) broadcasts its
    ADC tables; scoring is a map-side expression (8 element_at lookups +
    left-to-right adds — no per-pair vector math, no shuffle before the
    per-query top-k window). Codebooks ride as literals in the plan, so
    the DuckDB oracle shares them exactly (plans/pq_codebooks.json)."""
    M = len(codebooks)
    K = len(codebooks[0])
    codes = pq_encode(df, id_col, vec_col, codebooks, impl=impl)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"))
    if impl == "arrow":
        dt = pq_dtab_kernel(codebooks)(F.col("_q"))
    else:
        dt = F.expr(
            "array(" + ", ".join(_pq_dtab_entries("_q", codebooks, "spark")) + ")"
        )
    qd = q.select("query_id", dt.alias("_dt"))
    cand = codes.crossJoin(F.broadcast(qd)).where(
        F.col("item_id") != F.col("query_id")
    )
    adc = " + ".join(f"element_at(_dt, {1 + m * K} + _c{m})" for m in range(M))
    scored = cand.select("query_id", "item_id", F.expr(adc).alias("adc_dot"))
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "adc_dot", "rank")
    )


def pq_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_filter: str,
    codebooks: list[list[list[float]]],
    k: int = 5,
) -> str:
    """DuckDB twin of pq_topk: same unrolled literal expressions (encode
    argmin via list_position(d, list_min(d)) = first occurrence, the
    array_position tie rule), distance CTEs MATERIALIZED so the per-doc
    encode work runs once (the hash-once rule, SQL side)."""
    M = len(codebooks)
    K = len(codebooks[0])
    dsub = len(codebooks[0][0])
    darr_cols = ", ".join(
        "[" + ", ".join(_pq_sq_dists("_v", codebooks[m], m * dsub, "duckdb")) + f"] AS _d{m}"
        for m in range(M)
    )
    code_cols = ", ".join(
        f"CAST(list_position(_d{m}, list_min(_d{m})) - 1 AS INT) AS _c{m}"
        for m in range(M)
    )
    dtab = "[" + ", ".join(_pq_dtab_entries("_q", codebooks, "duckdb")) + "]"
    adc = " + ".join(f"_dt[{1 + m * K} + _c{m}]" for m in range(M))
    return f"""
    WITH corpus AS (SELECT {id_col} AS item_id, {vec_col} AS _v FROM {table}),
    darr AS MATERIALIZED (SELECT item_id, {darr_cols} FROM corpus),
    enc AS MATERIALIZED (SELECT item_id, {code_cols} FROM darr),
    q AS (SELECT {id_col} AS query_id, {vec_col} AS _q FROM {table}
          WHERE {query_filter}),
    qd AS MATERIALIZED (SELECT query_id, {dtab} AS _dt FROM q),
    cand AS (SELECT query_id, item_id, ({adc}) AS adc_dot
             FROM enc CROSS JOIN qd WHERE item_id != query_id)
    SELECT query_id, item_id, adc_dot, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dot DESC, item_id ASC) AS INT) AS rank
      FROM cand
    ) WHERE rank <= {k}
    """


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-PQ ANN top-k — the FAISS-style composition of the two frozen
    artifacts: the IVF coarse quantizer prunes the candidate set (equi-
    join on the probed list ids, the ivf_topk shape) and PQ asymmetric
    distance scores the survivors in the compressed domain (the pq_topk
    scorer). This is the plan the 100 TB serving path wants: bounded
    fan-out (nprobe lists instead of the whole corpus) AND an 8-byte
    scan payload (codes instead of vectors) — neither parent operator
    has both.

    Ranking is adc_dot DESC within the probed lists; the scan side
    carries (cid, codes) only. All pieces are frozen literals
    (plans/ivf_centroids.json + plans/pq_codebooks.json), so the DuckDB
    twin shares them exactly."""
    M = len(codebooks)
    K = len(codebooks[0])
    corpus = df.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("_v"))
    corpus = corpus.withColumn("_nv", _norm(F.col("_v")))
    sc = centroid_scores("_v", "_nv", centroids)
    # assign is consumed twice (pq_encode input + the cid join); the
    # unrolled centroid_scores projection over the full corpus is the
    # expensive upstream, so materialize it once (the mutual_best /
    # localCheckpoint consume-twice rule).
    assign = corpus.select(
        "item_id",
        "_v",
        (F.array_position(sc, F.array_max(sc)) - 1).cast("int").alias("cid"),
    ).localCheckpoint()
    codes = pq_encode(assign, "item_id", "_v", codebooks).join(
        assign.select("item_id", "cid"), on="item_id"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    ).withColumn("_nq", _norm(F.col("_q")))
    qa = q.select(
        "query_id", "_q", F.posexplode(centroid_scores("_q", "_nq", centroids))
    ).withColumnsRenamed({"pos": "cid", "col": "cscore"})
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cscore"), F.asc("cid"))
    probes = (
        qa.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= nprobe)
        .select("query_id", "_q", F.col("cid").cast("int").alias("cid"))
    )
    qd = probes.select(
        "query_id", "cid", pq_dtab_kernel(codebooks)(F.col("_q")).alias("_dt")
    )
    cand = codes.join(F.broadcast(qd), on="cid").where(
        F.col("item_id") != F.col("query_id")
    )
    adc = " + ".join(f"element_at(_dt, {1 + m * K} + _c{m})" for m in range(M))
    scored = cand.select("query_id", "item_id", F.expr(adc).alias("adc_dot"))
    w3 = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w3))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "adc_dot", "rank")
    )


def ivfpq_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_filter: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
) -> str:
    """DuckDB twin of ivfpq_topk: the ivf_topk assignment/probe CTEs
    composed with the pq_topk encode/ADC CTEs."""
    M = len(codebooks)
    K = len(codebooks[0])
    dsub = len(codebooks[0][0])
    vals = ", ".join(
        "(" + str(i) + ", [" + ", ".join(_flit(x) for x in c) + "])"
        for i, c in enumerate(centroids)
    )
    cos_assign = cosine_sql("c._v", "ct._c")
    cos_probe = cosine_sql("q._q", "ct._c")
    darr_cols = ", ".join(
        "[" + ", ".join(_pq_sq_dists("_v", codebooks[m], m * dsub, "duckdb")) + f"] AS _d{m}"
        for m in range(M)
    )
    code_cols = ", ".join(
        f"CAST(list_position(_d{m}, list_min(_d{m})) - 1 AS INT) AS _c{m}"
        for m in range(M)
    )
    dtab = "[" + ", ".join(_pq_dtab_entries("_q", codebooks, "duckdb")) + "]"
    adc = " + ".join(f"_dt[{1 + m * K} + _c{m}]" for m in range(M))
    return f"""
    WITH cents(cid, _c) AS (VALUES {vals}),
    corpus AS (SELECT {id_col} AS item_id, {vec_col} AS _v FROM {table}),
    ca AS (SELECT c.item_id, c._v, ct.cid, {cos_assign} AS cscore
           FROM corpus c CROSS JOIN cents ct),
    assign AS MATERIALIZED (SELECT item_id, _v, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY item_id
                  ORDER BY cscore DESC, cid ASC) AS _r FROM ca) WHERE _r = 1),
    darr AS MATERIALIZED (SELECT item_id, cid, {darr_cols} FROM assign),
    enc AS MATERIALIZED (SELECT item_id, cid, {code_cols} FROM darr),
    q AS (SELECT {id_col} AS query_id, {vec_col} AS _q FROM {table}
          WHERE {query_filter}),
    qa AS (SELECT q.query_id, q._q, ct.cid, {cos_probe} AS cscore
           FROM q CROSS JOIN cents ct),
    probes AS (SELECT query_id, _q, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cscore DESC, cid ASC) AS _r FROM qa)
        WHERE _r <= {nprobe}),
    qd AS MATERIALIZED (SELECT query_id, cid, {dtab} AS _dt FROM probes),
    cand AS (SELECT p.query_id, e.item_id, ({adc}) AS adc_dot
             FROM enc e JOIN qd p ON e.cid = p.cid
             WHERE e.item_id != p.query_id)
    SELECT query_id, item_id, adc_dot, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dot DESC, item_id ASC) AS INT) AS rank
      FROM cand
    ) WHERE rank <= {k}
    """
