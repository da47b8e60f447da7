"""Deduplication operators for large-scale training-data pipelines.

All of these are compositions of built-in DataFrame ops over the shared
dual-emitter functions (functions.text), so every one is DuckDB-oracle
checkable. At 100 TB: the groupBys shuffle on content hashes (uniformly
distributed — no skew); LSH/SimHash candidate joins are equi-joins on band/
bucket keys with bounded bucket sizes.

  - exact_dedup: md5-hash groupBy, canonical representative = min id
  - ngram_jaccard_pairs: near-dup pairs by distinct-token Jaccard within
    equi-join blocks
  - jaccard_prefix_filter_pairs: EXACT-recall global Jaccard self-join
    (AllPairs prefix filtering — no blocking key, no LSH recall curve)
  - minhash_lsh_pairs: shingle -> minhash -> band -> bucket equi-self-join
  - simhash_pairs: simhash fingerprint + banded Hamming candidate join
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition for CPU-bound per-row work: these tables are small in
    bytes but heavy per row (shingling/hashing), so byte-based AQE
    coalescing would serialize them onto one core."""
    n = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(n, *cols)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (content_hash, n_dups, canonical_id): exact duplicate groups."""
    return (
        df.select(F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("_id").alias("canonical_id"),
        )
    )


def exact_dedup_sql(table: str, id_col: str, text_col: str) -> str:
    return (
        f"SELECT content_hash, CAST(count(*) AS BIGINT) AS n_dups, "
        f"min({id_col}) AS canonical_id "
        f"FROM (SELECT {id_col}, md5({text_col}) AS content_hash FROM {table}) "
        f"GROUP BY content_hash"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    min_jaccard_pct: int = 50,
    max_block_rows: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs within equi-join blocks by distinct-token Jaccard
    (integer-threshold: |I|*100 >= |U|*pct). Returns (id_a, id_b, jac_pct).

    Blocks larger than `max_block_rows` are salt-split (blocking.salt_buckets
    — deterministic per id, mirrored bit-for-bit in the SQL twin), bounding
    the in-block self-join at ~max_block_rows^2 pairs instead of n^2 on a
    degenerate hot key (one language, boilerplate corpus). Pairs across
    salts of a hot block are not compared — bounded recall traded for
    bounded compute; blocks at or under the cap are exhaustively compared
    exactly as before. For guaranteed sub-quadratic behavior WITH recall
    control, use ngram_jaccard_pairs_via_lsh (the scale path)."""
    from .blocking import salt_buckets

    toks = F.array_distinct(T.tokens(F.col(text_col)))
    base = _spread(df, id_col).select(
        F.col(id_col).alias("_id"), *block_cols, toks.alias("_toks")
    ).withColumn(
        "_bkey",
        F.concat_ws("|", *[F.col(c).cast("string") for c in block_cols]),
    )
    # hot-block detection prunes _toks (count only needs _bkey), so the
    # tokenize projection is not recomputed for the salt aggregate
    base = salt_buckets(base, "_bkey", "_id", max_block_rows)
    a = base.select(
        F.col("_id").alias("id_a"), *block_cols, "_bsalt",
        F.col("_toks").alias("toks_a"),
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        *[F.col(c).alias(f"_{c}_b") for c in block_cols],
        "_bsalt",
        F.col("_toks").alias("toks_b"),
    )
    i = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    u = F.size(F.array_union(F.col("toks_a"), F.col("toks_b")))
    joined = a.alias("a").join(
        b.alias("b"),
        on=[F.col(f"a.{c}") == F.col(f"b._{c}_b") for c in block_cols]
        + [F.col("a._bsalt") == F.col("b._bsalt")],
    )
    return (
        joined
        .where(F.col("id_a") < F.col("id_b"))
        .where(i * 100 >= u * min_jaccard_pct)
        .select(
            "id_a",
            "id_b",
            (i * 100 / u).cast("double").alias("jac_pct"),
        )
    )


def ngram_jaccard_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    min_jaccard_pct: int = 50,
    max_block_rows: int | None = 1000,
) -> str:
    from .blocking import salt_buckets_sql

    toks = f"list_distinct({T.tokens_sql(text_col)})"
    bc = ", ".join(block_cols)
    bkey = "concat_ws('|', " + ", ".join(
        f"CAST({c} AS VARCHAR)" for c in block_cols
    ) + ")"
    salt = salt_buckets_sql("_bkey", "_id", max_block_rows)
    on = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    i = "len(list_intersect(a._toks, b._toks))"
    u = "len(list_distinct(list_concat(a._toks, b._toks)))"
    return f"""
    WITH base0 AS (
        SELECT {id_col} AS _id, {bc}, {toks} AS _toks, {bkey} AS _bkey
        FROM {table}
    ),
    base AS (SELECT *, {salt} AS _bsalt FROM base0)
    SELECT a._id AS id_a, b._id AS id_b,
           CAST({i} * 100 / {u} AS DOUBLE) AS jac_pct
    FROM base a JOIN base b
      ON {on} AND a._bsalt = b._bsalt AND a._id < b._id
    WHERE {i} * 100 >= {u} * {min_jaccard_pct}
    """


def ngram_jaccard_pairs_via_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard_pct: int = 50,
    n_bands: int = 8,
    rows_per_band: int = 1,
    shingle_k: int = 3,
    max_bucket_rows: int | None = 1000,
) -> DataFrame:
    """SCALE PATH for ngram_jaccard_pairs: exact distinct-token Jaccard
    verified ONLY on MinHash-LSH candidate pairs instead of all pairs
    within equi-join blocks (which is quadratic inside a hot block).
    Returns (id_a, id_b, jac_pct) — a subset of ngram_jaccard_pairs
    restricted to LSH hits; recall is the standard S-curve
    1 - (1 - s^rows_per_band)^n_bands of the pair's SHINGLE similarity
    (>= .96 at s = 0.5 with the 8x1 default). Precision is exact (every
    emitted pair passes the true Jaccard threshold). Note the candidate
    stage is word-order-sensitive (k-word shingles): a token-permuted pair
    with identical token SETS shares no shingles and is missed — the
    explicit recall trade vs the quadratic exact path."""
    cand = minhash_lsh_pairs(
        df, id_col, text_col, n_bands, rows_per_band, shingle_k,
        max_bucket_rows,
    ).select("id_a", "id_b")
    toks = F.array_distinct(T.tokens(F.col(text_col)))
    base = _spread(df, id_col).select(
        F.col(id_col).alias("_id"), toks.alias("_toks")
    )
    i = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    u = F.size(F.col("toks_a")) + F.size(F.col("toks_b")) - i
    return (
        cand.join(base.select(F.col("_id").alias("id_a"),
                              F.col("_toks").alias("toks_a")), on="id_a")
        .join(base.select(F.col("_id").alias("id_b"),
                          F.col("_toks").alias("toks_b")), on="id_b")
        .where(i * 100 >= u * min_jaccard_pct)
        .select("id_a", "id_b", (i * 100 / u).cast("double").alias("jac_pct"))
    )


def ngram_jaccard_pairs_via_lsh_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_jaccard_pct: int = 50,
    n_bands: int = 8,
    rows_per_band: int = 1,
    shingle_k: int = 3,
    max_bucket_rows: int | None = 1000,
) -> str:
    cand = minhash_lsh_pairs_sql(
        table, id_col, text_col, n_bands, rows_per_band, shingle_k,
        max_bucket_rows,
    )
    toks = f"list_distinct({T.tokens_sql(text_col)})"
    i = "len(list_intersect(ta._toks, tb._toks))"
    u = f"(len(ta._toks) + len(tb._toks) - {i})"
    return f"""
    WITH cand AS (SELECT id_a, id_b FROM ({cand})),
    base AS MATERIALIZED (SELECT {id_col} AS _id, {toks} AS _toks FROM {table})
    SELECT cand.id_a, cand.id_b,
           CAST({i} * 100 / {u} AS DOUBLE) AS jac_pct
    FROM cand
    JOIN base ta ON ta._id = cand.id_a
    JOIN base tb ON tb._id = cand.id_b
    WHERE {i} * 100 >= {u} * {min_jaccard_pct}
    """


def jaccard_prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard_pct: int = 50,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """EXACT-RECALL scale path for global token-set Jaccard self-join via
    prefix filtering (AllPairs, Bayardo/Ma/Srikant WWW'07; the PPJoin
    candidate core) — the third leg of the Jaccard family: no blocking
    key (vs ngram_jaccard_pairs) and no LSH recall curve (vs the
    _via_lsh path). Returns every (id_a, id_b, jac_pct) with
    |I|*100 >= |U|*pct over distinct word tokens, id_a < id_b.

    Why it is sub-quadratic: order each document's distinct tokens by a
    GLOBAL canonical order (document frequency asc, token asc — rarest
    first) and emit only the first p = n - ceil(n*t) + 1 tokens into the
    inverted index. For any pair with Jaccard >= t, the canonically
    SMALLEST intersection token provably lies in BOTH prefixes (if it
    didn't, the whole intersection would fit in one suffix of size
    ceil(t*n) - 1 < ceil(t*n) <= |I|), so the prefix-token equi-join
    loses nothing; rare-token prefixes keep the inverted lists short.
    Candidates then pass the length filter (min*100 >= pct*max, since
    J <= min/max) and ONE exact verify. All thresholds are integer
    arithmetic (ceil(n*pct/100) = (n*pct + 99) div 100) — bit-identical
    across engines.

    The FINAL pair set is canonical-order-independent (the method is
    complete at any valid order), so the DuckDB twin replaying the same
    plan must agree exactly even where string collation could differ.

    Scale shape: token df is one map-side-combined count; ordered arrays
    build in one aggregate and are localCheckpoint'ed (consumed by the
    prefix emitter and both verify re-attach joins — the repo's
    consume-thrice rule); the self-join is NARROW ((id, n, token) rows;
    arrays never ride the explode); candidates dedup before verify.
    Empty-token documents never pair (Jaccard undefined; filtered).

    max_bucket_rows: None (default) = the unconditional exactness
    guarantee. A cap salt-splits degenerate hot prefix tokens
    (blocking.salt_buckets) at the SAME documented recall trade as
    clk_band_pairs — only needed on adversarial corpora where even
    rarest-first prefixes collide (e.g. every document identical)."""
    from .blocking import salt_buckets

    pct = int(min_jaccard_pct)
    toks0 = F.array_distinct(T.tokens(F.col(text_col)))
    docs = (
        _spread(df, id_col)
        .select(F.col(id_col).cast("long").alias("_id"), toks0.alias("_t"))
        .where(F.size("_t") >= 1)
    )
    ex = docs.select("_id", F.explode("_t").alias("tok"))
    dfreq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    ordered = (
        ex.join(dfreq, "tok")
        .groupBy("_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "tok"))),
                lambda s: s["tok"],
            ).alias("toks")
        )
        .withColumn("n", F.size("toks"))
        .withColumn(
            "p", F.expr(f"n - (n * {pct} + 99) div 100 + 1").cast("int")
        )
        .localCheckpoint()  # consumed by prefix emit + 2 verify joins
    )
    pre = ordered.select(
        "_id", "n", F.explode(F.expr("slice(toks, 1, p)")).alias("tok")
    )
    pre = salt_buckets(pre, "tok", "_id", max_bucket_rows)
    a = pre.select(
        F.col("_id").alias("id_a"), F.col("n").alias("na"), "tok", "_bsalt"
    )
    b = pre.select(
        F.col("_id").alias("id_b"), F.col("n").alias("nb"), "tok", "_bsalt"
    )
    cand = (
        a.join(b, ["tok", "_bsalt"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.least("na", "nb") * 100 >= F.greatest("na", "nb") * F.lit(pct)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    va = ordered.select(F.col("_id").alias("id_a"), F.col("toks").alias("toks_a"))
    vb = ordered.select(F.col("_id").alias("id_b"), F.col("toks").alias("toks_b"))
    i = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    u = F.size(F.col("toks_a")) + F.size(F.col("toks_b")) - i
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .where(i * 100 >= u * pct)
        .select("id_a", "id_b", (i * 100 / u).cast("double").alias("jac_pct"))
    )


def jaccard_prefix_filter_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_jaccard_pct: int = 50,
    max_bucket_rows: int | None = None,
) -> str:
    """DuckDB twin: the same plan (df-ordered lists, prefix slice,
    inverted-index join, length filter, exact verify). The output set is
    provably order-independent, so the twin is exact regardless of
    collation differences in the canonical order."""
    from .blocking import salt_buckets_sql

    pct = int(min_jaccard_pct)
    toks = f"list_distinct({T.tokens_sql(text_col)})"
    salt = salt_buckets_sql("tok", "_id", max_bucket_rows)
    i = "len(list_intersect(va.toks, vb.toks))"
    u = f"(len(va.toks) + len(vb.toks) - {i})"
    return f"""
    WITH docs AS MATERIALIZED (
      SELECT _id, _t FROM (
        SELECT CAST({id_col} AS BIGINT) AS _id, {toks} AS _t FROM {table}
      ) WHERE len(_t) >= 1
    ),
    ex AS (SELECT _id, unnest(_t) AS tok FROM docs),
    dfreq AS (SELECT tok, count(*) AS _df FROM ex GROUP BY tok),
    ordered AS MATERIALIZED (
      SELECT _id, toks, len(toks) AS n,
             len(toks) - (len(toks) * {pct} + 99) // 100 + 1 AS p
      FROM (
        SELECT ex._id, list(ex.tok ORDER BY d._df, ex.tok) AS toks
        FROM ex JOIN dfreq d ON d.tok = ex.tok GROUP BY ex._id
      )
    ),
    pre AS (
      SELECT _id, n, tok, {salt} AS _bsalt
      FROM (SELECT _id, n, unnest(toks[1:p]) AS tok FROM ordered)
    ),
    cand AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b
      FROM pre a JOIN pre b ON a.tok = b.tok AND a._bsalt = b._bsalt
      WHERE a._id < b._id
        AND least(a.n, b.n) * 100 >= greatest(a.n, b.n) * {pct}
    )
    SELECT cand.id_a, cand.id_b,
           CAST({i} * 100 / {u} AS DOUBLE) AS jac_pct
    FROM cand
    JOIN ordered va ON va._id = cand.id_a
    JOIN ordered vb ON vb._id = cand.id_b
    WHERE {i} * 100 >= {u} * {pct}
    """


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    max_bucket_rows: int | None = 1000,
) -> DataFrame:
    """MinHash-LSH candidate near-dup pairs: (id_a, id_b, n_bands_hit).

    The shingle-hash array is materialized once per document (an aggregate
    on the unique id is the projection barrier keeping Catalyst from
    inlining the md5 pass into every band expression); band keys are then
    cheap affine transforms of that array. Oversized band buckets (empty /
    boilerplate text hashing to one key) are split by a deterministic salt
    (blocking.salt_buckets) so no bucket goes quadratic."""
    from .blocking import salt_buckets
    # localCheckpoint: the md5 shingle pass is consumed three times (hot-key
    # count, join side a, join side b) — materialize it once. n_docs rows of
    # (id, hash array): small relative to the text it derives from.
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).alias("_id"),
            T.shingle_hashes(F.col(text_col), shingle_k).alias("_shh"),
        )
        .groupBy("_id")
        .agg(F.first("_shh").alias("_shh"))
        .localCheckpoint()
    )
    banded = hashed.select(
        "_id",
        F.explode(
            F.array(
                *[
                    T.band_key_from_hashes(F.col("_shh"), band, rows_per_band)
                    for band in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    banded = salt_buckets(banded, "band_key", "_id", max_bucket_rows)
    a = banded.select(F.col("_id").alias("id_a"), "band_key", "_bsalt")
    b = banded.select(F.col("_id").alias("id_b"), "band_key", "_bsalt")
    return (
        a.join(b, on=["band_key", "_bsalt"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )


def minhash_lsh_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    max_bucket_rows: int | None = 1000,
) -> str:
    from .blocking import salt_buckets_sql

    bands = ", ".join(
        T.band_key_from_hashes_sql("_shh", band, rows_per_band)
        for band in range(n_bands)
    )
    salt = salt_buckets_sql("band_key", "_id", max_bucket_rows)
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT {id_col} AS _id, {T.shingle_hashes_sql(text_col, shingle_k)} AS _shh
      FROM {table}
    ),
    banded0 AS (
      SELECT _id, unnest([{bands}]) AS band_key FROM hashed
    ),
    banded AS (
      SELECT _id, band_key, {salt} AS _bsalt FROM banded0
    )
    SELECT a._id AS id_a, b._id AS id_b, CAST(count(*) AS BIGINT) AS n_bands_hit
    FROM banded a JOIN banded b
      ON a.band_key = b.band_key AND a._bsalt = b._bsalt AND a._id < b._id
    GROUP BY a._id, b._id
    """


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    n_chunks: int = 4,
    nbits: int = T.SIMHASH_BITS,
    max_bucket_rows: int | None = 1000,
) -> DataFrame:
    """SimHash near-dup pairs: candidates share at least one fingerprint
    chunk, verified by exact Hamming distance. Returns (id_a, id_b, hamming).
    Oversized chunk buckets are salt-split (blocking.salt_buckets).

    Recall contract (pigeonhole): a pair at Hamming distance d is
    GUARANTEED to share a chunk when d < n_chunks; for n_chunks <= d <=
    max_hamming candidates are still verified exactly but may be missed by
    the chunk index (raise n_chunks to max_hamming+1 for full recall at the
    cost of smaller, more collision-prone chunks)."""
    chunk_bits = nbits // n_chunks
    mask = (1 << chunk_bits) - 1
    # aggregate on the unique id = projection barrier: without it Catalyst
    # inlines the simhash subtree into every chunk-key expression (5 evals)
    sh = (
        _spread(df, id_col)
        .select(
            F.col(id_col).alias("_id"), T.simhash(F.col(text_col), nbits).alias("_sh")
        )
        .groupBy("_id")
        .agg(F.first("_sh").alias("_sh"))
        .localCheckpoint()  # fingerprint pass consumed 3x (see minhash)
    )
    chunks = sh.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(c)),
                        F.shiftright(F.col("_sh"), c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_key"),
    )
    from .blocking import salt_buckets

    chunks = salt_buckets(chunks, "chunk_key", "_id", max_bucket_rows)
    a = chunks.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "chunk_key", "_bsalt"
    )
    b = chunks.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "chunk_key", "_bsalt"
    )
    return (
        a.join(b, on=["chunk_key", "_bsalt"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sh_a", "sh_b")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .withColumn("hamming", T.hamming64(F.col("sh_a"), F.col("sh_b")).cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    n_chunks: int = 4,
    nbits: int = T.SIMHASH_BITS,
    max_bucket_rows: int | None = 1000,
) -> str:
    from .blocking import salt_buckets_sql

    chunk_bits = nbits // n_chunks
    mask = (1 << chunk_bits) - 1
    sh = T.simhash_sql(text_col, nbits)
    chunk_exprs = ", ".join(
        f"concat_ws(':', '{c}', CAST((_sh >> {c * chunk_bits}) & {mask} AS VARCHAR))"
        for c in range(n_chunks)
    )
    salt = salt_buckets_sql("chunk_key", "_id", max_bucket_rows)
    return f"""
    WITH sh AS (SELECT {id_col} AS _id, {sh} AS _sh FROM {table}),
    chunks0 AS (SELECT _id, _sh, unnest([{chunk_exprs}]) AS chunk_key FROM sh),
    chunks AS (SELECT _id, _sh, chunk_key, {salt} AS _bsalt FROM chunks0),
    cand AS (
      SELECT a._id AS id_a, b._id AS id_b, a._sh AS sh_a, b._sh AS sh_b
      FROM chunks a JOIN chunks b
        ON a.chunk_key = b.chunk_key AND a._bsalt = b._bsalt AND a._id < b._id
      GROUP BY a._id, b._id, a._sh, b._sh
    )
    SELECT id_a, id_b, CAST({T.hamming64_sql('sh_a', 'sh_b')} AS INT) AS hamming
    FROM cand WHERE {T.hamming64_sql('sh_a', 'sh_b')} <= {max_hamming}
    """


def embedding_cosine_pairs(
    df,
    id_col: str,
    vec_col: str,
    dim: int,
    min_cosine: float = 0.95,
    n_planes: int = 6,
    max_bucket_rows: int | None = 1000,
    n_band_sets: int = 6,
    key_impl: str = "arrow",
):
    """Embedding-cosine near-dup pairs: sign-LSH bucket equi-self-join +
    exact cosine verify (>= min_cosine). Returns (id_a, id_b, sim).
    Oversized sign buckets (e.g. zero/duplicate vectors) are salt-split
    (blocking.salt_buckets).

    The salted self-join is NARROW — (id, bucket-key) rows only; the
    vector payload never rides the n_band_sets explode. Candidate pairs
    are deduped (distinct) across plane sets, then both vectors are
    re-attached by id-keyed equi-joins so each survivor pays exactly one
    exact cosine. Keys come from similarity.band_set_keys_kernel (numpy
    batch; key_impl="expr" selects the bit-identical Catalyst twin).

    Recall: one n_planes-plane set collides a theta-angle pair with
    probability (1 - theta/pi)^n_planes (~0.53 at cos 0.95 with 6 planes),
    so buckets are OR-ed over `n_band_sets` independent plane sets like
    MinHash bands: recall 1-(1-p)^n_band_sets (~0.99 at the 6x6 default).
    Every candidate is verified exactly, so precision is 1 regardless."""
    from .blocking import salt_buckets
    from .similarity import (
        band_set_keys,
        band_set_keys_kernel,
        cosine,
        cosine_kernel,
    )

    if key_impl == "arrow":
        keys = band_set_keys_kernel(dim, n_planes, n_band_sets)(F.col(vec_col))
    else:
        keys = band_set_keys(vec_col, dim, n_planes, n_band_sets)
    keyed = (
        _spread(df, id_col)
        .select(F.col(id_col).alias("_id"), F.explode(keys).alias("_bk"))
        .localCheckpoint()  # consumed 3x: salt hot-key count + both join sides
    )
    keyed = salt_buckets(keyed, "_bk", "_id", max_bucket_rows)
    a = keyed.select(F.col("_id").alias("id_a"), "_bk", "_bsalt")
    b = keyed.select(F.col("_id").alias("id_b"), "_bk", "_bsalt")
    pairs = (
        a.join(b, on=["_bk", "_bsalt"])
        .where(F.col("id_a") < F.col("id_b"))
        # dedupe multi-set collisions BEFORE the exact verify so each
        # surviving pair pays one cosine
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vv"))
    sim = (
        cosine_kernel()(F.col("va"), F.col("vb"))
        if key_impl == "arrow"
        else cosine(F.col("va"), F.col("vb"))
    )
    return (
        pairs.join(vecs.withColumnRenamed("_vid", "id_a")
                   .withColumnRenamed("_vv", "va"), on="id_a")
        .join(vecs.withColumnRenamed("_vid", "id_b")
              .withColumnRenamed("_vv", "vb"), on="id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= min_cosine)
    )


def embedding_cosine_pairs_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    min_cosine: float = 0.95,
    n_planes: int = 6,
    max_bucket_rows: int | None = 1000,
    n_band_sets: int = 6,
) -> str:
    from .blocking import salt_buckets_sql
    from .similarity import band_set_keys_sql, cosine_sql

    bucket = band_set_keys_sql("_v0", dim, n_planes, n_band_sets)
    cos = cosine_sql("va._v", "vb._v")
    salt = salt_buckets_sql("_bk", "_id", max_bucket_rows)
    # NARROW-join shape, mirroring the Spark side exactly: the banded
    # self-join carries (id, key) only, candidates dedup to bare id
    # pairs, and vectors re-attach via two id-keyed joins so each
    # survivor pays one cosine. The r4 twin carried both vectors through
    # the join into a list-payload GROUP BY — measured 124 GB RSS (OOM)
    # at sf0.1 where this form stays in MBs.
    return f"""
    WITH vecs AS MATERIALIZED (
      SELECT {id_col} AS _id, {vec_col} AS _v FROM {table}
    ),
    base0 AS MATERIALIZED (
      SELECT {id_col} AS _id, {bucket} AS _bk
      FROM (SELECT {id_col}, {vec_col} AS _v0 FROM {table})
    ),
    base AS (SELECT _id, _bk, {salt} AS _bsalt FROM base0),
    cand AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b
      FROM base a JOIN base b
        ON a._bk = b._bk AND a._bsalt = b._bsalt AND a._id < b._id
    )
    SELECT id_a, id_b, sim FROM (
      SELECT c.id_a, c.id_b, {cos} AS sim
      FROM cand c
      JOIN vecs va ON va._id = c.id_a
      JOIN vecs vb ON vb._id = c.id_b
    ) WHERE sim >= {min_cosine!r}e0
    """


# ---------------------------------------------------------------------------
# containment (asymmetric near-dup: one document substantially inside another)
# ---------------------------------------------------------------------------


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_containment_pct: int = 60,
    span_k: int = 8,
    max_span_df: int = 20,
) -> DataFrame:
    """-> (id_a, id_b, n_shared, n_spans_a, n_spans_b, cont_a_pct,
    cont_b_pct): pairs where either document's DISTINCT k-word span set is
    >= min_containment_pct contained in the other's. Jaccard misses the
    quote/subset case (a short doc fully inside a long one has low union
    similarity but containment ~100%); this is the asymmetric companion
    (Broder's containment, the Lee et al. 2022 substring-dedup shape at
    span granularity).

    Scale shape: spans are hashed ONCE per document behind a unique-key
    aggregate barrier and localCheckpoint'ed (consumed by the postings
    explode AND the per-doc size join). Pair generation goes through the
    span postings join, with spans above max_span_df doc-frequency dropped
    first — the stop-span cap: boilerplate spans shared by thousands of
    docs would emit C(df,2) pairs each, and they carry no containment
    signal. Per-span work is thus bounded at C(max_span_df, 2); singleton
    spans (df=1) are dropped too (they cannot form a pair). Containment
    percentages are exact integer arithmetic (pct = 100*shared div n)."""
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.array_distinct(
                F.transform(
                    T.word_shingles(F.col(text_col), span_k),
                    lambda s: T.phash(s),
                )
            ).alias("_gh"),
        )
        .groupBy("doc_id")
        .agg(F.first("_gh").alias("_gh"))
        .localCheckpoint()
    )
    sizes = hashed.select(
        "doc_id", F.size("_gh").cast("long").alias("n_spans")
    )
    post = hashed.select("doc_id", F.explode("_gh").alias("gh"))
    keep = (
        post.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= max_span_df))
        .select("gh")
    )
    p = post.join(keep, on="gh", how="left_semi")
    a = p.select(F.col("gh"), F.col("doc_id").alias("id_a"))
    b = p.select(F.col("gh"), F.col("doc_id").alias("id_b"))
    shared = (
        a.join(b, on="gh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col("doc_id").alias("id_a"),
                         F.col("n_spans").alias("n_spans_a")), on="id_a")
        .join(
            sizes.select(F.col("doc_id").alias("id_b"),
                         F.col("n_spans").alias("n_spans_b")), on="id_b")
        .withColumn("cont_a_pct", F.expr("(100 * n_shared) div n_spans_a"))
        .withColumn("cont_b_pct", F.expr("(100 * n_shared) div n_spans_b"))
        .where(
            F.greatest("cont_a_pct", "cont_b_pct") >= min_containment_pct
        )
    )
    return out.select(
        "id_a", "id_b", "n_shared", "n_spans_a", "n_spans_b",
        F.col("cont_a_pct").cast("int").alias("cont_a_pct"),
        F.col("cont_b_pct").cast("int").alias("cont_b_pct"),
    )


def containment_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_containment_pct: int = 60,
    span_k: int = 8,
    max_span_df: int = 20,
) -> str:
    grams = (
        f"list_distinct(list_transform({T.word_shingles_sql(text_col, span_k)}, "
        f"s -> {T.phash_sql('s')}))"
    )
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS doc_id, {grams} AS _gh FROM {table}
    ),
    sizes AS (SELECT doc_id, CAST(len(_gh) AS BIGINT) AS n_spans FROM hashed),
    post AS (SELECT doc_id, unnest(_gh) AS gh FROM hashed),
    keep AS (SELECT gh FROM post GROUP BY gh
             HAVING count(*) >= 2 AND count(*) <= {max_span_df}),
    p AS (SELECT post.gh, post.doc_id FROM post SEMI JOIN keep USING (gh)),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM p a JOIN p b ON a.gh = b.gh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_shared, n_spans_a, n_spans_b,
           CAST(cont_a_pct AS INT) AS cont_a_pct,
           CAST(cont_b_pct AS INT) AS cont_b_pct
    FROM (
      SELECT id_a, id_b, n_shared,
             sa.n_spans AS n_spans_a, sb.n_spans AS n_spans_b,
             (100 * n_shared) // sa.n_spans AS cont_a_pct,
             (100 * n_shared) // sb.n_spans AS cont_b_pct
      FROM shared
      JOIN sizes sa ON shared.id_a = sa.doc_id
      JOIN sizes sb ON shared.id_b = sb.doc_id
    ) WHERE greatest(cont_a_pct, cont_b_pct) >= {min_containment_pct}
    """


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside frozen-quantizer clusters
# ---------------------------------------------------------------------------


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    min_cosine: float,
    max_bucket_rows: int | None = 1000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every embedding to its nearest
    FROZEN k-means centroid, compare pairs only WITHIN a cluster, and drop
    any item that has a lower-id in-cluster neighbor with cosine >=
    min_cosine. -> (item_id, cid, keep).

    Deterministic variant (documented divergence from the paper): the
    paper keeps the cluster member least similar to the centroid among a
    duplicate group; here the survivor is the smallest id reachable by a
    DIRECT >=min_cosine edge — a total-order rule both engines replay
    exactly (no RNG, no float-order ambiguity in who survives).

    Scale shape: the assignment is the IVF map-side literal-argmax
    (similarity.centroid_scores — no explode, no corpus shuffle); the
    pairwise stage is an equi-self-join on cid, the semantic analog of an
    LSH bucket join, with oversized clusters salt-split
    (blocking.salt_buckets) so a degenerate cluster is bounded at ~cap^2
    pairs. Centroid count is the 100-TB knob: k scales with corpus size so
    clusters stay comparison-sized (the paper uses k ~ sqrt(N))."""
    from .blocking import salt_buckets
    from .similarity import _norm, centroid_scores, cosine

    base = df.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("_v"))
    sc = centroid_scores("_v", "_nv", centroids)
    assign = (
        base.withColumn("_nv", _norm(F.col("_v")))
        .select(
            "item_id",
            "_v",
            (F.array_position(sc, F.array_max(sc)) - 1).cast("int").alias("cid"),
        )
        .localCheckpoint()  # consumed 3x: salt hot-key count + both join sides
    )
    salted = salt_buckets(assign, "cid", "item_id", max_bucket_rows)
    a = salted.select(
        F.col("item_id").alias("id_a"), F.col("_v").alias("va"), "cid", "_bsalt"
    )
    b = salted.select(
        F.col("item_id").alias("id_b"), F.col("_v").alias("vb"), "cid", "_bsalt"
    )
    drops = (
        a.join(b, on=["cid", "_bsalt"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) >= min_cosine)
        .select(F.col("id_b").alias("item_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        assign.join(drops, on="item_id", how="left")
        .select(
            "item_id",
            "cid",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
    )


def semdedup_sql(
    table: str,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    min_cosine: float,
    max_bucket_rows: int | None = 1000,
) -> str:
    from .blocking import salt_buckets_sql
    from .similarity import _flit, cosine_sql

    vals = ", ".join(
        "(" + str(i) + ", [" + ", ".join(_flit(x) for x in c) + "])"
        for i, c in enumerate(centroids)
    )
    cos_assign = cosine_sql("c._v", "ct._c")
    cos_pair = cosine_sql("a._v", "b._v")
    salt = salt_buckets_sql("cid", "item_id", max_bucket_rows)
    return f"""
    WITH sd_cents(cid, _c) AS (VALUES {vals}),
    sd_corpus AS (SELECT {id_col} AS item_id, {vec_col} AS _v FROM {table}),
    sd_ca AS (SELECT c.item_id, c._v, ct.cid, {cos_assign} AS cscore
              FROM sd_corpus c CROSS JOIN sd_cents ct),
    sd_assign AS (SELECT item_id, _v, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY item_id
                  ORDER BY cscore DESC, cid ASC) AS _r FROM sd_ca)
        WHERE _r = 1),
    sd_salted AS (SELECT item_id, _v, cid, {salt} AS _bsalt FROM sd_assign),
    sd_drops AS (SELECT DISTINCT b.item_id
                 FROM sd_salted a JOIN sd_salted b
                   ON a.cid = b.cid AND a._bsalt = b._bsalt
                      AND a.item_id < b.item_id
                 WHERE {cos_pair} >= {_flit(float(min_cosine))})
    SELECT s.item_id, s.cid, (d.item_id IS NULL) AS keep
    FROM sd_assign s LEFT JOIN sd_drops d ON s.item_id = d.item_id
    """


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) — rolling-window boundary dedup
# ---------------------------------------------------------------------------

CDC_WINDOW = 16   # rolling window width (chars)
CDC_DIV = 64      # boundary when window-hash % CDC_DIV == 0 (~64-char chunks)


def _cdc_bounds(text_sql: str, eng: str, window: int, div: int) -> str:
    """Boundary-position array as an engine SQL expression.

    Basic content-defined chunking (the rsync/LBFS rolling-boundary idea,
    Muthitacharoen et al. 2001): position i (1-based, i >= window) is a
    boundary iff the 60-bit portable hash of the width-`window` substring
    ENDING at i is divisible by `div`; chunks span (prev boundary, i].
    The documented variant has no min/max chunk clamps — those need
    sequential state neither engine expresses relationally; expected
    chunk length is `div` chars and boundaries are content-LOCAL, so an
    edit only re-chunks its neighborhood (the CDC property that makes
    chunk-hash dedup robust to insertions, unlike fixed-width blocks).

    eng='spark': length/sequence/filter; eng='duck': len/range/
    list_filter (range is end-exclusive). Hash = the portable md5-prefix
    phash, identical in both. Documents shorter than `window` get no
    boundaries (one whole-document chunk downstream)."""
    if eng == "spark":
        ln, flt = "length", "filter"
        seq = f"sequence(CAST({window} AS BIGINT), CAST({ln}({text_sql}) AS BIGINT))"
        ph = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
        empty = "CAST(array() AS ARRAY<BIGINT>)"
    else:
        ln, flt = "len", "list_filter"
        seq = f"range(CAST({window} AS BIGINT), CAST({ln}({text_sql}) + 1 AS BIGINT))"
        ph = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
        empty = "CAST([] AS BIGINT[])"
    win = f"substr({text_sql}, CAST(i - {window - 1} AS INT), {window})"
    wh = ph.format(x=win)
    return (
        f"CASE WHEN {ln}({text_sql}) >= {window} "
        f"THEN {flt}({seq}, i -> {wh} % {div} = 0) "
        f"ELSE {empty} END"
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = CDC_WINDOW,
    div: int = CDC_DIV,
) -> DataFrame:
    """-> (doc_id, chunk_idx int, chunk_start, chunk_len, chunk_hash):
    content-defined chunks of every document (see _cdc_bounds). Empty
    documents emit no chunks; a boundary landing exactly at len(text)
    would create an empty trailing chunk, which is filtered (s > e)
    BEFORE chunk numbering in both engines.

    Scale shape: the boundary array is computed ONCE per document in a
    single projection (array expressions — no per-position explode /
    window / join round trip); cost is O(total chars) portable hashes,
    the inherent price of rolling-boundary detection, embarrassingly
    parallel with no shuffle until a consumer aggregates chunk hashes."""
    bounds = _cdc_bounds("_t", "spark", window, div)
    spans = (
        "filter(zip_with("
        "concat(array(CAST(1 AS BIGINT)), transform(_b, b -> b + 1)), "
        "concat(_b, array(CAST(length(_t) AS BIGINT))), "
        "(s, e) -> named_struct('s', s, 'e', e)), p -> p.s <= p.e)"
    )
    # hash-once discipline (CLAUDE.md): the boundary array is referenced
    # twice by the span construction (starts and ends); without a barrier
    # Catalyst's CollapseProject would inline the rolling-hash pass into
    # both references. The unique-key aggregate (first() on doc_id — the
    # repo's comparator barrier pattern) pins exactly one evaluation.
    d = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_t"),
        )
        .where(F.length("_t") > 0)
        .withColumn("_b", F.expr(bounds))
        .groupBy("doc_id")
        .agg(F.first("_t").alias("_t"), F.first("_b").alias("_b"))
        .withColumn("_spans", F.expr(spans))
    )
    return d.select(
        "doc_id",
        F.posexplode("_spans").alias("chunk_idx", "_sp"),
        "_t",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("_sp.s").cast("long").alias("chunk_start"),
        (F.col("_sp.e") - F.col("_sp.s") + 1).cast("long").alias("chunk_len"),
        T.phash(
            F.expr(
                "substr(_t, CAST(_sp.s AS INT), CAST(_sp.e - _sp.s + 1 AS INT))"
            )
        ).alias("chunk_hash"),
    )


def cdc_chunks_sql(
    table: str,
    id_col: str,
    text_col: str,
    window: int = CDC_WINDOW,
    div: int = CDC_DIV,
) -> str:
    """DuckDB twin of cdc_chunks. chunk_idx renumbers via a doc-
    partitioned row_number AFTER the empty-span filter, matching the
    Spark side's filter-then-posexplode order; ties are impossible
    (i is unique per doc)."""
    bounds = _cdc_bounds("_t", "duck", window, div)
    ph = T.phash_sql("substr(_t, CAST(s AS INT), CAST(e - s + 1 AS INT))")
    return f"""
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
                AS INT) AS chunk_idx,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(e - s + 1 AS BIGINT) AS chunk_len,
           {ph} AS chunk_hash
    FROM (
      SELECT doc_id, _t, i,
             CASE WHEN i = 1 THEN 1 ELSE _b[i - 1] + 1 END AS s,
             CASE WHEN i = len(_b) + 1 THEN len(_t) ELSE _b[i] END AS e
      FROM (
        SELECT CAST({id_col} AS BIGINT) AS doc_id, {text_col} AS _t,
               {bounds} AS _b
        FROM {table} WHERE len({text_col}) > 0
      ), unnest(range(1, len(_b) + 2)) AS u(i)
    ) WHERE s <= e
    """


def cdc_chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = CDC_WINDOW,
    div: int = CDC_DIV,
) -> DataFrame:
    """-> (chunk_hash, chunk_len, n_occ, n_docs) for chunks occurring
    more than once corpus-wide — chunk-level exact dedup over
    content-defined boundaries (the storage/dedup-ratio measurement
    pass, robust to insert/delete edits that shift byte offsets). One
    map-side-combined aggregate over cdc_chunks; nothing quadratic."""
    ch = cdc_chunks(df, id_col, text_col, window, div)
    return (
        ch.groupBy("chunk_hash", "chunk_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_occ") > 1)
    )


def cdc_chunk_dedup_sql(
    table: str,
    id_col: str,
    text_col: str,
    window: int = CDC_WINDOW,
    div: int = CDC_DIV,
) -> str:
    return f"""
    SELECT chunk_hash, chunk_len, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM ({cdc_chunks_sql(table, id_col, text_col, window, div)})
    GROUP BY chunk_hash, chunk_len
    HAVING count(*) > 1
    """
