"""Privacy-preserving record linkage (PPRL): Bloom-filter CLK encodings
with Dice-coefficient matching (Schnell, Bachteler & Reiher, BMC Med Inf
2009; the de-facto standard for linking person records across parties
that cannot exchange plaintext quasi-identifiers).

The reference links plaintext fields only (src/comparisonsummary.jl
comparators see raw strings); real cross-organization deployments encode
each record's quasi-identifier into a fixed-length Bloom filter and match
on bit-set similarity. This module implements the cryptographic-long-term-
key (CLK) flavor:

  - encode: char-bigram the normalized key, hash each bigram with K_HASH
    independent affine transforms of the one cross-engine content hash
    (the MinHash discipline: phash once per gram, affine constants derived
    in Python from md5 — functions/text.py:76-118), set bit (h mod L).
  - match: Dice = 2|A∩B| / (|A|+|B|) over bit sets, computed from packed
    int64 words with bit_count — reported in integer micro fixed point
    (one integer DIV), so every output column is bit-strict vs DuckDB.

Packing: L = N_WORDS * BITS_PER_WORD = 4 * 60 = 240 bits. 60 bits per
word keeps every mask positive in signed int64 (bit 63 would diverge
between engines on overflow semantics); bit_or is the aggregate in BOTH
engines, so encoding is one map-side-combined aggregate per document.

100-TB notes: encoding happens ONCE per document below any join (the
tokenize-once invariant); per-pair work is 8 bit_count ops on packed
words — no strings cross the pair join. The catalog entry blocks on the
standard equi-keys; at scale the encodings band exactly like SimHash
chunks (16-bit slices, pigeonhole guarantee) — the same salt-split
machinery applies because a band key is just another hot-key candidate.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import text as T
from ..functions.text import MH_PRIME
from .dedup import _spread

N_WORDS = 4
BITS_PER_WORD = 60
L_BITS = N_WORDS * BITS_PER_WORD  # 240
K_HASH = 2
DICE_SCALE = 1_000_000


def _clk_params(i: int) -> tuple[int, int]:
    """Affine constants for hash function i (Python md5, engine-neutral)."""
    h = hashlib.md5(f"clk{i}".encode()).hexdigest()
    return int(h[:8], 16) % (MH_PRIME - 1) + 1, int(h[8:16], 16) % MH_PRIME


def _bigrams(key: Column) -> Column:
    n = F.greatest(F.length(key) - 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(key, i, 2)
    )


def _bigrams_sql(key: str) -> str:
    return (
        f"list_transform(generate_series(1, greatest(length({key}) - 1, 1)),"
        f" i -> substr({key}, i, 2))"
    )


def _positions(key: Column) -> Column:
    """array<long> of CLK bit positions (K_HASH per bigram, dups ok)."""
    hs = F.transform(_bigrams(key), lambda g: T.phash(g) % MH_PRIME)

    def _affine(a: int, b: int):
        return lambda h: (
            (F.lit(a) * h + F.lit(b)) % F.lit(MH_PRIME) % F.lit(L_BITS)
        )

    per_i = [
        F.transform(hs, _affine(a, b))
        for a, b in (_clk_params(i) for i in range(K_HASH))
    ]
    return F.flatten(F.array(*per_i))


def _positions_sql(key: str) -> str:
    hs = (
        f"list_transform({_bigrams_sql(key)}, g -> {T.phash_sql('g')} "
        f"% {MH_PRIME})"
    )
    per_i = ", ".join(
        f"list_transform({hs}, h -> ({a} * h + {b}) % {MH_PRIME} % {L_BITS})"
        for a, b in (_clk_params(i) for i in range(K_HASH))
    )
    return f"flatten([{per_i}])"


def clk_encode(
    df: DataFrame, id_col: str, key: Column, block_cols: tuple
) -> DataFrame:
    """-> (doc_id, block..., w0..w<N_WORDS-1>, nbits): packed CLK words
    plus the precomputed popcount (so pair joins never recount sizes)."""
    bcols = list(block_cols)
    rows = (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            *[F.col(c) for c in bcols],
            F.explode(_positions(key)).alias("_pos"),
        )
        .select(
            "doc_id", *bcols,
            F.expr(f"CAST(_pos div {BITS_PER_WORD} AS INT)").alias("_w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(_pos % {BITS_PER_WORD} AS INT))"
            ).alias("_m"),
        )
    )
    aggs = [
        F.coalesce(
            F.bit_or(F.when(F.col("_w") == w, F.col("_m"))), F.lit(0)
        ).cast("long").alias(f"w{w}")
        for w in range(N_WORDS)
    ]
    enc = rows.groupBy("doc_id", *bcols).agg(*aggs)
    nbits = sum(
        (F.bit_count(F.col(f"w{w}")) for w in range(N_WORDS)),
        F.lit(0),
    )
    return enc.withColumn("nbits", nbits.cast("long"))


def clk_encode_sql(
    table: str, id_col: str, key_sql: str, block_cols: tuple
) -> str:
    bc = "".join(f"{c}, " for c in block_cols)  # "" when unblocked
    gb = "".join(f", {c}" for c in block_cols)
    wsel = ",\n             ".join(
        f"CAST(COALESCE(bit_or(CASE WHEN _pos // {BITS_PER_WORD} = {w} "
        f"THEN (CAST(1 AS BIGINT) << CAST(_pos % {BITS_PER_WORD} AS INT)) "
        f"END), 0) AS BIGINT) AS w{w}"
        for w in range(N_WORDS)
    )
    nbits = " + ".join(f"bit_count(w{w})" for w in range(N_WORDS))
    return f"""
      SELECT doc_id, {bc}{", ".join(f"w{w}" for w in range(N_WORDS))},
             CAST({nbits} AS BIGINT) AS nbits
      FROM (
        SELECT doc_id, {bc}{wsel}
        FROM (
          SELECT CAST({id_col} AS BIGINT) AS doc_id, {bc}
                 unnest({_positions_sql(key_sql)}) AS _pos
          FROM {table}
        ) GROUP BY doc_id{gb}
      )
    """


def clk_dice_pairs(
    df: DataFrame,
    id_col: str,
    key: Column,
    block_cols: tuple = ("lang", "source"),
    min_dice_micro: int = 500_000,
) -> DataFrame:
    """-> (id_a, id_b, nbits_a, nbits_b, inter_bits, dice_micro): blocked
    record pairs whose CLK Dice coefficient >= min_dice_micro / 1e6.
    dice_micro = (2 * |A∩B| * 1e6) div (|A| + |B|) — integers only."""
    bcols = list(block_cols)
    # consume-twice convention (CLAUDE.md): the per-document encode
    # aggregate feeds both self-join sides — materialize once.
    enc = clk_encode(df, id_col, key, tuple(bcols)).localCheckpoint()
    a = enc.select(
        *bcols, F.col("doc_id").alias("id_a"),
        *[F.col(f"w{w}").alias(f"a{w}") for w in range(N_WORDS)],
        F.col("nbits").alias("nbits_a"),
    )
    b = enc.select(
        *bcols, F.col("doc_id").alias("id_b"),
        *[F.col(f"w{w}").alias(f"b{w}") for w in range(N_WORDS)],
        F.col("nbits").alias("nbits_b"),
    )
    inter = sum(
        (
            F.bit_count(F.expr(f"a{w} & b{w}"))
            for w in range(N_WORDS)
        ),
        F.lit(0),
    )
    return (
        a.join(b, on=bcols)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("inter_bits", inter.cast("long"))
        .withColumn(
            "dice_micro",
            F.expr(
                f"CASE WHEN nbits_a + nbits_b > 0 THEN "
                f"(2 * inter_bits * {DICE_SCALE}) div (nbits_a + nbits_b) "
                f"ELSE 0 END"
            ).cast("long"),
        )
        .where(F.col("dice_micro") >= min_dice_micro)
        .select(
            "id_a", "id_b", "nbits_a", "nbits_b", "inter_bits", "dice_micro"
        )
    )


def clk_dice_pairs_sql(
    table: str,
    id_col: str,
    key_sql: str,
    block_cols: tuple = ("lang", "source"),
    min_dice_micro: int = 500_000,
) -> str:
    on = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    inter = " + ".join(f"bit_count(a.w{w} & b.w{w})" for w in range(N_WORDS))
    return f"""
    WITH enc AS MATERIALIZED ({clk_encode_sql(table, id_col, key_sql, block_cols)})
    SELECT id_a, id_b, nbits_a, nbits_b, inter_bits,
           CAST(CASE WHEN nbits_a + nbits_b > 0 THEN
             (2 * inter_bits * {DICE_SCALE}) // (nbits_a + nbits_b)
           ELSE 0 END AS BIGINT) AS dice_micro
    FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.nbits AS nbits_a, b.nbits AS nbits_b,
             CAST({inter} AS BIGINT) AS inter_bits
      FROM enc a JOIN enc b ON {on} AND a.doc_id < b.doc_id
    )
    WHERE CASE WHEN nbits_a + nbits_b > 0 THEN
            (2 * inter_bits * {DICE_SCALE}) // (nbits_a + nbits_b)
          ELSE 0 END >= {min_dice_micro}
    """


# ---------------------------------------------------------------------------
# Banded CLK join — the scale path (no equi-blocking key required)
# ---------------------------------------------------------------------------

BAND_BITS = 20
N_BANDS = L_BITS // BAND_BITS  # 12 bands of 20 bits (3 per 60-bit word)


def clk_band_pairs(
    df: DataFrame,
    id_col: str,
    key: Column,
    min_dice_micro: int = 500_000,
    max_bucket_rows: int | None = 1000,
) -> DataFrame:
    """-> (id_a, id_b, nbits_a, nbits_b, inter_bits, dice_micro): CLK
    Dice pairs WITHOUT an external blocking key — candidates share at
    least one of the 12 20-bit slices of the 240-bit encoding (the
    SimHash-chunk pigeonhole applied to Bloom filters), then every
    survivor pays exactly one exact Dice verify. The PPRL shape for a
    corpus with no shared plaintext blocking attribute (the usual PPRL
    constraint: blocking keys would leak).

    Recall contract: a pair at Hamming distance d on the encodings
    shares a slice when d < N_BANDS = 12 (pigeonhole); that shared-slice
    pair is GUARANTEED to surface only when its slice bucket is under
    the salt cap — salt_buckets (default max_bucket_rows=1000) splits
    oversized band buckets, and a pair whose ONLY shared slice lands in
    a split bucket can fall in different salts. Pass
    max_bucket_rows=None for the unconditional pigeonhole guarantee (at
    the cost of hot-bucket blowup, e.g. the all-zeros band of empty
    keys). High-Dice pairs have low Hamming by construction
    (ham = na + nb - 2*inter), so at the default threshold misses are
    only possible for short keys with few set bits AND a hot shared
    band. Precision is 1 regardless (exact verify).

    Scale shape: encode once per document (localCheckpoint — consumed by
    the band emitter and both verify re-attach joins); the banded
    self-join is NARROW ((id, band_key) rows only — packed words never
    ride the explode); oversized band buckets are salt-split
    (blocking.salt_buckets, e.g. the all-zeros band of empty keys);
    candidates are deduped across bands before the one Dice verify."""
    from .blocking import salt_buckets

    enc = clk_encode(df, id_col, key, ()).localCheckpoint()
    band_exprs = [
        F.concat_ws(
            ":",
            F.lit(str(w * (BITS_PER_WORD // BAND_BITS) + s)),
            F.expr(
                f"CAST(shiftright(w{w}, {s * BAND_BITS}) "
                f"& {(1 << BAND_BITS) - 1} AS STRING)"
            ),
        )
        for w in range(N_WORDS)
        for s in range(BITS_PER_WORD // BAND_BITS)
    ]
    bands = enc.select(
        F.col("doc_id").alias("_id"),
        F.explode(F.array(*band_exprs)).alias("band_key"),
    )
    bands = salt_buckets(bands, "band_key", "_id", max_bucket_rows)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band_key", "_bsalt"])
        .where(F.expr("a._id < b._id"))
        .select(
            F.expr("a._id").alias("id_a"), F.expr("b._id").alias("id_b")
        )
        .distinct()
    )
    wa = enc.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"w{w}").alias(f"a{w}") for w in range(N_WORDS)],
        F.col("nbits").alias("nbits_a"),
    )
    wb = enc.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"w{w}").alias(f"b{w}") for w in range(N_WORDS)],
        F.col("nbits").alias("nbits_b"),
    )
    inter = sum(
        (F.bit_count(F.expr(f"a{w} & b{w}")) for w in range(N_WORDS)),
        F.lit(0),
    )
    return (
        cand.join(wa, on="id_a")
        .join(wb, on="id_b")
        .withColumn("inter_bits", inter.cast("long"))
        .withColumn(
            "dice_micro",
            F.expr(
                f"CASE WHEN nbits_a + nbits_b > 0 THEN "
                f"(2 * inter_bits * {DICE_SCALE}) div (nbits_a + nbits_b) "
                f"ELSE 0 END"
            ).cast("long"),
        )
        .where(F.col("dice_micro") >= min_dice_micro)
        .select(
            "id_a", "id_b", "nbits_a", "nbits_b", "inter_bits", "dice_micro"
        )
    )


def clk_band_pairs_sql(
    table: str,
    id_col: str,
    key_sql: str,
    min_dice_micro: int = 500_000,
    max_bucket_rows: int | None = 1000,
) -> str:
    from .blocking import salt_buckets_sql

    mask = (1 << BAND_BITS) - 1
    band_exprs = ", ".join(
        f"concat_ws(':', '{w * (BITS_PER_WORD // BAND_BITS) + s}', "
        f"CAST((w{w} >> {s * BAND_BITS}) & {mask} AS VARCHAR))"
        for w in range(N_WORDS)
        for s in range(BITS_PER_WORD // BAND_BITS)
    )
    salt = salt_buckets_sql("band_key", "_id", max_bucket_rows)
    inter = " + ".join(
        f"bit_count(wa.w{w} & wb.w{w})" for w in range(N_WORDS)
    )
    return f"""
    WITH enc AS MATERIALIZED ({clk_encode_sql(table, id_col, key_sql, ())}),
    bands0 AS (
      SELECT doc_id AS _id, unnest([{band_exprs}]) AS band_key FROM enc
    ),
    bands AS (SELECT _id, band_key, {salt} AS _bsalt FROM bands0),
    cand AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a._bsalt = b._bsalt AND a._id < b._id
    )
    SELECT id_a, id_b, nbits_a, nbits_b, inter_bits,
           CAST(CASE WHEN nbits_a + nbits_b > 0 THEN
             (2 * inter_bits * {DICE_SCALE}) // (nbits_a + nbits_b)
           ELSE 0 END AS BIGINT) AS dice_micro
    FROM (
      SELECT id_a, id_b, wa.nbits AS nbits_a, wb.nbits AS nbits_b,
             CAST({inter} AS BIGINT) AS inter_bits
      FROM cand
      JOIN enc wa ON cand.id_a = wa.doc_id
      JOIN enc wb ON cand.id_b = wb.doc_id
    )
    WHERE CASE WHEN nbits_a + nbits_b > 0 THEN
            (2 * inter_bits * {DICE_SCALE}) // (nbits_a + nbits_b)
          ELSE 0 END >= {min_dice_micro}
    """


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit (privacy profiling over quasi-identifiers)
# ---------------------------------------------------------------------------

KANON_K = 5
LDIV_L = 3
KANON_BAND = 100  # n_chars generalization band width


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: tuple[str, str] = ("lang", "source"),
    numeric_col: str = "n_chars",
    k: int = KANON_K,
    l: int = LDIV_L,
) -> DataFrame:
    """-> one row per generalization level 0..3: (level, n_classes,
    min_class, max_class, n_below_k, l_min, is_k_anonymous,
    is_l_diverse): the privacy audit a release pipeline runs BEFORE
    publishing quasi-identified rows (Sweeney 2002 k-anonymity;
    Machanavajjhala et al. 2007 l-diversity) — the plaintext-side
    companion of the CLK PPRL encoders, which exist precisely because
    raw quasi-identifiers leak.

    The generalization ladder is the nested ROLLUP of
    (quasi1, quasi2, band(numeric)): level 0 = full quasi-tuple,
    3 = fully suppressed. ONE rollup aggregation computes every level's
    equivalence classes (the multi-grain trap of CLAUDE.md does not
    bite: all states are integers); level ids derive from the rollup
    NULL markers, never GROUPING_ID (engine-specific). l_min is the
    minimum distinct-sensitive-values per class, with the banded numeric
    as the sensitive attribute — at level 0 it is 1 by construction
    (the band sits inside the quasi-tuple; meaningful from level 1 up).
    A release is k-anonymous at level L iff min_class >= k there —
    the smallest such L is the generalization the release needs.

    Scale shape: one map-side-combined rollup over the corpus (integer
    counts), one count-distinct per class, then a |classes|-row level
    summary. Nothing driver-side."""
    q1, q2 = quasi_cols
    base = df.select(
        F.col(q1).alias("_q1"),
        F.col(q2).alias("_q2"),
        # DIV = integer division, matching DuckDB // (n_chars >= 0)
        F.expr(f"CAST(CAST({numeric_col} AS BIGINT) DIV {KANON_BAND} AS BIGINT)")
        .alias("_band"),
    )
    classes = (
        base.rollup("_q1", "_q2", "_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.countDistinct("_band").cast("long").alias("_l"),
        )
        .select(
            F.when(F.col("_band").isNotNull(), F.lit(0))
            .when(F.col("_q2").isNotNull(), F.lit(1))
            .when(F.col("_q1").isNotNull(), F.lit(2))
            .otherwise(F.lit(3))
            .cast("int")
            .alias("level"),
            "_n",
            "_l",
        )
    )
    return (
        classes.groupBy("level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("_n").cast("long").alias("min_class"),
            F.max("_n").cast("long").alias("max_class"),
            F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
            .cast("long")
            .alias("n_below_k"),
            F.min("_l").cast("long").alias("l_min"),
        )
        .select(
            "level", "n_classes", "min_class", "max_class", "n_below_k",
            "l_min",
            F.when(F.col("min_class") >= k, 1).otherwise(0).cast("int")
            .alias("is_k_anonymous"),
            F.when(F.col("l_min") >= l, 1).otherwise(0).cast("int")
            .alias("is_l_diverse"),
        )
    )


def k_anonymity_profile_sql(
    table: str,
    quasi_cols: tuple[str, str] = ("lang", "source"),
    numeric_col: str = "n_chars",
    k: int = KANON_K,
    l: int = LDIV_L,
) -> str:
    q1, q2 = quasi_cols
    return f"""
    WITH base AS (
      SELECT {q1} AS _q1, {q2} AS _q2,
             CAST(CAST({numeric_col} AS BIGINT) // {KANON_BAND} AS BIGINT)
               AS _band
      FROM {table}
    ),
    classes AS (
      SELECT CASE WHEN _band IS NOT NULL THEN 0
                  WHEN _q2 IS NOT NULL THEN 1
                  WHEN _q1 IS NOT NULL THEN 2
                  ELSE 3 END AS level,
             CAST(count(*) AS BIGINT) AS _n,
             CAST(count(DISTINCT _band) AS BIGINT) AS _l
      FROM base GROUP BY ROLLUP (_q1, _q2, _band)
    )
    SELECT CAST(level AS INT) AS level,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(_n) AS BIGINT) AS min_class,
           CAST(max(_n) AS BIGINT) AS max_class,
           CAST(sum(CASE WHEN _n < {k} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k,
           CAST(min(_l) AS BIGINT) AS l_min,
           CAST(CASE WHEN min(_n) >= {k} THEN 1 ELSE 0 END AS INT)
             AS is_k_anonymous,
           CAST(CASE WHEN min(_l) >= {l} THEN 1 ELSE 0 END AS INT)
             AS is_l_diverse
    FROM classes GROUP BY level
    """
