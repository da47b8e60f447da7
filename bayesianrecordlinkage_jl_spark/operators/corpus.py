"""Training-corpus curation operators (beyond the reference — the stages a
web-scale LLM-data pipeline runs AFTER near-dup pair detection):

  - near_dup_clusters_keep: near-dup pairs -> transitive clusters ->
    canonical representative per cluster (the "which copy do we keep"
    step that turns pair detection into an actually deduplicated corpus).
  - duplicated_span_stats: per-document duplicated k-word-span profile —
    the relational form of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a span is
    duplicated iff its content hash occurs in at least one OTHER document.
  - inverted_postings / conjunctive_search_topk: term->doc inverted index
    and multi-query conjunctive (AND) search ranked by summed term
    frequency; bm25_topk adds the standard BM25 ranking on the same
    postings (library-level: idf/avgdl are data-derived and log-based, so
    it is pytest-validated rather than oracle-checked).

Reference analog: none (BayesianRecordLinkage.jl stops at entity
clusters); these compose the repo's own LSH/CC machinery
(operators/dedup.py, operators/connected_components.py) into corpus ops.

Scale notes (100 TB):
  - cluster keep: the only non-LSH shuffles are the CC rounds (large-star/
    small-star over |near-dup edges|) and one struct-MAX aggregate keyed by
    component — |docs| rows of (component, len, id), never the pair graph
    (the mutual_best lesson).
  - span stats: shuffles are keyed by the 60-bit span hash (near-uniform);
    per-key fan-out of the docs-per-gram join is bounded by document
    frequency, with the hot side pre-aggregated to one row per
    (gram, doc) — no quadratic blowup on boilerplate.
  - search: postings are filtered to the literal query vocabulary
    MAP-SIDE (right after the explode, before any shuffle), so the ranked
    window only ever sees docs matching at least one term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as T
from .connected_components import components_with_isolated
from .dedup import _spread, minhash_lsh_pairs, minhash_lsh_pairs_sql


# ---------------------------------------------------------------------------
# near-dup cluster canonicalization
# ---------------------------------------------------------------------------


def near_dup_clusters_keep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    len_col: str,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """-> (doc_id, rep_id, keep boolean, cluster_size bigint), one row per
    document. Documents are clustered by the transitive closure of the
    MinHash-LSH near-dup graph (isolated docs form singleton clusters);
    each cluster keeps its LONGEST document (len_col desc, id asc
    tie-break — a total order, so the choice is partitioning-invariant).

    The representative is a struct-MAX aggregate keyed by component
    (partial aggregation combines map-side; the shuffle carries |docs|
    rows, never the pair graph)."""
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, n_bands, rows_per_band, shingle_k
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    nodes = df.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(len_col).cast("long").alias("_len"),
    )
    comps = components_with_isolated(edges, nodes.select("node"))
    # comps is backed by CC's localCheckpoint (and own-id for isolates), so
    # consuming `labeled` twice re-runs only a cheap scan+join, not the LSH.
    labeled = comps.join(nodes, on="node")
    reps = (
        labeled.groupBy("component")
        .agg(
            F.max(
                F.struct(F.col("_len"), (-F.col("node")).alias("_nid"))
            ).alias("_m"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select(
            "component",
            (-F.col("_m._nid")).cast("long").alias("rep_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
    )
    return labeled.join(reps, on="component").select(
        F.col("node").alias("doc_id"),
        "rep_id",
        (F.col("node") == F.col("rep_id")).alias("keep"),
        "cluster_size",
    )


def near_dup_clusters_keep_sql(
    table: str,
    id_col: str,
    text_col: str,
    len_col: str,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> str:
    pairs = minhash_lsh_pairs_sql(
        table, id_col, text_col, n_bands, rows_per_band, shingle_k
    )
    return f"""
    WITH RECURSIVE jp AS MATERIALIZED ({pairs}),
    nodes AS (SELECT CAST({id_col} AS BIGINT) AS node,
                     CAST({len_col} AS BIGINT) AS _len FROM {table}),
    bi AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jp
         UNION ALL SELECT id_b AS a, id_a AS b FROM jp),
    walk(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT bi.b, walk.comp FROM walk JOIN bi ON bi.a = walk.node
      WHERE walk.comp < bi.b
    ),
    cc AS MATERIALIZED (SELECT node, min(comp) AS component
                        FROM walk GROUP BY node),
    ranked AS (
      SELECT cc.node, cc.component, n._len,
             row_number() OVER (PARTITION BY cc.component
                                ORDER BY n._len DESC, cc.node ASC) AS _rn,
             count(*) OVER (PARTITION BY cc.component) AS _csize
      FROM cc JOIN nodes n ON n.node = cc.node
    ),
    reps AS (SELECT component, node AS rep_id, _csize FROM ranked
             WHERE _rn = 1)
    SELECT cc.node AS doc_id, reps.rep_id, cc.node = reps.rep_id AS keep,
           CAST(reps._csize AS BIGINT) AS cluster_size
    FROM cc JOIN reps ON reps.component = cc.component
    """


# ---------------------------------------------------------------------------
# duplicated-span statistics (exact-substring dedup, relational form)
# ---------------------------------------------------------------------------


def duplicated_span_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """-> (doc_id, n_grams bigint, dup_grams bigint, dup_frac double), one
    row per document. A k-word span (position) counts as duplicated iff
    its 60-bit content hash (functions.text.phash of the space-joined
    window) occurs in at least one OTHER document — within-document
    repetition alone is not duplication.

    Tokenize/shingle/md5 runs ONCE per document behind a unique-key
    aggregate barrier (the minhash_lsh_pairs pattern) and is
    localCheckpoint'ed: the per-(gram, doc) occurrence table is consumed
    by both the document-frequency aggregate and the join back."""
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.transform(
                T.word_shingles(F.col(text_col), k), lambda s: T.phash(s)
            ).alias("_gh"),
        )
        .groupBy("doc_id")
        .agg(F.first("_gh").alias("_gh"))
        .localCheckpoint()
    )
    per_gram_doc = (
        hashed.select(
            "doc_id",
            F.size("_gh").cast("long").alias("n_grams"),
            F.explode("_gh").alias("gh"),
        )
        .groupBy("gh", "doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    gram_docs = per_gram_doc.groupBy("gh").agg(
        F.count(F.lit(1)).alias("_ndocs")
    )
    return (
        per_gram_doc.join(gram_docs, on="gh")
        .groupBy("doc_id", "n_grams")
        .agg(
            F.sum(
                F.when(F.col("_ndocs") >= 2, F.col("_occ")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("dup_grams")
        )
        .select(
            "doc_id",
            "n_grams",
            "dup_grams",
            (
                F.col("dup_grams").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("dup_frac"),
        )
    )


def duplicated_span_stats_sql(
    table: str, id_col: str, text_col: str, k: int = 8
) -> str:
    grams = (
        f"list_transform({T.word_shingles_sql(text_col, k)}, "
        f"s -> {T.phash_sql('s')})"
    )
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS doc_id, {grams} AS _gh FROM {table}
    ),
    occ AS (SELECT doc_id, CAST(len(_gh) AS BIGINT) AS n_grams,
                   unnest(_gh) AS gh FROM hashed),
    pgd AS (SELECT gh, doc_id, n_grams, count(*) AS _occ
            FROM occ GROUP BY gh, doc_id, n_grams),
    gd AS (SELECT gh, count(*) AS _ndocs FROM pgd GROUP BY gh)
    SELECT doc_id, n_grams,
           CAST(sum(CASE WHEN _ndocs >= 2 THEN _occ ELSE 0 END) AS BIGINT)
             AS dup_grams,
           CAST(CAST(sum(CASE WHEN _ndocs >= 2 THEN _occ ELSE 0 END)
                     AS BIGINT) AS DOUBLE)
             / CAST(n_grams AS DOUBLE) AS dup_frac
    FROM pgd JOIN gd USING (gh) GROUP BY doc_id, n_grams
    """


def split_column(id_col: str, splits: dict[str, int], salt: str = "split"):
    """The split-name Column as a pure per-row function of the id (shared
    by hash_split and any operator that filters by split without a join)."""
    total = sum(splits.values())
    expr = None
    lo = 0
    bucket = T.phash(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % total
    for name, w in splits.items():
        cond = bucket < F.lit(lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += w
    return expr


def split_case_sql(id_col: str, splits: dict[str, int], salt: str = "split") -> str:
    total = sum(splits.values())
    bucket = T.phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)") + f" % {total}"
    cases = []
    lo = 0
    for name, w in splits.items():
        cases.append(f"WHEN ({bucket}) < {lo + w} THEN '{name}'")
        lo += w
    return f"CASE {' '.join(cases)} END"


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: -> (doc_id, split string).
    Buckets = phash(salt || id) mod sum(weights); each named split owns a
    contiguous weight range, so assignment is a pure per-row function of
    the id — stable across runs, partitionings and engines (phash is the
    shared 60-bit md5 hash), and growing the corpus never reassigns an
    existing id. splits e.g. {"train": 98, "val": 1, "test": 1}."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        split_column(id_col, splits, salt).alias("split"),
    )


def hash_split_sql(
    table: str, id_col: str, splits: dict[str, int], salt: str = "split"
) -> str:
    return f"""
    SELECT CAST({id_col} AS BIGINT) AS doc_id,
           {split_case_sql(id_col, splits, salt)} AS split
    FROM {table}
    """


def ngram_repetition_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 2
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText-style
    quality filter, Rae et al. 2021 §A1.1): -> (doc_id, n_tokens bigint,
    n_grams bigint, dup_gram_frac double, top_gram_frac double).

      - dup_gram_frac: fraction of k-gram POSITIONS whose k-gram occurs
        more than once in the SAME document (cf. "duplicate n-gram
        fraction");
      - top_gram_frac: occurrences of the document's most frequent k-gram
        over all k-gram positions (cf. "top n-gram fraction").

    Unlike duplicated_span_stats (cross-document), this is purely
    intra-document: tokenize/shingle/hash once per doc behind the
    aggregate barrier, explode, and aggregate per (doc, gram) then per
    doc — shuffles are keyed by (doc, 60-bit gram hash), so hot grams
    cannot skew a single reducer across documents."""
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            T.token_count(F.col(text_col)).alias("n_tokens"),
            F.transform(
                T.word_shingles(F.col(text_col), k), lambda s: T.phash(s)
            ).alias("_gh"),
        )
        .groupBy("doc_id")
        .agg(F.first("n_tokens").alias("n_tokens"), F.first("_gh").alias("_gh"))
    )
    per_gram = (
        hashed.select(
            "doc_id",
            "n_tokens",
            F.size("_gh").cast("long").alias("n_grams"),
            F.explode("_gh").alias("gh"),
        )
        .groupBy("doc_id", "n_tokens", "n_grams", "gh")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        per_gram.groupBy("doc_id", "n_tokens", "n_grams")
        .agg(
            F.sum(
                F.when(F.col("_cnt") >= 2, F.col("_cnt")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("_dup_pos"),
            F.max("_cnt").cast("long").alias("_top_cnt"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            (
                F.col("_dup_pos").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("dup_gram_frac"),
            (
                F.col("_top_cnt").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("top_gram_frac"),
        )
    )


def ngram_repetition_stats_sql(
    table: str, id_col: str, text_col: str, k: int = 2
) -> str:
    grams = (
        f"list_transform({T.word_shingles_sql(text_col, k)}, "
        f"s -> {T.phash_sql('s')})"
    )
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS doc_id,
             {T.token_count_sql(text_col)} AS n_tokens, {grams} AS _gh
      FROM {table}
    ),
    per_gram AS (
      SELECT doc_id, n_tokens, n_grams, gh, count(*) AS _cnt FROM (
        SELECT doc_id, n_tokens, CAST(len(_gh) AS BIGINT) AS n_grams,
               unnest(_gh) AS gh FROM hashed
      ) GROUP BY doc_id, n_tokens, n_grams, gh
    )
    SELECT doc_id, n_tokens, n_grams,
           CAST(CAST(sum(CASE WHEN _cnt >= 2 THEN _cnt ELSE 0 END) AS BIGINT)
                AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_gram_frac,
           CAST(CAST(max(_cnt) AS BIGINT) AS DOUBLE)
             / CAST(n_grams AS DOUBLE) AS top_gram_frac
    FROM per_gram GROUP BY doc_id, n_tokens, n_grams
    """


def contamination_flags(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_id_col: str,
    bench_text_col: str,
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: -> (doc_id, n_hits bigint, contaminated
    boolean), one row per CORPUS document. A hit is a k-word span
    (position) in the corpus doc whose content hash also occurs in ANY
    benchmark document; docs with >= min_hits hits are flagged (the
    standard n-gram-overlap test-set decontamination rule, e.g. GPT-3
    appendix C / Lee et al. 2022).

    Semantics are pure content overlap: any shared span flags, including
    a doc matching itself when it is present in both inputs (exclude
    benchmark ids from the corpus upstream if that is not wanted).

    Scale shape: both sides hash spans once per document behind an
    aggregate barrier; the benchmark's DISTINCT span-hash set is
    typically tiny relative to the corpus (test sets are small), so the
    probe is an equi-join on the 60-bit hash that AQE turns into a
    broadcast when it fits — the corpus explode never shuffles more than
    (doc_id, hash) rows either way."""

    def _span_hashes(df: DataFrame, idc: str, tc: str) -> DataFrame:
        return (
            _spread(df, idc)
            .select(
                F.col(idc).cast("long").alias("doc_id"),
                F.transform(
                    T.word_shingles(F.col(tc), k), lambda s: T.phash(s)
                ).alias("_gh"),
            )
            .groupBy("doc_id")
            .agg(F.first("_gh").alias("_gh"))
        )

    bench_set = (
        _span_hashes(benchmark, bench_id_col, bench_text_col)
        .select(F.explode("_gh").alias("gh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus_spans = _span_hashes(corpus, id_col, text_col).select(
        "doc_id", F.explode("_gh").alias("gh")
    )
    return (
        corpus_spans.join(bench_set, on="gh", how="left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "doc_id",
            "n_hits",
            (F.col("n_hits") >= min_hits).alias("contaminated"),
        )
    )


def contamination_flags_sql(
    table: str,
    id_col: str,
    text_col: str,
    bench_filter: str,
    k: int = 8,
    min_hits: int = 1,
    corpus_filter: str = "TRUE",
) -> str:
    """DuckDB twin for the catalog case where the benchmark set is a
    static filter over the same table (and, optionally, the flagged
    corpus is another static filter — the split-decontamination case)."""
    grams = (
        f"list_transform({T.word_shingles_sql(text_col, k)}, "
        f"s -> {T.phash_sql('s')})"
    )
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS doc_id, {grams} AS _gh,
             ({bench_filter}) AS _is_bench, ({corpus_filter}) AS _is_corpus
      FROM {table}
    ),
    bench_set AS (SELECT DISTINCT unnest(_gh) AS gh FROM hashed
                  WHERE _is_bench),
    corpus_spans AS (SELECT doc_id, unnest(_gh) AS gh FROM hashed
                     WHERE _is_corpus),
    hits AS (
      SELECT c.doc_id,
             CAST(sum(CASE WHEN b.gh IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_hits
      FROM corpus_spans c LEFT JOIN bench_set b ON b.gh = c.gh
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_hits, n_hits >= {min_hits} AS contaminated FROM hits
    """


# ---------------------------------------------------------------------------
# inverted index + conjunctive search
# ---------------------------------------------------------------------------


def inverted_postings(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """-> (term, doc_id, tf bigint): the term->document inverted index."""
    return (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(T.tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def conjunctive_search_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[int, tuple[str, ...]],
    k: int = 10,
) -> DataFrame:
    """-> (query_id int, doc_id, score bigint, rank int): for each query,
    the top-k documents containing ALL its terms, ranked by summed term
    frequency (ties to the smaller doc_id — total order).

    The literal query table (query_id, term, n_terms) is broadcast onto
    the postings; postings themselves are filtered to the union query
    vocabulary map-side, before any shuffle, so the per-query window sees
    only matching docs (bounded by document frequency, not corpus size)."""
    spark = df.sparkSession
    rows = [
        (int(qid), t, len(set(terms)))
        for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    ]
    qdf = spark.createDataFrame(
        rows, schema="query_id int, term string, n_terms int"
    )
    vocab = sorted({t for terms in queries.values() for t in terms})
    postings = inverted_postings(df, id_col, text_col).where(
        F.col("term").isin(vocab)
    )
    matched = (
        postings.join(F.broadcast(qdf), on="term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("_nmatch"),
            F.first("n_terms").alias("_need"),  # unique per query_id
            F.sum("tf").cast("long").alias("score"),
        )
        .where(F.col("_nmatch") == F.col("_need"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        matched.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def conjunctive_search_topk_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: dict[int, tuple[str, ...]],
    k: int = 10,
) -> str:
    vals = ", ".join(
        f"({int(qid)}, '{t}', {len(set(terms))})"
        for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    )
    return f"""
    WITH q(query_id, term, n_terms) AS (VALUES {vals}),
    postings AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT CAST({id_col} AS BIGINT) AS doc_id,
               unnest({T.tokens_sql(text_col)}) AS term FROM {table}
      ) WHERE term IN (SELECT term FROM q) GROUP BY term, doc_id
    ),
    matched AS (
      SELECT q.query_id, p.doc_id, CAST(sum(p.tf) AS BIGINT) AS score
      FROM postings p JOIN q USING (term)
      GROUP BY q.query_id, p.doc_id, q.n_terms
      HAVING count(*) = q.n_terms
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      FROM matched
    ) WHERE rank <= {k}
    """


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[int, tuple[str, ...]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked disjunctive (OR) search: (query_id, doc_id, score
    double, rank int). idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the
    Lucene/ATIRE non-negative form), length-normalized tf saturation with
    the standard (k1, b).

    N and avgdl are single scalar aggregates (two tiny jobs); df comes
    from one postings aggregate and rides the broadcast query join.
    Library-level only: the score is log-based and corpus-derived, so it
    is validated by pytest against a driver-side numpy replica rather
    than a static DuckDB oracle (repo invariant: no exp/log in
    oracle-checked columns)."""
    spark = df.sparkSession
    rows = [
        (int(qid), t)
        for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    ]
    qdf = spark.createDataFrame(rows, schema="query_id int, term string")
    vocab = sorted({t for terms in queries.values() for t in terms})

    stats = df.select(
        F.count(F.lit(1)).alias("_n"),
        F.avg(T.token_count(F.col(text_col))).alias("_avgdl"),
    ).collect()[0]
    n_docs, avgdl = int(stats["_n"]), float(stats["_avgdl"])

    dl = _spread(df, id_col).select(
        F.col(id_col).cast("long").alias("doc_id"),
        T.token_count(F.col(text_col)).alias("_dl"),
    )
    postings = inverted_postings(df, id_col, text_col).where(
        F.col("term").isin(vocab)
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("_dl").cast("double") / F.lit(avgdl)
        )
    )
    scored = (
        postings.join(F.broadcast(qdf), on="term")
        .join(F.broadcast(dfreq), on="term")
        .join(dl, on="doc_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * tf_norm).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# per-key frequency capping (domain cap)
# ---------------------------------------------------------------------------


def frequency_cap(
    df: DataFrame,
    id_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Per-key frequency capping (the C4/RefinedWeb "domain cap": keep at
    most `cap` documents per host/source so hot domains cannot dominate
    the corpus): -> (doc_id, key, rank int), the SURVIVING rows only.

    Selection is a pure function of the id: within a key, docs are ranked
    by (phash(salt || id) asc, doc_id asc) — a deterministic shuffle, so
    the kept subset is stable across runs, partitionings and engines, and
    is an unbiased uniform sample of the key's docs.

    Scale shape: the rank<=cap filter over row_number() is rewritten by
    Spark (InferWindowGroupLimit, 3.5+) into a WindowGroupLimit that
    drops rows PARTIAL/map-side before the shuffle — a Zipf-hot key ships
    at most `cap` rows per input partition instead of its full row set
    (plan shape pinned in tests/test_plans.py)."""
    h = T.phash(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("key").orderBy(F.asc("_h"), F.asc("doc_id"))
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(key_col).alias("key"),
            h.alias("_h"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= cap)
        .select("doc_id", "key", "rank")
    )


def frequency_cap_sql(
    table: str, id_col: str, key_col: str, cap: int, salt: str = "cap"
) -> str:
    h = T.phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT doc_id, key, rank FROM (
      SELECT CAST({id_col} AS BIGINT) AS doc_id, {key_col} AS key,
             CAST(row_number() OVER (
               PARTITION BY {key_col}
               ORDER BY {h} ASC, CAST({id_col} AS BIGINT) ASC
             ) AS INT) AS rank
      FROM {table}
    ) WHERE rank <= {cap}
    """


# ---------------------------------------------------------------------------
# sequence packing (fixed token-budget training windows)
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    n_buckets: int = 8,
    salt: str = "pack",
    group_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing for LLM training (fill fixed context
    windows with whole documents, Raffel et al. 2020 §2.3 / Krell et al.
    2021): -> (doc_id, bucket int, seq_id bigint, offset bigint), one row
    per document.

    Packing a whole corpus is inherently sequential, so the scale shape
    is hash-sharded independence: each doc goes to one of `n_buckets`
    packers (bucket = phash(salt||id) % n_buckets — at 100 TB set
    n_buckets ~ cores so every packer's doc list fits an executor);
    within a bucket, docs are visited in (phash, doc_id) order — a
    deterministic shuffle — and appended to the current sequence while
    the running fill + len <= budget, else a new sequence starts. A doc
    longer than `budget` occupies a sequence alone (never truncated).
    seq_id = bucket * 2^40 + per-bucket sequence index; offset is the
    doc's token offset inside its sequence.

    With `group_col` set (e.g. a train/val/test split), packers are keyed
    by (group, bucket) so sequences never mix groups; seq_id is then
    unique WITHIN a group — (group, seq_id) is the global key — and the
    group column rides through to the output.

    The per-bucket scan is one applyInPandas pass (Arrow batch in, one
    sequential numpy-array walk — the irreducibly serial part of packing,
    bounded by bucket size and parallel across buckets); everything
    upstream and downstream stays relational. Oracle twin: per-bucket
    recursive CTE replaying the same greedy rule row-by-row."""
    import numpy as np
    import pandas as pd

    h = T.phash(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    cols = [
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(len_col).cast("long").alias("_len"),
        h.alias("_h"),
        (h % n_buckets).cast("int").alias("bucket"),
    ]
    if group_col is not None:
        cols.append(F.col(group_col).cast("string").alias(group_col))
    prepared = df.select(*cols)
    out_schema = "doc_id long, bucket int, seq_id long, offset long"
    if group_col is not None:
        out_schema += f", {group_col} string"
    budget_i = int(budget)
    gcol = group_col

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", "doc_id"], ignore_index=True)
        lens = pdf["_len"].to_numpy(dtype=np.int64)
        seqs = np.empty(len(pdf), dtype=np.int64)
        offs = np.empty(len(pdf), dtype=np.int64)
        seq, fill = 0, None
        for i, ln in enumerate(lens):
            if fill is not None and fill + ln <= budget_i:
                offs[i] = fill
                fill += ln
            else:
                if fill is not None:
                    seq += 1
                offs[i] = 0
                fill = ln
            seqs[i] = seq
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        out = {
            "doc_id": pdf["doc_id"],
            "bucket": np.int32(bucket),
            "seq_id": (bucket << 40) + seqs,
            "offset": offs,
        }
        if gcol is not None:
            out[gcol] = pdf[gcol]
        return pd.DataFrame(out)

    keys = ["bucket"] if group_col is None else [group_col, "bucket"]
    return prepared.groupBy(*keys).applyInPandas(_pack, out_schema)


def pack_sequences_sql(
    table: str,
    id_col: str,
    len_col: str,
    budget: int,
    n_buckets: int = 8,
    salt: str = "pack",
    group_col: str | None = None,
) -> str:
    """DuckDB twin: the greedy scan as a per-bucket recursive CTE — each
    iteration advances every (group,) bucket by one row (rn -> rn+1),
    carrying (seq, fill) state; depth = max rows per bucket. NB the
    recursive member uses UNION ALL (linear recursion, one new row per
    bucket per step — the repo's WITH RECURSIVE dedup trap does not
    apply because rows are unique by construction)."""
    h = T.phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    gsel = f", CAST({group_col} AS VARCHAR) AS _grp" if group_col else ""
    gpart = f"CAST({group_col} AS VARCHAR), " if group_col else ""
    gw = ", _grp" if group_col else ""
    gjoin = " AND o._grp = w._grp" if group_col else ""
    gout = f", w._grp AS {group_col}" if group_col else ""
    return f"""
    WITH RECURSIVE ordered AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS doc_id,
             CAST({len_col} AS BIGINT) AS _len,
             CAST(({h}) % {n_buckets} AS INT) AS bucket{gsel},
             row_number() OVER (
               PARTITION BY {gpart}({h}) % {n_buckets}
               ORDER BY {h} ASC, CAST({id_col} AS BIGINT) ASC
             ) AS rn
      FROM {table}
    ),
    walk(bucket, rn, doc_id, seq, fill{gw}) AS (
      SELECT bucket, rn, doc_id, CAST(0 AS BIGINT) AS seq, _len AS fill{gw}
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.doc_id,
             CASE WHEN w.fill + o._len <= {int(budget)}
                  THEN w.seq ELSE w.seq + 1 END,
             CASE WHEN w.fill + o._len <= {int(budget)}
                  THEN w.fill + o._len ELSE o._len END{
               ', o._grp' if group_col else ''}
      FROM walk w JOIN ordered o
        ON o.bucket = w.bucket AND o.rn = w.rn + 1{gjoin}
    )
    SELECT w.doc_id, w.bucket,
           (CAST(w.bucket AS BIGINT) * 1099511627776) + w.seq AS seq_id,
           w.fill - o._len AS offset{gout}
    FROM walk w JOIN ordered o
      ON o.bucket = w.bucket AND o.rn = w.rn{gjoin}
    """


# ---------------------------------------------------------------------------
# end-to-end curation pipeline: documents in -> packed training windows out
# ---------------------------------------------------------------------------


def curation_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    q_min: float = 0.5,
    rep_max: float = 0.125,
    rep_k: int = 2,
    cap: int = 15,
    splits: dict[str, int] | None = None,
    budget: int = 256,
    n_buckets: int = 4,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """The whole training-data curation flow as ONE relational pipeline —
    raw documents in, packed training windows out:

      1. quality gate: quality_score >= q_min AND within-doc duplicate
         k-gram fraction <= rep_max (Gopher-style filters);
      2. near-dup dedup: MinHash-LSH clusters, keep the longest doc per
         cluster;
      3. domain cap: at most `cap` survivors per source
         (deterministic-hash uniform keep);
      4. split: hash-bucketed train/val/test;
      5. pack: greedy whole-doc packing into `budget`-token windows,
         grouped by split so sequences never mix splits.

    -> (doc_id, split, seq_id, offset), one row per document that
    survives the gates; (split, seq_id, offset) addresses its slot in
    the packed corpus. All thresholds are dyadic so the whole pipeline
    is bit-portable (oracle twin composes the per-stage SQL twins).

    Scale notes: the gated working set is localCheckpoint'ed because
    three consumers read it (the LSH cluster pass and two id joins) —
    the mutual_best double-consumption lesson; every later stage is a
    pure function of (id, n_tokens, source), so nothing re-reads text
    after stage 2."""
    splits = splits or {"train": 98, "val": 1, "test": 1}
    rep = ngram_repetition_stats(df, id_col, text_col, k=rep_k)
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.col(source_col).alias("_source"),
        T.quality_score(F.col(text_col)).alias("_q"),
    )
    gated = (
        base.join(rep.select("doc_id", "n_tokens", "dup_gram_frac"), on="doc_id")
        .where((F.col("_q") >= F.lit(q_min)) & (F.col("dup_gram_frac") <= F.lit(rep_max)))
        .select("doc_id", "_text", "_source", "n_tokens")
        .localCheckpoint()
    )
    keepers = near_dup_clusters_keep(
        gated, "doc_id", "_text", "n_tokens", n_bands, rows_per_band, shingle_k
    ).where("keep").select("doc_id")
    survivors = gated.join(keepers, on="doc_id")
    capped = frequency_cap(survivors, "doc_id", "_source", cap).select("doc_id")
    kept = survivors.join(capped, on="doc_id")
    split = hash_split(kept, "doc_id", splits)
    packin = kept.select("doc_id", "n_tokens").join(split, on="doc_id")
    return pack_sequences(
        packin, "doc_id", "n_tokens", budget, n_buckets, group_col="split"
    ).select("doc_id", "split", "seq_id", "offset")


def curation_pipeline_sql(
    table: str,
    id_col: str,
    text_col: str,
    source_col: str,
    q_min: float = 0.5,
    rep_max: float = 0.125,
    rep_k: int = 2,
    cap: int = 15,
    splits: dict[str, int] | None = None,
    budget: int = 256,
    n_buckets: int = 4,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> str:
    """DuckDB twin: composes the per-stage SQL twins — each stage's full
    statement (own WITH RECURSIVE where needed) rides as a parenthesized
    subquery inside one outer WITH, so no recursive blocks merge (the
    repo's WITH RECURSIVE dedup trap stays contained per stage)."""
    splits = splits or {"train": 98, "val": 1, "test": 1}
    rep = ngram_repetition_stats_sql(table, id_col, text_col, k=rep_k)
    q = T.quality_score_sql(f"d.{text_col}")
    ck = near_dup_clusters_keep_sql(
        "gated", "doc_id", "_text", "n_tokens", n_bands, rows_per_band, shingle_k
    )
    capsql = frequency_cap_sql("surv", "doc_id", "_source", cap)
    spsql = hash_split_sql("kept", "doc_id", splits)
    packsql = pack_sequences_sql(
        "packin", "doc_id", "n_tokens", budget, n_buckets, group_col="split"
    )
    return f"""
    WITH gated AS MATERIALIZED (
      SELECT CAST(d.{id_col} AS BIGINT) AS doc_id, d.{text_col} AS _text,
             d.{source_col} AS _source, r.n_tokens
      FROM {table} d JOIN ({rep}) r ON r.doc_id = CAST(d.{id_col} AS BIGINT)
      WHERE ({q}) >= {q_min!r}e0 AND r.dup_gram_frac <= {rep_max!r}e0
    ),
    keepers AS MATERIALIZED (
      SELECT doc_id FROM ({ck}) WHERE keep
    ),
    surv AS MATERIALIZED (
      SELECT g.* FROM gated g JOIN keepers USING (doc_id)
    ),
    capped AS (SELECT doc_id FROM ({capsql})),
    kept AS MATERIALIZED (
      SELECT s.* FROM surv s JOIN capped USING (doc_id)
    ),
    sp AS ({spsql}),
    packin AS (
      SELECT k.doc_id, k.n_tokens, sp.split
      FROM kept k JOIN sp USING (doc_id)
    )
    SELECT doc_id, split, seq_id, "offset" FROM ({packsql})
    """


# ---------------------------------------------------------------------------
# hashed linear quality classifier (fastText/CCNet-style model gate)
# ---------------------------------------------------------------------------

QC_BUCKETS = 256


def classifier_weights(n_buckets: int = QC_BUCKETS, seed: str = "qw") -> list[int]:
    """Frozen integer weights in [-8, 8], one per hash bucket, derived
    once from md5 of the bucket index.  The same Python constants feed
    both emitters (the MinHash affine-constant pattern), so the "model"
    is static — never trained at query time (oracle-staticity invariant).
    At production scale the ints would come from an offline fastText /
    logistic fit quantized to this grid; the serving plan is identical."""
    import hashlib

    return [
        int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16) % 17 - 8
        for i in range(n_buckets)
    ]


_QC_TOKENS = "filter(split(lower({c}), '[^a-z0-9]+'), t -> t != '')"
_QC_HASH = "CAST(conv(substring(md5(t),1,15),16,10) AS BIGINT)"


def quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = QC_BUCKETS,
    seed: str = "qw",
) -> DataFrame:
    """-> (doc_id, n_tokens bigint, raw_score bigint, cls_score double,
    keep boolean): a hashed-bag-of-words linear classifier score per
    document — the model-based quality gate (fastText/CCNet-style) that
    complements the heuristic quality_score.

    Token bucket = shared 60-bit md5 hash mod n_buckets; raw_score is the
    INTEGER sum of frozen per-bucket weights over all tokens (tf
    weighting; integer addition commutes, so the score is partitioning-
    invariant with no fold-order pinning needed).  cls_score normalizes
    by 8*n_tokens in ONE final division (exactly rounded, bit-identical
    across engines).  keep = raw_score >= 0.

    100 TB: pure per-row Catalyst (aggregate over the token array with an
    element_at into a 256-int literal array — one server-parsed expr
    string, no py4j literal loop, no shuffle, no Python)."""
    w = classifier_weights(n_buckets, seed)
    arr = f"array({','.join(str(x) for x in w)})"
    toks = _QC_TOKENS.format(c=text_col)
    raw = (
        f"coalesce(aggregate({toks}, CAST(0 AS BIGINT), (acc, t) -> acc + "
        f"element_at({arr}, CAST(({_QC_HASH} % {n_buckets}) AS INT) + 1)), "
        f"CAST(0 AS BIGINT))"
    )
    ntok = f"CAST(size({toks}) AS BIGINT)"
    return _spread(df, id_col).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(ntok).alias("n_tokens"),
        F.expr(raw).alias("raw_score"),
        F.expr(
            f"CAST(({raw}) AS DOUBLE) / "
            f"CAST(8 * greatest({ntok}, 1) AS DOUBLE)"
        ).alias("cls_score"),
        F.expr(f"({raw}) >= 0").alias("keep"),
    )


def quality_classifier_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_buckets: int = QC_BUCKETS,
    seed: str = "qw",
) -> str:
    w = classifier_weights(n_buckets, seed)
    lst = f"[{','.join(str(x) for x in w)}]"
    toks = T.tokens_sql(text_col)
    h = T.phash_sql("t")
    raw = (
        f"coalesce(list_aggregate(list_transform({toks}, "
        f"t -> ({lst})[CAST(({h} % {n_buckets}) AS INT) + 1]), 'sum'), 0)"
    )
    ntok = f"CAST(len({toks}) AS BIGINT)"
    return f"""
    SELECT CAST({id_col} AS BIGINT) AS doc_id,
           {ntok} AS n_tokens,
           CAST({raw} AS BIGINT) AS raw_score,
           CAST({raw} AS DOUBLE) / CAST(8 * greatest({ntok}, 1) AS DOUBLE)
             AS cls_score,
           ({raw}) >= 0 AS keep
    FROM {table}
    """


# ---------------------------------------------------------------------------
# data-mixture sampling / epoch upsampling (DoReMi-style source reweighting)
# ---------------------------------------------------------------------------

_MIX_DENOM = 4096


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """-> (doc_id, source, epoch int), one output row per training COPY of
    a document under per-source mixture rates (epochs).  rate 2.5 emits 2
    guaranteed copies plus a third for a deterministic 50% of ids; rate
    0.25 keeps 25% of docs; rate 0 drops the source.

    The fractional part is resolved by the shared 60-bit hash of
    (salt:id) against rate*4096 — integer-only, so assignment is stable
    across runs, partitionings, engines, and corpus growth (adding docs
    never flips an existing id's copy count).

    100 TB: a per-row CASE + bounded explode — no shuffle, no state; the
    natural way to materialize a DoReMi/epoch-weighted mixture as a flat
    training corpus."""
    r4096 = {s: int(round(r * _MIX_DENOM)) for s, r in rates.items()}
    dflt = int(round(default_rate * _MIX_DENOM))
    rate = None
    for s, r in sorted(r4096.items()):
        cond = F.col(source_col) == s
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(dflt) if rate is None else rate.otherwise(F.lit(dflt))
    bucket = (
        T.phash(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        % _MIX_DENOM
    )
    n_copies = (rate / F.lit(_MIX_DENOM)).cast("int") + F.when(
        bucket < rate % _MIX_DENOM, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(source_col).alias("source"),
            n_copies.alias("_n"),
        )
        .where(F.col("_n") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_e"),
        )
        .select("doc_id", "source", F.col("_e").cast("int").alias("epoch"))
    )


def mixture_sample_sql(
    table: str,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
) -> str:
    r4096 = {s: int(round(r * _MIX_DENOM)) for s, r in rates.items()}
    dflt = int(round(default_rate * _MIX_DENOM))
    cases = " ".join(
        f"WHEN {source_col} = '{s}' THEN {r}" for s, r in sorted(r4096.items())
    )
    rate = f"(CASE {cases} ELSE {dflt} END)" if cases else str(dflt)
    bucket = T.phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)") + f" % {_MIX_DENOM}"
    n = f"(CAST({rate} // {_MIX_DENOM} AS INT) + CASE WHEN ({bucket}) < {rate} % {_MIX_DENOM} THEN 1 ELSE 0 END)"
    return f"""
    SELECT doc_id, source, CAST(unnest(range(_n)) AS INT) AS epoch
    FROM (
      SELECT CAST({id_col} AS BIGINT) AS doc_id, {source_col} AS source,
             {n} AS _n
      FROM {table}
    ) WHERE _n > 0
    """


# ---------------------------------------------------------------------------
# vocabulary builder (tokenizer-training prep)
# ---------------------------------------------------------------------------


def vocabulary_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 100
) -> DataFrame:
    """-> (term, tf bigint, df bigint, rank int): the top-k corpus
    vocabulary by total term frequency (ties to the lexicographically
    smaller term — total order), with document frequency alongside — the
    aggregation a BPE/WordPiece tokenizer-training pass starts from.

    Scale shape: reuses the inverted-postings aggregate (shuffle keyed by
    near-uniform terms, partial map-side combine); the global top-k is
    TakeOrderedAndProject (per-partition partial top-k merged on the
    driver, never a full sort); the rank window runs on k rows only."""
    stats = (
        inverted_postings(df, id_col, text_col)
        .groupBy("term")
        .agg(
            F.sum("tf").cast("long").alias("tf"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
    )
    topk = stats.orderBy(F.desc("tf"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def vocabulary_topk_sql(
    table: str, id_col: str, text_col: str, k: int = 100
) -> str:
    return f"""
    SELECT term, tf, df, CAST(row_number() OVER
             (ORDER BY tf DESC, term ASC) AS INT) AS rank
    FROM (
      SELECT term, CAST(sum(tf) AS BIGINT) AS tf,
             CAST(count(*) AS BIGINT) AS df
      FROM (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
          SELECT CAST({id_col} AS BIGINT) AS doc_id,
                 unnest({T.tokens_sql(text_col)}) AS term FROM {table}
        ) GROUP BY term, doc_id
      ) GROUP BY term
    ) ORDER BY tf DESC, term ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# train/test split decontamination (leakage check across hash splits)
# ---------------------------------------------------------------------------


def split_decontamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    splits: dict[str, int],
    train: str = "train",
    test: str = "test",
    k: int = 8,
    min_hits: int = 1,
    salt: str = "split",
) -> DataFrame:
    """-> (doc_id, n_hits bigint, contaminated boolean), one row per TRAIN
    document: flags training documents that share a k-word span with any
    held-out TEST document under the deterministic hash split — the
    leakage audit run after splitting, before training.

    Split membership is the pure per-row split_column function (no join
    against a split table), so the whole operator is contamination_flags
    over two filters of one scan."""
    labeled = _spread(df, id_col).withColumn(
        "_split", split_column(id_col, splits, salt)
    )
    return contamination_flags(
        labeled.where(F.col("_split") == train), id_col, text_col,
        labeled.where(F.col("_split") == test), id_col, text_col,
        k=k, min_hits=min_hits,
    )


def split_decontamination_sql(
    table: str,
    id_col: str,
    text_col: str,
    splits: dict[str, int],
    train: str = "train",
    test: str = "test",
    k: int = 8,
    min_hits: int = 1,
    salt: str = "split",
) -> str:
    case = split_case_sql(id_col, splits, salt)
    return contamination_flags_sql(
        table, id_col, text_col,
        bench_filter=f"({case}) = '{test}'",
        k=k, min_hits=min_hits,
        corpus_filter=f"({case}) = '{train}'",
    )

# ---------------------------------------------------------------------------
# boilerplate / repeated-paragraph strip (CCNet-style paragraph dedup)
# ---------------------------------------------------------------------------

BP_CHUNK_K = 8   # words per non-overlapping chunk ("paragraph" proxy)
BP_MIN_DOCS = 2  # chunk duplicated iff seen in >= this many distinct docs


def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = BP_CHUNK_K,
    min_docs: int = BP_MIN_DOCS,
) -> DataFrame:
    """-> (doc_id, n_chunks bigint, dup_chunks bigint, dup_frac double,
    clean_text string): the removal TRANSFORMATION on top of span
    detection — CCNet-style paragraph dedup (Wenzek et al. 2020 dedup
    normalized paragraphs corpus-wide; the fixture text has no newlines,
    so the paragraph proxy is non-overlapping k-word chunks of the
    normalized token stream). A chunk is boilerplate iff its content hash
    occurs in >= `min_docs` DISTINCT documents; `clean_text` is the
    surviving chunks re-joined in document order (normalized tokens — the
    contract is normalized-text output, like CCNet's dedup unit).

    Scale shape: tokenize/chunk/hash runs once per document behind the
    unique-key aggregate barrier (duplicated_span_stats pattern); the
    exploded (chunk, doc) table is localCheckpoint'ed because it is
    consumed twice (document-frequency aggregate + flag join). Shuffles
    key on the 60-bit chunk hash (near-uniform) and on doc_id for the
    reassembly; the reassembly list is bounded by document length.
    Determinism: collect_list order is partition-dependent, so chunks are
    collected as (idx, chunk) structs and array_sort'ed (idx is unique
    per document) before joining."""
    chunks_expr = F.expr(
        f"transform(sequence(1, greatest((size(_t) + {k - 1}) div {k}, 1)), "
        f"i -> array_join(slice(_t, (i - 1) * {k} + 1, {k}), ' '))"
    )
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            T.tokens(F.col(text_col)).alias("_t"),
        )
        .groupBy("doc_id")
        .agg(F.first("_t").alias("_t"))
        .select("doc_id", chunks_expr.alias("_ch"))
    )
    ex = (
        hashed.select("doc_id", F.posexplode("_ch").alias("_i0", "chunk"))
        .select(
            "doc_id",
            (F.col("_i0") + 1).cast("int").alias("idx"),
            "chunk",
            T.phash(F.col("chunk")).alias("h"),
        )
        .localCheckpoint()
    )
    dup = (
        ex.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
        .where(F.col("_ndocs") >= min_docs)
        .select("h", F.lit(1).alias("_dup"))
    )
    flagged = ex.join(dup, on="h", how="left")
    is_dup = F.col("_dup").isNotNull()
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(is_dup, 1).otherwise(0)).cast("long").alias("dup_chunks"),
        (
            F.sum(F.when(is_dup, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_frac"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~is_dup,
                            F.struct(
                                F.col("idx").alias("i"),
                                F.col("chunk").alias("c"),
                            ),
                        )
                    )
                ),
                lambda s: s["c"],
            ),
            " ",
        ).alias("clean_text"),
    )


def boilerplate_strip_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = BP_CHUNK_K,
    min_docs: int = BP_MIN_DOCS,
) -> str:
    toks = T.tokens_sql(text_col)
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest((len(_t) + {k - 1}) // {k}, 1)),
               i -> array_to_string(
                      list_slice(_t, (i - 1) * {k} + 1, (i - 1) * {k} + {k}),
                      ' ')) AS _ch
      FROM (SELECT CAST({id_col} AS BIGINT) AS doc_id, {toks} AS _t
            FROM {table})
    ),
    ex AS MATERIALIZED (
      SELECT doc_id, CAST(i AS INT) AS idx, _ch[i] AS chunk,
             {T.phash_sql('_ch[i]')} AS h
      FROM hashed, unnest(range(1, len(_ch) + 1)) AS u(i)
    ),
    dup AS (
      SELECT h FROM (SELECT DISTINCT h, doc_id FROM ex)
      GROUP BY h HAVING count(*) >= {min_docs}
    )
    SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_chunks,
           CAST(CAST(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_frac,
           coalesce(string_agg(CASE WHEN dup.h IS NULL THEN ex.chunk END,
                               ' ' ORDER BY ex.idx), '') AS clean_text
    FROM ex LEFT JOIN dup ON ex.h = dup.h
    GROUP BY ex.doc_id
    """

# ---------------------------------------------------------------------------
# longest duplicated span (gaps-and-islands over duplicated shingle runs)
# ---------------------------------------------------------------------------


def longest_dup_span(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """-> (doc_id, n_grams bigint, max_run bigint, max_dup_words bigint):
    per document, the LONGEST run of consecutive duplicated k-word shingle
    positions — the "longest duplicated substring" signal of exact-substring
    dedup (Lee et al. 2022 cut documents at long duplicated spans; the run
    length r of overlapping duplicated k-grams covers r + k - 1 words).
    A position is duplicated iff its shingle hash occurs in at least one
    OTHER document (duplicated_span_stats semantics); docs with no
    duplicated position report max_run = max_dup_words = 0.

    Plan shape: the island grouping is the classic gaps-and-islands
    rewrite — idx - row_number() over (doc, idx-order) is constant within
    a consecutive run — so the whole operator is two window-free hash
    aggregations plus ONE window partitioned by doc_id (per-partition
    work bounded by document length, never corpus-wide). The hashed
    position table is localCheckpoint'ed (consumed by the doc-frequency
    aggregate AND the island pass)."""
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.transform(
                T.word_shingles(F.col(text_col), k), lambda s: T.phash(s)
            ).alias("_gh"),
        )
        .groupBy("doc_id")
        .agg(F.first("_gh").alias("_gh"))
    )
    pos = (
        hashed.select(
            "doc_id",
            F.size("_gh").cast("long").alias("n_grams"),
            F.posexplode("_gh").alias("_i0", "gh"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("_i0") + 1).cast("long").alias("idx"),
            "gh",
        )
        .localCheckpoint()
    )
    dup_hashes = (
        pos.select("gh", "doc_id")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
        .where(F.col("_ndocs") >= 2)
        .select("gh")
    )
    dup_pos = pos.join(dup_hashes, on="gh", how="left_semi")
    w = Window.partitionBy("doc_id").orderBy(F.asc("idx"))
    runs = (
        dup_pos.withColumn("_isl", F.col("idx") - F.row_number().over(w))
        .groupBy("doc_id", "_isl")
        .agg(F.count(F.lit(1)).cast("long").alias("_run"))
        .groupBy("doc_id")
        .agg(F.max("_run").cast("long").alias("max_run"))
    )
    base = pos.select("doc_id", "n_grams").distinct()
    return base.join(runs, on="doc_id", how="left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("max_run"), F.lit(0)).cast("long").alias("max_run"),
        F.when(
            F.col("max_run").isNotNull(), F.col("max_run") + (k - 1)
        ).otherwise(F.lit(0)).cast("long").alias("max_dup_words"),
    )


def longest_dup_span_sql(
    table: str, id_col: str, text_col: str, k: int = 8
) -> str:
    grams = (
        f"list_transform({T.word_shingles_sql(text_col, k)}, "
        f"s -> {T.phash_sql('s')})"
    )
    return f"""
    WITH hashed AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS doc_id, {grams} AS _gh FROM {table}
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, CAST(len(_gh) AS BIGINT) AS n_grams,
             CAST(i AS BIGINT) AS idx, _gh[i] AS gh
      FROM hashed, unnest(range(1, len(_gh) + 1)) AS u(i)
    ),
    duph AS (
      SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM pos)
      GROUP BY gh HAVING count(*) >= 2
    ),
    islands AS (
      SELECT doc_id,
             idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
               AS _isl
      FROM pos WHERE gh IN (SELECT gh FROM duph)
    ),
    runs AS (
      SELECT doc_id, CAST(max(_run) AS BIGINT) AS max_run FROM (
        SELECT doc_id, _isl, count(*) AS _run
        FROM islands GROUP BY doc_id, _isl
      ) GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_grams,
           CAST(coalesce(r.max_run, 0) AS BIGINT) AS max_run,
           CAST(CASE WHEN r.max_run IS NOT NULL THEN r.max_run + {k - 1}
                     ELSE 0 END AS BIGINT) AS max_dup_words
    FROM (SELECT DISTINCT doc_id, n_grams FROM pos) b
    LEFT JOIN runs r ON b.doc_id = r.doc_id
    """


# ---------------------------------------------------------------------------
# per-group language profile (Simpson concentration — log-free diversity)
# ---------------------------------------------------------------------------


def group_language_profile(
    df: DataFrame, group_col: str, lang_col: str
) -> DataFrame:
    """-> (grp, n_docs bigint, n_langs bigint, top_lang string,
    top_lang_docs bigint, simpson double): per-group language mix — the
    crawl-curation signal for "is this host monolingual or a content
    farm". `simpson` is the Simpson concentration index
    sum_l (n_l / n)^2, computed as ONE exact-integer division
    (sum of squared counts over n^2) so it is bit-portable — the log-free
    stand-in for entropy (repo invariant bans exp/log in oracle columns).
    Ties on top_lang break lexicographically (total order).

    Scale shape: one (grp, lang) hash aggregate (map-side combined), then
    per-group folds over the tiny (grp, lang) table — the corpus is
    touched once."""
    by_lang = (
        df.select(F.col(group_col).alias("grp"), F.col(lang_col).alias("_l"))
        .groupBy("grp", "_l")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("_c"), F.asc("_l"))
    top = (
        by_lang.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "grp",
            F.col("_l").alias("top_lang"),
            F.col("_c").alias("top_lang_docs"),
        )
    )
    agg = by_lang.groupBy("grp").agg(
        F.sum("_c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_sumsq"),
    )
    return agg.join(top, on="grp").select(
        "grp",
        "n_docs",
        "n_langs",
        "top_lang",
        "top_lang_docs",
        (
            F.col("_sumsq").cast("double")
            / (F.col("n_docs") * F.col("n_docs")).cast("double")
        ).alias("simpson"),
    )


def group_language_profile_sql(
    table_expr: str, group_col: str, lang_col: str
) -> str:
    return f"""
    WITH by_lang AS (
      SELECT {group_col} AS grp, {lang_col} AS _l,
             CAST(count(*) AS BIGINT) AS _c
      FROM {table_expr} GROUP BY 1, 2
    ),
    top AS (
      SELECT grp, _l AS top_lang, _c AS top_lang_docs FROM (
        SELECT grp, _l, _c,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY _c DESC, _l ASC) AS _rn
        FROM by_lang
      ) WHERE _rn = 1
    ),
    agg AS (
      SELECT grp, CAST(sum(_c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(_c * _c) AS BIGINT) AS _sumsq
      FROM by_lang GROUP BY grp
    )
    SELECT agg.grp, n_docs, n_langs, top_lang, top_lang_docs,
           CAST(_sumsq AS DOUBLE)
             / CAST(n_docs * n_docs AS DOUBLE) AS simpson
    FROM agg JOIN top ON agg.grp = top.grp
    """

# ---------------------------------------------------------------------------
# per-source token-budget selection (quality-ranked prefix under budget)
# ---------------------------------------------------------------------------


def token_budget_select(
    scored: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    score_col: str = "raw_score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """scored(doc_id, source, raw_score, n_tokens, ...) -> the selected
    rows (doc_id, source, raw_score, n_tokens, sel_rank int, cum_tokens
    bigint): per source, documents ranked by quality (score desc, id asc
    — total order) and kept while the RUNNING token total stays within
    `budget_tokens` — the "best data first, cut at the compute budget"
    curriculum-selection step (the data-constrained-scaling recipe:
    rank by a quality model, take the top slice that fits the token
    budget). Take-while semantics: selection is the maximal quality-
    ranked PREFIX whose cumulative tokens <= budget (a later smaller doc
    does NOT backfill — keeps the rule window-expressible and the output
    a deterministic function of the ranking).

    Scale shape: ONE window per source (rank + running sum share the
    same (source, score desc, id) sort — Catalyst evaluates both in a
    single Window node); per-partition work is bounded by docs-per-source.
    The budget filter cannot use WindowGroupLimit (the cut depends on the
    running SUM, not a row count), so the per-source sort is the honest
    cost — at 100 TB, sources are the natural partition unit and the sort
    is per-source, never global."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.desc(score_col), F.asc(id_col))
    )
    return (
        scored.select(
            id_col, source_col, score_col, tokens_col,
            F.row_number().over(w).cast("int").alias("sel_rank"),
            F.sum(tokens_col)
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_tokens"),
        )
        .where(F.col("cum_tokens") <= budget_tokens)
    )


def token_budget_select_sql(
    scored_expr: str,
    budget_tokens: int,
    source_col: str = "source",
    score_col: str = "raw_score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> str:
    order = f"{score_col} DESC, {id_col} ASC"
    return f"""
    SELECT {id_col}, {source_col}, {score_col}, {tokens_col},
           sel_rank, cum_tokens
    FROM (
      SELECT {id_col}, {source_col}, {score_col}, {tokens_col},
             CAST(row_number() OVER (PARTITION BY {source_col}
                                     ORDER BY {order}) AS INT) AS sel_rank,
             CAST(sum({tokens_col}) OVER (
                    PARTITION BY {source_col} ORDER BY {order}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
      FROM {scored_expr}
    ) WHERE cum_tokens <= {budget_tokens}
    """


# ---------------------------------------------------------------------------
# Exact group quantiles (corpus profiling)
# ---------------------------------------------------------------------------

QUANTILES = (25, 50, 75, 90, 99)


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple = QUANTILES,
) -> DataFrame:
    """-> one row per group: (group..., n, vmin, vmax, q<p> for each p):
    EXACT rank-based percentiles of an integer column — the corpus-
    telemetry profile (length/token-count distributions per language or
    source) that drives curation thresholds. Quantile definition:
    q_p = value at rank ceil(n * p / 100) (1-indexed, values ascending) —
    the value at a rank is deterministic even under duplicate values
    (ties carry equal values), so outputs are bit-strict integers.

    Cross-engine trap this avoids: Spark's approx_percentile and DuckDB's
    quantile use different sketches/interpolation and can never be
    value-compared; rank selection is the only portable exact form.
    NULL values are dropped before ranking IN BOTH EMITTERS (n counts
    non-null values only) — Spark windows sort NULLS FIRST while DuckDB's
    row_number defaults NULLS LAST, so any NULL admitted to the rank
    would silently shift every quantile across engines.

    Scale shape: one window sort per group (rank needs a total order —
    the inherent cost of EXACT quantiles; groups here are coarse lang/
    source buckets, so each sort is a per-group parallel range sort) plus
    a map-side-combined group aggregate. For sketch-budget profiling at
    extreme scale use span_cardinality_sketches/countmin instead; this op
    is the exact calibration pass."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(F.col("_v").asc())
    vals = df.select(
        *group_cols, F.col(value_col).cast("long").alias("_v")
    ).where(F.col("_v").isNotNull())
    sized = vals.withColumn("_rn", F.row_number().over(w))
    counts = (
        vals.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    j = sized.join(counts, on=list(group_cols))
    aggs = [
        F.max("n").cast("long").alias("n"),
        F.min("_v").cast("long").alias("vmin"),
        F.max("_v").cast("long").alias("vmax"),
    ]
    for p in qs:
        aggs.append(
            F.max(
                F.when(
                    F.col("_rn") == F.expr(f"(n * {p} + 99) div 100"),
                    F.col("_v"),
                )
            ).cast("long").alias(f"q{p}")
        )
    return j.groupBy(*group_cols).agg(*aggs)


def exact_group_quantiles_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    qs: tuple = QUANTILES,
) -> str:
    """Twin of exact_group_quantiles (same rank rule, integer ceil)."""
    gc = ", ".join(group_cols)
    qsel = ",\n           ".join(
        f"CAST(max(CASE WHEN _rn = (n * {p} + 99) // 100 THEN _v END) "
        f"AS BIGINT) AS q{p}"
        for p in qs
    )
    return f"""
    WITH vals AS (
      SELECT {gc}, CAST({value_col} AS BIGINT) AS _v
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    sized AS (
      SELECT {gc}, _v,
             row_number() OVER (PARTITION BY {gc} ORDER BY _v ASC) AS _rn
      FROM vals
    ),
    counts AS (
      SELECT {gc}, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY {gc}
    )
    SELECT {gc},
           CAST(max(n) AS BIGINT) AS n,
           CAST(min(_v) AS BIGINT) AS vmin,
           CAST(max(_v) AS BIGINT) AS vmax,
           {qsel}
    FROM sized JOIN counts USING ({gc})
    GROUP BY {gc}
    """


# ---------------------------------------------------------------------------
# exact-substring dedup REWRITE (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — the removal half; duplicated_span_
# stats above is the measurement half)
# ---------------------------------------------------------------------------

# combined (doc_id, start) order key: start < 2^20 tokens per document
# (a 1M-token doc would need re-sharding long before this bound matters)
_CKEY_SHIFT = 1 << 20


def span_rewrite(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """-> (doc_id, n_tokens, n_removed, new_text): every k-word span whose
    content hash occurs >= 2 times in the corpus (within-doc repeats count,
    per Lee et al.'s any-second-occurrence rule) is removed from all
    occurrences EXCEPT the global first (min (doc_id, start) — total
    order); `new_text` is the surviving token stream joined by single
    spaces. The rewrite operates on the tokenized stream (same lowercase/
    punct-split normalization the span hashes use), so `new_text` of an
    untouched document is its normalized token join, not the raw bytes.

    When duplicated spans overlap, the union of their removal windows is
    cut — so a canonical occurrence can still lose tokens to a DIFFERENT
    overlapping duplicated span (documented one-pass behavior; an exact
    all-but-first guarantee would need sequential suffix-array passes).

    Scale shape: tokenize/shingle/md5 runs ONCE per document behind a
    unique-key aggregate barrier and is localCheckpoint'ed (three
    consumers: span occurrences, token rows, final row base); the span
    aggregate is map-side combinable on the 60-bit hash; removal fan-out
    is bounded by k tokens per duplicated occurrence; no document ever
    joins another document — the corpus is never self-joined."""
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            T.tokens(F.col(text_col)).alias("_toks"),
            F.transform(
                T.word_shingles(F.col(text_col), k), lambda s: T.phash(s)
            ).alias("_gh"),
        )
        .groupBy("doc_id")
        .agg(F.first("_toks").alias("_toks"), F.first("_gh").alias("_gh"))
        .localCheckpoint()
    )
    occ = hashed.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.posexplode("_gh").alias("_p0", "gh"),
    ).select(
        "doc_id", "n_tokens", "gh",
        (F.col("_p0") + 1).cast("long").alias("start"),
    )
    ckey = F.col("doc_id") * _CKEY_SHIFT + F.col("start")
    grams = occ.groupBy("gh").agg(
        F.count(F.lit(1)).alias("_cnt"), F.min(ckey).alias("_ck")
    )
    removed = (
        occ.join(grams, on="gh")
        .where(
            (F.col("_cnt") >= 2)
            & (ckey != F.col("_ck"))
            & (F.col("n_tokens") >= F.col("start"))
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("start"),
                    F.least(F.col("start") + (k - 1), F.col("n_tokens")),
                )
            ).alias("pos"),
        )
        .distinct()
    )
    tok_rows = hashed.select(
        "doc_id", F.posexplode("_toks").alias("_p0", "tok")
    ).select("doc_id", (F.col("_p0") + 1).cast("long").alias("pos"), "tok")
    rebuilt = (
        tok_rows.join(removed, on=["doc_id", "pos"], how="left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("new_text"),
        )
    )
    return (
        hashed.select(
            "doc_id", F.size("_toks").cast("long").alias("n_tokens")
        )
        .join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("new_text"), F.lit("")).alias("new_text"),
        )
    )


def span_rewrite_sql(
    table: str, id_col: str, text_col: str, k: int = 8
) -> str:
    """Twin of span_rewrite (same hash, order key, and union-of-windows
    removal rule; string_agg ORDER BY pos = the sorted-struct join)."""
    grams = (
        f"list_transform({T.word_shingles_sql(text_col, k)}, "
        f"s -> {T.phash_sql('s')})"
    )
    return f"""
    WITH srh AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS doc_id,
             {T.tokens_sql(text_col)} AS _toks, {grams} AS _gh
      FROM {table}
    ),
    socc AS MATERIALIZED (
      SELECT doc_id, CAST(len(_toks) AS BIGINT) AS n_tokens,
             CAST(_gh[i] AS BIGINT) AS gh, CAST(i AS BIGINT) AS start
      FROM srh, unnest(range(1, len(_gh) + 1)) AS u(i)
    ),
    sgr AS (
      SELECT gh, count(*) AS _cnt,
             min(doc_id * {_CKEY_SHIFT} + start) AS _ck
      FROM socc GROUP BY gh
    ),
    srem AS (
      SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
      FROM (
        SELECT o.doc_id, o.start, o.n_tokens
        FROM socc o JOIN sgr g USING (gh)
        WHERE g._cnt >= 2
          AND o.doc_id * {_CKEY_SHIFT} + o.start != g._ck
          AND o.n_tokens >= o.start
      ), unnest(range(start, least(start + {k - 1}, n_tokens) + 1)) AS u(p)
    ),
    strow AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, _toks[i] AS tok
      FROM srh, unnest(range(1, len(_toks) + 1)) AS u(i)
    ),
    srebuilt AS (
      SELECT doc_id, count(*) AS _n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS new_text
      FROM strow ANTI JOIN srem USING (doc_id, pos)
      GROUP BY doc_id
    )
    SELECT h.doc_id, CAST(len(h._toks) AS BIGINT) AS n_tokens,
           CAST(len(h._toks) - coalesce(r._n_kept, 0) AS BIGINT)
             AS n_removed,
           coalesce(r.new_text, '') AS new_text
    FROM srh h LEFT JOIN srebuilt r USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Frozen character-n-gram LM scoring (CCNet-style perplexity-proxy filter)
# ---------------------------------------------------------------------------


def train_ngram_lm(
    df: DataFrame,
    text_col: str,
    top_n: int = 256,
    scale: int = 100,
) -> dict:
    """Train the frozen char-trigram LM the quality filter scores with —
    the CCNet recipe (Wenzek et al. 2020: language-model perplexity as a
    web-corpus quality signal), reduced to a character n-gram table so
    scoring needs no external LM and stays engine-portable.

    Counts every char trigram in the corpus (one explode + count — the
    same distributed shape as vocabulary_topk), keeps the top_n by
    (count DESC, trigram ASC), and quantizes each log-probability to an
    integer: score(t) = floor(scale * ln(count_t / total) + 0.5). Unseen
    trigrams get backoff = min(score) - scale (one decade below the
    rarest kept entry). INTEGER scores are the point: document totals
    become plain BIGINT sums — partitioning-order independent and
    bit-strict across engines (the repo's integer-state rule; ln runs at
    TRAIN time only, never in oracle-checked columns).

    Only trigrams over the safe charset [a-z0-9 ] are kept, so the frozen
    table embeds in both engines' SQL literals without escaping
    divergence. Frozen to plans/ngram_lm.json by
    scripts/freeze_ngram_lm.py (the freeze-don't-train-at-query-time
    rule)."""
    import math
    import re

    tri = df.select(
        F.explode(
            F.expr(
                f"CASE WHEN length({text_col}) < 3 THEN array() "
                f"ELSE transform(sequence(1, length({text_col}) - 2), "
                f"i -> substring({text_col}, i, 3)) END"
            )
        ).alias("t")
    )
    counts = (
        tri.groupBy("t").count()
        .orderBy(F.desc("count"), F.asc("t"))
        .limit(top_n * 2)  # headroom for charset-filtered entries
        .collect()
    )
    total = tri.count()
    safe = re.compile(r"^[a-z0-9 ]{3}$")
    scores: dict[str, int] = {}
    for r in counts:
        if len(scores) >= top_n:
            break
        if safe.match(r["t"]):
            scores[r["t"]] = int(
                math.floor(scale * math.log(r["count"] / total) + 0.5)
            )
    if not scores:
        raise ValueError(
            "train_ngram_lm: no trigrams over the safe charset [a-z0-9 ] "
            "survived filtering — the corpus cannot fit this model "
            "(non-ASCII or too-short texts); supply a charset-compatible "
            "corpus or widen top_n"
        )
    backoff = min(scores.values()) - scale
    return {"n": 3, "scale": scale, "backoff": backoff, "scores": scores}


def ngram_lm_kernel(model: dict):
    """Arrow-batched scorer twin of the expression form — a dict lookup
    per trigram (exact integer sums, so parity with the map-literal /
    CASE forms is trivial). The hot path: the 256-entry map literal
    inside an aggregate lambda runs as an interpreted HigherOrderFunction
    per trigram on the JVM, while the kernel scans a batch of documents
    in one Python pass over a hash map."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    scores = dict(model["scores"])
    backoff = int(model["backoff"])

    @pandas_udf("struct<n_tri: bigint, lm_score: bigint>")
    def _score(texts):
        ns, tots = [], []
        for t in texts:
            t = t or ""
            n = max(len(t) - 2, 0)
            acc = 0
            for i in range(n):
                acc += scores.get(t[i : i + 3], backoff)
            ns.append(n)
            tots.append(acc)
        return pd.DataFrame({"n_tri": ns, "lm_score": tots})

    return _score


def ngram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict,
    impl: str = "arrow",
) -> DataFrame:
    """-> (doc_id, n_tri, lm_score, avg_score): per-document frozen-LM
    quality signal — lm_score = sum of quantized trigram log-probs
    (BIGINT, exact), n_tri = trigram count, avg_score = lm_score/n_tri as
    one double division (the per-trigram log-prob, the CCNet
    perplexity-proxy; higher = more in-distribution text; NULL when the
    text is shorter than a trigram). Map-side only — no shuffle, no join:
    the model rides in the plan (kernel closure or map literal), which is
    what makes this a single-scan filter at 100 TB.

    impl: "arrow" (default) = ngram_lm_kernel batch scorer; "expr" = the
    pure-Catalyst twin (map-literal lookup inside an aggregate lambda) —
    identical integers by construction, asserted in test_corpus."""
    if impl == "arrow":
        kern = ngram_lm_kernel(model)
        scored = df.select(
            F.col(id_col).alias("doc_id"), kern(F.col(text_col)).alias("_s")
        ).select("doc_id", "_s.n_tri", "_s.lm_score")
    else:
        entries = ", ".join(
            f"'{t}', {s}L" for t, s in sorted(model["scores"].items())
        )
        backoff = int(model["backoff"])
        tri = (
            f"CASE WHEN length({text_col}) < 3 THEN array() "
            f"ELSE transform(sequence(1, length({text_col}) - 2), "
            f"i -> substring({text_col}, i, 3)) END"
        )
        scored = df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"CAST(greatest(length({text_col}) - 2, 0) AS BIGINT)"
            ).alias("n_tri"),
            F.expr(
                f"aggregate({tri}, CAST(0 AS BIGINT), (acc, t) -> "
                f"acc + coalesce(element_at(map({entries}), t), {backoff}L))"
            ).alias("lm_score"),
        )
    return scored.select(
        "doc_id",
        "n_tri",
        "lm_score",
        F.when(
            F.col("n_tri") > 0,
            F.col("lm_score").cast("double") / F.col("n_tri").cast("double"),
        ).alias("avg_score"),
    )


def ngram_lm_scores_sql(table: str, id_col: str, text_col: str, model: dict) -> str:
    """DuckDB twin: trigrams unnested and LEFT-JOINed against the frozen
    table as a VALUES relation (a 256-branch simple-CASE per trigram was
    measured 6x slower at sf0.1 — the SQL mirror of the hash-once
    lesson). INTEGER scores make the group-sum partitioning/order
    independent, so the join form is value-identical to a sequential
    lookup; avg_score stays the one double division."""
    vals = ", ".join(
        f"('{t}', {s})" for t, s in sorted(model["scores"].items())
    )
    backoff = int(model["backoff"])
    return f"""
    WITH st(t, s) AS (VALUES {vals}),
    base AS (SELECT {id_col} AS doc_id, {text_col} AS _txt FROM {table}),
    tri AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(_txt) - 2, 0) + 1),
                                   i -> substring(_txt, i, 3))) AS t
      FROM base
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
             CAST(sum(coalesce(st.s, {backoff})) AS BIGINT) AS lm_score
      FROM tri LEFT JOIN st USING (t)
      GROUP BY doc_id
    )
    SELECT b.doc_id, coalesce(a.n_tri, 0) AS n_tri,
           coalesce(a.lm_score, 0) AS lm_score,
           CASE WHEN coalesce(a.n_tri, 0) > 0
                THEN CAST(a.lm_score AS DOUBLE) / CAST(a.n_tri AS DOUBLE)
           END AS avg_score
    FROM base b LEFT JOIN agg a USING (doc_id)
    """


# ---------------------------------------------------------------------------
# BPE merge training (distributed tokenizer-training pass)
# ---------------------------------------------------------------------------

BPE_ROUNDS = 8


def _bpe_seed_vocab(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (tok, cnt, seg): the weighted type vocabulary with each token's
    initial character segmentation. seg uses the DOUBLE-SPACE encoding:
    symbols separated by two spaces, two-space padding at both ends, so a
    merge is ONE plain (non-regex) replace of ' l  r ' with ' lr ' — the
    single outer spaces consume one of each boundary pair, which makes
    back-to-back occurrences ('a b a b' with merge a+b) NON-overlapping
    for a leftmost-scan replace. Plain replace is the only string-rewrite
    primitive with identical semantics in Spark and DuckDB (RE2 has no
    lookarounds, so the classic '(?<!\\S)l r(?!\\S)' regex is not
    portable)."""
    toks = df.select(F.explode(T.tokens(F.col(text_col))).alias("tok"))
    return toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt")).select(
        "tok",
        "cnt",
        F.concat(
            F.lit("  "), F.expr("regexp_replace(tok, '(.)', '$1  ')")
        ).alias("seg"),
    )


def bpe_train(
    df: DataFrame, id_col: str, text_col: str, rounds: int = BPE_ROUNDS
) -> DataFrame:
    """-> (rank, left_sym, right_sym, merged, pair_count): the first
    `rounds` byte-pair-encoding merges learned from the corpus (Sennrich,
    Haddow & Birch 2016) — the tokenizer-training pass of a training-data
    pipeline, run where the data lives instead of on a sampled shard.

    Each round: adjacent-symbol pairs of every vocabulary type are counted
    weighted by type frequency (integer sums — order-independent); the
    argmax pair (count DESC, left ASC, right ASC — a total order, unlike
    the hash-ordered dict of the reference implementation) becomes the
    round's merge and is applied to every segmentation with the
    double-space replace (_bpe_seed_vocab). Stops early if no pair is
    left.

    Scale shape: the corpus is touched ONCE (tokenize + type count — the
    vocabulary_topk shuffle); every round then runs on the |types| table
    only, which is what makes BPE trainable at 100 TB (types grow
    sublinearly in corpus size). Per round: one map-side pair explode +
    combined count, one 1-row TakeOrdered argmax to the driver (the
    train_centroids_distributed precedent — merge literals are the
    training artifact), one map-side replace; the vocab is checkpointed
    per round so lineage stays flat."""
    vocab = _bpe_seed_vocab(df, id_col, text_col).localCheckpoint()
    merges: list[tuple] = []
    for rnd in range(1, rounds + 1):
        pairs = (
            vocab.select("cnt", F.expr("split(trim(seg), '  ')").alias("arr"))
            .select(
                "cnt",
                # sequence(1, 0) DESCENDS in Spark — guard short arrays
                F.expr(
                    "explode(CASE WHEN size(arr) < 2 THEN "
                    "CAST(array() AS array<struct<l: string, r: string>>) "
                    "ELSE transform(sequence(1, size(arr) - 1), "
                    "i -> struct(element_at(arr, i) AS l, "
                    "element_at(arr, i + 1) AS r)) END)"
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").cast("long").alias("c"))
        )
        top = pairs.orderBy(
            F.desc("c"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        merges.append((rnd, l, r, l + r, c))
        vocab = vocab.select(
            "tok",
            "cnt",
            F.expr(
                "replace(seg, ' ' || {l} || '  ' || {r} || ' ', "
                "' ' || {l} || {r} || ' ')".format(
                    l=f"'{l}'", r=f"'{r}'"
                )
            ).alias("seg"),
        ).localCheckpoint()
    spark = df.sparkSession
    return spark.createDataFrame(
        merges,
        "rank: int, left_sym: string, right_sym: string, "
        "merged: string, pair_count: long",
    )


def bpe_train_sql(
    table: str, id_col: str, text_col: str, rounds: int = BPE_ROUNDS
) -> str:
    """Chained-CTE DuckDB twin: v0 -> p1 -> m1 -> v1 -> ... with the same
    double-space replace; merge scalars flow via scalar subqueries
    (coalesced to a control char so an exhausted round leaves seg
    unchanged instead of NULLing it)."""
    ctes = [
        f"""v0 AS MATERIALIZED (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
                 '  ' || regexp_replace(tok, '(.)', '\\1  ', 'g') AS seg
          FROM (SELECT unnest({T.tokens_sql(text_col)}) AS tok FROM {table})
          GROUP BY tok)"""
    ]
    for it in range(1, rounds + 1):
        prev = f"v{it - 1}"
        ctes.append(f"""p{it} AS (
          SELECT arr[i] AS l, arr[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS c
          FROM (SELECT cnt, str_split(trim(seg), '  ') AS arr FROM {prev}),
               unnest(range(1, greatest(len(arr), 1))) AS u(i)
          GROUP BY arr[i], arr[i + 1])""")
        ctes.append(f"""m{it} AS MATERIALIZED (
          SELECT l, r, c FROM p{it} ORDER BY c DESC, l ASC, r ASC LIMIT 1)""")
        ctes.append(f"""v{it} AS MATERIALIZED (
          SELECT tok, cnt,
                 replace(seg,
                         coalesce((SELECT ' ' || l || '  ' || r || ' ' FROM m{it}), chr(1)),
                         coalesce((SELECT ' ' || l || r || ' ' FROM m{it}), chr(1))) AS seg
          FROM {prev})""")
    body = ",\n    ".join(ctes)
    sel = "\n    UNION ALL ".join(
        f"SELECT {it} AS rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, c AS pair_count FROM m{it}"
        for it in range(1, rounds + 1)
    )
    return f"""WITH {body}
    SELECT CAST(rank AS INT) AS rank, left_sym, right_sym, merged, pair_count
    FROM ({sel}) ORDER BY rank
    """


def _bpe_apply_chain(sym_expr: str, merges: list[list[str]], engine: str) -> str:
    """Nested-replace chain applying the frozen merge list in rank order
    to a double-space segmentation expression — identical plain-replace
    semantics in both engines (see _bpe_seed_vocab)."""
    out = sym_expr
    for l, r in merges:
        out = f"replace({out}, ' {l}  {r} ', ' {l}{r} ')"
    return out


def bpe_segment_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[list[str]],
) -> DataFrame:
    """-> (doc_id, n_tokens, n_symbols, n_chars): per-document subword
    budget under the FROZEN learned BPE vocabulary — n_symbols is what
    the document costs a tokenizer trained by bpe_train (the
    tokens-per-document signal curriculum/budget operators consume;
    n_symbols/n_chars is the compression-ratio quality heuristic).

    Map-side single scan, no joins: each token is seeded to its
    character segmentation and the merge list is replayed as a chain of
    plain replaces inside one transform lambda; symbol counts are
    integer sums (order-independent, bit-strict). The merge list is a
    frozen literal (plans/bpe_merges.json) — training never runs at
    query time, mirroring the IVF/PQ/LM freeze rule."""
    from ..functions.text import TOKEN_RE

    seed = "'  ' || regexp_replace(t, '(.)', '$1  ')"
    chain = _bpe_apply_chain(seed, merges, "spark")
    toks = f"filter(split(lower({text_col}), '{TOKEN_RE}'), t -> t != '')"
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_tokens"),
        F.expr(
            f"CAST(aggregate({toks}, CAST(0 AS BIGINT), (acc, t) -> "
            f"acc + size(split(trim({chain}), '  '))) AS BIGINT)"
        ).alias("n_symbols"),
        F.expr(
            f"CAST(aggregate({toks}, CAST(0 AS BIGINT), (acc, t) -> "
            f"acc + length(t)) AS BIGINT)"
        ).alias("n_chars"),
    )


def bpe_segment_stats_sql(
    table: str, id_col: str, text_col: str, merges: list[list[str]]
) -> str:
    seed = "'  ' || regexp_replace(t, '(.)', '\\1  ', 'g')"
    chain = _bpe_apply_chain(seed, merges, "duckdb")
    toks = T.tokens_sql(text_col)
    return f"""
    SELECT {id_col} AS doc_id,
           CAST(len({toks}) AS BIGINT) AS n_tokens,
           CAST(coalesce(list_sum(list_transform({toks},
                t -> len(str_split(trim({chain}), '  ')))), 0) AS BIGINT)
             AS n_symbols,
           CAST(coalesce(list_sum(list_transform({toks},
                t -> len(t))), 0) AS BIGINT) AS n_chars
    FROM {table}
    """


# ---------------------------------------------------------------------------
# Hybrid search: reciprocal-rank fusion of lexical and semantic rankings
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_SCALE = 1_000_000


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    id_col: str,
    text_col: str,
    vec_id_col: str,
    vec_col: str,
    query_max_id: int,
    k_in: int = 20,
    k_out: int = 10,
) -> DataFrame:
    """-> (query_id, doc_id, lex_rank, sem_rank, rrf_score, rank): hybrid
    more-like-this retrieval — for each query document (id < query_max_id)
    a LEXICAL ranking (integer tf dot product over shared terms, the
    sparse-retrieval half) and a SEMANTIC ranking (exact embedding cosine,
    the dense half) are fused by reciprocal-rank fusion (Cormack, Clarke
    & Buettcher 2009): rrf = sum over rankings of RRF_SCALE // (RRF_K +
    rank). Integer floor division keeps the fused score BIGINT — the RRF
    trick is that only RANKS cross the fusion boundary, so the log-free
    lexical side and the float cosine side both reduce to oracle-safe
    integers (absent-from-one-ranking is rank 0 = no contribution, the
    standard truncated-list RRF).

    Scale shape: the lexical side is one postings self-join restricted to
    the (tiny, broadcast) query-doc postings — fan-out bounded by the
    query docs' term document frequencies (at web scale, cap query terms
    by df as in conjunctive_search_topk's map-side vocabulary filter);
    the semantic side is brute_force_topk's broadcast scan (swap in
    pq/ivf/lsh for the ANN path — only ranks flow onward, so the fusion
    is ranker-agnostic). Both rankings truncate to k_in before the fuse;
    the fuse itself joins two <= |queries| * k_in row tables."""
    from .similarity import brute_force_topk

    post = inverted_postings(docs, id_col, text_col).localCheckpoint()
    qpost = post.where(F.col("doc_id") < query_max_id).select(
        F.col("doc_id").alias("query_id"),
        "term",
        F.col("tf").alias("_tfq"),
    )
    lex_scored = (
        post.join(F.broadcast(qpost), on="term")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("tf") * F.col("_tfq")).cast("long").alias("_s"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    lex = (
        lex_scored.withColumn("lex_rank", F.row_number().over(w).cast("int"))
        .where(F.col("lex_rank") <= k_in)
        .select("query_id", "doc_id", "lex_rank")
    )
    sem = (
        brute_force_topk(
            emb,
            vec_id_col,
            vec_col,
            emb.where(F.col(vec_id_col) < query_max_id),
            k=k_in,
        )
        .select(
            "query_id",
            F.col("item_id").alias("doc_id"),
            F.col("rank").alias("sem_rank"),
        )
    )
    fused = (
        lex.join(sem, on=["query_id", "doc_id"], how="full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("lex_rank"), F.lit(0)).alias("lex_rank"),
            F.coalesce(F.col("sem_rank"), F.lit(0)).alias("sem_rank"),
        )
        .withColumn(
            "rrf_score",
            # DIV = integer floor division (Spark's / on longs is a
            # DOUBLE true-divide; DIV matches DuckDB's //)
            F.expr(
                f"CAST(CASE WHEN lex_rank > 0 THEN CAST({RRF_SCALE} AS BIGINT)"
                f" DIV ({RRF_K} + lex_rank) ELSE 0 END"
                f" + CASE WHEN sem_rank > 0 THEN CAST({RRF_SCALE} AS BIGINT)"
                f" DIV ({RRF_K} + sem_rank) ELSE 0 END AS BIGINT)"
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("int"))
        .where(F.col("rank") <= k_out)
        .select("query_id", "doc_id", "lex_rank", "sem_rank", "rrf_score", "rank")
    )


def hybrid_rrf_topk_sql(
    table: str,
    emb_table: str,
    id_col: str,
    text_col: str,
    vec_id_col: str,
    vec_col: str,
    query_max_id: int,
    k_in: int = 20,
    k_out: int = 10,
) -> str:
    from .similarity import cosine_sql

    cos = cosine_sql("q._q", "c._v")
    return f"""
    WITH post AS MATERIALIZED (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT {id_col} AS doc_id, unnest({T.tokens_sql(text_col)}) AS term
        FROM {table}
      ) GROUP BY term, doc_id
    ),
    lex_scored AS (
      SELECT q.doc_id AS query_id, p.doc_id,
             CAST(sum(p.tf * q.tf) AS BIGINT) AS _s
      FROM post p JOIN post q ON p.term = q.term
      WHERE q.doc_id < {query_max_id} AND p.doc_id != q.doc_id
      GROUP BY q.doc_id, p.doc_id
    ),
    lex AS (
      SELECT query_id, doc_id, CAST(_r AS INT) AS lex_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY _s DESC, doc_id ASC) AS _r FROM lex_scored
      ) WHERE _r <= {k_in}
    ),
    corpus AS (SELECT {vec_id_col} AS item_id, {vec_col} AS _v FROM {emb_table}),
    qv AS (SELECT {vec_id_col} AS query_id, {vec_col} AS _q FROM {emb_table}
           WHERE {vec_id_col} < {query_max_id}),
    sem_scored AS (
      SELECT q.query_id, c.item_id AS doc_id, {cos} AS sim
      FROM corpus c CROSS JOIN qv q WHERE c.item_id != q.query_id
    ),
    sem AS (
      SELECT query_id, doc_id, CAST(_r AS INT) AS sem_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY sim DESC, doc_id ASC) AS _r FROM sem_scored
      ) WHERE _r <= {k_in}
    ),
    fused AS (
      SELECT coalesce(l.query_id, s.query_id) AS query_id,
             coalesce(l.doc_id, s.doc_id) AS doc_id,
             coalesce(l.lex_rank, 0) AS lex_rank,
             coalesce(s.sem_rank, 0) AS sem_rank,
             CAST(CASE WHEN coalesce(l.lex_rank, 0) > 0
                       THEN {RRF_SCALE} // ({RRF_K} + l.lex_rank) ELSE 0 END
                + CASE WHEN coalesce(s.sem_rank, 0) > 0
                       THEN {RRF_SCALE} // ({RRF_K} + s.sem_rank) ELSE 0 END
                  AS BIGINT) AS rrf_score
      FROM lex l FULL OUTER JOIN sem s
        ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )
    SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
      FROM fused
    ) WHERE rank <= {k_out}
    """


# ---------------------------------------------------------------------------
# Deterministic corruption channel (augmentation / matcher training pairs)
# ---------------------------------------------------------------------------

CORRUPT_PCT = 5          # per-character substitution probability (%)
CORRUPT_SALT = "aug1"


def corruption_kernel(pct: int = CORRUPT_PCT, salt: str = CORRUPT_SALT):
    """Arrow-batched twin of the corruption expression chain — identical
    bytes (hashlib md5 == both engines' md5; same mod arithmetic). The
    hot path: the expression form is a nested interpreted
    HigherOrderFunction per character (measured ~14s for 5k docs at
    sf0.1 vs ~2s here) — the CLAUDE.md lambda-cost lore, with the
    kernel as the escape hatch. Parity asserted in test_corpus."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<text_aug: string, n_edits: bigint>")
    def _aug(ids, texts):
        outs, ed = [], []
        for did, t in zip(ids, texts):
            t = t or ""
            chars = list(t)
            n = 0
            pre = f"{salt}:{did}:"
            for i, ch in enumerate(chars, start=1):
                if "a" <= ch <= "z":
                    h = int(
                        hashlib.md5(f"{pre}{i}".encode()).hexdigest()[:15], 16
                    )
                    if h % 100 < pct:
                        chars[i - 1] = chr(
                            97 + (ord(ch) - 97 + 1 + h % 25) % 26
                        )
                        n += 1
            outs.append("".join(chars))
            ed.append(n)
        return pd.DataFrame({"text_aug": outs, "n_edits": ed})

    return _aug


def corruption_augment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pct: int = CORRUPT_PCT,
    salt: str = CORRUPT_SALT,
    impl: str = "arrow",
) -> DataFrame:
    """-> (doc_id, text_aug, n_edits): a deterministic noisy copy of each
    document — every [a-z] character is substituted with probability
    pct%% by a DIFFERENT letter, both the decision and the replacement
    derived from phash(salt:doc:pos) — the reference vignette's
    record-corruption channel (vignette data = clean + corrupted
    duplicates) lifted to a reusable operator: (text, text_aug) rows are
    the self-supervised positive pairs a matcher/comparator is trained
    and calibrated on, with n_edits the known edit count the calibration
    curve is sliced by.

    Determinism: the channel is a pure function of (salt, id, position),
    so augmentation is reproducible across runs, partitionings and
    engines (phash is the one cross-engine hash). The replacement letter
    is chr('a' + (1 + h mod 25) + orig) mod 26 — never the original, so
    n_edits equals the literal character-diff count, which is how the
    operator computes it (comparing orig vs aug char positions, no
    second hash pass — the single-eval rule applied to the hash chain).
    Non-letter characters (spaces, digits) pass through untouched.

    Scale shape: map-side single scan; per character one md5; no
    shuffle, no join. impl: "arrow" (default) = corruption_kernel, the
    batch hot path; "expr" = the pure-Catalyst twin (bit-identical,
    kept as the oracle-shareable form — its nested per-char lambdas run
    interpreted, the measured HOF cost the kernel avoids)."""
    if impl == "arrow":
        kern = corruption_kernel(pct, salt)
        return df.select(
            F.col(id_col).alias("doc_id"),
            kern(F.col(id_col), F.col(text_col)).alias("_s"),
        ).select("doc_id", "_s.text_aug", "_s.n_edits")
    # the per-position hash is bound ONCE via the single-element-array
    # lambda trick (transform(array(h), h -> ...)[1]) — the portable
    # let-binding; a naive CASE would md5 every position twice
    h_expr = (
        f"CAST(conv(substring(md5(concat('{salt}', ':', "
        f"CAST({id_col} AS STRING), ':', CAST(i AS STRING))), 1, 15), 16, 10) "
        f"AS BIGINT)"
    )
    pos_marks = (
        f"transform(sequence(1, length({text_col})), i -> "
        f"element_at(transform(array({h_expr}), h -> "
        f"CASE WHEN substring({text_col}, i, 1) >= 'a' "
        f"AND substring({text_col}, i, 1) <= 'z' "
        f"AND pmod(h, 100) < {pct} "
        f"THEN chr(97 + pmod(ascii(substring({text_col}, i, 1)) - 97 + 1 + "
        f"pmod(h, 25), 26)) "
        f"ELSE substring({text_col}, i, 1) END), 1))"
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_txt"),
        F.expr(
            pos_marks.replace(text_col, "__T__").replace("__T__", text_col)
        ).alias("_chars"),
    ).localCheckpoint()  # _chars is consumed twice below (aug + diff count)
    return base.select(
        "doc_id",
        F.array_join(F.col("_chars"), "").alias("text_aug"),
        F.expr(
            "CAST(size(filter(zip_with(_chars, split(_txt, ''), "
            "(a, b) -> a != b), x -> x)) AS BIGINT)"
        ).alias("n_edits"),
    )


def corruption_augment_sql(
    table: str,
    id_col: str,
    text_col: str,
    pct: int = CORRUPT_PCT,
    salt: str = CORRUPT_SALT,
) -> str:
    h = (
        f"CAST(('0x' || substr(md5('{salt}' || ':' || "
        f"CAST({id_col} AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) "
        f"AS BIGINT)"
    )
    chars = (
        f"list_transform(range(1, length({text_col}) + 1), i -> "
        f"list_transform([{h}], h -> "
        f"CASE WHEN substring({text_col}, i, 1) >= 'a' "
        f"AND substring({text_col}, i, 1) <= 'z' "
        f"AND h %% 100 < {pct} "
        f"THEN chr(CAST(97 + (ascii(substring({text_col}, i, 1)) - 97 + 1 + "
        f"h %% 25) %% 26 AS INTEGER)) "
        f"ELSE substring({text_col}, i, 1) END)[1])"
    ).replace("%%", "%")
    return f"""
    WITH aug AS MATERIALIZED (
      SELECT {id_col} AS doc_id, {text_col} AS _txt,
             {chars} AS _chars
      FROM {table}
    )
    SELECT doc_id,
           -- list_aggr returns NULL on an empty list; Spark's array_join
           -- returns '' — coalesce so empty-text docs agree across engines
           coalesce(list_aggr(_chars, 'string_agg', ''), '') AS text_aug,
           CAST(len(list_filter(
               list_transform(range(1, len(_chars) + 1),
                              i -> _chars[i] != substring(_txt, i, 1)),
               x -> x)) AS BIGINT) AS n_edits
    FROM aug
    """


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS local document fingerprinting)
# ---------------------------------------------------------------------------

WINNOW_K = 8   # character k-gram width
WINNOW_W = 4   # winnowing window (guarantee: any match >= k+w-1 chars shares a fp)


def winnowing_kernel(k: int = WINNOW_K, w: int = WINNOW_W):
    """Arrow-batched twin of the winnowing expression chain — identical
    output (hashlib md5 == both engines' md5; numpy rolling min with the
    rightmost-tie rule). The hot path: the expression form's per-window
    interpreted lambdas measured ~15x slower; parity asserted in
    test_corpus."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<pos: long, fp: long>>")
    def _win(texts):
        out = []
        for t in texts:
            t = t or ""
            n = len(t) - k + 1
            if n < w:
                out.append([])
                continue
            gh = np.array(
                [
                    int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:15], 16)
                    for i in range(n)
                ],
                dtype=np.int64,
            )
            win = np.lib.stride_tricks.sliding_window_view(gh, w)
            # rightmost minimal: argmin of the reversed window
            right_arg = (w - 1) - np.argmin(win[:, ::-1], axis=1)
            pos = np.arange(len(win)) + right_arg + 1  # 1-based
            sel = sorted(set(int(p) for p in pos))
            out.append([{"pos": p, "fp": int(gh[p - 1])} for p in sel])
        return pd.Series(out)

    return _win


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    impl: str = "arrow",
) -> DataFrame:
    """-> (doc_id, pos, fp): winnowing fingerprints (Schleimer, Wilkerson
    & Aiken 2003 — the MOSS algorithm): per k-gram-hash window of width w
    select the RIGHTMOST minimal hash; the selected (position, hash)
    pairs are the document's local fingerprints. Guarantee: any shared
    substring of length >= k + w - 1 yields at least one shared
    fingerprint, with density ~2/(w+1) — the position-aware complement of
    MinHash (global similarity) and CDC (content-defined chunk
    boundaries): winnowing localizes WHERE documents overlap, which is
    what plagiarism/attribution queries need.

    Engine-portable selection rule: per window the minimal hash binds
    once (array-wrap let-binding), then the rightmost position with that
    hash is an integer max over the window's indices — no struct
    ordering relied on in either engine. The gram-hash array is built
    ONCE per document in its own projection (hash-once below everything,
    the repo rule).

    Scale shape: map-side per-document arrays (O(n*w) comparisons per
    doc, integer-only after the one md5 pass per gram); one explode of
    the ~n/w selected positions; no shuffle, no join. Fingerprint
    postings (fp -> docs) are then one groupBy away, the same inverted
    shape as inverted_postings. impl: "arrow" (default) =
    winnowing_kernel; "expr" = the pure-Catalyst oracle-shaped twin."""
    if impl == "arrow":
        kern = winnowing_kernel(k, w)
        return (
            df.select(
                F.col(id_col).alias("doc_id"),
                F.explode(kern(F.col(text_col))).alias("_s"),
            )
            .select("doc_id", "_s.pos", "_s.fp")
        )
    gh = (
        f"CASE WHEN length({text_col}) < {k} THEN "
        f"CAST(array() AS array<bigint>) ELSE "
        f"transform(sequence(1, length({text_col}) - {k} + 1), i -> "
        f"CAST(conv(substring(md5(substring({text_col}, i, {k})), 1, 15), "
        f"16, 10) AS BIGINT)) END"
    )
    # localCheckpoint: every window lambda references _gh — without the
    # barrier CollapseProject inlines the n-md5 gram array into each
    # element_at, turning O(n*w) into O(n^2*w) md5 per document
    g = df.select(
        F.col(id_col).alias("doc_id"), F.expr(gh).alias("_gh")
    ).localCheckpoint()
    pos_expr = (
        f"element_at(transform(array(array_min(slice(_gh, j, {w}))), h -> "
        f"array_max(filter(sequence(j, j + {w} - 1), "
        f"i -> element_at(_gh, i) = h))), 1)"
    )
    sel = g.select(
        "doc_id",
        "_gh",
        F.expr(
            f"CASE WHEN size(_gh) < {w} THEN CAST(array() AS array<int>) "
            f"ELSE array_distinct(transform(sequence(1, size(_gh) - {w} + 1), "
            f"j -> CAST({pos_expr} AS INT))) END"
        ).alias("_pos"),
    )
    return sel.select(
        "doc_id", "_gh", F.explode("_pos").alias("pos")
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.expr("element_at(_gh, pos)").cast("long").alias("fp"),
    )


def winnowing_fingerprints_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> str:
    gh = (
        f"CASE WHEN length({text_col}) < {k} THEN CAST([] AS BIGINT[]) ELSE "
        f"list_transform(range(1, length({text_col}) - {k} + 2), i -> "
        f"CAST(('0x' || substr(md5(substring({text_col}, i, {k})), 1, 15)) "
        f"AS BIGINT)) END"
    )
    pos_expr = (
        f"list_transform([list_min(_gh[j : j + {w} - 1])], h -> "
        f"list_max(list_filter(range(j, j + {w}), "
        f"i -> _gh[i] = h)))[1]"
    )
    return f"""
    WITH g AS MATERIALIZED (
      SELECT {id_col} AS doc_id, {gh} AS _gh FROM {table}
    ),
    sel AS (
      SELECT doc_id, _gh,
             CASE WHEN len(_gh) < {w} THEN CAST([] AS INT[])
                  ELSE list_distinct(list_transform(
                      range(1, len(_gh) - {w} + 2),
                      j -> CAST({pos_expr} AS INT))) END AS _pos
      FROM g
    )
    SELECT doc_id, CAST(p AS BIGINT) AS pos, CAST(_gh[p] AS BIGINT) AS fp
    FROM sel, unnest(_pos) AS u(p)
    """


WINNOW_MIN_SHARED = 2
WINNOW_MAX_BUCKET = 1000


def winnowing_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_shared: int = WINNOW_MIN_SHARED,
    max_bucket_rows: int | None = WINNOW_MAX_BUCKET,
) -> DataFrame:
    """-> (id_a, id_b, n_shared_fp): document pairs sharing >= min_shared
    winnowing fingerprints — the MOSS plagiarism join: by the winnowing
    guarantee a shared substring of length >= k + w - 1 surfaces as a
    shared fingerprint, so n_shared_fp lower-bounds textual overlap in a
    POSITION-ROBUST way (unlike dup_span_stats' aligned spans, overlap
    is found wherever it moved in either document).

    Scale shape: the self-join runs on DISTINCT per-doc fingerprint
    hashes (positions dropped before joining — a fingerprint repeated
    inside one doc must not multiply pairs); oversized fingerprint
    buckets (boilerplate grams shared by thousands of docs) are
    salt-split via blocking.salt_buckets, the LSH-family rule, and the
    fingerprint table is localCheckpoint'ed (consumed by both join
    sides). Pair counts are a map-side-combined aggregate; output is
    oriented id_a < id_b."""
    from .blocking import salt_buckets

    fps = (
        winnowing_fingerprints(df, id_col, text_col)
        .select("doc_id", "fp")
        .distinct()
    )
    fps = salt_buckets(fps, "fp", "doc_id", max_bucket_rows).localCheckpoint()
    a = fps.select(
        F.col("doc_id").alias("id_a"), "fp", "_bsalt"
    )
    b = fps.select(
        F.col("doc_id").alias("id_b"), "fp", "_bsalt"
    )
    return (
        a.join(b, on=["fp", "_bsalt"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fp"))
        .where(F.col("n_shared_fp") >= min_shared)
    )


def winnowing_overlap_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_shared: int = WINNOW_MIN_SHARED,
    max_bucket_rows: int | None = WINNOW_MAX_BUCKET,
) -> str:
    from .blocking import salt_buckets_sql

    salt = salt_buckets_sql("fp", "doc_id", max_bucket_rows)
    return f"""
    WITH fps0 AS MATERIALIZED (
      SELECT DISTINCT doc_id, fp FROM (
        {winnowing_fingerprints_sql(table, id_col, text_col)}
      )
    ),
    fps AS MATERIALIZED (
      SELECT doc_id, fp, {salt} AS _bsalt FROM fps0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared_fp
    FROM fps a JOIN fps b
      ON a.fp = b.fp AND a._bsalt = b._bsalt AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {min_shared}
    """
