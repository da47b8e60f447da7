"""Incremental entity resolution: link a crawl increment against EXISTING
clusters without re-linking the corpus.

At 10^12 documents the full blocking -> scoring -> clustering pipeline runs
once; every subsequent crawl only contributes a delta. These operators make
the delta path first-class:

  - cluster_representatives: one doc per existing cluster (min id — a
    map-side-combined aggregate, never a window over the corpus).
  - link_increment: MinHash-LSH band join of NEW docs against cluster
    representatives, exact token-Jaccard verify on candidates only, then a
    per-new-doc struct-MAX argmax assigns each new doc to its best cluster
    (or mints a deterministic singleton id). The corpus-side relation is
    |clusters| rows, not |docs| — the increment never touches old documents
    except through their representatives.
  - merge_components: fold a delta edge set into existing component labels
    by running connected components over (star edges ∪ delta edges). The
    label relation IS a star graph (node -> min-id component), so
    large-star/small-star converges in O(log |delta-diameter|) rounds — the
    old corpus contributes one edge per node and is never re-clustered from
    its raw pair graph.
  - cluster_pair_metrics: pairwise precision/recall/F1 of a predicted
    clustering against a truth clustering from the (pred, truth) label
    contingency table — sums of C(n,2) per cell/margin, so the pair
    universe is never materialized (O(n) not O(pairs); the standard
    pair-counting evaluation, e.g. Menestrina et al. 2010).

Reference analog: the reference has no incremental path (clusterings are
rebuilt per run — /root/reference/src/clustering_functions.jl); this is the
north-rule's re-crawl contract made operational. All outputs are integer /
exactly-derived, so every operator has a bit-strict DuckDB twin.

100-TB notes: the band join's corpus side is one row per cluster per band;
hot band keys on the representative side (boilerplate) are dropped above
`max_rep_key_df` — the containment_pairs stop-span pattern, a documented
recall-for-boundedness trade. The argmax is the mutual_best struct-MAX
shape: the shuffle carries |new docs| grouped rows, never sorts the
candidate pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T
from .connected_components import components_with_isolated
from .dedup import _spread

# Deterministic id space for clusters minted by an increment: offset + doc_id
# (disjoint from min-doc-id cluster labels as long as doc ids stay below it).
NEW_CLUSTER_OFFSET = 1 << 40


def cluster_representatives(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str,
    cluster_col: str,
    text_col: str,
) -> DataFrame:
    """clusters (id, cluster) + docs -> (cluster_id, rep_id, rep_text):
    representative = min doc id per cluster. One aggregate + one join on
    the unique rep id; |output| = |clusters|, not |docs|."""
    reps = (
        clusters.select(
            F.col(cluster_col).cast("long").alias("cluster_id"),
            F.col(id_col).cast("long").alias("_cid"),
        )
        .groupBy("cluster_id")
        .agg(F.min("_cid").alias("rep_id"))
    )
    d = docs.select(
        F.col(id_col).cast("long").alias("rep_id"),
        F.col(text_col).alias("rep_text"),
    )
    return reps.join(d, on="rep_id").select("cluster_id", "rep_id", "rep_text")


def _hashed_side(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int,
    extra: list[str] | None = None,
) -> DataFrame:
    """(_id, _shh, _toks [, extra…]): shingle-hash array + distinct token
    set computed ONCE per document behind a unique-key aggregate barrier,
    then localCheckpoint'ed — the relation feeds the band emitter AND the
    verify join (two consumers; repo invariant: hash once per document)."""
    extra = extra or []
    base = _spread(df, id_col).select(
        F.col(id_col).cast("long").alias("_id"),
        T.shingle_hashes(F.col(text_col), shingle_k).alias("_shh"),
        F.array_distinct(T.tokens(F.col(text_col))).alias("_toks"),
        *extra,
    )
    aggs = [F.first("_shh").alias("_shh"), F.first("_toks").alias("_toks")]
    aggs += [F.first(c).alias(c) for c in extra]
    return base.groupBy("_id").agg(*aggs).localCheckpoint()


def link_increment(
    reps: DataFrame,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard_pct: int = 50,
    n_bands: int = 8,
    rows_per_band: int = 1,
    shingle_k: int = 3,
    max_rep_key_df: int = 200,
) -> DataFrame:
    """Assign each NEW doc to an existing cluster (via its representative)
    or mint a singleton. reps: (cluster_id, rep_id, rep_text) from
    cluster_representatives. Returns one row per new doc:
    (doc_id, cluster_id, matched, best_jac_e4) — best_jac_e4 is the
    winning Jaccard in 1e-4 units (integer; -1 when unmatched).

    Plan: band keys on both sides (affine transforms of the per-doc
    shingle-hash array), equi-join new×rep on band_key with hot rep-side
    keys dropped above max_rep_key_df (bounds per-new-row fanout), distinct
    candidate pairs, exact token-Jaccard verify on candidates only, then
    a struct-MAX argmax per new doc (ties: higher Jaccard, then smaller
    cluster_id — total order)."""
    rep_h = _hashed_side(
        reps.select(F.col("rep_id").alias("rid"), "cluster_id", "rep_text"),
        "rid", "rep_text", shingle_k, extra=["cluster_id"],
    )
    new_h = _hashed_side(new_docs, id_col, text_col, shingle_k)

    def bands(h: DataFrame, keep: list[str]) -> DataFrame:
        return h.select(
            *keep,
            F.explode(
                F.array(*[
                    T.band_key_from_hashes(F.col("_shh"), b, rows_per_band)
                    for b in range(n_bands)
                ])
            ).alias("band_key"),
        )

    rep_b = bands(rep_h, ["_id", "cluster_id"]).withColumnRenamed("_id", "_rid")
    new_b = bands(new_h, ["_id"])
    # stop-key cap: drop band keys that are boilerplate on the REP side —
    # per-new-row join fanout is then bounded by max_rep_key_df. The count
    # relation is |distinct band keys| rows; AQE broadcasts it.
    kept = (
        rep_b.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("_kdf"))
        .where(F.col("_kdf") <= max_rep_key_df)
        .select("band_key")
    )
    cand = (
        new_b.join(kept, on="band_key")
        .join(rep_b, on="band_key")
        .select(F.col("_id").alias("new_id"), "_rid", "cluster_id")
        .distinct()
    )
    i = F.size(F.array_intersect(F.col("toks_n"), F.col("toks_r")))
    u = F.size(F.col("toks_n")) + F.size(F.col("toks_r")) - i
    scored = (
        cand.join(
            new_h.select(F.col("_id").alias("new_id"),
                         F.col("_toks").alias("toks_n")),
            on="new_id",
        )
        .join(
            rep_h.select(F.col("_id").alias("_rid"),
                         F.col("_toks").alias("toks_r")),
            on="_rid",
        )
        .where((u > 0) & (i * 100 >= u * min_jaccard_pct))
        .select(
            "new_id",
            "cluster_id",
            (i.cast("long") * 10000).alias("_i4"),
            u.cast("long").alias("_u"),
        )
    )
    # integer DIV: exact, matches DuckDB's `//` bit-for-bit
    jac_e4 = F.expr("CAST(_i4 DIV _u AS BIGINT)")
    best = (
        scored.select(
            "new_id",
            F.struct(
                jac_e4.alias("jac_e4"),
                (-F.col("cluster_id")).alias("negc"),
            ).alias("_s"),
        )
        .groupBy("new_id")
        .agg(F.max("_s").alias("_s"))
        .select(
            "new_id",
            F.col("_s.jac_e4").alias("best_jac_e4"),
            (-F.col("_s.negc")).alias("best_cluster"),
        )
    )
    ids = new_docs.select(F.col(id_col).cast("long").alias("new_id")).distinct()
    return ids.join(best, on="new_id", how="left").select(
        F.col("new_id").alias("doc_id"),
        F.coalesce(
            F.col("best_cluster"),
            F.col("new_id") + F.lit(NEW_CLUSTER_OFFSET).cast("long"),
        ).alias("cluster_id"),
        F.col("best_cluster").isNotNull().alias("matched"),
        F.coalesce(F.col("best_jac_e4"), F.lit(-1).cast("long")).alias(
            "best_jac_e4"
        ),
    )


def link_increment_sql(
    reps_expr: str,
    new_expr: str,
    id_col: str,
    text_col: str,
    min_jaccard_pct: int = 50,
    n_bands: int = 8,
    rows_per_band: int = 1,
    shingle_k: int = 3,
    max_rep_key_df: int = 200,
) -> str:
    """DuckDB twin. reps_expr: derived table (cluster_id, rep_id, rep_text);
    new_expr: derived table with ({id_col}, {text_col}). The argmax is the
    window form (row_number ORDER BY jac_e4 DESC, cluster_id ASC) — values
    identical to the struct-MAX (lexicographic total order)."""
    band_list = ", ".join(
        T.band_key_from_hashes_sql("_shh", b, rows_per_band)
        for b in range(n_bands)
    )
    i = "len(list_intersect(nh._toks, rh._toks))"
    u = f"(len(nh._toks) + len(rh._toks) - {i})"
    return f"""
    WITH rep_h AS MATERIALIZED (
      SELECT CAST(rep_id AS BIGINT) AS _rid,
             CAST(cluster_id AS BIGINT) AS cluster_id,
             {T.shingle_hashes_sql('rep_text', shingle_k)} AS _shh,
             list_distinct({T.tokens_sql('rep_text')}) AS _toks
      FROM ({reps_expr})
    ),
    new_h AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS _id,
             {T.shingle_hashes_sql(text_col, shingle_k)} AS _shh,
             list_distinct({T.tokens_sql(text_col)}) AS _toks
      FROM ({new_expr})
    ),
    rep_b AS (SELECT _rid, cluster_id, unnest([{band_list}]) AS band_key
              FROM rep_h),
    new_b AS (SELECT _id, unnest([{band_list}]) AS band_key FROM new_h),
    kept AS (SELECT band_key FROM rep_b GROUP BY band_key
             HAVING count(*) <= {max_rep_key_df}),
    cand AS (
      SELECT DISTINCT n._id AS new_id, r._rid, r.cluster_id
      FROM new_b n JOIN kept k ON n.band_key = k.band_key
      JOIN rep_b r ON n.band_key = r.band_key
    ),
    scored AS (
      SELECT cand.new_id, cand.cluster_id,
             CAST(({i} * 10000) // {u} AS BIGINT) AS jac_e4
      FROM cand
      JOIN new_h nh ON nh._id = cand.new_id
      JOIN rep_h rh ON rh._rid = cand._rid
      WHERE {u} > 0 AND {i} * 100 >= {u} * {min_jaccard_pct}
    ),
    best AS (
      SELECT new_id, cluster_id, jac_e4,
             row_number() OVER (PARTITION BY new_id
                                ORDER BY jac_e4 DESC, cluster_id ASC) AS _r
      FROM scored
    ),
    ids AS (SELECT DISTINCT CAST({id_col} AS BIGINT) AS new_id
            FROM ({new_expr}))
    SELECT ids.new_id AS doc_id,
           COALESCE(b.cluster_id, ids.new_id + {NEW_CLUSTER_OFFSET})
             AS cluster_id,
           b.cluster_id IS NOT NULL AS matched,
           COALESCE(b.jac_e4, -1) AS best_jac_e4
    FROM ids LEFT JOIN (SELECT * FROM best WHERE _r = 1) b
      ON ids.new_id = b.new_id
    """


def merge_components(labels: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Fold a delta edge set into an existing labeling without re-clustering
    the corpus. labels: (node, component) — the standing assignment;
    new_edges: (src, dst) delta pairs (endpoints may be new nodes).
    Returns (node, component) with component = min node id, covering every
    labeled node and every delta endpoint.

    The old corpus enters as its STAR graph (node -> component), one edge
    per node, so (a) the input is |nodes| + |delta| edges regardless of how
    dense the original pair graph was, and (b) alternating star rounds
    converge fast — stars are already canonical, only delta-bridged chains
    need flattening."""
    star = labels.select(
        F.col("node").cast("long").alias("src"),
        F.col("component").cast("long").alias("dst"),
    )
    delta = new_edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    edges = star.unionByName(delta)
    # singleton clusters are self-loop star edges — CC drops self-loops, so
    # the node universe (every labeled node + every delta endpoint) rides
    # alongside explicitly
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    )
    return components_with_isolated(edges, nodes)


def merge_components_sql(labels_expr: str, edges_expr: str) -> str:
    """Recursive-CTE twin over the union edge set. labels_expr: derived
    table (node, component); edges_expr: derived table (src, dst)."""
    return f"""
    WITH RECURSIVE uedges AS MATERIALIZED (
      SELECT CAST(node AS BIGINT) AS a, CAST(component AS BIGINT) AS b
      FROM ({labels_expr})
      UNION
      SELECT CAST(src AS BIGINT) AS a, CAST(dst AS BIGINT) AS b
      FROM ({edges_expr})
    ),
    nodes AS (SELECT DISTINCT a AS node FROM (
      SELECT a FROM uedges UNION ALL SELECT b FROM uedges)),
    bi AS MATERIALIZED (SELECT a, b FROM uedges WHERE a != b
           UNION SELECT b AS a, a AS b FROM uedges WHERE a != b),
    walk(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT bi.b, walk.comp FROM walk JOIN bi ON bi.a = walk.node
      WHERE walk.comp < bi.b
    )
    SELECT node, min(comp) AS component FROM walk GROUP BY node
    """


def cluster_pair_metrics(
    pred: DataFrame,
    truth: DataFrame,
    node_col: str = "node",
    pred_col: str = "component",
    truth_col: str = "component",
) -> DataFrame:
    """Pairwise precision/recall/F1 of a predicted clustering vs a truth
    clustering, from the label contingency table: tp = Σ_cells C(n,2),
    pred_pairs = Σ_pred C(n,2), true_pairs = Σ_truth C(n,2). One row:
    (tp, pred_pairs, true_pairs, precision, recall, f1). Nodes present in
    only one side count as singletons there (inner join on node — only
    co-labeled nodes can form counted pairs; callers align universes).

    Never materializes pairs: three aggregations over |nodes| rows. The
    ratio columns are single divisions of exact integers (doubles are
    therefore bit-identical across engines); empty denominators yield 0.0
    by convention."""
    j = pred.select(
        F.col(node_col).cast("long").alias("_n"),
        F.col(pred_col).cast("long").alias("_p"),
    ).join(
        truth.select(
            F.col(node_col).cast("long").alias("_n"),
            F.col(truth_col).cast("long").alias("_t"),
        ),
        on="_n",
    )

    # integer DIV (n*(n-1) is even, so exact; never routes through doubles)
    pairs_of = F.expr("CAST(_c * (_c - 1) DIV 2 AS BIGINT)")

    cells = (
        j.groupBy("_p", "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.sum(pairs_of).alias("tp"))
    )
    pp = (
        j.groupBy("_p").agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.sum(pairs_of).alias("pred_pairs"))
    )
    tpg = (
        j.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.sum(pairs_of).alias("true_pairs"))
    )
    one = cells.crossJoin(pp).crossJoin(tpg)
    prec = F.when(
        F.col("pred_pairs") > 0,
        F.col("tp").cast("double") / F.col("pred_pairs").cast("double"),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("true_pairs") > 0,
        F.col("tp").cast("double") / F.col("true_pairs").cast("double"),
    ).otherwise(F.lit(0.0))
    denom = F.col("pred_pairs") + F.col("true_pairs")
    f1 = F.when(
        denom > 0,
        (2 * F.col("tp")).cast("double") / denom.cast("double"),
    ).otherwise(F.lit(0.0))
    return one.select(
        "tp", "pred_pairs", "true_pairs",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def cluster_pair_metrics_sql(
    pred_expr: str,
    truth_expr: str,
    node_col: str = "node",
    pred_col: str = "component",
    truth_col: str = "component",
) -> str:
    """Twin of cluster_pair_metrics. pred_expr/truth_expr: derived tables.
    F1 computed as 2*tp/(pred+true) directly from exact integers (the
    harmonic-mean form — algebraically identical, and single-division so
    the double is bit-identical across engines)."""
    return f"""
    WITH j AS MATERIALIZED (
      SELECT CAST(p.{node_col} AS BIGINT) AS _n,
             CAST(p.{pred_col} AS BIGINT) AS _p,
             CAST(t.{truth_col} AS BIGINT) AS _t
      FROM ({pred_expr}) p JOIN ({truth_expr}) t
        ON CAST(p.{node_col} AS BIGINT) = CAST(t.{node_col} AS BIGINT)
    ),
    tp AS (SELECT CAST(sum(_c * (_c - 1) // 2) AS BIGINT) AS tp FROM
           (SELECT count(*) AS _c FROM j GROUP BY _p, _t)),
    pp AS (SELECT CAST(sum(_c * (_c - 1) // 2) AS BIGINT) AS pred_pairs FROM
           (SELECT count(*) AS _c FROM j GROUP BY _p)),
    tg AS (SELECT CAST(sum(_c * (_c - 1) // 2) AS BIGINT) AS true_pairs FROM
           (SELECT count(*) AS _c FROM j GROUP BY _t))
    SELECT tp, pred_pairs, true_pairs,
           CASE WHEN pred_pairs > 0
                THEN CAST(tp AS DOUBLE) / CAST(pred_pairs AS DOUBLE)
                ELSE 0.0e0 END AS precision,
           CASE WHEN true_pairs > 0
                THEN CAST(tp AS DOUBLE) / CAST(true_pairs AS DOUBLE)
                ELSE 0.0e0 END AS recall,
           CASE WHEN pred_pairs + true_pairs > 0
                THEN CAST(2 * tp AS DOUBLE)
                     / CAST(pred_pairs + true_pairs AS DOUBLE)
                ELSE 0.0e0 END AS f1
    FROM tp, pp, tg
    """


def bcubed_metrics(
    pred: DataFrame,
    truth: DataFrame,
    node_col: str = "node",
    pred_col: str = "component",
    truth_col: str = "component",
) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) of a predicted
    clustering vs truth — the per-RECORD average that, unlike pair
    counting, does not let one huge cluster dominate the score (the
    standard complement; Amigo et al. 2009 showed B^3 is the only family
    meeting all four clustering-metric constraints).

    Per record r: precision_r = |C(r) ∩ T(r)| / |C(r)|. All records in
    contingency cell (p, t) share it, so the whole metric is three
    aggregations over label counts — the pair universe (and even the
    per-record relation) is never re-scanned: B3P = (1/N) Σ_cells
    c_pt^2 / c_p, B3R with c_t.

    Fixed-point contract (bit-strict across engines): each cell
    contributes floor(c_pt^2 * 1e6 / c_p) micro-units (integer DIV), the
    sums are integer (order-free), the final averages and the harmonic
    F1 are integer DIVs of those sums. One row:
    (n_nodes, b3p_micro, b3r_micro, b3f1_micro), all BIGINT. Each
    per-cell/final floor loses < 1e-6 — quantization, not approximation."""
    j = pred.select(
        F.col(node_col).cast("long").alias("_n"),
        F.col(pred_col).cast("long").alias("_p"),
    ).join(
        truth.select(
            F.col(node_col).cast("long").alias("_n"),
            F.col(truth_col).cast("long").alias("_t"),
        ),
        on="_n",
    ).localCheckpoint()  # three aggregates consume it

    cells = j.groupBy("_p", "_t").agg(
        F.count(F.lit(1)).cast("long").alias("c_pt")
    )
    psize = j.groupBy("_p").agg(F.count(F.lit(1)).cast("long").alias("c_p"))
    tsize = j.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("c_t"))
    sums = (
        cells.join(psize, on="_p")
        .join(tsize, on="_t")
        .agg(
            F.coalesce(
                F.sum(F.expr("(c_pt * c_pt * 1000000) div c_p")), F.lit(0)
            ).cast("long").alias("_ps"),
            F.coalesce(
                F.sum(F.expr("(c_pt * c_pt * 1000000) div c_t")), F.lit(0)
            ).cast("long").alias("_rs"),
            F.coalesce(F.sum("c_pt"), F.lit(0)).cast("long").alias("n_nodes"),
        )
    )
    return sums.select(
        "n_nodes",
        F.expr("CASE WHEN n_nodes > 0 THEN _ps div n_nodes ELSE 0 END")
        .cast("long").alias("b3p_micro"),
        F.expr("CASE WHEN n_nodes > 0 THEN _rs div n_nodes ELSE 0 END")
        .cast("long").alias("b3r_micro"),
    ).withColumn(
        "b3f1_micro",
        F.expr(
            "CASE WHEN b3p_micro + b3r_micro > 0 THEN "
            "(2 * b3p_micro * b3r_micro) div (b3p_micro + b3r_micro) "
            "ELSE 0 END"
        ).cast("long"),
    )


def bcubed_metrics_sql(
    pred_expr: str,
    truth_expr: str,
    node_col: str = "node",
    pred_col: str = "component",
    truth_col: str = "component",
) -> str:
    """Twin of bcubed_metrics (same per-cell integer-DIV fixed point)."""
    return f"""
    WITH j AS MATERIALIZED (
      SELECT CAST(p.{node_col} AS BIGINT) AS _n,
             CAST(p.{pred_col} AS BIGINT) AS _p,
             CAST(t.{truth_col} AS BIGINT) AS _t
      FROM ({pred_expr}) p JOIN ({truth_expr}) t
        ON CAST(p.{node_col} AS BIGINT) = CAST(t.{node_col} AS BIGINT)
    ),
    cells AS (SELECT _p, _t, CAST(count(*) AS BIGINT) AS c_pt
              FROM j GROUP BY _p, _t),
    psize AS (SELECT _p, CAST(count(*) AS BIGINT) AS c_p
              FROM j GROUP BY _p),
    tsize AS (SELECT _t, CAST(count(*) AS BIGINT) AS c_t
              FROM j GROUP BY _t),
    sums AS (
      SELECT CAST(COALESCE(sum((c_pt * c_pt * 1000000) // c_p), 0)
               AS BIGINT) AS _ps,
             CAST(COALESCE(sum((c_pt * c_pt * 1000000) // c_t), 0)
               AS BIGINT) AS _rs,
             CAST(COALESCE(sum(c_pt), 0) AS BIGINT) AS n_nodes
      FROM cells JOIN psize USING (_p) JOIN tsize USING (_t)
    )
    SELECT n_nodes, b3p_micro, b3r_micro,
           CASE WHEN b3p_micro + b3r_micro > 0 THEN
             (2 * b3p_micro * b3r_micro) // (b3p_micro + b3r_micro)
           ELSE 0 END AS b3f1_micro
    FROM (
      SELECT n_nodes,
             CASE WHEN n_nodes > 0 THEN _ps // n_nodes ELSE 0 END
               AS b3p_micro,
             CASE WHEN n_nodes > 0 THEN _rs // n_nodes ELSE 0 END
               AS b3r_micro
      FROM sums
    )
    """


# ---------------------------------------------------------------------------
# Chance-corrected clustering agreement: ARI + Fowlkes-Mallows
# ---------------------------------------------------------------------------

# Final-value tails shared VERBATIM by both engines: every float op is an
# IEEE exactly-rounded op (int64->double cast, + - * /, sqrt, floor) applied
# in the identical written order to identical BIGINT inputs, so both engines
# produce the identical double and the identical floor. No exp/log.
# `_exp` below = sumA*sumB/T in doubled units; den = max - expected.
_ARI_TAIL = (
    "CASE WHEN n_nodes < 2 THEN 1000000 "
    "WHEN (CAST(pred_pairs2 AS DOUBLE) + CAST(truth_pairs2 AS DOUBLE)) "
    "/ 2.0e0 - CAST(pred_pairs2 AS DOUBLE) * CAST(truth_pairs2 AS DOUBLE) "
    "/ CAST(t2 AS DOUBLE) = 0e0 THEN "
    "CASE WHEN CAST(both_pairs2 AS DOUBLE) "
    "- CAST(pred_pairs2 AS DOUBLE) * CAST(truth_pairs2 AS DOUBLE) "
    "/ CAST(t2 AS DOUBLE) = 0e0 THEN 1000000 ELSE 0 END "
    "ELSE CAST(floor((CAST(both_pairs2 AS DOUBLE) "
    "- CAST(pred_pairs2 AS DOUBLE) * CAST(truth_pairs2 AS DOUBLE) "
    "/ CAST(t2 AS DOUBLE)) * 1000000e0 "
    "/ ((CAST(pred_pairs2 AS DOUBLE) + CAST(truth_pairs2 AS DOUBLE)) "
    "/ 2.0e0 - CAST(pred_pairs2 AS DOUBLE) * CAST(truth_pairs2 AS DOUBLE) "
    "/ CAST(t2 AS DOUBLE))) AS BIGINT) END"
)
_FM_TAIL = (
    "CASE WHEN both_pairs2 = 0 THEN 0 "
    "ELSE CAST(floor(CAST(both_pairs2 AS DOUBLE) * 1000000e0 "
    "/ sqrt(CAST(pred_pairs2 AS DOUBLE) * CAST(truth_pairs2 AS DOUBLE))) "
    "AS BIGINT) END"
)


def ari_metrics(
    pred: DataFrame,
    truth: DataFrame,
    node_col: str = "node",
    pred_col: str = "component",
    truth_col: str = "component",
) -> DataFrame:
    """-> one row (n_nodes, both_pairs2, pred_pairs2, truth_pairs2,
    ari_micro, fm_micro): Adjusted Rand Index (Hubert & Arabie 1985) and
    Fowlkes-Mallows index of a predicted clustering vs truth — the
    CHANCE-CORRECTED agreement that cluster_pair_metrics (raw pair P/R/F1)
    and bcubed_metrics (per-record average) both miss: raw pair F1 rewards
    a degenerate one-big-cluster prediction on skewed truth; ARI scores it
    ~0 because agreement expected under random labelings is subtracted.
    The standard third leg of clustering evaluation for ER audits.

    Everything is contingency-margin sums, all integer and order-free:
    both_pairs2 = sum_cells c_pt*(c_pt-1)  (= 2 * pairs co-clustered in
    BOTH), pred_pairs2 / truth_pairs2 the margin analogs, t2 = n*(n-1).
    The doubled units cancel in both ratios:
      ARI = (I - AB/T) / ((A+B)/2 - AB/T)   (identical in 2x units)
      FM  = I / sqrt(A*B)                    (identical in 2x units)
    Products of the doubled sums can exceed int64 near ~10^9 co-clustered
    pairs, so the tails divide as DOUBLES (exactly-rounded IEEE ops shared
    verbatim with the DuckDB twin — see _ARI_TAIL) rather than as integer
    cross-products; every BIGINT component is also returned raw so the
    exact rationals are recoverable. ari_micro uses floor (negative ARI —
    worse than chance — floors away from zero; document scale is 1e6).
    Degenerate denominators: both partitions trivial => ARI := 1e6 (the
    universal convention); n < 2 likewise.

    100-TB notes: identical shape to bcubed_metrics — one node-key join,
    three map-side-combined label aggregates, three single-row reductions;
    the pair universe is never materialized. The joined relation is
    localCheckpoint'ed (consumed by three aggregates).

    Reference analog: none (the reference evaluates via matchcounts only,
    src/clustering_functions.jl) — this is the evaluation surface its
    users import scikit-learn for, made distributed and bit-strict."""
    j = pred.select(
        F.col(node_col).cast("long").alias("_n"),
        F.col(pred_col).cast("long").alias("_p"),
    ).join(
        truth.select(
            F.col(node_col).cast("long").alias("_n"),
            F.col(truth_col).cast("long").alias("_t"),
        ),
        on="_n",
    ).localCheckpoint()  # three aggregates consume it

    cells = (
        j.groupBy("_p", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.coalesce(F.sum(F.expr("c * (c - 1)")), F.lit(0))
            .cast("long").alias("both_pairs2"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_nodes"),
        )
    )
    pa = (
        j.groupBy("_p")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.coalesce(F.sum(F.expr("c * (c - 1)")), F.lit(0))
            .cast("long").alias("pred_pairs2"),
        )
    )
    tb = (
        j.groupBy("_t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.coalesce(F.sum(F.expr("c * (c - 1)")), F.lit(0))
            .cast("long").alias("truth_pairs2"),
        )
    )
    return (
        cells.crossJoin(pa).crossJoin(tb)
        .withColumn("t2", F.expr("n_nodes * (n_nodes - 1)").cast("long"))
        .select(
            "n_nodes", "both_pairs2", "pred_pairs2", "truth_pairs2",
            F.expr(_ARI_TAIL).cast("long").alias("ari_micro"),
            F.expr(_FM_TAIL).cast("long").alias("fm_micro"),
        )
    )


def ari_metrics_sql(
    pred_expr: str,
    truth_expr: str,
    node_col: str = "node",
    pred_col: str = "component",
    truth_col: str = "component",
) -> str:
    """Twin of ari_metrics (identical shared-verbatim IEEE tails)."""
    return f"""
    WITH j AS MATERIALIZED (
      SELECT CAST(p.{node_col} AS BIGINT) AS _n,
             CAST(p.{pred_col} AS BIGINT) AS _p,
             CAST(t.{truth_col} AS BIGINT) AS _t
      FROM ({pred_expr}) p JOIN ({truth_expr}) t
        ON CAST(p.{node_col} AS BIGINT) = CAST(t.{node_col} AS BIGINT)
    ),
    cells AS (
      SELECT CAST(COALESCE(sum(c * (c - 1)), 0) AS BIGINT) AS both_pairs2,
             CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_nodes
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM j GROUP BY _p, _t)
    ),
    pa AS (
      SELECT CAST(COALESCE(sum(c * (c - 1)), 0) AS BIGINT) AS pred_pairs2
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM j GROUP BY _p)
    ),
    tb AS (
      SELECT CAST(COALESCE(sum(c * (c - 1)), 0) AS BIGINT) AS truth_pairs2
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM j GROUP BY _t)
    )
    SELECT n_nodes, both_pairs2, pred_pairs2, truth_pairs2,
           CAST({_ARI_TAIL} AS BIGINT) AS ari_micro,
           CAST({_FM_TAIL} AS BIGINT) AS fm_micro
    FROM (
      SELECT n_nodes, both_pairs2, pred_pairs2, truth_pairs2,
             CAST(n_nodes * (n_nodes - 1) AS BIGINT) AS t2
      FROM cells, pa, tb
    )
    """


# ---------------------------------------------------------------------------
# Stable cluster-id carryover between ER runs
# ---------------------------------------------------------------------------


def stable_relabel(
    new: DataFrame,
    old: DataFrame,
    node_col: str = "node",
    cluster_col: str = "component",
    mint_offset: int = NEW_CLUSTER_OFFSET,
) -> DataFrame:
    """-> one row per NEW cluster: (new_cluster, stable_id, matched_old,
    overlap, new_size, old_size, status): carry ENTITY IDS across ER runs.
    Re-running linkage after a crawl renames every cluster (CC labels are
    min node ids; any new member can change them) — downstream systems
    keyed on entity ids need the new clustering expressed in LAST run's
    ids wherever the entity survived. The standard contract: a new
    cluster inherits an old id iff it is the MUTUAL max-overlap partner
    (the Menestrina et al. 2010 slice comparison applied as an
    assignment); a split's minority siblings and genuinely new entities
    mint `mint_offset + new_cluster` (collision-free: the link_increment
    convention, same offset).

    status: 'carried' (mutual argmax — inherits matched_old),
    'split' (its best old cluster was claimed by a sibling with larger
    overlap — mints), 'new' (no node shared with any old cluster —
    mints). matched_old / old_size are -1 for 'new' rows (not NULL — the
    cross-engine hash treats absent as a value, integers keep it
    bit-strict).

    Determinism: both argmaxes are total-ordered — (overlap DESC, id ASC)
    — as a struct-MAX aggregation (the mutual_best shape: shuffles
    |clusters| grouped rows, never sorts the overlap-cell relation; the
    DuckDB twin uses the window form, values identical). Overlap cells
    are localCheckpoint'ed (consumed by both directions).

    100-TB notes: one node-key join + one (new,old) cell aggregate + two
    cluster-keyed argmaxes + broadcastable size dims — everything is
    O(nodes) rows map-side-combined; nothing pairwise. Reference analog:
    none (the reference rebuilds clusterings per run,
    src/clustering_functions.jl) — this is the re-crawl id-stability
    contract."""
    n = new.select(
        F.col(node_col).cast("long").alias("_n"),
        F.col(cluster_col).cast("long").alias("new_c"),
    )
    o = old.select(
        F.col(node_col).cast("long").alias("_n"),
        F.col(cluster_col).cast("long").alias("old_c"),
    )
    cells = (
        n.join(o, on="_n")
        .groupBy("new_c", "old_c")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
        .localCheckpoint()  # consumed by both argmax directions
    )
    fwd = (
        cells.groupBy("new_c")
        .agg(F.max(F.struct("overlap", F.expr("-old_c").alias("_no"))).alias("_b"))
        .select(
            "new_c",
            F.col("_b.overlap").alias("overlap"),
            F.expr("-_b._no").cast("long").alias("matched_old"),
        )
    )
    bwd = (
        cells.groupBy("old_c")
        .agg(F.max(F.struct("overlap", F.expr("-new_c").alias("_nn"))).alias("_b"))
        .select(
            F.col("old_c").alias("matched_old"),
            F.expr("-_b._nn").cast("long").alias("bwd_new"),
        )
    )
    nsize = n.groupBy("new_c").agg(
        F.count(F.lit(1)).cast("long").alias("new_size")
    )
    osize = o.groupBy("old_c").agg(
        F.count(F.lit(1)).cast("long").alias("old_size")
    )
    j = (
        nsize.join(fwd, on="new_c", how="left")
        .join(bwd, on="matched_old", how="left")
        .join(
            osize.withColumnRenamed("old_c", "matched_old"),
            on="matched_old", how="left",
        )
    )
    return j.select(
        "new_c",
        F.expr(
            "CASE WHEN bwd_new = new_c THEN matched_old "
            f"ELSE new_c + {mint_offset} END"
        ).cast("long").alias("stable_id"),
        F.coalesce(F.col("matched_old"), F.lit(-1)).cast("long").alias(
            "matched_old"
        ),
        F.coalesce(F.col("overlap"), F.lit(0)).cast("long").alias("overlap"),
        "new_size",
        F.coalesce(F.col("old_size"), F.lit(-1)).cast("long").alias(
            "old_size"
        ),
        F.expr(
            "CASE WHEN bwd_new = new_c THEN 'carried' "
            "WHEN matched_old IS NOT NULL THEN 'split' "
            "ELSE 'new' END"
        ).alias("status"),
    ).withColumnRenamed("new_c", "new_cluster")


def stable_relabel_sql(
    new_expr: str,
    old_expr: str,
    node_col: str = "node",
    cluster_col: str = "component",
    mint_offset: int = NEW_CLUSTER_OFFSET,
) -> str:
    """Twin of stable_relabel (window-form argmaxes, identical total
    order; -1/0 sentinels identical)."""
    return f"""
    WITH n AS MATERIALIZED (
      SELECT CAST({node_col} AS BIGINT) AS _n,
             CAST({cluster_col} AS BIGINT) AS new_c
      FROM ({new_expr})
    ),
    o AS MATERIALIZED (
      SELECT CAST({node_col} AS BIGINT) AS _n,
             CAST({cluster_col} AS BIGINT) AS old_c
      FROM ({old_expr})
    ),
    cells AS MATERIALIZED (
      SELECT new_c, old_c, CAST(count(*) AS BIGINT) AS overlap
      FROM n JOIN o USING (_n) GROUP BY new_c, old_c
    ),
    fwd AS (
      SELECT new_c, overlap, old_c AS matched_old
      FROM (SELECT new_c, old_c, overlap,
                   row_number() OVER (PARTITION BY new_c
                     ORDER BY overlap DESC, old_c ASC) AS rn
            FROM cells)
      WHERE rn = 1
    ),
    bwd AS (
      SELECT old_c AS matched_old, new_c AS bwd_new
      FROM (SELECT old_c, new_c, overlap,
                   row_number() OVER (PARTITION BY old_c
                     ORDER BY overlap DESC, new_c ASC) AS rn
            FROM cells)
      WHERE rn = 1
    ),
    nsize AS (SELECT new_c, CAST(count(*) AS BIGINT) AS new_size
              FROM n GROUP BY new_c),
    osize AS (SELECT old_c AS matched_old,
                     CAST(count(*) AS BIGINT) AS old_size
              FROM o GROUP BY old_c)
    SELECT ns.new_c AS new_cluster,
           CAST(CASE WHEN b.bwd_new = ns.new_c THEN f.matched_old
                ELSE ns.new_c + {mint_offset} END AS BIGINT) AS stable_id,
           CAST(COALESCE(f.matched_old, -1) AS BIGINT) AS matched_old,
           CAST(COALESCE(f.overlap, 0) AS BIGINT) AS overlap,
           ns.new_size,
           CAST(COALESCE(os.old_size, -1) AS BIGINT) AS old_size,
           CASE WHEN b.bwd_new = ns.new_c THEN 'carried'
                WHEN f.matched_old IS NOT NULL THEN 'split'
                ELSE 'new' END AS status
    FROM nsize ns
    LEFT JOIN fwd f USING (new_c)
    LEFT JOIN bwd b ON f.matched_old = b.matched_old
    LEFT JOIN osize os ON f.matched_old = os.matched_old
    """


# ---------------------------------------------------------------------------
# Pair-level PR curve over score thresholds
# ---------------------------------------------------------------------------


def _thr_lit(x: float) -> str:
    """Bit-identical double literal in both engines (repo convention)."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def pair_pr_curve(
    scored: DataFrame,
    truth: DataFrame,
    thresholds: tuple,
    w_col: str = "w",
) -> DataFrame:
    """-> one row per threshold: (thr_idx, tp, fp, fn, prec_micro,
    rec_micro, f1_micro): the pair-level operating characteristic of a
    scored candidate set against labeled truth pairs — the curve that
    picks the Fellegi-Sunter upper/lower cutoffs (fs_decision) instead of
    guessing them. Complements threshold_sensitivity (cluster-count
    stability, no labels) and cluster_pair_metrics (one clustering, no
    sweep): this is precision/recall of PAIR classification at every
    candidate threshold in one pass.

    Truth pairs MISSING from the scored set (blocking misses) count as
    false negatives at every threshold — the full-outer join makes recall
    honest about blocking recall, not just scorer recall. Both inputs
    must be oriented id_a < id_b (the repo-wide pair convention).

    Single-pass shape: each pair is bucketed once by
    "number of thresholds <= w" (a CASE sum over the literal ascending
    threshold list; unscored truth pairs take bucket 0), then one
    (bucket, is_true) count aggregate — at most 2*(K+1) cells — and the
    per-threshold cumulative counts come from a tiny literal-dim theta
    join (never a window over the pair set). tp/fp/fn are BIGINT;
    precision/recall/F1 use the bcubed integer micro fixed point, so the
    whole row is bit-strict. Thresholds enter as CAST('repr' AS DOUBLE)
    literals; w is the bit-portable FS weight, so w >= t decides
    identically in both engines.

    100-TB notes: O(pairs) scan + map-side-combined count; the pair set
    is never sorted, windowed, or exploded per threshold. Reference
    analog: none (the reference picks cutoffs by inspection of the
    weight histogram, vignette/example.jl) — this is that histogram made
    decision-grade."""
    ts = [float(t) for t in thresholds]
    assert ts == sorted(ts), "thresholds must be ascending"
    spark = scored.sparkSession
    s = scored.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col(w_col).cast("double").alias("_w"),
    )
    t = truth.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.lit(1).cast("long").alias("is_true"),
    )
    bucket_sum = " + ".join(
        f"(CASE WHEN _w >= {_thr_lit(x)} THEN 1 ELSE 0 END)" for x in ts
    )
    j = s.join(t, on=["id_a", "id_b"], how="full").select(
        F.expr(
            f"CASE WHEN _w IS NULL THEN 0 ELSE {bucket_sum} END"
        ).cast("long").alias("bucket"),
        F.coalesce(F.col("is_true"), F.lit(0)).cast("long").alias("is_true"),
    )
    cells = j.groupBy("bucket", "is_true").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint()  # consumed by the curve join + the truth total
    total_true = cells.where(F.col("is_true") == 1).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_true")
    )
    dim_rows = ", ".join(f"({i + 1})" for i in range(len(ts)))
    dim = spark.sql(
        f"SELECT CAST(col1 AS BIGINT) AS thr_idx FROM VALUES {dim_rows}"
    )
    curve = (
        dim.join(cells, on=F.col("bucket") >= F.col("thr_idx"), how="left")
        .groupBy("thr_idx")
        .agg(
            F.coalesce(
                F.sum(F.expr("CASE WHEN is_true = 1 THEN c ELSE 0 END")),
                F.lit(0),
            ).cast("long").alias("tp"),
            F.coalesce(
                F.sum(F.expr("CASE WHEN is_true = 0 THEN c ELSE 0 END")),
                F.lit(0),
            ).cast("long").alias("fp"),
        )
        .crossJoin(total_true)
    )
    return curve.select(
        "thr_idx", "tp", "fp",
        F.expr("n_true - tp").cast("long").alias("fn"),
        F.expr(
            "CASE WHEN tp + fp > 0 THEN (tp * 1000000) div (tp + fp) "
            "ELSE 0 END"
        ).cast("long").alias("prec_micro"),
        F.expr(
            "CASE WHEN n_true > 0 THEN (tp * 1000000) div n_true "
            "ELSE 0 END"
        ).cast("long").alias("rec_micro"),
    ).withColumn(
        "f1_micro",
        F.expr(
            "CASE WHEN prec_micro + rec_micro > 0 THEN "
            "(2 * prec_micro * rec_micro) div (prec_micro + rec_micro) "
            "ELSE 0 END"
        ).cast("long"),
    )


def pair_pr_curve_sql(
    scored_expr: str,
    truth_expr: str,
    thresholds: tuple,
    w_col: str = "w",
) -> str:
    """Twin of pair_pr_curve (identical literals, buckets, micro DIVs)."""
    ts = [float(t) for t in thresholds]
    bucket_sum = " + ".join(
        f"(CASE WHEN _w >= {_thr_lit(x)} THEN 1 ELSE 0 END)" for x in ts
    )
    dim_rows = ", ".join(f"({i + 1})" for i in range(len(ts)))
    return f"""
    WITH s AS (
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             CAST({w_col} AS DOUBLE) AS _w
      FROM ({scored_expr})
    ),
    t AS (
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             CAST(1 AS BIGINT) AS is_true
      FROM ({truth_expr})
    ),
    j AS (
      SELECT CAST(CASE WHEN _w IS NULL THEN 0 ELSE {bucket_sum} END
               AS BIGINT) AS bucket,
             CAST(COALESCE(is_true, 0) AS BIGINT) AS is_true
      FROM s FULL OUTER JOIN t USING (id_a, id_b)
    ),
    cells AS MATERIALIZED (
      SELECT bucket, is_true, CAST(count(*) AS BIGINT) AS c
      FROM j GROUP BY bucket, is_true
    ),
    tot AS (
      SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_true
      FROM cells WHERE is_true = 1
    ),
    dim AS (SELECT CAST(col0 AS BIGINT) AS thr_idx
            FROM (VALUES {dim_rows}) v(col0)),
    curve AS (
      SELECT d.thr_idx,
             CAST(COALESCE(sum(CASE WHEN cl.is_true = 1 THEN cl.c
                                    ELSE 0 END), 0) AS BIGINT) AS tp,
             CAST(COALESCE(sum(CASE WHEN cl.is_true = 0 THEN cl.c
                                    ELSE 0 END), 0) AS BIGINT) AS fp
      FROM dim d LEFT JOIN cells cl ON cl.bucket >= d.thr_idx
      GROUP BY d.thr_idx
    )
    SELECT thr_idx, tp, fp, fn, prec_micro, rec_micro,
           CAST(CASE WHEN prec_micro + rec_micro > 0 THEN
             (2 * prec_micro * rec_micro) // (prec_micro + rec_micro)
           ELSE 0 END AS BIGINT) AS f1_micro
    FROM (
      SELECT thr_idx, tp, fp,
             CAST(n_true - tp AS BIGINT) AS fn,
             CAST(CASE WHEN tp + fp > 0 THEN (tp * 1000000) // (tp + fp)
                  ELSE 0 END AS BIGINT) AS prec_micro,
             CAST(CASE WHEN n_true > 0 THEN (tp * 1000000) // n_true
                  ELSE 0 END AS BIGINT) AS rec_micro
      FROM curve, tot
    )
    """


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap for pair P/R uncertainty
# ---------------------------------------------------------------------------

BOOTSTRAP_REPS = 16
BOOTSTRAP_SALT = "boot1"


def _poisson1_cuts() -> list[int]:
    """Integer 1e6-scaled CDF cut points of Poisson(1) at k=0..5 (k
    capped at 6). Fixed mathematical constants (math.exp at build time is
    not data-derived training — every engine sees the same literals)."""
    import math

    cum, out, term = 0.0, [], math.exp(-1.0)
    for k in range(6):
        cum += term
        out.append(int(math.floor(cum * 1_000_000)))
        term /= (k + 1)
    return out


def pr_bootstrap_replicates(
    pred: DataFrame,
    truth: DataFrame,
    n_reps: int = BOOTSTRAP_REPS,
    salt: str = BOOTSTRAP_SALT,
) -> DataFrame:
    """-> one row per bootstrap replicate: (rep, tp, n_pred, n_true,
    prec_micro, rec_micro, f1_micro): the sampling uncertainty of pair
    precision/recall — the error bars pair_pr_curve's point estimates
    lack, which is what separates "P=0.98" from "P=0.98±0.04" when
    deciding whether a matcher change actually helped.

    Resampling is the Poisson bootstrap (Chamandy et al. 2012, the
    streaming/distributed form of the Efron bootstrap: per-ENTITY
    Poisson(1) multiplicities approximate with-replacement resampling
    without any global draw), made DETERMINISTIC: record id's replicate
    weight is the Poisson(1) inverse-CDF of phash(salt:rep:id) mod 1e6,
    compared against integer 1e6-scaled CDF cut points — no RNG state,
    identical in both engines and under any partitioning. Resampling
    units are RECORDS (both pair endpoints reweighted, w_a*w_b — the
    node bootstrap, which unlike naive pair resampling respects the
    dependence between pairs sharing a record). Metrics use the repo's
    integer micro fixed point (x1e6, DIV), so every column is BIGINT.

    Scale shape: the weight table is |records| x n_reps rows built map-
    side (explode of a literal sequence); each metric is one equi-join
    of the pair tables to weights on both endpoints + a map-side-
    combined sum per replicate. The pair tables are scanned a fixed 3
    times (pred, truth, tp-intersection), never per replicate."""
    cuts = _poisson1_cuts()
    p = pred.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    ).distinct()
    t = truth.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    ).distinct()
    both = p.join(t, on=["id_a", "id_b"], how="inner")
    nodes = (
        p.select(F.col("id_a").alias("id"))
        .unionByName(p.select(F.col("id_b").alias("id")))
        .unionByName(t.select(F.col("id_a").alias("id")))
        .unionByName(t.select(F.col("id_b").alias("id")))
        .distinct()
    )
    cut_case = " ".join(
        f"WHEN _u < {c} THEN {k}" for k, c in enumerate(cuts)
    )
    weights = (
        nodes.select(
            "id", F.explode(F.expr(f"sequence(0, {n_reps - 1})")).alias("rep")
        )
        .select(
            "id",
            "rep",
            F.expr(
                f"pmod(CAST(conv(substring(md5(concat('{salt}', ':', "
                f"CAST(rep AS STRING), ':', CAST(id AS STRING))), 1, 15), "
                f"16, 10) AS BIGINT), 1000000)"
            ).alias("_u"),
        )
        .select(
            "id", "rep",
            F.expr(f"CAST(CASE {cut_case} ELSE 6 END AS BIGINT)").alias("w"),
        )
        .localCheckpoint()  # consumed by three pair-weighting joins
    )

    def _wsum(pairs: DataFrame, name: str) -> DataFrame:
        return (
            pairs.join(
                weights.select(
                    F.col("id").alias("id_a"), "rep", F.col("w").alias("_wa")
                ),
                on="id_a",
            )
            .join(
                weights.select(
                    F.col("id").alias("id_b"),
                    F.col("rep").alias("rep_b"),
                    F.col("w").alias("_wb"),
                ).withColumnRenamed("rep_b", "rep"),
                on=["id_b", "rep"],
            )
            .groupBy("rep")
            .agg(F.sum(F.col("_wa") * F.col("_wb")).cast("long").alias(name))
        )
    reps = pred.sparkSession.range(n_reps).select(F.col("id").cast("int").alias("rep"))
    out = (
        reps.join(_wsum(both, "tp"), on="rep", how="left")
        .join(_wsum(p, "n_pred"), on="rep", how="left")
        .join(_wsum(t, "n_true"), on="rep", how="left")
        .select(
            "rep",
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.col("n_true"), F.lit(0)).cast("long").alias("n_true"),
        )
    )
    return out.select(
        "rep", "tp", "n_pred", "n_true",
        F.expr(
            "CAST(CASE WHEN n_pred > 0 THEN (tp * 1000000) DIV n_pred "
            "ELSE 0 END AS BIGINT)"
        ).alias("prec_micro"),
        F.expr(
            "CAST(CASE WHEN n_true > 0 THEN (tp * 1000000) DIV n_true "
            "ELSE 0 END AS BIGINT)"
        ).alias("rec_micro"),
    ).withColumn(
        "f1_micro",
        F.expr(
            "CAST(CASE WHEN "
            "(CASE WHEN n_pred > 0 THEN (tp * 1000000) DIV n_pred ELSE 0 END) + "
            "(CASE WHEN n_true > 0 THEN (tp * 1000000) DIV n_true ELSE 0 END) > 0 "
            "THEN (2 * (CASE WHEN n_pred > 0 THEN (tp * 1000000) DIV n_pred ELSE 0 END) * "
            "(CASE WHEN n_true > 0 THEN (tp * 1000000) DIV n_true ELSE 0 END)) DIV "
            "((CASE WHEN n_pred > 0 THEN (tp * 1000000) DIV n_pred ELSE 0 END) + "
            "(CASE WHEN n_true > 0 THEN (tp * 1000000) DIV n_true ELSE 0 END)) "
            "ELSE 0 END AS BIGINT)"
        ),
    )


def pr_bootstrap_replicates_sql(
    pred_expr: str,
    truth_expr: str,
    n_reps: int = BOOTSTRAP_REPS,
    salt: str = BOOTSTRAP_SALT,
) -> str:
    """DuckDB twin: same phash-uniform draw, same integer CDF cut points,
    same micro fixed point. pred_expr/truth_expr are subqueries yielding
    (id_a, id_b)."""
    cuts = _poisson1_cuts()
    cut_case = " ".join(f"WHEN _u < {c} THEN {k}" for k, c in enumerate(cuts))
    h = (
        f"CAST(('0x' || substr(md5('{salt}' || ':' || CAST(r.rep AS VARCHAR) "
        f"|| ':' || CAST(n.id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
    )
    return f"""
    WITH p AS MATERIALIZED (SELECT DISTINCT id_a, id_b FROM ({pred_expr})),
    t AS MATERIALIZED (SELECT DISTINCT id_a, id_b FROM ({truth_expr})),
    b AS (SELECT p.id_a, p.id_b FROM p JOIN t USING (id_a, id_b)),
    nodes AS (
      SELECT DISTINCT id FROM (
        SELECT id_a AS id FROM p UNION ALL SELECT id_b FROM p
        UNION ALL SELECT id_a FROM t UNION ALL SELECT id_b FROM t)
    ),
    reps AS (SELECT unnest(range({n_reps})) AS rep),
    weights AS MATERIALIZED (
      SELECT id, rep,
             CAST(CASE {cut_case} ELSE 6 END AS BIGINT) AS w
      FROM (SELECT n.id, r.rep, {h} AS _u
            FROM nodes n CROSS JOIN reps r)
    ),
    tpw AS (SELECT wa.rep, CAST(sum(wa.w * wb.w) AS BIGINT) AS tp
            FROM b JOIN weights wa ON b.id_a = wa.id
            JOIN weights wb ON b.id_b = wb.id AND wb.rep = wa.rep
            GROUP BY wa.rep),
    pw AS (SELECT wa.rep, CAST(sum(wa.w * wb.w) AS BIGINT) AS n_pred
           FROM p JOIN weights wa ON p.id_a = wa.id
           JOIN weights wb ON p.id_b = wb.id AND wb.rep = wa.rep
           GROUP BY wa.rep),
    tw AS (SELECT wa.rep, CAST(sum(wa.w * wb.w) AS BIGINT) AS n_true
           FROM t JOIN weights wa ON t.id_a = wa.id
           JOIN weights wb ON t.id_b = wb.id AND wb.rep = wa.rep
           GROUP BY wa.rep),
    base AS (
      SELECT CAST(r.rep AS INT) AS rep,
             CAST(coalesce(tpw.tp, 0) AS BIGINT) AS tp,
             CAST(coalesce(pw.n_pred, 0) AS BIGINT) AS n_pred,
             CAST(coalesce(tw.n_true, 0) AS BIGINT) AS n_true
      FROM reps r LEFT JOIN tpw ON r.rep = tpw.rep
      LEFT JOIN pw ON r.rep = pw.rep
      LEFT JOIN tw ON r.rep = tw.rep
    ),
    m AS (
      SELECT *,
             CAST(CASE WHEN n_pred > 0 THEN (tp * 1000000) // n_pred
                       ELSE 0 END AS BIGINT) AS prec_micro,
             CAST(CASE WHEN n_true > 0 THEN (tp * 1000000) // n_true
                       ELSE 0 END AS BIGINT) AS rec_micro
      FROM base
    )
    SELECT rep, tp, n_pred, n_true, prec_micro, rec_micro,
           CAST(CASE WHEN prec_micro + rec_micro > 0
                     THEN (2 * prec_micro * rec_micro) //
                          (prec_micro + rec_micro)
                ELSE 0 END AS BIGINT) AS f1_micro
    FROM m
    """


# ---------------------------------------------------------------------------
# Entity-disjoint evaluation splits (leakage-free train/val/test)
# ---------------------------------------------------------------------------

SPLIT_SALT = "edsplit1"
SPLIT_CUTS = (80, 90)  # train < 80, val < 90, test otherwise (of 100)


def entity_disjoint_splits(
    clusters: DataFrame,
    node_col: str = "node",
    comp_col: str = "component",
    salt: str = SPLIT_SALT,
    cuts: tuple = SPLIT_CUTS,
) -> DataFrame:
    """clusters(node, component) -> (doc_id, cluster_id, bucket, split):
    train/val/test assignment where the unit of randomization is the
    ENTITY CLUSTER, not the record — records of one entity can never
    straddle splits, so no matching pair leaks from train into test (the
    group-disjoint-split rule ER evaluation requires; record-level
    random splits overstate matcher quality because near-duplicates of
    training records land in test).

    Deterministic: bucket = phash(salt : cluster_id) mod 100; split by
    the (80, 90) cuts. A pure function of the cluster label, so the
    assignment is stable across runs, partitionings, engines, AND
    incremental recompute — a cluster keeps its split as long as its
    canonical min-id label survives (pairs well with stable_relabel).

    Scale shape: one map-side projection over the cluster table; no
    shuffle, no join beyond what produced the clusters."""
    lo, hi = cuts
    return clusters.select(
        F.col(node_col).cast("long").alias("doc_id"),
        F.col(comp_col).cast("long").alias("cluster_id"),
    ).withColumn(
        "bucket",
        F.expr(
            f"pmod(CAST(conv(substring(md5(concat('{salt}', ':', "
            f"CAST(cluster_id AS STRING))), 1, 15), 16, 10) AS BIGINT), 100)"
        ).cast("long"),
    ).withColumn(
        "split",
        F.when(F.col("bucket") < lo, F.lit("train"))
        .when(F.col("bucket") < hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def entity_disjoint_splits_sql(
    clusters_expr: str,
    salt: str = SPLIT_SALT,
    cuts: tuple = SPLIT_CUTS,
) -> str:
    """DuckDB twin; clusters_expr yields (node, component)."""
    lo, hi = cuts
    return f"""
    SELECT doc_id, cluster_id, bucket,
           CASE WHEN bucket < {lo} THEN 'train'
                WHEN bucket < {hi} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT CAST(node AS BIGINT) AS doc_id,
             CAST(component AS BIGINT) AS cluster_id,
             CAST(('0x' || substr(md5('{salt}' || ':' ||
                  CAST(CAST(component AS BIGINT) AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS bucket
      FROM ({clusters_expr})
    )
    """
