"""Golden-record fusion (survivorship): collapse each entity cluster into
one canonical record with per-field resolution rules.

The reference stops at the matching/clustering output (LinkMatrix /
ConnectedComponents — /root/reference/src/clustering_functions.jl); real ER
deployments then FUSE each cluster into a single record (Bleiholder &
Naumann's data-fusion survey, ACM CS 2008). This operator implements the
two deterministic rule families that cover most survivorship policies:

  - recency/size champion: the member with the MAX (len_col, -id) struct —
    "longest text wins" here, "latest timestamp wins" with a ts column;
    one struct-MAX aggregate (the mutual_best pattern — partial map-side
    aggregation, the shuffle carries |docs| grouped rows, never sorts).
  - categorical mode: for each categorical field, the most frequent value
    (ties: lexicographically smallest — a total order, so the choice is
    partitioning-invariant). One (cluster, value) count aggregate per
    field, then a struct-MIN over (-count, value).

All outputs are integers/strings (counts, argmax ids, mode values) — no
floats anywhere, so the DuckDB twin is bit-strict. The SQL twin replays
the argmax/mode rules as row_number windows over the same total orders.

100-TB notes: per-field work is one map-side-combined aggregate keyed by
cluster (or (cluster, value)); nothing explodes and nothing is quadratic
in cluster size. The labeled (node ⋈ docs) relation feeds 2+len(cat_cols)
aggregates, so callers passing an expensive upstream should materialize it
— the catalog entry consumes CC output, which is localCheckpoint-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def record_fusion(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    len_col: str,
    cat_cols: list[str],
    node_col: str = "node",
    cluster_col: str = "component",
) -> DataFrame:
    """docs + clusters(node, component) -> one golden record per cluster:
    (cluster_id, n_docs, rep_id, best_len_id, best_len,
     top_<c>, <c>_support for each categorical field c).

    rep_id = min member id (stable cluster key); best_len_id = the
    longest-field champion (len desc, id asc); top_<c> = modal value
    (count desc, value asc); <c>_support = that value's member count."""
    labeled = clusters.select(
        F.col(node_col).cast("long").alias("_id"),
        F.col(cluster_col).cast("long").alias("cluster_id"),
    ).join(
        docs.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(len_col).cast("long").alias("_len"),
            *[F.col(c) for c in cat_cols],
        ),
        on="_id",
    )
    base = (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("_id").cast("long").alias("rep_id"),
            F.max(
                F.struct(F.col("_len"), (-F.col("_id")).alias("_nid"))
            ).alias("_m"),
        )
        .select(
            "cluster_id", "n_docs", "rep_id",
            (-F.col("_m._nid")).cast("long").alias("best_len_id"),
            F.col("_m._len").cast("long").alias("best_len"),
        )
    )
    out = base
    for c in cat_cols:
        mode = (
            labeled.groupBy("cluster_id", c)
            .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
            .groupBy("cluster_id")
            .agg(
                F.min(
                    F.struct((-F.col("_cnt")).alias("_nc"), F.col(c))
                ).alias("_mm")
            )
            .select(
                "cluster_id",
                F.col(f"_mm.{c}").alias(f"top_{c}"),
                (-F.col("_mm._nc")).cast("long").alias(f"{c}_support"),
            )
        )
        out = out.join(mode, on="cluster_id")
    return out


def record_fusion_sql(
    table: str,
    clusters_sql: str,
    id_col: str,
    len_col: str,
    cat_cols: list[str],
    node_col: str = "node",
    cluster_col: str = "component",
) -> str:
    """Twin of record_fusion. clusters_sql: derived table producing
    (node, component). Mode/argmax replayed as row_number windows over
    the same total orders."""
    cat_sel = ", ".join(f"d.{c}" for c in cat_cols)
    cat_sel = (", " + cat_sel) if cat_sel else ""
    parts = [f"""labeled AS MATERIALIZED (
      SELECT c.{cluster_col} AS cluster_id, d.{id_col} AS _id,
             CAST(d.{len_col} AS BIGINT) AS _len{cat_sel}
      FROM ({clusters_sql}) c
      JOIN {table} d ON d.{id_col} = c.{node_col}
    )""", """base AS (
      SELECT cluster_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(_id) AS BIGINT) AS rep_id
      FROM labeled GROUP BY cluster_id
    )""", """champ AS (
      SELECT cluster_id, CAST(_id AS BIGINT) AS best_len_id,
             _len AS best_len
      FROM (SELECT cluster_id, _id, _len,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY _len DESC, _id ASC) AS _rn
            FROM labeled)
      WHERE _rn = 1
    )"""]
    joins = ["base", "JOIN champ USING (cluster_id)"]
    sel = ["cluster_id", "n_docs", "rep_id", "best_len_id", "best_len"]
    for c in cat_cols:
        parts.append(f"""mode_{c} AS (
      SELECT cluster_id, {c} AS top_{c},
             CAST(_cnt AS BIGINT) AS {c}_support
      FROM (SELECT cluster_id, {c}, count(*) AS _cnt,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY count(*) DESC, {c} ASC) AS _rn
            FROM labeled GROUP BY cluster_id, {c})
      WHERE _rn = 1
    )""")
        joins.append(f"JOIN mode_{c} USING (cluster_id)")
        sel += [f"top_{c}", f"{c}_support"]
    body = ",\n    ".join(parts)
    return (
        f"WITH {body}\n    SELECT {', '.join(sel)} FROM "
        + " ".join(joins)
    )


def group_linkage(
    edges: DataFrame,
    members: DataFrame,
    member_id: str,
    group_col: str,
) -> DataFrame:
    """Group-level (household-style) linkage: roll record-pair evidence up
    to GROUP pairs (On et al., ICDE 2007 group linkage; Fu et al.'s
    household linkage). `edges` is any record-pair evidence relation
    (id_a, id_b) — here the LSH-verified near-dup graph; `members` maps
    member_id -> group_col. Returns one row per unordered CROSS-group pair
    with any evidence: edge count, both group sizes, and score_bp =
    floor(10000 * n_edges / min(|A|, |B|)) — an integer-basis-point
    containment-style group score (the "at least this fraction of the
    smaller group has a match" reading; bipartite-matching variants refine
    it but need per-pair weights, which `edges` here doesn't carry).

    100-TB shape: two keyed joins of the edge list against the member map
    (equi, broadcastable when the member map's group dim is small), one
    (group_a, group_b) count aggregate, then a broadcast join of the tiny
    group-size dim. Nothing is quadratic in group size; the edge list is
    consumed once (callers pass the memoized/checkpointed edge source)."""
    m = members.select(
        F.col(member_id).cast("long").alias("_id"),
        F.col(group_col).alias("_g"),
    )
    tagged = (
        edges.select("id_a", "id_b")
        .join(m.select(F.col("_id").alias("id_a"),
                       F.col("_g").alias("_ga")), on="id_a")
        .join(m.select(F.col("_id").alias("id_b"),
                       F.col("_g").alias("_gb")), on="id_b")
        .where(F.col("_ga") != F.col("_gb"))
        .select(
            F.least("_ga", "_gb").alias("group_a"),
            F.greatest("_ga", "_gb").alias("group_b"),
        )
    )
    cnt = tagged.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("n_edges")
    )
    sizes = m.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    return (
        cnt.join(
            F.broadcast(sizes.select(F.col("_g").alias("group_a"),
                                     F.col("_n").alias("n_docs_a"))),
            on="group_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_g").alias("group_b"),
                                     F.col("_n").alias("n_docs_b"))),
            on="group_b",
        )
        .select(
            "group_a", "group_b", "n_edges", "n_docs_a", "n_docs_b",
            F.floor(
                F.lit(10000.0) * F.col("n_edges")
                / F.least("n_docs_a", "n_docs_b")
            ).cast("long").alias("score_bp"),
        )
    )


def group_linkage_sql(
    edges_sql: str,
    members_table: str,
    member_id: str,
    group_col: str,
) -> str:
    """DuckDB twin of group_linkage (same least/greatest normalization,
    same floor-of-double score — 10000*n/min with n, min small integers is
    exact in IEEE doubles, so the floor is bit-identical)."""
    return f"""
    WITH gedges AS ({edges_sql}),
    m AS (SELECT CAST({member_id} AS BIGINT) AS _id, {group_col} AS _g
          FROM {members_table}),
    x AS (SELECT least(ma._g, mb._g) AS group_a,
                 greatest(ma._g, mb._g) AS group_b
          FROM gedges e
          JOIN m ma ON ma._id = e.id_a
          JOIN m mb ON mb._id = e.id_b
          WHERE ma._g <> mb._g),
    cnt AS (SELECT group_a, group_b, CAST(count(*) AS BIGINT) AS n_edges
            FROM x GROUP BY 1, 2),
    sz AS (SELECT _g, CAST(count(*) AS BIGINT) AS _n FROM m GROUP BY 1)
    SELECT c.group_a, c.group_b, c.n_edges,
           sa._n AS n_docs_a, sb._n AS n_docs_b,
           CAST(floor(10000.0 * c.n_edges / least(sa._n, sb._n)) AS BIGINT)
             AS score_bp
    FROM cnt c
    JOIN sz sa ON sa._g = c.group_a
    JOIN sz sb ON sb._g = c.group_b
    """


# ---------------------------------------------------------------------------
# truth discovery: iterative source-reliability voting (Sums / Hubs-style)
# ---------------------------------------------------------------------------

TD_SCALE = 1_000_000  # micro-unit fixed point (same convention as PageRank)
TD_ITERS = 4


def _td_claims(
    df: DataFrame, entity_col: str, value_col: str, src_col: str
) -> DataFrame:
    return (
        df.select(
            F.col(entity_col).cast("long").alias("e"),
            F.col(value_col).cast("string").alias("v"),
            F.col(src_col).cast("string").alias("s"),
        )
        .distinct()
        .localCheckpoint()  # consumed 2x per iteration + the final pass
    )


def _td_fixed_point(
    claims: DataFrame, iterations: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (nclaims(s, n_claims), nscore(e, v, sc), trust(s, t)): `iterations`
    rounds of the Sums/Hubs recurrence in integer micro-units:

      score(e,v)  = sum of trust over claiming sources        (exact sum)
      nscore      = (score * SCALE) div max(score)            (0..SCALE)
      trust(s)    = (sum of nscore over s's claims) div n_claims(s),
                    then renormalized by its max to 0..SCALE

    then ONE final score pass with the converged trust, so the reported
    value scores are consistent with the reported source trust. Integer
    div on non-negative longs == DuckDB `//`; the two scalar maxima per
    round are exact, so every quantity is bit-portable. Bounds: trust
    <= SCALE, so score <= n_sources * SCALE and score * SCALE stays far
    below 2^63 for any plausible source count."""
    nclaims = claims.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_claims")
    )
    trust = nclaims.select(
        "s", F.lit(TD_SCALE).cast("long").alias("t")
    )

    def _scores(tr: DataFrame) -> DataFrame:
        # the round's (e,v) aggregate is the algorithm's state and is
        # consumed twice (scalar max + normalize): materialize it, or the
        # double-consume NESTS across rounds into a 2^iterations plan
        sc = (
            claims.join(tr, on="s")
            .groupBy("e", "v")
            .agg(F.sum("t").cast("long").alias("_sc"))
            .localCheckpoint()
        )
        smax = sc.agg(F.max("_sc").alias("_m"))
        return sc.crossJoin(F.broadcast(smax)).select(
            "e", "v",
            F.expr(f"(_sc * {TD_SCALE}) div _m").cast("long").alias("sc"),
        )

    for _ in range(iterations):
        nsc = _scores(trust)
        traw = (
            claims.join(nsc, on=["e", "v"])
            .groupBy("s")
            .agg(F.sum("sc").cast("long").alias("_ts"))
            .join(nclaims, on="s")
            .select("s", F.expr("_ts div n_claims").cast("long").alias("_tr"))
            .localCheckpoint()  # consumed twice: scalar max + normalize
        )
        tmax = traw.agg(F.max("_tr").alias("_tm"))
        trust = traw.crossJoin(F.broadcast(tmax)).select(
            "s", F.expr(f"(_tr * {TD_SCALE}) div _tm").cast("long").alias("t")
        )
    return nclaims, _scores(trust), trust


def truth_discovery(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    src_col: str,
    iterations: int = TD_ITERS,
) -> DataFrame:
    """-> (entity, value, score_fp, n_values): per entity, the claimed
    value with the highest converged support (ties: lexicographically
    smallest value — total order), its micro-unit score, and how many
    distinct values were claimed. Conflicting multi-source claims resolve
    toward the values backed by RELIABLE sources, where reliability is
    itself learned from agreement (the Sums/TruthFinder family — Yin,
    Han & Yu, TKDE 2008 — in its simplest mutually-recursive form).

    Scale shape: the fixed point touches only aggregates — claims
    (|entities| x |values| x |sources| distinct rows, checkpointed once),
    per-round (e,v) and (s) sums, and two 1-row scalar maxima broadcast
    back — nothing quadratic, no driver-side loops over data."""
    claims = _td_claims(df, entity_col, value_col, src_col)
    _, nscore, _ = _td_fixed_point(claims, iterations)
    win = nscore.groupBy("e").agg(
        F.min(
            F.struct((-F.col("sc")).alias("_ns"), F.col("v").alias("v"))
        ).alias("_w"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    )
    return win.select(
        F.col("e").alias("entity"),
        F.col("_w.v").alias("value"),
        (-F.col("_w._ns")).cast("long").alias("score_fp"),
        "n_values",
    )


def source_trust(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    src_col: str,
    iterations: int = TD_ITERS,
) -> DataFrame:
    """-> (src, trust_fp, n_claims): the converged per-source reliability
    from the same fixed point as truth_discovery (max source = SCALE)."""
    claims = _td_claims(df, entity_col, value_col, src_col)
    nclaims, _, trust = _td_fixed_point(claims, iterations)
    return trust.join(nclaims, on="s").select(
        F.col("s").alias("src"),
        F.col("t").cast("long").alias("trust_fp"),
        "n_claims",
    )


def _td_sql_core(claims_expr: str, iterations: int) -> str:
    """Shared CTE chain: tdc/tdn + one (tds/tdns/tdr/tdt) block per round,
    ending with the final consistent score pass tdnsf."""
    parts = [
        f"tdc AS MATERIALIZED (SELECT DISTINCT e, v, s FROM {claims_expr})",
        "tdn AS (SELECT s, CAST(count(*) AS BIGINT) AS n_claims"
        " FROM tdc GROUP BY s)",
        f"tdt0 AS (SELECT s, CAST({TD_SCALE} AS BIGINT) AS t FROM tdn)",
    ]
    # every multiply-referenced CTE is MATERIALIZED: DuckDB inlines plain
    # CTEs, which would nest the double references into a 2^rounds plan
    # (the SQL face of the same consume-twice trap the Spark side
    # localCheckpoints away)
    prev = "tdt0"
    for i in range(1, iterations + 1):
        parts += [
            f"tds{i} AS MATERIALIZED (SELECT e, v, sum(t) AS sc FROM tdc"
            f" JOIN {prev} USING (s) GROUP BY e, v)",
            f"tdns{i} AS MATERIALIZED (SELECT e, v, (sc * {TD_SCALE})"
            f" // (SELECT max(sc) FROM tds{i}) AS sc FROM tds{i})",
            f"tdr{i} AS MATERIALIZED (SELECT s, (sum(sc) // max(n_claims))"
            f" AS tr FROM tdc JOIN tdns{i} USING (e, v) JOIN tdn USING (s)"
            f" GROUP BY s)",
            f"tdt{i} AS MATERIALIZED (SELECT s, (tr * {TD_SCALE})"
            f" // (SELECT max(tr) FROM tdr{i}) AS t FROM tdr{i})",
        ]
        prev = f"tdt{i}"
    parts += [
        f"tdsf AS MATERIALIZED (SELECT e, v, sum(t) AS sc FROM tdc"
        f" JOIN {prev} USING (s) GROUP BY e, v)",
        f"tdnsf AS (SELECT e, v, CAST((sc * {TD_SCALE})"
        f" // (SELECT max(sc) FROM tdsf) AS BIGINT) AS sc FROM tdsf)",
    ]
    return ",\n    ".join(parts)


def truth_discovery_sql(claims_expr: str, iterations: int = TD_ITERS) -> str:
    """Twin of truth_discovery (row_number over the same total order)."""
    return f"""
    WITH {_td_sql_core(claims_expr, iterations)},
    tdwin AS (
      SELECT e, v, sc,
             row_number() OVER (PARTITION BY e ORDER BY sc DESC, v ASC)
               AS _r,
             count(*) OVER (PARTITION BY e) AS _nv
      FROM tdnsf
    )
    SELECT CAST(e AS BIGINT) AS entity, v AS value,
           CAST(sc AS BIGINT) AS score_fp, CAST(_nv AS BIGINT) AS n_values
    FROM tdwin WHERE _r = 1
    """


def source_trust_sql(claims_expr: str, iterations: int = TD_ITERS) -> str:
    """Twin of source_trust (final trust CTE joined with claim counts)."""
    return f"""
    WITH {_td_sql_core(claims_expr, iterations)}
    SELECT s AS src, CAST(t AS BIGINT) AS trust_fp, n_claims
    FROM tdt{iterations} JOIN tdn USING (s)
    """
