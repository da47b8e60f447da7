"""End-to-end record-linkage pipeline: blocking -> FS scoring -> one-to-one
-> transitive clustering, with optional stage checkpoints for resume.

Lifecycle mirrors SURVEY.md §3.1-3.3 (ComparisonSummary build, penalized-
likelihood MAP path, post-hoc-block resolution), re-expressed Spark-first:

  pages --extract--> docs --LSH/key blocking--> candidate ids
        --join fields--> pairs --comparators--> comparison vectors
        --groupBy dedup--> distinct vectors --driver EM--> (pM, pU)
        --broadcast weights join--> weighted pairs --filter w>penalty-->
        edges --large-star/small-star CC--> block_id --applyInPandas
        Hungarian/greedy--> links --CC--> clusters

Node ids are the portable 60-bit hash of url (deterministic, distributed id
assignment with no global sort; collision probability ~n^2/2^60).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import comparators as C
from ..functions.text import phash
from ..operators import assignment, blocking, em
from ..operators.comparison_summary import ComparisonSummary
from ..operators.connected_components import (
    components_with_isolated,
    connected_components,
)
from ..sources.checkpoint import StageStore
from ..sources.pages import extract_text


@dataclass
class LinkageConfig:
    # weight threshold; "bayes" = -logit(EM match prevalence), i.e. link
    # iff posterior match probability > 1/2 (the reference's Bayes-estimate
    # rule, README.md:148-151, in MAP form)
    penalty: float | str = 2.0
    n_bands: int = 6
    rows_per_band: int = 1
    shingle_k: int = 3
    lev_prefix: int = 80
    # salted composite-key blocking (lang / host): supplies the non-match
    # background EM needs for identifiability AND a recall backstop; salt
    # caps block size (skew control)
    key_block_max_rows: int = 64
    # per-block solver: hungarian / greedy / auction (MAP matching), or
    # "exact_posterior" = the reference's Bayes estimate (link iff exact
    # posterior marginal > 1/2, enumerated per block; blocks above
    # exact_max_block_pairs fall back to Hungarian MAP)
    method: str = "hungarian"
    exact_max_block_pairs: int = 10
    use_em: bool = True
    em_max_iter: int = 200
    # cap on pairs per resolution block; oversized components are re-clustered
    # at rising thresholds (iterative_bipartite_cluster2 analog) so no block
    # can blow up the per-block solver at scale. None disables.
    max_block_pairs: int | None = 10_000
    block_split_incr: float = 0.5
    checkpoint_dir: str | None = None

    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}


# comparison fields: (name, weight-kind) — must stay in lockstep with
# _field_exprs below.
FIELDS: list[tuple[str, str]] = [
    ("g_lev", "lev"),
    ("g_jac", "jac"),
    ("g_lang", "exact"),
]
NLEVELS = {"g_lev": 4, "g_jac": 4, "g_lang": 2}


def _field_exprs(cfg: LinkageConfig) -> dict:
    return {
        "g_lev": C.lev_ord(
            F.substring("text_a", 1, cfg.lev_prefix),
            F.substring("text_b", 1, cfg.lev_prefix),
        ),
        "g_jac": C.token_jaccard_ord(F.col("text_a"), F.col("text_b")),
        "g_lang": C.bool_ord(F.col("lang_a"), F.col("lang_b")),
    }


def _score_vectors(spark: SparkSession, pairs: DataFrame, cfg: LinkageConfig) -> DataFrame:
    """Comparison vectors with each comparator kernel evaluated exactly
    once per pair: raw measures (banded levenshtein on per-doc prefixes,
    token-set intersect on per-doc distinct-token arrays) in one pre-shuffle
    projection, pair-key aggregate barrier, then integer bin CASEs. The
    result is localCheckpointed because both the distinct-vector dedup and
    the vec_id attach branch from it (without materialization each branch
    would re-run the comparators). Value-identical to _field_exprs."""
    raw = pairs.select(
        "id_a",
        "id_b",
        F.levenshtein("t_pre_a", "t_pre_b", cfg.lev_prefix // 2).alias("_lev"),
        F.greatest(F.length("t_pre_a"), F.length("t_pre_b")).alias("_mx"),
        F.size(F.array_intersect("toks_a", "toks_b")).alias("_i"),
        (F.size("toks_a") + F.size("toks_b")).alias("_nab"),
        "lang_a",
        "lang_b",
    )
    rawcols = ["_lev", "_mx", "_i", "_nab", "lang_a", "lang_b"]
    agg = raw.groupBy("id_a", "id_b").agg(*[F.first(c).alias(c) for c in rawcols])
    return agg.select(
        "id_a",
        "id_b",
        C.lev_ord_from_raw(F.col("_lev"), F.col("_mx")).alias("g_lev"),
        C.token_jaccard_ord_from_counts(
            F.col("_i"), F.col("_nab") - F.col("_i")
        ).alias("g_jac"),
        C.bool_ord(F.col("lang_a"), F.col("lang_b")).alias("g_lang"),
    ).localCheckpoint()


def _resolve_penalty(penalty: float | str, params: em.FSParams | None) -> float:
    """penalty="bayes" -> -logit(EM match prevalence): link iff posterior
    match probability > 1/2 (the reference's Bayes-estimate rule,
    /root/reference/README.md:148-151, in MAP form)."""
    if penalty == "bayes":
        import math

        p_hat = min(max(params.p if params is not None else 0.5, 1e-12), 1 - 1e-12)
        return math.log((1.0 - p_hat) / p_hat)
    return float(penalty)


@dataclass
class LinkageResult:
    docs: DataFrame
    pairs: DataFrame  # scored candidate pairs with w
    links: DataFrame  # one-to-one matches (id_a, id_b, w, block_id)
    clusters: DataFrame  # (url, node, cluster_id)
    comps: DataFrame  # (node, component, capped) — the block graph
    params: em.FSParams | None
    stage_counters: dict = field(default_factory=dict)
    _capped_nodes: int | None = field(default=None, repr=False)

    @property
    def counters(self) -> dict:
        """Stage counters + the unsplittable-hot-block flag. capped_nodes is
        counted lazily on first access (it needs a Spark action over comps;
        callers that ignore counters pay nothing)."""
        if self._capped_nodes is None:
            self._capped_nodes = self.comps.where(F.col("capped")).count()
        return {"capped_nodes": self._capped_nodes, **self.stage_counters}


def run_linkage(
    spark: SparkSession, pages: DataFrame, cfg: LinkageConfig | None = None
) -> LinkageResult:
    cfg = cfg or LinkageConfig()
    store = StageStore(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    ccfg = cfg.as_dict()

    def stage(name: str, fn):
        if store is None:
            return fn()
        df, _resumed = store.load_or_run(spark, name, ccfg, fn)
        return df

    # -- extraction: html -> text (byte-identical contract) ----------------
    def _docs() -> DataFrame:
        d = pages.withColumn("text", extract_text(F.col("html")))
        return d.select(
            phash(F.col("url")).alias("node"),
            "url",
            "text",
            "lang",
            F.regexp_extract(F.col("url"), "^https?://([^/]+)/", 1).alias("host"),
        )

    docs = stage("docs", _docs)

    # -- blocking: MinHash-LSH bands ∪ salted composite keys ----------------
    # LSH finds near-duplicate text across hosts (recall channel); salted
    # lang/host equi-keys bound block sizes and provide the non-match
    # background that makes EM identifiable (precision channel).
    def _cand() -> DataFrame:
        lsh = blocking.lsh_blocking(
            docs,
            id_col="node",
            text_col="text",
            n_bands=cfg.n_bands,
            rows_per_band=cfg.rows_per_band,
            shingle_k=cfg.shingle_k,
        ).select("id_a", "id_b")
        keyed = []
        for key in (["lang"], ["host"]):
            salted = blocking.salt_hot_keys(
                docs, "node", key, max_block_rows=cfg.key_block_max_rows
            )
            keyed.append(
                blocking.key_blocking(
                    salted, "node", key + ["_salt"]
                ).select("id_a", "id_b")
            )
        out = lsh
        for k in keyed:
            out = out.unionByName(k)
        return out.distinct()

    cand = stage("candidates", _cand)

    # -- fetch fields + comparison vectors ---------------------------------
    def _pairs() -> DataFrame:
        # per-document derived columns (prefix + distinct tokens) computed
        # ONCE below the field joins — only narrow arrays cross the shuffle
        proj = docs.select(
            "node",
            "lang",
            F.substring("text", 1, cfg.lev_prefix).alias("t_pre"),
            F.array_distinct(F.split("text", " ")).alias("toks"),
        )
        fa = proj.select(
            F.col("node").alias("id_a"),
            F.col("t_pre").alias("t_pre_a"),
            F.col("toks").alias("toks_a"),
            F.col("lang").alias("lang_a"),
        )
        fb = proj.select(
            F.col("node").alias("id_b"),
            F.col("t_pre").alias("t_pre_b"),
            F.col("toks").alias("toks_b"),
            F.col("lang").alias("lang_b"),
        )
        n_part = spark.sparkContext.defaultParallelism * 2
        # pairs are byte-small but comparator-heavy per row; repartition
        # UPSTREAM of the field joins (downstream weight filters get pushed
        # into the join stage, so a post-join repartition would be bypassed)
        return (
            cand.repartition(n_part, "id_a", "id_b")
            .join(fa, "id_a")
            .join(fb, "id_b")
        )

    vectors = _score_vectors(spark, _pairs(), cfg)
    summary = ComparisonSummary.build(
        vectors, {g: F.col(g) for g, _ in FIELDS}, NLEVELS
    )
    gcols = summary.gcols
    dvecs_pd = summary.dvecs_pd()

    # -- parameter estimation on aggregated counts (driver numpy) ----------
    if cfg.use_em and len(dvecs_pd) > 0:
        params = em.estimate_em(dvecs_pd, gcols, NLEVELS, max_iter=cfg.em_max_iter)
    else:
        params = None

    if params is not None:
        wpd = em.weights_vector(dvecs_pd, gcols, params)
    else:
        from ..functions import weights as W

        wpd = dvecs_pd[["vec_id"]].copy()
        w = None
        for g, kind in FIELDS:
            lr = W.level_log_ratios(kind)
            contrib = dvecs_pd[g].map(lambda lvl: lr.get(int(lvl), 0.0))
            w = contrib if w is None else w + contrib
        wpd["w"] = w

    penalty = _resolve_penalty(cfg.penalty, params)
    wdf = spark.createDataFrame(wpd, schema="vec_id long, w double")
    scored = summary.pairs.join(F.broadcast(wdf), on="vec_id", how="left")

    # -- positive-weight graph -> connected components -> block ids --------
    # size-capped variant splits hot components at rising thresholds
    # (skew control for the per-block solver)
    def _blocks() -> DataFrame:
        if cfg.max_block_pairs is not None:
            from ..operators.connected_components import size_capped_components

            wedges = scored.where(F.col("w") > penalty).select(
                F.col("id_a").alias("src"),
                F.col("id_b").alias("dst"),
                (F.col("w") - F.lit(penalty)).alias("w"),
            )
            return size_capped_components(
                wedges, cfg.max_block_pairs, 0.0, cfg.block_split_incr
            ).select("node", "component", "capped")
        edges = scored.where(F.col("w") > penalty).select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        return connected_components(edges).withColumn("capped", F.lit(False))

    comps = stage("components", _blocks)

    blocked = (
        scored.where(F.col("w") > penalty)
        .join(comps.withColumnRenamed("node", "id_a"), on="id_a")
        .withColumnRenamed("component", "block_id")
        .withColumn("w", F.col("w") - F.lit(penalty))  # shrink_weights
    )

    # -- per-block one-to-one resolution ------------------------------------
    def _links() -> DataFrame:
        if cfg.method == "exact_posterior":
            # Bayes estimate (reference README.md:148-151): link iff the
            # EXACT posterior marginal over the block's matchings exceeds
            # 1/2 — enumerated where the block is small enough, Hungarian
            # MAP elsewhere. One-to-one by construction: two conflicting
            # pairs are mutually exclusive events over matchings, so their
            # marginals sum to <= 1 and cannot both exceed 1/2.
            from ..operators.mcmc import exact_posterior_links

            bp = blocked.select(
                "id_a", "id_b", F.exp("w").alias("r"), "block_id"
            ).localCheckpoint()
            small_ids = (
                bp.groupBy("block_id")
                .agg(F.count(F.lit(1)).alias("_np"))
                .where(F.col("_np") <= cfg.exact_max_block_pairs)
                .select("block_id")
            )
            exact = exact_posterior_links(
                bp, max_pairs_per_block=cfg.exact_max_block_pairs
            ).select("id_a", "id_b", "block_id")
            exact_w = exact.join(
                blocked.select("id_a", "id_b", "w"), on=["id_a", "id_b"]
            ).select("id_a", "id_b", "w", "block_id")
            big = blocked.select("id_a", "id_b", "w", "block_id").join(
                small_ids, on="block_id", how="left_anti"
            )
            solved = assignment.one_to_one(big, method="hungarian")
            return solved.unionByName(exact_w.select(*solved.columns))
        return assignment.one_to_one(
            blocked.select("id_a", "id_b", "w", "block_id"), method=cfg.method
        )

    links = stage("links", _links)

    # -- transitive clustering: CC of the positive-weight graph -------------
    # (the links table is the one-to-one precision artifact; clusters are the
    # transitive closure of above-penalty evidence, exactly the reference's
    # post-hoc-block construction, /root/reference/src/posthocblocks.jl:89-116.
    # For two-file linkage where clusters ARE the matching, see
    # link_two_sources below.)
    def _clusters() -> DataFrame:
        return docs.select("node", "url").join(comps, on="node", how="left").select(
            "url",
            "node",
            F.coalesce("component", F.col("node")).alias("cluster_id"),
        )

    clusters = stage("clusters", _clusters)

    return LinkageResult(
        docs=docs,
        pairs=scored,
        links=links,
        clusters=clusters,
        comps=comps,
        params=params,
        stage_counters=store.counters() if store else {},
    )


def link_two_sources(
    spark: SparkSession,
    df_a: DataFrame,
    df_b: DataFrame,
    field_exprs: dict,
    field_kinds: list[tuple[str, str]],
    nlevels: dict[str, int],
    id_col: str = "rec_id",
    block_cols: list[str] | None = None,
    penalty: float | str = 0.0,
    use_em: bool = True,
    method: str = "hungarian",
) -> tuple[DataFrame, em.FSParams | None]:
    """Bipartite two-file linkage — the direct reference analog
    (vignette lifecycle, /root/reference/vignette/example.jl): candidate
    pairs (optionally key-blocked), comparison-vector dedup, EM m/u, FS
    weights, CC decomposition, per-block one-to-one. Here the matching IS
    the entity-cluster output (each record appears in at most one link).

    df_a/df_b must expose id_col (string/long) plus the columns consumed by
    field_exprs with _a/_b suffixes. Returns (links, params).

    penalty="bayes" sets the threshold to -logit(p_hat) from the EM match
    prevalence — link iff posterior match probability > 1/2, the
    reference's Bayes-estimate rule (README.md:148-151) in MAP form.
    """
    a = df_a.select(
        phash(F.col(id_col).cast("string")).alias("id_a"),
        F.col(id_col).alias("rid_a"),
        *[F.col(c).alias(f"{c}_a") for c in df_a.columns if c != id_col],
    )
    b = df_b.select(
        phash(F.concat(F.lit("B:"), F.col(id_col).cast("string"))).alias("id_b"),
        F.col(id_col).alias("rid_b"),
        *[F.col(c).alias(f"{c}_b") for c in df_b.columns if c != id_col],
    )
    if block_cols:
        cond = [F.col(f"{c}_a") == F.col(f"{c}_b") for c in block_cols]
        pairs = a.join(b, on=cond, how="inner")
    else:
        pairs = a.crossJoin(b)  # only sane for vignette-scale fixtures

    summary = ComparisonSummary.build(pairs, field_exprs, nlevels)
    dvecs_pd = summary.dvecs_pd()
    params = (
        em.estimate_em(dvecs_pd, summary.gcols, nlevels) if use_em else None
    )
    if params is not None:
        wpd = em.weights_vector(dvecs_pd, summary.gcols, params)
    else:
        from ..functions import weights as W

        w = None
        for g, kind in field_kinds:
            lr = W.level_log_ratios(kind)
            contrib = dvecs_pd[g].map(lambda lvl: lr.get(int(lvl), 0.0))
            w = contrib if w is None else w + contrib
        wpd = pd.DataFrame({"vec_id": dvecs_pd["vec_id"], "w": w})
    penalty = _resolve_penalty(penalty, params)
    wdf = spark.createDataFrame(wpd, schema="vec_id long, w double")
    scored = summary.pairs.join(F.broadcast(wdf), on="vec_id", how="left")
    pos = scored.where(F.col("w") > penalty)
    comps = connected_components(
        pos.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    blocked = (
        pos.join(comps.withColumnRenamed("node", "id_a"), on="id_a")
        .withColumnRenamed("component", "block_id")
        .withColumn("w", F.col("w") - F.lit(penalty))
    )
    links = assignment.one_to_one(
        blocked.select("id_a", "id_b", "w", "block_id"), method=method
    )
    # map hashed node ids back to record ids
    links = (
        links.join(a.select("id_a", "rid_a"), on="id_a")
        .join(b.select("id_b", "rid_b"), on="id_b")
        .select("rid_a", "rid_b", "w", "block_id")
    )
    return links, params


def pairwise_f1(clusters: DataFrame, truth_pairs: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of predicted clusters vs labeled pairs.

    truth_pairs: (url_a, url_b, is_match) with url_a < url_b (positives).
    Predicted pairs: all within-cluster url pairs (url_a < url_b).
    """
    a = clusters.select(F.col("url").alias("url_a"), F.col("cluster_id").alias("ca"))
    b = clusters.select(F.col("url").alias("url_b"), F.col("cluster_id").alias("cb"))
    pred = (
        a.join(b, a["ca"] == b["cb"])
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
    )
    truth = truth_pairs.where("is_match").select("url_a", "url_b")
    tp = pred.join(truth, ["url_a", "url_b"], "inner").count()
    np_ = pred.count()
    nt = truth.count()
    precision = tp / np_ if np_ else 1.0
    recall = tp / nt if nt else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "pred": np_, "truth": nt, "precision": precision, "recall": recall, "f1": f1}
