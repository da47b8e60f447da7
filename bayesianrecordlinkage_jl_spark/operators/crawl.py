"""Crawl-side URL operators: canonicalization and latest-snapshot dedup.

A Common-Crawl-style corpus re-fetches the same logical page under many
surface forms (scheme/host case, default ports, `www.`, tracking params,
fragments) and across many crawls (one row per (url, warc_ts)). Training
pipelines canonicalize first, then keep one snapshot per canonical URL —
otherwise near-dup detection pays for duplicates that string normalization
removes for free. The reference has no URL surface (person records); this
is the input_hint's (url, warc_ts) contract made operational.

`url_normalize` is a pure-Catalyst expression (one structural regex +
anchored cleanups, Java/RE2 common subset — same discipline as the PII
patterns), so it costs nothing at 100 TB: no shuffle, stays inside
whole-stage codegen, and pushes through joins. Normalization steps, in
order (each a documented choice, not RFC 3986 completeness):

  1. drop the fragment
  2. lowercase scheme and authority (path/query case preserved)
  3. strip default ports :80/:443 and a leading `www.`
  4. collapse duplicate slashes in the path; empty path -> "/"
  5. drop `utm_*` tracking params (query order otherwise preserved);
     a query left empty loses its "?"

Dot-segment resolution (`/a/../b`) is intentionally out of scope (regex
cannot do it correctly and crawlers emit resolved URLs).

`latest_snapshot` keeps the newest (ts, id) row per canonical URL as a
struct-MAX aggregation (the mutual_best pattern: shuffles |urls| grouped
rows, never sorts the snapshot table; ties break on id — total order).
The SQL twin is the window form; values are identical because the struct
compare is lexicographic on (ts, id)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import phash, phash_sql

# structural split: scheme://authority path ?query  (fragment stripped first)
_URL_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)"


def url_normalize(u: Column) -> Column:
    u = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.regexp_replace(
        F.regexp_replace(auth, ":(80|443)$", ""), "^www\\.", ""
    )
    path = F.regexp_replace(F.regexp_extract(u, _URL_RE, 3), "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, _URL_RE, 4)
    fq = F.array_join(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(fq != "", F.concat(F.lit("?"), fq)).otherwise(F.lit("")),
    )


def url_normalize_sql(u: str) -> str:
    stripped = f"regexp_replace({u}, '#.*$', '')"
    scheme = f"lower(regexp_extract({stripped}, '{_URL_RE}', 1))"
    auth = f"lower(regexp_extract({stripped}, '{_URL_RE}', 2))"
    host = (
        f"regexp_replace(regexp_replace({auth}, ':(80|443)$', ''),"
        f" '^www\\.', '')"
    )
    path = (
        f"regexp_replace(regexp_extract({stripped}, '{_URL_RE}', 3),"
        f" '/{{2,}}', '/', 'g')"
    )
    path = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    q = f"regexp_extract({stripped}, '{_URL_RE}', 4)"
    fq = (
        f"array_to_string(list_filter(string_split({q}, '&'),"
        f" p -> p != '' AND NOT starts_with(p, 'utm_')), '&')"
    )
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {fq} != '' THEN '?' || {fq} ELSE '' END))"
    )


def latest_snapshot(
    df: DataFrame, url_col: str, ts_col: str, id_col: str
) -> DataFrame:
    """-> (url, ts_epoch, doc_id): the newest snapshot per CANONICAL url
    (ties on ts break to the larger id — total order). One map-side-
    combined struct-MAX aggregate; never sorts or windows the corpus."""
    return (
        df.select(
            url_normalize(F.col(url_col)).alias("url"),
            F.struct(
                F.col(ts_col).cast("long").alias("ts_epoch"),
                F.col(id_col).cast("long").alias("doc_id"),
            ).alias("_s"),
        )
        .groupBy("url")
        .agg(F.max("_s").alias("_s"))
        .select("url", F.col("_s.ts_epoch").alias("ts_epoch"),
                F.col("_s.doc_id").alias("doc_id"))
    )


def latest_snapshot_sql(
    table_expr: str, url_col: str, ts_col: str, id_col: str
) -> str:
    """Window-form twin of the struct-MAX (identical values: the struct
    compare is lexicographic on (ts, id))."""
    return f"""
    SELECT url, ts_epoch, doc_id FROM (
      SELECT {url_normalize_sql(url_col)} AS url,
             CAST({ts_col} AS BIGINT) AS ts_epoch,
             CAST({id_col} AS BIGINT) AS doc_id,
             row_number() OVER (
               PARTITION BY {url_normalize_sql(url_col)}
               ORDER BY CAST({ts_col} AS BIGINT) DESC,
                        CAST({id_col} AS BIGINT) DESC) AS _r
      FROM {table_expr}
    ) WHERE _r = 1
    """


def crawl_delta(
    old: DataFrame, new: DataFrame, url_col: str = "url", fp_col: str = "fp"
) -> DataFrame:
    """old/new snapshot tables (one row per url, with a content
    fingerprint) -> (url, status, old_doc, new_doc) where status is
    'added' | 'removed' | 'changed' | 'unchanged'. Content-addressed:
    a url re-crawled to a byte-identical page (equal fingerprints) is
    'unchanged' even if the winning snapshot row differs. Absent sides
    surface as doc id -1 (a NULL-free schema keeps every column exactly
    hashable across engines).

    One full-outer shuffle join on the unique url key — the minimal plan
    for a two-sided diff; at 100 TB both sides bucket by url and the join
    is co-located."""
    o = old.select(
        F.col(url_col).alias("url"),
        F.col(fp_col).alias("_ofp"),
        F.col("doc_id").alias("old_doc"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.col(fp_col).alias("_nfp"),
        F.col("doc_id").alias("new_doc"),
    )
    j = o.join(n, on="url", how="full_outer")
    status = (
        F.when(F.col("_ofp").isNull(), F.lit("added"))
        .when(F.col("_nfp").isNull(), F.lit("removed"))
        .when(F.col("_ofp") == F.col("_nfp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "url",
        status.alias("status"),
        F.coalesce(F.col("old_doc"), F.lit(-1).cast("long")).alias("old_doc"),
        F.coalesce(F.col("new_doc"), F.lit(-1).cast("long")).alias("new_doc"),
    )


def crawl_delta_sql(old_expr: str, new_expr: str) -> str:
    """old_expr/new_expr: derived tables with (url, fp, doc_id)."""
    return f"""
    SELECT COALESCE(o.url, n.url) AS url,
           CASE WHEN o.url IS NULL THEN 'added'
                WHEN n.url IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           CAST(COALESCE(o.doc_id, -1) AS BIGINT) AS old_doc,
           CAST(COALESCE(n.doc_id, -1) AS BIGINT) AS new_doc
    FROM ({old_expr}) o FULL OUTER JOIN ({new_expr}) n ON o.url = n.url
    """


# --- deterministic messy-URL fixture (catalog use; both engines) -----------
#
# The sandbox documents table has no URL column, so the catalog derives one
# deterministically: ~N_LOGICAL logical pages, each doc_id a re-crawl of
# page (doc_id % N_LOGICAL) with hash-chosen surface noise exercising every
# normalization step.

N_LOGICAL = 150


def messy_url(id_col: str) -> Column:
    idc = F.col(id_col)
    page = idc % N_LOGICAL
    h = phash(F.concat(F.lit("crawl:u:"), idc.cast("string")))
    scheme = F.when(h % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS"))
    www = F.when(h % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    port = F.when(h % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    slash = F.when(h % 7 == 0, F.lit("//")).otherwise(F.lit("/"))
    query = (
        F.when(h % 4 == 0, F.concat(F.lit("?utm_source=x&id="), page.cast("string"), F.lit("&utm_medium=y")))
        .when(h % 4 == 1, F.concat(F.lit("?id="), page.cast("string")))
        .when(h % 4 == 2, F.lit("?utm_campaign=z"))
        .otherwise(F.lit(""))
    )
    frag = F.when(h % 11 == 0, F.lit("#Sec2")).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), www,
        F.lit("Site"), (page % 9).cast("string"), F.lit(".Example.org"),
        port, slash, F.lit("Page/"), page.cast("string"), query, frag,
    )


def messy_url_sql(id_col: str) -> str:
    page = f"({id_col} % {N_LOGICAL})"
    h = phash_sql(f"'crawl:u:' || CAST({id_col} AS VARCHAR)")
    return f"""(
      (CASE WHEN ({h}) % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://'
      || (CASE WHEN ({h}) % 3 = 0 THEN 'WWW.' ELSE '' END)
      || 'Site' || CAST({page} % 9 AS VARCHAR) || '.Example.org'
      || (CASE WHEN ({h}) % 5 = 0 THEN ':443' ELSE '' END)
      || (CASE WHEN ({h}) % 7 = 0 THEN '//' ELSE '/' END)
      || 'Page/' || CAST({page} AS VARCHAR)
      || (CASE WHEN ({h}) % 4 = 0 THEN '?utm_source=x&id=' || CAST({page} AS VARCHAR) || '&utm_medium=y'
               WHEN ({h}) % 4 = 1 THEN '?id=' || CAST({page} AS VARCHAR)
               WHEN ({h}) % 4 = 2 THEN '?utm_campaign=z'
               ELSE '' END)
      || (CASE WHEN ({h}) % 11 = 0 THEN '#Sec2' ELSE '' END)
    )"""


def crawl_ts_epoch(id_col: str) -> Column:
    h = phash(F.concat(F.lit("crawl:t:"), F.col(id_col).cast("string")))
    return (F.lit(1_700_000_000).cast("long") + (h % (86400 * 365))).cast("long")


def crawl_ts_epoch_sql(id_col: str) -> str:
    h = phash_sql(f"'crawl:t:' || CAST({id_col} AS VARCHAR)")
    return f"CAST(1700000000 + (({h}) % {86400 * 365}) AS BIGINT)"


# ---------------------------------------------------------------------------
# SCD2 version history: collapse a snapshot log into validity intervals
# ---------------------------------------------------------------------------

# valid_to of the current (open) version: 9999-12-31T00:00:00Z in epoch
# seconds — a literal shared by both engines, so the column stays NULL-free
SCD2_OPEN_TS = 253402214400


def scd2_intervals(
    df: DataFrame, url_col: str, ts_col: str, fp_col: str, id_col: str
) -> DataFrame:
    """Snapshot log (one row per fetch: url, ts epoch, content fingerprint,
    unique id) -> (url, version_no, fp, valid_from, valid_to, n_snaps,
    is_current): the slowly-changing-dimension type-2 page history. Ordered
    per url by (ts, id) — a total order, so ties are deterministic — a new
    version starts at the first snapshot and whenever the fingerprint
    differs from the previous snapshot's; consecutive identical re-fetches
    collapse into one interval. valid_to is the next version's valid_from
    (half-open [from, to)); the open current version carries the
    SCD2_OPEN_TS sentinel instead of NULL (bit-strict cross-engine hash).

    Scale shape: two windows and one aggregate, ALL partitioned by url —
    no global sort, no self-join; per-url snapshot counts are crawl-
    frequency bounded, so partitions stay balanced even at 10^12 rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("ts", "sid")
    snaps = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(fp_col).cast("long").alias("fp"),
        F.col(id_col).cast("long").alias("sid"),
    ).select(
        "url", "ts", "fp", "sid",
        F.when(
            F.lag("fp").over(w).isNull() | (F.lag("fp").over(w) != F.col("fp")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("_chg"),
    )
    versioned = snaps.select(
        "url", "ts", "fp",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("version_no"),
    )
    runs = versioned.groupBy("url", "version_no").agg(
        F.min("fp").alias("fp"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_snaps"),
    )
    wv = Window.partitionBy("url").orderBy("version_no")
    nxt = F.lead("valid_from").over(wv)
    return runs.select(
        "url", "version_no", "fp", "valid_from",
        F.coalesce(nxt, F.lit(SCD2_OPEN_TS)).cast("long").alias("valid_to"),
        "n_snaps",
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_current"),
    )


def scd2_intervals_sql(
    table_expr: str, url_col: str, ts_col: str, fp_col: str, id_col: str
) -> str:
    """Twin of scd2_intervals (same (ts, id) total order and sentinel)."""
    return f"""
    WITH s2snap AS (
      SELECT {url_col} AS url, CAST({ts_col} AS BIGINT) AS ts,
             CAST({fp_col} AS BIGINT) AS fp, CAST({id_col} AS BIGINT) AS sid
      FROM {table_expr}
    ),
    s2chg AS (
      SELECT url, ts, fp, sid,
             CASE WHEN lag(fp) OVER (PARTITION BY url ORDER BY ts, sid)
                       IS DISTINCT FROM fp THEN 1 ELSE 0 END AS _chg
      FROM s2snap
    ),
    s2ver AS (
      SELECT url, ts, fp,
             sum(_chg) OVER (PARTITION BY url ORDER BY ts, sid
                             ROWS UNBOUNDED PRECEDING) AS version_no
      FROM s2chg
    ),
    s2run AS (
      SELECT url, CAST(version_no AS BIGINT) AS version_no,
             min(fp) AS fp, min(ts) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_snaps
      FROM s2ver GROUP BY url, version_no
    )
    SELECT url, version_no, fp, valid_from,
           CAST(coalesce(
             lead(valid_from) OVER (PARTITION BY url ORDER BY version_no),
             {SCD2_OPEN_TS}) AS BIGINT) AS valid_to,
           n_snaps,
           CAST(CASE WHEN lead(valid_from) OVER (
                  PARTITION BY url ORDER BY version_no) IS NULL
                THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM s2run
    """
