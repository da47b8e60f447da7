"""Structured Streaming ingest for incremental crawls.

The reference has no streaming (SURVEY.md §2.9); at web scale the pages
table grows continuously, so the engine needs an incremental path:

  readStream(parquet dir) -> extraction + text features (same Catalyst
  expressions as batch — one code path) -> watermarked dedup on url ->
  append to the staging table the batch pipeline consumes.

Micro-batch near-dup flagging joins each batch's LSH band keys against the
(static, periodically refreshed) corpus band index — a stream-static join,
which Spark executes without state buildup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions import text as T
from ..sources.pages import extract_text

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_page_stream(spark: SparkSession, input_dir: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def enrich(stream: DataFrame) -> DataFrame:
    """Extraction + features — identical expressions to the batch path."""
    return (
        stream.withColumn("text", extract_text(F.col("html")))
        .withColumn("n_tokens", T.token_count(F.col("text")))
        .withColumn("fingerprint", T.doc_fingerprint(F.col("text")))
        .withColumn("simhash", T.simhash(F.col("text")))
    )


def dedup_on_url(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop re-crawls of the same url within the watermark horizon
    (stateful streaming dedup; late data beyond the watermark is admitted
    to the staging table and handled by the batch exact-dedup pass)."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicates(["url"])


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> StreamingQuery:
    enriched = dedup_on_url(enrich(read_page_stream(spark, input_dir)), watermark)
    return (
        enriched.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def dedup_on_fingerprint(
    stream: DataFrame,
    watermark: str = "1 hour",
    state_timeout_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): emit
    only the FIRST page seen per content fingerprint — streaming exact
    near-dup suppression by content, beyond what dropDuplicates offers
    (which keys on a column but cannot carry custom per-key state or
    per-key emission logic).

    State per fingerprint: (first_url, n_dups_suppressed). Re-crawls and
    mirrors of already-seen content are counted into state and dropped.
    State expires via processing-time timeout so the store is bounded; the
    batch exact-dedup pass catches anything beyond the horizon (same
    tiered design as dedup_on_url).

    Input must carry (fingerprint, url, warc_ts, text, lang).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "fingerprint string, url string, warc_ts timestamp, "
        "text string, lang string, n_dups long"
    )
    state_schema = "first_url string, n_dups long"

    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _fingerprint_reducer(state_timeout_ms),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def _fingerprint_reducer(state_timeout_ms: int):
    """The applyInPandasWithState handler for dedup_on_fingerprint —
    module-level factory so the timeout path is unit-testable."""
    import pandas as pd

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            # Timeout invocation: Spark passes an empty batch iterator; the
            # only correct move is to expire the state (this is what bounds
            # the store) and emit nothing.
            state.remove()
            return iter(())
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["warc_ts", "url"], ignore_index=True)
        if state.exists:
            first_url, n_dups = state.get
            n_dups += len(rows)
            state.update((first_url, n_dups))
            state.setTimeoutDuration(state_timeout_ms)
            return iter(())  # all duplicates of already-emitted content
        first = rows.iloc[:1].copy()
        first["n_dups"] = len(rows) - 1
        state.update((str(first["url"].iloc[0]), int(len(rows) - 1)))
        state.setTimeoutDuration(state_timeout_ms)
        return iter(
            [first[["fingerprint", "url", "warc_ts", "text", "lang", "n_dups"]]]
        )

    return fn


def windowed_crawl_stats(stream: DataFrame, window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window crawl stats by lang (late data handled)."""
    return (
        stream.withWatermark("warc_ts", window)
        .groupBy(F.window("warc_ts", window).getField("start").alias("win_start"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum("n_tokens").alias("n_tokens"))
    )
