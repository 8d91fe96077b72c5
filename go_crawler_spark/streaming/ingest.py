"""Structured Streaming ingestion: continuous page feed -> engine tables.

The reference is a periodic batch pass (service/crawler/crawler.go:131-148
re-runs every UpdateInterval) — there is no true stream in it.  This module
adds the streaming shape a production corpus pipeline has anyway: pages
arriving continuously (e.g. fetcher fleet output landing as parquet files)
are extracted and appended to documents/url_seen incrementally, with
event-time watermarked dedup and windowed throughput metrics.

* ``stream_pages``       — file-source readStream over a pages directory
  (schema enforced; new files picked up per micro-batch).
* ``streaming_ingest``   — extraction (same byte-exact UDF as batch) +
  watermarked ``dropDuplicates`` on url_hash, sunk via ``foreachBatch``
  into the lakehouse (append-only, MoR-reconciled like the batch path).
* ``windowed_fetch_metrics`` — 1-minute tumbling-window counts by host
  with a watermark for late data: the reference's per-pass
  processed_link_count log line, as a live aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from go_crawler_spark import tables
from go_crawler_spark.crawl import _with_url_cols
from go_crawler_spark.functions.textops import udf_extract_page
from go_crawler_spark.lakehouse import Lakehouse

PAGES_SCHEMA = tables.PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(pages_stream: DataFrame) -> DataFrame:
    """Same extraction plan as the batch crawl, on a streaming DF."""
    return (
        _with_url_cols(pages_stream)
        .withColumn("_ex", udf_extract_page("url", "html"))
        .select(
            "url_hash",
            "url",
            "host",
            F.col("warc_ts"),
            F.col("_ex.title").alias("title"),
            F.col("_ex.text").alias("text"),
        )
    )


def streaming_ingest(
    spark: SparkSession,
    pages_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    watermark: str | None = None,
    max_files_per_trigger: int = 8,
    trigger_interval: str | None = None,
):
    """Continuous documents ingestion with URL dedup.

    ``trigger_interval`` (e.g. ``"30 seconds"``) keeps the query RUNNING,
    picking up files as they land — the continuous-deployment mode.  The
    default ``None`` uses ``availableNow``: drain what exists, then stop
    (the batch-catchup/test mode — files arriving after start are NOT
    ingested until the next invocation).

    URL dedup is an ALL-TIME set (the reference's UNIQUE url constraint,
    migrations/01:3), so the default dedups with unbounded state and NO
    watermark: a watermark + dropDuplicates would silently drop any row
    whose event time lags the watermark across micro-batches, and since
    the event-time column is not part of the dedup key the watermark
    would never evict dedup state anyway — worst of both.  Pass a
    ``watermark`` duration to opt into bounded-lateness dedup instead
    (``dropDuplicatesWithinWatermark``: duplicates suppressed within the
    lateness bound, state evicted after it — rows later than the bound
    may re-index, which the MoR latest-version reconcile tolerates).

    Returns the StreamingQuery; callers stop it / processAllAvailable().
    """
    lake = Lakehouse(spark, warehouse)
    stream = extract_stream(
        stream_pages(spark, pages_dir, max_files_per_trigger)
    )
    if watermark is None:
        extracted = stream.dropDuplicates(["url_hash"])
    else:
        extracted = stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
            ["url_hash"]
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            "url_hash",
            "url",
            "title",
            "text",
            F.col("warc_ts").alias("indexed_at"),
            F.lit(None).cast("double").alias("pagerank"),
        )
        lake.append(tables.DOCUMENTS, docs)
        lake.append(
            tables.URL_SEEN,
            batch_df.select(
                "url_hash", "url", F.col("warc_ts").alias("retrieved_at")
            ),
        )

    writer = extracted.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_fetch_metrics(
    pages_stream: DataFrame, window: str = "1 minute", watermark: str = "5 minutes"
) -> DataFrame:
    """Event-time tumbling-window fetch counts per host (late-data safe)."""
    return (
        _with_url_cols(pages_stream)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("host"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("bytes_fetched"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_pages",
            "bytes_fetched",
        )
    )
