"""WARC source round-trip + Structured Streaming ingestion."""

import os
from datetime import datetime, timezone

import pyspark.sql.functions as F

from go_crawler_spark import fixtures, tables
from go_crawler_spark.lakehouse import Lakehouse
from go_crawler_spark.sources import warc
from go_crawler_spark.streaming import ingest

TS = datetime(2025, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _rows(n=5):
    return [
        {
            "url": f"http://w{i}.test/p/{i}",
            "warc_ts": TS,
            "html": f"<html><title>T{i}</title><body>doc {i} &amp; more</body></html>".encode(),
            "status": 200 if i != 3 else 404,
            "content_type": "text/html; charset=utf-8",
        }
        for i in range(n)
    ]


def test_warc_roundtrip(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "part0.warc")
    warc.write_warc(_rows(), path)
    df = warc.read_warc(spark, path)
    got = {r.url: r for r in df.collect()}
    assert len(got) == 5
    r2 = got["http://w2.test/p/2"]
    assert bytes(r2.html) == _rows()[2]["html"]
    assert r2.status == 200 and "html" in r2.content_type
    assert got["http://w3.test/p/3"].status == 404
    assert r2.warc_ts.replace(tzinfo=timezone.utc) == TS


def test_warc_gzip_and_crawlable(spark, tmp_warehouse):
    """Gz WARC reads identically and feeds the crawl's prepare_pages."""
    from go_crawler_spark.crawl import prepare_pages

    path = os.path.join(tmp_warehouse, "part0.warc.gz")
    warc.write_warc(_rows(), path, compress=True)
    df = warc.read_warc(spark, path)
    assert df.count() == 5
    prepared = prepare_pages(df.withColumn("text", F.lit(None).cast("string"))
                             .withColumn("lang", F.lit("en")))
    assert "url_hash" in prepared.columns


def test_streaming_ingest(spark, tmp_warehouse):
    pages_dir = os.path.join(tmp_warehouse, "pages_stream")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    wh = os.path.join(tmp_warehouse, "wh")

    pages = fixtures.synth_pages(spark, 50, n_hosts=5, skew=0.2)
    pages.write.mode("overwrite").parquet(pages_dir)

    q = ingest.streaming_ingest(spark, pages_dir, wh, ckpt)
    q.awaitTermination(120)

    lake = Lakehouse(spark, wh)
    docs = lake.read(tables.DOCUMENTS)
    seen = lake.read(tables.URL_SEEN)
    assert docs.count() == 50  # one doc per distinct url
    assert seen.count() == 50
    # extraction parity with the batch UDF: expected-text column matches
    joined = docs.join(
        pages.select("url", F.col("text").alias("exp_text")), "url"
    )
    assert joined.where(F.col("text") != F.col("exp_text")).count() == 0

    # restart with availableNow and no new files -> no duplicates
    q2 = ingest.streaming_ingest(spark, pages_dir, wh, ckpt)
    q2.awaitTermination(60)
    assert lake.read(tables.DOCUMENTS).count() == 50


def test_windowed_metrics_stream(spark, tmp_warehouse):
    pages_dir = os.path.join(tmp_warehouse, "pages_stream2")
    fixtures.synth_pages(spark, 40, n_hosts=4, skew=0.2).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    stream = ingest.stream_pages(spark, pages_dir)
    metrics = ingest.windowed_fetch_metrics(stream, window="1 hour")
    q = (
        metrics.writeStream.format("memory")
        .queryName("fetch_metrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM fetch_metrics").collect()
    # append-mode emits finalized windows only; watermark may hold the last
    # window open — accept either but the schema and grouping must be sane
    for r in rows:
        assert r.n_pages > 0 and r.host.startswith("host")
