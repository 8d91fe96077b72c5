"""applyInPandasWithState: per-host ledger accumulates across micro-batches."""

import os

import pyspark.sql.functions as F

from go_crawler_spark import fixtures
from go_crawler_spark.streaming.ingest import stream_pages
from go_crawler_spark.streaming.stateful import host_ledger_stream


def test_host_ledger_accumulates(spark, tmp_warehouse):
    pages_dir = os.path.join(tmp_warehouse, "pages")
    pages = fixtures.synth_pages(spark, 80, n_hosts=4, skew=0.3)
    pages.write.mode("overwrite").parquet(pages_dir)

    # small trigger batches force multi-batch state accumulation
    stream = stream_pages(spark, pages_dir, max_files_per_trigger=1)
    ledger = host_ledger_stream(stream)
    q = (
        ledger.writeStream.format("memory")
        .queryName("host_ledger")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # latest ledger row per host == batch-mode totals
    rows = spark.sql(
        """SELECT host, max_by(pages_total, last_ts) AS pages_total,
                  max(pages_total) AS max_pages
           FROM host_ledger GROUP BY host"""
    ).collect()
    got = {r.host: r.max_pages for r in rows}

    expected = {
        r.host: r.cnt
        for r in pages.select(
            F.lower(F.parse_url("url", F.lit("HOST"))).alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == expected
