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


def test_streaming_politeness_gate_never_exceeds_budget(spark, tmp_warehouse):
    """The stateful gate enforces the per-host budget ACROSS micro-batches:
    admitted count per host == min(budget, available), seq is dense, no
    URL admitted twice — equal to the batch politeness oracle's volume."""
    from go_crawler_spark.streaming.stateful import politeness_gate_stream

    pages_dir = os.path.join(tmp_warehouse, "pages_gate")
    pages = fixtures.synth_pages(spark, 120, n_hosts=5, skew=0.4)
    pages.write.mode("overwrite").parquet(pages_dir)

    budget = 7
    stream = stream_pages(spark, pages_dir, max_files_per_trigger=1)
    gated = politeness_gate_stream(stream, default_budget=budget)
    q = (
        gated.writeStream.format("memory")
        .queryName("gate_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ckpt_gate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out = spark.sql("SELECT * FROM gate_out").collect()
    per_host_avail = {
        r.host: r.cnt
        for r in pages.select(
            F.lower(F.parse_url("url", F.lit("HOST"))).alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert set(by_host) == set(per_host_avail)
    for host, rows in by_host.items():
        # batch-oracle volume: min(budget, available) — never exceeded
        assert len(rows) == min(budget, per_host_avail[host])
        assert sorted(r.seq for r in rows) == list(range(len(rows)))  # dense
        assert len({r.url for r in rows}) == len(rows)  # no double admission
