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


def test_streaming_ingest_multibatch_out_of_order(spark, tmp_warehouse):
    """URL dedup must be all-time across micro-batches: rows whose warc_ts
    is older than earlier batches' event times (late files) must still be
    indexed, and re-deliveries of the same url must not duplicate.

    Regression: a watermark before dropDuplicates silently dropped any
    row older than the watermark once ingestion spanned multiple
    triggers (maxFilesPerTrigger=1 here forces one file per batch)."""
    import pandas as pd
    from go_crawler_spark.tables import PAGES_SCHEMA

    pages_dir = os.path.join(tmp_warehouse, "pages_ooo")
    ckpt = os.path.join(tmp_warehouse, "ckpt_ooo")
    wh = os.path.join(tmp_warehouse, "wh_ooo")

    def row(i: int, ts: str) -> dict:
        return {
            "url": f"http://host0.test/p/{i}",
            "warc_ts": pd.Timestamp(ts, tz="UTC"),
            "html": f"<html><body><p>page {i}</p></body></html>".encode(),
            "text": f"page {i}",
            "lang": "en",
            "status": 200,
            "content_type": "text/html",
        }

    # file 0: newest timestamps; file 1: 2 days OLDER (late data) + one
    # duplicate url from file 0 — written as separate files so each is
    # its own micro-batch (alphabetical listing order: f0 then f1).
    f0 = [row(0, "2025-01-03 12:00:00"), row(1, "2025-01-03 13:00:00")]
    f1 = [row(2, "2025-01-01 00:30:00"), row(0, "2025-01-01 00:00:00")]
    for name, rows in [("f0", f0), ("f1", f1)]:
        spark.createDataFrame(pd.DataFrame(rows), PAGES_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(pages_dir, name))

    q = ingest.streaming_ingest(
        spark, pages_dir + "/*", wh, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    lake = Lakehouse(spark, wh)
    docs = lake.read(tables.DOCUMENTS)
    urls = sorted(r.url for r in docs.select("url").collect())
    # all three distinct urls present (the late file was NOT dropped),
    # the duplicate url 0 indexed exactly once
    assert urls == [f"http://host0.test/p/{i}" for i in (0, 1, 2)]


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


def test_warc_parser_resyncs_after_malformed_record(tmp_path):
    """One bad record (wrong Content-Length / non-numeric length) must
    cost only itself — the parser resyncs to the next record header
    instead of silently dropping the rest of the segment."""
    from go_crawler_spark.sources.warc import _parse_warc_stream

    def rec(url, body, length=None, ltext=None):
        http = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        n = ltext if ltext is not None else str(length if length is not None else len(http))
        return (f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
                f"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: {n}\r\n"
                "Content-Type: application/http; msgtype=response\r\n\r\n"
                ).encode() + http + b"\r\n\r\n"

    good1 = rec("http://a.test/", b"<p>one</p>")
    bad_len = rec("http://bad.test/", b"<p>bad</p>", length=3)   # truncating frame
    bad_num = rec("http://nan.test/", b"<p>nan</p>", ltext="abc")  # non-numeric
    good2 = rec("http://b.test/", b"<p>two</p>")
    got = [r["url"] for r in _parse_warc_stream(good1 + bad_len + good2 + bad_num + good2, "f")]
    # both good trailing records recovered; the malformed ones cost themselves
    assert got[0] == "http://a.test/"
    assert got.count("http://b.test/") == 2


def test_streaming_corpus_prepare_matches_batch(spark, tmp_path):
    """The streamable funnel prefix (gate -> exact dedup -> split) over
    a multi-file document stream yields the same survivor TEXT set as
    the batch stages (stream keeps first-arrival per 128-bit hash; batch
    keeps min-id — same hashes either way) and identical split
    assignment (subset-stable hash split)."""
    import pyspark.sql.functions as F

    from go_crawler_spark.functions.corpus import CorpusConfig, prepare_training_corpus
    from go_crawler_spark.functions.dedup import exact_dedup
    from go_crawler_spark.streaming.corpus import streaming_corpus_prepare

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(src)

    cfg = CorpusConfig(min_tokens=5, min_quality=0.0,
                       split_weights={"train": 0.9, "val": 0.1})
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_corpus_prepare(stream, cfg)
    q = (out.writeStream.format("memory").queryName("corpus_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("corpus_stream")

    batch = prepare_training_corpus(docs, cfg)
    batch_exact = exact_dedup(batch["filtered"])
    want_hashes = {r.h for r in batch_exact.select(
        F.xxhash64("text").alias("h")).collect()}
    got_hashes = {r.h for r in got.select(F.xxhash64("text").alias("h")).collect()}
    assert got_hashes == want_hashes
    assert got.count() == batch_exact.count()

    # split assignment is a pure function of (doc_id, seed): streamed
    # rows agree with the batch split wherever the same doc_id survived
    batch_split = {r.doc_id: r.split for r in batch["corpus"]
                   .select("doc_id", "split").collect()}
    for r in got.select("doc_id", "split").collect():
        if r.doc_id in batch_split:
            assert batch_split[r.doc_id] == r.split


def test_streaming_corpus_watermarked_dedup(spark, tmp_path):
    """The watermark path (dropDuplicatesWithinWatermark) yields the
    same survivor hash set as the unbounded path when nothing is late,
    while keeping dedup state evictable."""
    import pyspark.sql.functions as F

    from go_crawler_spark.functions.corpus import CorpusConfig
    from go_crawler_spark.functions.dedup import exact_dedup
    from go_crawler_spark.functions.corpus import prepare_training_corpus
    from go_crawler_spark.streaming.corpus import streaming_corpus_prepare

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                        + F.make_interval(secs=F.col("doc_id"))))
    src = str(tmp_path / "docs_wm")
    docs.repartition(2).write.parquet(src)

    cfg = CorpusConfig(min_tokens=5, min_quality=0.0, split_weights=None)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_corpus_prepare(stream, cfg, watermark=("ts", "1 hour"))
    q = (out.writeStream.format("memory").queryName("corpus_wm")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("corpus_wm")

    batch = exact_dedup(prepare_training_corpus(docs, cfg)["filtered"])
    want = {r.h for r in batch.select(F.xxhash64("text").alias("h")).collect()}
    have = {r.h for r in got.select(F.xxhash64("text").alias("h")).collect()}
    assert have == want


def test_stream_plus_periodic_near_dup_equals_batch(spark, tmp_path):
    """VERDICT r3 item 6: the documented composition — streaming funnel
    (gate -> exact dedup -> split, per micro-batch) + the PERIODIC batch
    near-dup pass over its accumulated survivors — must reproduce the
    full batch funnel end-to-end (prepare_training_corpus "corpus"),
    row-for-row including split assignment.

    The fixture controls arrival order (exact-duplicate min-ids land in
    the older file) so the stream's first-arrival-per-hash rule picks
    the same representatives as batch exact_dedup's min-id rule — the
    precondition under which the composition is exactly the batch
    funnel (streaming/corpus.py module docstring)."""
    import os
    import time

    import pyspark.sql.functions as F

    from go_crawler_spark.functions.corpus import CorpusConfig, prepare_training_corpus
    from go_crawler_spark.streaming.corpus import (
        periodic_near_dup_pass,
        streaming_corpus_prepare,
    )

    t1 = "the quick brown fox jumps over the lazy dog tonight and runs far away home"
    t3 = "spark structured streaming with watermarks handles late arriving data gracefully at scale"
    early = [  # file 1: every exact-dup group's min id lives here
        (1, t1),
        (2, t1.replace("lazy", "sleepy")),          # near-dup of 1
        (3, t3),
        (4, t3.replace("gracefully", "smoothly")),  # near-dup of 3
        (6, "a completely unrelated document about bucketed lakehouse compaction strategies"),
        (8, "too short"),                           # fails min_tokens gate
    ]
    late = [(10, t1), (11, t3)]                     # exact dups, higher ids
    schema = "doc_id long, text string"
    src = str(tmp_path / "compose_src")
    spark.createDataFrame(early, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(src)
    # pin arrival order: the early file (more rows -> larger) strictly older
    now = time.time()
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")),
        key=os.path.getsize,
    )
    assert len(parts) == 2
    os.utime(parts[0], (now, now))               # smaller file (late rows): newer
    os.utime(parts[-1], (now - 100, now - 100))  # larger file (early rows): older

    cfg = CorpusConfig(
        min_tokens=5, min_quality=0.0,
        # Gopher gram gates sized for real documents would cut these tiny
        # fixtures (a unique 2-gram in a 10-token doc covers >20% of its
        # chars); the gates have their own oracle (repetition_stats)
        max_top2gram_frac=1.0, max_dup5gram_frac=1.0,
        minhash_threshold=0.3, minhash_shingle_k=3,
        split_weights={"train": 0.9, "val": 0.1},
    )
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (streaming_corpus_prepare(stream, cfg)
         .writeStream.format("memory").queryName("compose_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    accumulated = spark.table("compose_stream")

    all_docs = spark.createDataFrame(early + late, schema)
    batch = prepare_training_corpus(all_docs, cfg)["corpus"]

    # precondition holds: stream representatives == batch exact survivors
    assert {r.doc_id for r in accumulated.collect()} == {1, 2, 3, 4, 6}

    composed = periodic_near_dup_pass(accumulated, cfg)
    got = sorted((r.doc_id, r.text, r.split) for r in composed.collect())
    want = sorted((r.doc_id, r.text, r.split) for r in batch.collect())
    assert got == want and got  # near-dups 2 and 4 removed in both paths
    assert {g[0] for g in got} == {1, 3, 6}


def test_streaming_gate_honors_c4_and_gopher_flags(spark, tmp_path):
    """The shared heuristic gate (corpus.apply_heuristic_gate) applies
    the optional C4 cleaning and Gopher table-A1 verdict identically on
    a stream and in batch — same survivor ids, same cleaned text."""
    import pyspark.sql.functions as F

    from go_crawler_spark.functions.corpus import (
        CorpusConfig, apply_heuristic_gate,
    )
    from go_crawler_spark.streaming.corpus import streaming_quality_gate

    good = (
        "the crawler walks every frontier page and records what it finds. "
        "each document then moves through a series of gates that measure "
        "length, symbols, and repetition before anything heavier runs. "
        "only after those cheap checks have passed does the pipeline pay "
        "for hashing, clustering, or model scoring of the surviving text."
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good + "\nPlease enable javascript to proceed."),
            (3, "var x = { 1 };\n" + good),              # C4 page drop
            (4, "data pipeline sort merge join scan " * 9),  # no stop words
            # duplicate-line structure: one C4-surviving sentence repeated
            (5, good + ("\nthis exact sentence repeats itself "
                        "throughout the document." * 1) * 3),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "gate_stream")
    docs.repartition(2).write.parquet(src)

    cfg = CorpusConfig(min_tokens=5, min_quality=0.0, split_weights=None,
                       c4_clean=True, gopher_quality=True,
                       gopher_dup_structure=True)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    gated = streaming_quality_gate(stream, cfg)
    q = (gated.writeStream.format("memory").queryName("heur_gate")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.doc_id, r.text) for r in spark.table("heur_gate").collect()}

    _, batch_filtered = apply_heuristic_gate(docs, cfg)
    want = {(r.doc_id, r.text) for r in batch_filtered.collect()}
    assert got == want
    got_ids = {i for i, _ in got}
    assert 1 in got_ids            # clean doc survives
    assert 3 not in got_ids        # C4 page rule (curly brace) drops
    assert 4 not in got_ids        # Gopher stop-word rule drops
    assert 5 not in got_ids        # dup-line structure rule drops (3/4 lines identical)
    # the javascript line was REWRITTEN away, not the whole page
    t2 = {t for i, t in got if i == 2}
    assert t2 and "javascript" not in next(iter(t2)).lower()
