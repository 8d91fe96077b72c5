"""Table schemas for the crawl engine (explicit StructTypes, no inference).

Mirrors the reference's fixed schemas:
* frontier/url_seen <- CDB ``links`` table (migrations/01_create_links_table
  .up.sql: id UUID PK, url STRING UNIQUE, retrieved_at TIMESTAMP).  The
  random UUID PK is replaced by the deterministic 64-bit xxhash of the
  canonical URL — the URL is the true key (UNIQUE constraint).
* edges             <- CDB ``edges`` (migrations/02: FK src/dst,
  UNIQUE(src,dst), updated_at).
* documents         <- indexer Document (indexer/document.go:9-21) / ES
  mapping (indexer/store/es/es.go:96-108).
* pages             <- the synthetic fetch corpus, shape fixed by the
  engine contract: (url, warc_ts, html, text, lang) + optional
  status/content_type for filter coverage.
"""

from __future__ import annotations

import pyspark.sql.types as T

from go_crawler_spark.lakehouse import TableSpec

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
    ]
)

FRONTIER = TableSpec(
    "frontier",
    T.StructType(
        [
            T.StructField("url_hash", T.LongType(), False),
            # Nullable: attempt-mark deltas (merge-on-read) carry ONLY
            # (url_hash, retrieved_at, last_attempt) — url/host/priority/
            # discovered_iter are re-derived from the discovery row at
            # reconcile time, so per-iteration appends don't re-ship the
            # URL/host strings for every selected row (shuffle+IO bytes).
            T.StructField("url", T.StringType(), True),
            T.StructField("host", T.StringType()),
            T.StructField("priority", T.DoubleType()),
            T.StructField("discovered_iter", T.IntegerType()),
            T.StructField("retrieved_at", T.TimestampType()),
            # Last fetch *attempt* (success or failure). The reference only
            # bumps retrieved_at on successful pipeline completion, so a
            # dead URL stays due forever; the iteration loop needs attempt
            # tracking to drain. Not part of the reference contract.
            T.StructField("last_attempt", T.TimestampType()),
        ]
    ),
)

URL_SEEN = TableSpec(
    "url_seen",
    T.StructType(
        [
            T.StructField("url_hash", T.LongType(), False),
            T.StructField("url", T.StringType(), False),
            T.StructField("retrieved_at", T.TimestampType()),
        ]
    ),
)

EDGES = TableSpec(
    "edges",
    T.StructType(
        [
            T.StructField("src_hash", T.LongType(), False),
            # Nullable: a null dst is a "source re-crawled at updated_at"
            # marker used by the merge-on-read reconcile to implement
            # RemoveStaleEdges (U2) without rewriting the table.
            T.StructField("dst_hash", T.LongType(), True),
            T.StructField("updated_at", T.TimestampType()),
        ]
    ),
)

DOCUMENTS = TableSpec(
    "documents",
    T.StructType(
        [
            T.StructField("url_hash", T.LongType(), False),
            T.StructField("url", T.StringType(), False),
            T.StructField("title", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("indexed_at", T.TimestampType()),
            T.StructField("pagerank", T.DoubleType()),
        ]
    ),
)

HOST_BUDGETS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget_per_iter", T.IntegerType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), False),
    ]
)
