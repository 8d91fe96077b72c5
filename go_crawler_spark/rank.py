"""The ranker service: PageRank over the crawl graph -> document scores.

Re-expression of service/ranker/ranker.go: the reference's hourly pass
loads all links as vertices and all edges into one node's RAM
(ranker.go:141-147,181-219 — its scalability ceiling), runs BSP PageRank,
then persists per-vertex scores through IndexAPI.UpdateScore row-at-a-time
(ranker.go:157,172-179).

Here: vertices = the frontier's url_hashes, edges = the reconciled edge
table (unknown dst vertices tolerated, as the reference's graph load
tolerates unknown-src), PageRank runs distributed (graphx.pagerank), and
the scores land in the documents table via one MERGE — preserving the
reference's semantics that only indexed documents carry a score while
every known URL participates in the computation.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from go_crawler_spark import tables
from go_crawler_spark.crawl import Crawler
from go_crawler_spark.graphx.pagerank import PageRankResult, pagerank


def rank(crawler: Crawler, damping: float = 0.85, min_sad: float = 0.001) -> PageRankResult:
    """PageRank over the crawled link graph (vertex id = url_hash)."""
    vertices = crawler.read_frontier().select(F.col("url_hash").alias("id"))
    edges = crawler.read_edges().select(
        F.col("src_hash").alias("src"), F.col("dst_hash").alias("dst")
    )
    # J3 tolerance: drop edges whose endpoints are unknown vertices
    edges = edges.join(
        vertices.select(F.col("id").alias("src")), "src", "left_semi"
    ).join(vertices.select(F.col("id").alias("dst")), "dst", "left_semi")
    return pagerank(vertices, edges, damping=damping, min_sad=min_sad)


def rank_and_persist(crawler: Crawler, damping: float = 0.85, min_sad: float = 0.001) -> PageRankResult:
    """Run PageRank and MERGE the scores into the documents table (J4)."""
    result = rank(crawler, damping, min_sad)
    docs = crawler.read_documents()
    scored = (
        docs.drop("pagerank")
        .join(
            result.scores.select(
                F.col("id").alias("url_hash"), F.col("score").alias("pagerank")
            ),
            "url_hash",
            "left",
        )
        .select(*[f.name for f in tables.DOCUMENTS.schema.fields])
    )
    # the join above left scored hash-partitioned on url_hash: clustered
    snap = crawler.lake.overwrite(
        crawler.t_documents, scored, clustered=crawler._clustered
    )
    snapshots = {
        name: crawler.lake.current_snapshot(name)
        for name in ("frontier", "edges", "bloom")
        if crawler.lake.current_snapshot(name)
    }
    snapshots["documents"] = snap
    # Carry the last crawl iteration number: a later resume picks THIS
    # record (the post-rank documents snapshot) instead of rolling the
    # documents table back past the score overwrite and silently
    # discarding every pagerank value.
    rp = crawler.resume_point()
    crawler._append_state(
        {
            "iteration": rp["iteration"] if rp else 0,
            "status": "complete",
            "op": "rank",
            "snapshots": snapshots,
            "metrics": {"supersteps": result.supersteps, "final_sad": result.final_sad},
            "bloom_buckets": crawler.cfg.bloom_buckets,
            "ts": __import__("time").time(),
        }
    )
    return result
