"""Extra bench harness (guide §1.4): per-query noop-sink isolation,
explain("formatted") capture, and targeted micro-benchmarks.

Never used by the driver's measurement (bench.py is frozen); this file
exists so plan claims in OPTIMIZATION_r06.md are reproducible.

Usage:
  python bench_extra.py plans <outdir>       # dump explain for all bench queries
  python bench_extra.py time  <names...>     # noop-time individual queries (3x)
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "agg_pricing_summary", "star_join_revenue", "anti_join_unseen",
    "politeness_topk_per_key", "events_daily_rollup", "token_counts",
    "dedup_exact_survivors", "dedup_minhash_pairs", "dedup_simhash_pairs",
    "dedup_minhash_components", "ann_brute_force_topk", "knn_join_exact",
    "semantic_dedup_survivors", "paragraph_dedup_docs", "lm_perplexity_scores",
    "nb_quality_scores", "dsir_log_weights", "url_gate_survivors",
    "c4_cleaned_pages", "gopher_quality_signals", "corpus_mixture",
    "pack_assignments", "incremental_exact_survivors",
    "incremental_neardup_matches", "bpe_merges", "packed_sequences",
    "tfidf_top_terms", "user_sessions", "duplicate_spans",
    "contamination_spans", "repetition_stats", "repetition_merged_coverage",
    "gopher_repetition_full", "corpus_prepared", "pii_scrubbed",
    "text_quality_stats", "search_bm25_ranked", "search_or_ranked",
    "search_phrase_ranked", "pagerank_scores",
]


def _spark():
    from go_crawler_spark.session import get_spark

    return get_spark("gcs-bench-extra", cpus=CPUS,
                     shuffle_partitions=max(CPUS, 16))


def _queries():
    import __spark_entry__ as entry_mod

    return {**entry_mod.legacy_queries(), **entry_mod.queries()}


def dump_plans(outdir: str, names: list[str]) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = _queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR building/explaining {name}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}", file=sys.stderr)
    spark.stop()


def time_queries(names: list[str], repeats: int = 3) -> None:
    spark = _spark()
    qs = _queries()
    # warm the session like bench.py does
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    for name in names:
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        print(f"{name:35s} min={min(samples):7.3f} samples={samples}")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if cmd == "plans":
        outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06/_current"
        names = sys.argv[3:] or BENCH_QUERIES
        dump_plans(outdir, names)
    elif cmd == "time":
        time_queries(sys.argv[2:] or BENCH_QUERIES)
    else:
        raise SystemExit(f"unknown command {cmd}")
