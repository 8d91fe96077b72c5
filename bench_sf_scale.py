"""sf0.1 -> sf1 scale evidence for the LLM-corpus operators.

VERDICT r3 item 2: `corpus_prepared`, `duplicate_spans(_cut)`,
`contamination_spans`, `dedup_minhash_components` (and friends) had only
ever run at sf0.1 (5k docs).  This harness times the entry-suite
implementations at 10x that and publishes the ratios: anything
superlinear (> ~12x: 10x data + noise) flags a plan problem.  It also
runs the ADVERSARIAL HOT-GRAM fixture — one boilerplate footer pasted
into 50% of docs — proving duplicate_spans' aggregated-dups semi-join
claim (dedup.py: hot grams must not amplify rows; a naive gram
equi-join would square the 2,500-doc footer group).

The documents tables are synthesized deterministically to the driver
table's shape (doc_id/text/lang/source/n_chars; vocab word-salad text,
~55 tokens/doc, light exact+near duplication) — no external data.

Usage: python bench_sf_scale.py [base_docs] [mult] (default 5000 10)
Writes bench_out/sf_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = (
    "/dev/shm/gcs_bench_cache"
    if os.path.isdir("/dev/shm")
    else os.path.join(HERE, ".bench_cache")
)

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "index plan shuffle stage task executor driver broadcast skew salt bucket "
    "parquet snapshot delta commit vacuum compact schema prune codegen arrow "
    "pandas python scala catalyst tungsten memory spill disk network core"
).split()

FOOTER = (
    "subscribe to our newsletter for weekly updates terms of service apply "
    "copyright all rights reserved contact us at the office privacy policy"
).split()

QUERIES = [
    "repetition_stats",
    # the two heaviest corpus entries (22.5s/10.8s at sf0.1 in BENCH_r04)
    # were the only ones absent from this harness (VERDICT r4 item 2) —
    # their plans are zero-shuffle and locked, but linearity needs the
    # 10x measurement like everything else
    "gopher_repetition_full",
    "repetition_merged_coverage",
    "duplicate_spans",
    "duplicate_spans_cut",
    "contamination_spans",
    "dedup_minhash_pairs",
    "dedup_minhash_components",
    "corpus_prepared",
    "pii_scrubbed",
    "text_quality_stats",
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
    "gopher_dup_structure",
]


def synth_documents(spark, n_docs: int, hot_frac: float = 0.0, seed: int = 0):
    """Deterministic documents table in the driver-table shape."""

    def gen(batches):
        for b in batches:
            rows = []
            for i in b["id"].to_numpy():
                i = int(i)

                def base_toks(j: int) -> list[str]:
                    rb = np.random.default_rng(seed * 1_000_003 + j)
                    n_tok = int(rb.integers(10, 100))
                    return [VOCAB[k] for k in rb.integers(0, len(VOCAB), size=n_tok)]

                if i % 120 == 1 and i > 0:  # exact duplicate of doc i-1
                    toks = base_toks(i - 1)
                elif i % 97 == 3 and i > 0:  # near-duplicate: one word flipped
                    toks = base_toks(i - 1)
                    toks[len(toks) // 2] = "flipped"
                else:
                    toks = base_toks(i)
                if hot_frac and (i % 100) < hot_frac * 100:
                    toks = toks + FOOTER  # the shared boilerplate footer
                text = " ".join(toks)
                rows.append(
                    {
                        "doc_id": i,
                        "text": text,
                        "lang": "en" if i % 10 else "de",
                        "source": f"src{i % 20}",
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(rows)

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return spark.range(n_docs).repartition(32).mapInPandas(gen, schema)


def synth_embeddings(spark, n_vecs: int, dim: int = 64, seed: int = 0):
    """Deterministic embeddings in the driver-table shape (vec_id,
    embedding float[dim]); every 13th vector is a noisy near-copy of its
    predecessor so semantic dedup has real work."""

    def gen(batches):
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                j = i - 1 if (i % 13 == 1 and i > 0) else i
                r = np.random.default_rng(seed * 7_000_003 + j)
                v = r.standard_normal(dim).astype(np.float32)
                if j != i:  # near-dup: tiny deterministic perturbation
                    rp = np.random.default_rng(seed * 7_000_003 + i + 10**9)
                    v = v + 0.01 * rp.standard_normal(dim).astype(np.float32)
                rows.append({"vec_id": i, "embedding": v.tolist()})
            yield pd.DataFrame(rows)

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.range(n_vecs).repartition(32).mapInPandas(gen, schema)


def ensure_docs_dir(spark, n_docs: int, hot_frac: float = 0.0) -> str:
    tag = f"docs_n{n_docs}" + (f"_hot{int(hot_frac * 100)}" if hot_frac else "")
    d = os.path.join(CACHE_DIR, tag)
    marker = os.path.join(d, "documents.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        synth_documents(spark, n_docs, hot_frac).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
    emarker = os.path.join(d, "embeddings.parquet", "_SUCCESS")
    if not os.path.exists(emarker):
        synth_embeddings(spark, n_docs).write.mode("overwrite").parquet(
            os.path.join(d, "embeddings.parquet")
        )
    return d


def time_query(qs, name: str, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from go_crawler_spark.session import get_spark
    import __spark_entry__ as em

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("gcs-sfscale", cpus=cpus, shuffle_partitions=max(cpus, 16))
    qs = {**em.legacy_queries(), **em.queries()}

    d_small = ensure_docs_dir(spark, base)
    d_big = ensure_docs_dir(spark, base * mult)
    d_hot = ensure_docs_dir(spark, base * mult, hot_frac=0.5)

    # warm codegen/Python workers outside the timed window
    qs["text_quality_stats"](spark, d_small).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {"base_docs": base, "mult": mult, "cpus": cpus, "queries": {}}
    for name in QUERIES:
        t_small = time_query(qs, name, spark, d_small)
        t_big = time_query(qs, name, spark, d_big)
        ratio = round(t_big / max(t_small, 1e-9), 2)
        out["queries"][name] = {
            "sec_sf0.1": t_small,
            f"sec_sf1({mult}x)": t_big,
            "ratio": ratio,
        }
        print(f"{name:<28}{t_small:>9.2f}s {t_big:>9.2f}s  x{ratio}")

    # adversarial hot-gram fixture: 50% of docs share a 22-token footer.
    # A plan that amplifies hot grams would blow up here; the aggregated
    # semi-join shape must stay within ~2x of the uniform corpus.
    t_uniform = out["queries"]["duplicate_spans"][f"sec_sf1({mult}x)"]
    t_hot = time_query(qs, "duplicate_spans", spark, d_hot)
    out["hot_gram"] = {
        "uniform_sec": t_uniform,
        "hot50_sec": t_hot,
        "ratio": round(t_hot / max(t_uniform, 1e-9), 2),
    }
    print(f"hot-gram duplicate_spans: uniform {t_uniform}s hot50 {t_hot}s "
          f"x{out['hot_gram']['ratio']}")

    # SemDeDup at production shape: the entry pins C=8 centroids for the
    # SQL oracle, which makes within-cluster pairs O(n^2/8) — fine at
    # 500 vectors, wrong at scale.  The paper's rule holds cluster SIZE
    # roughly constant (C grows with n), making pairs O(n * cluster);
    # assignment runs the Arrow-matmul path (assign_clusters_udf).
    from go_crawler_spark.functions import semdedup

    def run_semantic(sf_dir: str, n: int) -> float:
        c = max(8, n // 64)
        e = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).select("vec_id", "embedding")
        cents = semdedup.centroids_by_id(e, c)
        t0 = time.time()
        semdedup.semantic_dedup_assigned(
            semdedup.assign_clusters_udf(e, cents), cosine_threshold=0.9
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # median-of-3, small/big INTERLEAVED (VERDICT r4 item 7: the r4
    # min-of-2 windows disagreed x2.4 vs x10.7 — the widest noise band
    # in the suite; interleaving decorrelates the host-steal windows)
    sem_small, sem_big = [], []
    for _ in range(3):
        sem_small.append(run_semantic(d_small, base))
        sem_big.append(run_semantic(d_big, base * mult))
    t_sem_small = sorted(sem_small)[1]
    t_sem_big = sorted(sem_big)[1]
    out["queries"]["semantic_dedup(C=n/64)"] = {
        "sec_sf0.1": t_sem_small,
        f"sec_sf1({mult}x)": t_sem_big,
        "ratio": round(t_sem_big / max(t_sem_small, 1e-9), 2),
        "reps": "median-of-3 interleaved",
        "all_small": sem_small,
        "all_big": sem_big,
    }
    print(f"{'semantic_dedup(C=n/64)':<28}{t_sem_small:>9.2f}s "
          f"{t_sem_big:>9.2f}s  x{out['queries']['semantic_dedup(C=n/64)']['ratio']}")

    os.makedirs(os.path.join(HERE, "bench_out"), exist_ok=True)
    with open(os.path.join(HERE, "bench_out", "sf_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
