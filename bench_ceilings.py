"""Hardware/platform scaling ceilings for the N -> 4N evidence.

The north rule's >=0.8 efficiency criterion targets a real cluster where
going from N to 4N executors multiplies EVERY resource by 4 — cores,
memory channels, shuffle disks, NICs.  This sandbox is one VM with a
single shared memory bus, so the achievable ceiling depends on the
workload's compute-per-byte.  This script measures the ceilings with
ZERO-coordination microbenchmarks at pinned 4 vs pinned 16 cores, so the
crawl's measured efficiency can be judged against what the hardware
itself permits:

  1. in-cache python compute   (multiprocessing, no memory traffic)
  2. page extraction mix       (multiprocessing, the crawl's Python work)
  3. streaming memcpy          (numpy copyto, pure DRAM bandwidth)
  4. vanilla Spark shuffle     (groupBy/agg, 60M rows, no Python, no
                                crawl code — the platform's own ceiling
                                for shuffle-bound work)
  5. Spark extract stage       (corpus scan -> pandas-UDF extraction)

Usage: python bench_ceilings.py [n_small] — writes bench_out/ceilings.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

_BURN = """
import multiprocessing as mp, time, sys
def burn(n):
    x = 0
    for i in range(n): x += i * i
    return x
procs = int(sys.argv[1])
with mp.Pool(procs) as p:
    p.map(burn, [1000] * procs)
    t = time.time()
    p.map(burn, [30_000_000] * procs)
    print("RES", procs / (time.time() - t))
"""

_EXTRACT = """
import sys, time
sys.path.insert(0, {here!r})
import multiprocessing as mp
def work(rng):
    from go_crawler_spark.fixtures import _page_row
    from go_crawler_spark.functions.textops import extract_title, extract_text
    from go_crawler_spark.functions.urlops import extract_links
    lo, hi = rng
    rows = [_page_row(i, 1000000, 200, 0.4, 10) for i in range(lo, hi)]
    data = [(r["url"], r["html"].decode("utf-8", "replace")) for r in rows]
    t0 = time.time()
    for u, c in data:
        extract_title(c); extract_text(c); extract_links(u, c)
    return time.time() - t0
procs = int(sys.argv[1]); per = 12000
with mp.Pool(procs) as p:
    p.map(work, [(0, 50)])
    t = time.time()
    p.map(work, [(i * per, (i + 1) * per) for i in range(procs)])
    print("RES", procs * per / (time.time() - t))
"""

_MEMCPY = """
import numpy as np, multiprocessing as mp, time, sys
def work(_):
    a = np.ones(12_500_000, dtype=np.int64); b = np.ones(12_500_000, dtype=np.int64)
    np.copyto(b, a)
    t = time.time()
    for _ in range(30): np.copyto(b, a)
    return time.time() - t
procs = int(sys.argv[1])
with mp.Pool(procs) as p:
    p.map(work, range(procs))
    t = time.time()
    p.map(work, range(procs))
    print("RES", procs * 30 * 0.2 / (time.time() - t))
"""

_SHUFFLE = """
import sys, time
sys.path.insert(0, {here!r})
from go_crawler_spark.session import get_spark
import pyspark.sql.functions as F
cpus = int(sys.argv[1])
spark = get_spark("ceil-shuf", cpus=cpus, shuffle_partitions=max(cpus, 16),
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
df = spark.range(0, 60_000_000, numPartitions=max(cpus, 16)).select(
    (F.col("id") % 3_000_000).alias("k"),
    F.concat(F.lit("v"), F.col("id")).alias("v"))
df.groupBy("k").agg(F.count("*")).write.format("noop").mode("overwrite").save()
t = time.time()
df.groupBy("k").agg(F.max("v"), F.count("*")).write.format("noop").mode("overwrite").save()
print("RES", 60_000_000 / (time.time() - t))
spark.stop()
"""

_SPARK_EXTRACT = """
import sys, time
sys.path.insert(0, {here!r})
from go_crawler_spark.session import get_spark
import pyspark.sql.functions as F
from go_crawler_spark.functions.textops import udf_extract_page
import bench
cpus = int(sys.argv[1])
spark = get_spark("ceil-ext", cpus=cpus, shuffle_partitions=max(cpus, 16),
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
corpus = bench._ensure_corpus(spark, 1_000_000)
df = spark.read.parquet(corpus).repartition(max(cpus, 16) * 2)
df.limit(2000).select(udf_extract_page("url", "html").alias("e")).write.format(
    "noop").mode("overwrite").save()
t = time.time()
df.select(udf_extract_page("url", "html").alias("e")).select(
    F.length("e.text")).write.format("noop").mode("overwrite").save()
print("RES", 1_000_000 / (time.time() - t))
spark.stop()
"""


def run_pinned(code: str, cpus: int) -> float:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
        code.format(here=HERE) if "{here!r}" in code else code, str(cpus),
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RES "):
            return float(line.split()[1])
    raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = {}
    for name, code in [
        ("python_compute", _BURN),
        ("extractor_mix", _EXTRACT),
        ("memcpy_stream", _MEMCPY),
        ("spark_shuffle", _SHUFFLE),
        ("spark_extract_stage", _SPARK_EXTRACT),
    ]:
        # interleaved reps; median ratio (shared-VM steal varies over time)
        pairs = [(run_pinned(code, n), run_pinned(code, n * 4)) for _ in range(reps)]
        ratios = sorted(hi / lo for lo, hi in pairs)
        med = ratios[len(ratios) // 2]
        best_lo = max(p[0] for p in pairs); best_hi = max(p[1] for p in pairs)
        results[name] = {
            f"throughput_{n}c_best": round(best_lo, 1),
            f"throughput_{n * 4}c_best": round(best_hi, 1),
            "ratio_median": round(med, 2),
            "efficiency_median": round(med / 4, 2),
            "ratios": [round(r, 2) for r in ratios],
        }
        print(name, results[name])
    os.makedirs(os.path.join(HERE, "bench_out"), exist_ok=True)
    with open(os.path.join(HERE, "bench_out", "ceilings.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
