"""Per-phase crawl profile at pinned N vs 4N cores (attribution tool).

Runs the steady-state scaling harness once per level with
``CrawlConfig.profile_phases=True`` (eager phase boundaries + per-sink
durations) and prints the per-phase N vs 4N table.  This is the
measurement loop behind the shuffle-byte reductions — not a driver
artifact; bench_scaling.py stays the official evidence.

Usage: python bench_profile.py [n_pages] [n_small]   (default 1000000 4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

_CHILD = r"""
import json, sys
sys.path.insert(0, {here!r})
from go_crawler_spark.session import get_spark
import bench

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = get_spark("gcs-profile", cpus=cpus, shuffle_partitions=max(cpus, 16),
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
bench._ensure_corpus(spark, n_pages)
elapsed, ups, metrics = bench.bench_crawl(spark, n_pages, steady=True, profile=True)
phases = {{}}
for m in metrics:
    for k, v in m.get("phases", {{}}).items():
        phases[k] = round(phases.get(k, 0.0) + v, 3)
print("RESULT " + json.dumps(
    {{"cpus": cpus, "elapsed": elapsed, "urls_per_sec": ups, "phases": phases,
      "iters": [m.get("phases", {{}}) for m in metrics]}}))
spark.stop()
"""


def run_level(cpus: int, n_pages: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )
    cmd = [sys.executable, "-c", _CHILD.format(here=HERE), str(cpus), str(n_pages)]
    total = os.cpu_count() or cpus
    if cpus < total:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"local[{cpus}] failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    r_n = run_level(n_small, n_pages)
    r_4n = run_level(n_small * 4, n_pages)
    eff = (r_4n["urls_per_sec"] / r_n["urls_per_sec"]) / 4.0
    print(f"\nelapsed: N={r_n['elapsed']:.1f}s 4N={r_4n['elapsed']:.1f}s "
          f"urls/s: N={r_n['urls_per_sec']:.0f} 4N={r_4n['urls_per_sec']:.0f} "
          f"efficiency={eff:.3f}")
    keys = sorted(set(r_n["phases"]) | set(r_4n["phases"]))
    print(f"{'phase':<16}{'sec_N':>9}{'sec_4N':>9}{'eff':>7}{'share4N':>9}")
    tot4 = sum(r_4n["phases"].values()) or 1e-9
    for k in keys:
        tn, t4 = r_n["phases"].get(k, 0.0), r_4n["phases"].get(k, 0.0)
        e = (tn / t4) / 4.0 if t4 > 0 else float("nan")
        print(f"{k:<16}{tn:>9.1f}{t4:>9.1f}{e:>7.2f}{t4 / tot4:>9.1%}")
    out = {"n_pages": n_pages, "localN": r_n, "local4N": r_4n,
           "scaling_efficiency": round(eff, 3)}
    os.makedirs(os.path.join(HERE, "bench_out"), exist_ok=True)
    with open(os.path.join(HERE, "bench_out", "profile.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
