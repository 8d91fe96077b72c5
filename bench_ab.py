"""A/B harness for the headline crawl bench (VERDICT r2 item 1).

Runs the BFS headline (bench.bench_crawl) at sf-scale n_pages on
local[$SPARK_GRAFT_CPUS] across {AQE on/off} x {politeness exact/
salted_quota}, INTERLEAVED round-robin with min-of-K per cell — the only
comparison regime that survives this VM's +/-30-50% host-steal noise
(never compare timings across sessions).

Prints one JSON line:
  {"cells": {"aqe=off,mode=salted_quota": {"runs": [...], "min_sec": s,
             "urls_per_sec": u}, ...}, "best": "...", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("AB_N_PAGES", "120000"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

CELLS = [
    ("off", "salted_quota"),
    ("on", "salted_quota"),
    ("off", "exact"),
    ("on", "exact"),
]


def main() -> None:
    from go_crawler_spark.session import get_spark

    from bench import bench_crawl

    spark = get_spark("gcs-ab", cpus=CPUS, shuffle_partitions=max(CPUS, 16))
    results: dict[str, dict] = {
        f"aqe={a},mode={m}": {"runs": [], "urls": []} for a, m in CELLS
    }
    for rnd in range(ROUNDS):
        for aqe, mode in CELLS:
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe == "on").lower())
            t0 = time.time()
            elapsed, ups, _ = bench_crawl(spark, N_PAGES, politeness_mode=mode)
            spark.catalog.clearCache()  # drop the run's cached corpus
            cell = results[f"aqe={aqe},mode={mode}"]
            cell["runs"].append(round(elapsed, 2))
            cell["urls"].append(round(ups, 1))
            print(
                f"# round {rnd} aqe={aqe} mode={mode}: {elapsed:.1f}s "
                f"{ups:.0f} urls/s (wall {time.time() - t0:.0f}s)",
                file=sys.stderr,
            )
    out = {}
    for k, v in results.items():
        i = min(range(len(v["runs"])), key=lambda j: v["runs"][j])
        out[k] = {
            "runs_sec": v["runs"],
            "urls_per_sec_runs": v["urls"],
            "min_sec": v["runs"][i],
            "best_urls_per_sec": v["urls"][i],
        }
    best = max(out, key=lambda k: out[k]["best_urls_per_sec"])
    print(
        json.dumps(
            {
                "cells": out,
                "best": best,
                "n_pages": N_PAGES,
                "cpus": CPUS,
                "rounds": ROUNDS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
