"""SparkSession construction with scale-appropriate defaults.

The engine is designed for a multi-executor cluster reading ~100 TB; in
this sandbox everything runs on ``local[N]``.  The confs below are the
ones that matter at both scales:

* AQE on (runtime shuffle-partition coalescing + skew-join splitting),
* Arrow execution for every pandas UDF (the only JVM<->Python boundary),
* an explicit shuffle-partition default sized to the local core count
  (on a real cluster this would be ~2-3x total cores or left to AQE).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "go-crawler-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    # getOrCreate returns any pre-existing session and silently ignores
    # every requested conf — surface that instead of letting benchmarks
    # or callers measure a configuration they never got.
    active = SparkSession.getActiveSession()
    if active is not None:
        import sys

        have_master = active.conf.get("spark.master", "")
        have_parts = active.conf.get("spark.sql.shuffle.partitions", "")
        if have_master != f"local[{cpus}]" or have_parts != str(shuffle_partitions):
            print(
                f"get_spark: reusing ACTIVE session ({have_master}, "
                f"shuffle={have_parts}); requested local[{cpus}]/"
                f"shuffle={shuffle_partitions} NOT applied",
                file=sys.stderr,
            )
        for k, v in (extra_conf or {}).items():
            try:
                active.conf.set(k, v)  # runtime confs still apply
            except Exception:
                print(f"get_spark: conf {k} not applicable to the active "
                      "session", file=sys.stderr)
        return active
    # Shuffle/spill files on tmpfs when available: this sandbox's VM disk
    # is slow and shared, and shuffle bandwidth must scale with cores (on
    # a real cluster every executor has its own local disks).
    local_dir = "/dev/shm/gcs-spark-local" if os.path.isdir("/dev/shm") else None
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # smaller scan splits: keeps input parallelism >= core count even
        # for modest tables (default 128MB glues small corpora to 1-2 tasks)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
