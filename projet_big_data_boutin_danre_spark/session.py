"""SparkSession factory.

The reference hardcodes a 2 GB local session per job
(``dags/lib/compute_usage.py:27-30``). We centralize session
construction with scale-aware defaults: AQE on (runtime coalesce +
skew-join handling), shuffle partitions sized to the env, Arrow
enabled for the few pandas-interop paths, and a pinned UTC session
timezone so results are comparable against UTC-naive oracles.

At 100 TB on a real cluster the same builder applies — only
``master`` and the shuffle-partition count change (set via env/conf),
and AQE re-coalesces post-shuffle partitions at runtime anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# glibc malloc tuning for the JVM and (critically) the forked Python
# UDF workers: by default every large numpy/Arrow temp buffer is a
# fresh mmap that is unmapped on free, so each pandas-UDF batch pays
# first-touch page faults again (measured ~13x slowdown on virtualized
# hosts with slow EPT faults). Pinning the mmap/trim thresholds makes
# the allocator serve large buffers from the heap and keep the pages,
# so the fault cost is paid once per worker, not once per batch. glibc
# reads these at process start, so they must be in the environment
# BEFORE the JVM (whose python daemons inherit it) is launched.
for _k in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
    os.environ.setdefault(_k, str(512 * 1024 * 1024))


def get_spark(
    app_name: str = "projet_big_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    Defaults honor the driver environment: ``local[$SPARK_GRAFT_CPUS]``
    with ``spark.sql.shuffle.partitions`` = cpu count. On a cluster,
    pass ``master=None`` with ``spark.master`` preset and a shuffle
    partition count ~2-3x total executor cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching — essential at 100 TB where
        # static plans mis-size shuffles.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas-interop (mapInPandas/applyInPandas paths).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Oracle comparability: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast threshold: dims (region/nation/market_stats) are
        # tiny even at SF100k; 64 MB keeps them broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet: vectorized reader + pushdown are on by default;
        # keep partition file sizes bounded for wide scans.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Some sources write TIMESTAMP(NANOS) parquet (the driver's
        # events table does); Spark has no nanos type — read as long
        # and convert at the source (sources/readers.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
