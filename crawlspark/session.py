"""SparkSession builder with scale-appropriate defaults.

Defaults chosen for the sandbox (local[N], single JVM) but expressed the way
a 1000-executor cluster job would set them: AQE on (runtime re-plan + skew
join splitting), adaptive shuffle partition coalescing, Arrow enabled for
all pandas UDF exchange, and a shuffle-partition count that scales with
parallelism rather than a hardcoded 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawlspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("CRAWLSPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism: 2x cores locally; on a real cluster this would be
        # ~2-3x total executor cores, and AQE coalesces downward at runtime.
        try:
            n = int(master.split("[")[1].rstrip("]")) if "[" in master else 8
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # split-packing charges each file openCostInBytes (default 4 MB),
        # which FLOORS the split size at max(openCost, bytes/cores): a
        # 25 MB table then scans ~7-way regardless of core count. 512 KB
        # models file-open cost on local/SSD storage honestly and lets
        # small-table scans use the cores (measured ~13% across the
        # scan-bound suite at sf1.0); the bytes/cores term still governs
        # at scale, so this is not a local-only constant. Env-overridable
        # for object-store deployments where 4-16 MB is realistic.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("CRAWLSPARK_OPEN_COST_BYTES", str(512 * 1024)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("CRAWLSPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
