"""SparkSession factory tuned for the sketch workload.

Arrow is the JVM<->Python boundary for every pandas UDF stage, so batch size
and self-destruct matter; shuffle partitions default to a multiple of cores
(sketch rows are tiny — the shuffle is never the bottleneck, but the build
stage parallelism is).
"""

from __future__ import annotations

import os

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "ddsparkle",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 1 << 16,
    extra_conf: dict | None = None,
):
    from pyspark.sql import SparkSession

    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        cpus = os.cpu_count() or 8
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            if inner.isdigit():
                cpus = int(inner)
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pin the session tz: TIMESTAMP_NTZ casts and epoch arithmetic must
        # not depend on the host's zone (the DuckDB oracles compute naive
        # timestamps as UTC)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
