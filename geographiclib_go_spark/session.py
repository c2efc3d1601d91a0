"""SparkSession factory with the engine's standard configuration.

Defaults are tuned for the sandbox (single-JVM local mode) but every
knob matters at cluster scale: AQE handles runtime skew-join splitting
and partition coalescing, Arrow batches feed the vectorized kernels,
and the shuffle-partition count tracks cores (not the 200 default,
which fragments small-scale runs and under-partitions big ones —
production jobs should set it to ~2-3x total executor cores or rely
on AQE coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 65536  # rows per Arrow batch into the numpy kernels;
# large batches amortize the masked-Newton loop and Arrow IPC overhead


def build_session(app: str = "geographiclib_go_spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(cpus) if cpus.isdigit() else 32
        shuffle_partitions = max(2 * n, 8)
    b = (
        SparkSession.builder
        .master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
