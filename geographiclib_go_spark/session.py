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
        # coalesce small shuffles to the ADVISORY SIZE, not to the
        # core count: with the default (true), every tiny exchange
        # still fans out to defaultParallelism tasks, and the
        # suite's shuffle-heavy queries pay ~32-64 near-empty tasks
        # per stage on this host.  Measured median-of-3 at local[32]
        # sf0.1: doc_tf_cosine_pairs 18.4 -> 13.2 s, pts_dbscan
        # 9.4 -> 8.8, track_map_match 5.3 -> 2.5, emb_ivfpq256 24.6
        # -> 11.4; map-heavy queries unchanged (q1 1.48 -> 1.35,
        # images_clean 2.78 -> 3.00).  Large shuffles still split by
        # advisoryPartitionSizeInBytes, so cluster-scale parallelism
        # is unaffected.
        .config("spark.sql.adaptive.coalescePartitions"
                ".parallelismFirst", "false")
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
