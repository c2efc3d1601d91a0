"""spark-submit entry for the flagship pipeline (scripts/submit.sh).

Generates the deterministic images table, runs tile + nearest-landmark
+ PIP + per-tile aggregation through the lineage stage store (so a
rerun resumes from the last committed stage), and prints one JSON
metrics line.  Sized by env:
  SPARK_GRAFT_PIPE_IMAGES (default 100000)
  SPARK_GRAFT_STAGE_ROOT  (default /tmp/geographiclib_go_spark_stages)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main():
    from geographiclib_go_spark.plans import pipeline as pl
    from geographiclib_go_spark.sources import images as im

    spark = SparkSession.builder.getOrCreate()
    n = int(os.environ.get("SPARK_GRAFT_PIPE_IMAGES", "100000"))
    root = os.environ.get("SPARK_GRAFT_STAGE_ROOT",
                          "/tmp/geographiclib_go_spark_stages")
    t0 = time.time()
    images = im.generate_images(spark, n, skew_pct=3)
    res = pl.tile_and_join(spark, images, stage_root=root,
                           fingerprint=f"n={n}")
    counts = {k: res[k].count() for k in
              ("tiles", "nearest", "in_polygon", "invariants",
               "dedup_split", "tile_stats")}
    from pyspark.sql import functions as F
    n_psnr_fail = (res["invariants"]
                   .filter(~F.col("psnr_ok")).count())
    wall = time.time() - t0
    print(json.dumps({"n_images": n, "wall_s": round(wall, 3),
                      "images_per_sec": round(n / wall, 1),
                      "stage_rows": counts,
                      "n_psnr_fail": n_psnr_fail,
                      "stage_root": root}))
    spark.stop()


if __name__ == "__main__":
    main()
