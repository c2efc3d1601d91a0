"""Two-parallelism scaling evidence (north rule: efficiency >= 0.8
between N and 4N executors; sandbox protocol: same job at local[8]
and local[32] on identical input).

Each configuration runs in a fresh subprocess (one JVM per master
setting) over the SAME input; we report rows/s at both plus the
scaling efficiency = (T8 / T32) / 4, written to BENCH/BASELINE.md and
stdout as JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from geographiclib_go_spark.session import build_session
from geographiclib_go_spark.sources import images as im
from geographiclib_go_spark.operators import tiling, nearest as nno
from geographiclib_go_spark.plans import pipeline as pl
from pyspark.sql import functions as F

cpus = sys.argv[1]
n_images = int(sys.argv[2])
sf_dir = sys.argv[3]
spark = build_session(app=f"scale-{{cpus}}", master=f"local[{{cpus}}]")
spark.range(1000).select(F.sum("id")).collect()  # warm up

# fixed work: generate + tile + nearest-landmark join + aggregate
t0 = time.time()
images = im.generate_images(spark, n_images, skew_pct=3).cache()
n = images.count()
tiles = tiling.assign_tiles(
    images.select("image_id", "phash", "lat", "lon"), tile_res=6)
# map-only broadcast-argmin nearest-landmark join (zero shuffle)
near = nno.nearest_dim_join(tiles, pl.DEFAULT_LANDMARKS, k=1)
out = (near.groupBy("tile_id", "nn_id")
       .agg(F.count("*").alias("n_images")))
n_out = out.count()
wall = time.time() - t0

# plus one big relational pass over sf data (shuffle-heavy)
t1 = time.time()
li = spark.read.parquet(f"{{sf_dir}}/lineitem.parquet")
orders = spark.read.parquet(f"{{sf_dir}}/orders.parquet")
j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
     .groupBy("o_orderpriority")
     .agg(F.count("*").alias("n"),
          F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")))
j.collect()
rel_wall = time.time() - t1

print(json.dumps({{"cpus": int(cpus), "n_images": n,
                   "pipeline_wall_s": round(wall, 3),
                   "images_per_sec": round(n / wall, 1),
                   "relational_wall_s": round(rel_wall, 3)}}))
spark.stop()
"""


def run_one(cpus: int, n_images: int, sf_dir: str) -> dict:
    code = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_images), sf_dir],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)})
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output from cpus={cpus}: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_images = int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", "400000"))
    lo = run_one(8, n_images, sf_dir)
    hi = run_one(32, n_images, sf_dir)
    eff = (lo["pipeline_wall_s"] / hi["pipeline_wall_s"]) / 4.0
    rel_eff = (lo["relational_wall_s"] / hi["relational_wall_s"]) / 4.0
    result = {
        "n_images": n_images,
        "local8": lo, "local32": hi,
        "pipeline_speedup_8_to_32": round(
            lo["pipeline_wall_s"] / hi["pipeline_wall_s"], 3),
        "pipeline_scaling_efficiency": round(eff, 3),
        "relational_scaling_efficiency": round(rel_eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(f"""# BENCH/BASELINE — measured engine numbers

## Scaling evidence (north rule: efficiency >= 0.8 between N and 4N)

Sandbox protocol: the SAME flagship job (generate {n_images:,} images
-> tile (res 6) -> kNN join vs 12 landmarks -> per-tile aggregate) at
local[8] and local[32], one fresh JVM each, identical input.

| config | pipeline wall (s) | images/s | relational pass (s) |
|---|---|---|---|
| local[8]  | {lo['pipeline_wall_s']} | {lo['images_per_sec']} | {lo['relational_wall_s']} |
| local[32] | {hi['pipeline_wall_s']} | {hi['images_per_sec']} | {hi['relational_wall_s']} |

- pipeline speedup 8->32 threads: {result['pipeline_speedup_8_to_32']}x
- **pipeline scaling efficiency (speedup/4): {eff:.3f}**
- relational join/agg scaling efficiency: {rel_eff:.3f}

Caveats: local-mode threads share one JVM heap, page cache and Python
worker pool, so this under-reports true multi-executor scaling
(no network shuffle, but also no per-executor memory bandwidth); the
partitioning strategy (cells/salting) is the same one a real cluster
would shuffle on.
""")


if __name__ == "__main__":
    main()
