"""Distributed Lloyd k-means in exact quantized-integer arithmetic
(engine-added).

Iterative algorithms usually live outside the hash-oracle gate
("rows-only" evidence at best) because float centroid averages are
summation-order-dependent.  This operator makes Lloyd's iteration
EXACTLY reproducible and therefore fully oracle-checkable:

- **quantize**: each float32 coordinate becomes the integer
  round(x * 1e6) — one deterministic rounding at ingest, after which
  every distance and every centroid is integer arithmetic.
- **assign**: argmin over centroids of the integer squared L2
  distance, ties broken by the lower centroid id (min over the
  (dist, cid) pair).  Executed as a broadcast join of the k-row
  centroid table against the vectors and a zip_with/aggregate JVM
  array expression — map-only per iteration, no UDF.
- **update**: the new centroid coordinate is floor(sum / n) — an
  integer-exact mean whose floor both engines compute identically
  (double division is exact for |sum| < 2^52).  Clusters that lose
  every member keep their previous centroid.
- **iterate**: a FIXED number of unrolled iterations, each one
  broadcast-join + one groupBy shuffle (map-side partial sums).  The
  SQL oracle unrolls the same chain as CTEs, so assignments,
  centroids, sizes, and inertia after T iterations match
  bit-for-bit.

Init is the deterministic seed-row convention the IVF index already
uses: the k lowest vector ids.  Scale shape per iteration: centroids
are always k rows (broadcast); the fact table is touched once per
iteration map-only plus one partial-aggregated shuffle — the
canonical distributed Lloyd plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QSCALE = 1_000_000


def quantized(df: DataFrame, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """(vid, q): integer-quantized vectors."""
    return df.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * QSCALE)
                    .cast("long")).alias("q"))


def _dist2(a, b):
    """Integer squared L2 of two equal-length long-array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda u, v: (u - v) * (u - v)),
        F.lit(0).cast("long"), lambda acc, t: acc + t)


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vid, q, cid, dist): nearest centroid per vector, ties to the
    lower cid."""
    joined = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "_d", _dist2(F.col("q"), F.col("c")))
    best = (joined.groupBy("vid")
            .agg(F.min(F.struct(F.col("_d").alias("d"),
                                F.col("cid").alias("cid")))
                 .alias("_b")))
    return (vecs.join(best, "vid")
            .select("vid", "q", F.col("_b.cid").alias("cid"),
                    F.col("_b.d").alias("dist")))


def _update(assigned: DataFrame, cents: DataFrame, dim: int,
            ) -> DataFrame:
    """New centroid table: floor(sum/n) per coordinate; empty
    clusters keep their previous centroid."""
    sums = (assigned
            .select("cid", F.posexplode("q").alias("j", "qj"))
            .groupBy("cid", "j")
            .agg(F.sum("qj").alias("s"), F.count("*").alias("n"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(
                F.struct("j", F.floor(F.col("s") / F.col("n"))
                         .cast("long").alias("cj")))).alias("_jc"))
            .select("cid", F.transform(F.col("_jc"),
                                       lambda t: t["cj"]).alias("c_new")))
    return (cents.join(sums, "cid", "left")
            .select("cid", F.coalesce(F.col("c_new"), F.col("c"))
                    .alias("c")))


def kmeans_iterate(vecs: DataFrame, k: int, iters: int,
                   dim: int) -> DataFrame:
    """Final assignment after ``iters`` unrolled Lloyd steps from
    seed-row init: (vid, cid, dist)."""
    cents = (vecs.orderBy("vid").limit(k)
             .select(F.row_number().over(Window.orderBy("vid"))
                     .alias("_rk"), F.col("q").alias("c"))
             .select((F.col("_rk") - 1).cast("long").alias("cid"),
                     "c"))
    vecs = vecs.cache()
    for _ in range(iters):
        assigned = _assign(vecs, cents)
        # each centroid table is referenced twice (next assign + the
        # empty-cluster carry-over join) and its lineage contains the
        # whole previous iteration — cache the k rows so the unrolled
        # chain executes each iteration once, not 2^t times
        cents = _update(assigned, cents, dim).cache()
    return _assign(vecs, cents)


def kmeans_oracle_sql(k: int, iters: int, dim: int,
                      table: str = "embeddings",
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """CTE chain replaying quantize -> seed init -> T unrolled
    assign/update rounds -> final assignment summary."""
    dist = ("list_sum(list_transform(list_zip(v.q, c.c), "
            "x -> (x[1]-x[2])*(x[1]-x[2])))")
    ctes = [f"""
vecs AS (
  SELECT {id_col} AS vid,
         [CAST(ROUND(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT)
          for x in {vec_col}] AS q
  FROM {table}
),
cents0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS cid,
         q AS c
  FROM (SELECT vid, q FROM vecs ORDER BY vid LIMIT {k})
)"""]
    for t in range(1, iters + 1):
        prev = f"cents{t - 1}"
        ctes.append(f"""
assign{t} AS (
  SELECT vid, q, cid, d FROM (
    SELECT v.vid, v.q, c.cid, {dist} AS d,
           ROW_NUMBER() OVER (PARTITION BY v.vid
                              ORDER BY {dist}, c.cid) AS rk
    FROM vecs v CROSS JOIN {prev} c)
  WHERE rk = 1
),
sums{t} AS (
  SELECT cid, j, CAST(SUM(qj) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT cid, unnest(q) AS qj,
               unnest(range(1, {dim + 1})) AS j
        FROM assign{t})
  GROUP BY cid, j
),
newc{t} AS (
  SELECT cid, list(CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT)
                   ORDER BY j) AS c_new
  FROM sums{t} GROUP BY cid
),
cents{t} AS (
  SELECT p.cid, COALESCE(nc.c_new, p.c) AS c
  FROM {prev} p LEFT JOIN newc{t} nc USING (cid)
)""")
    ctes.append(f"""
final AS (
  SELECT vid, cid, d FROM (
    SELECT v.vid, c.cid, {dist} AS d,
           ROW_NUMBER() OVER (PARTITION BY v.vid
                              ORDER BY {dist}, c.cid) AS rk
    FROM vecs v CROSS JOIN cents{iters} c)
  WHERE rk = 1
)""")
    return f"""
WITH {",".join(ctes)}
SELECT CAST(cid AS BIGINT) AS cid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vid) AS BIGINT) AS id_sum,
       CAST(SUM(d) AS BIGINT) AS inertia
FROM final GROUP BY cid ORDER BY cid
"""
