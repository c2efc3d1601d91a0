"""Geodesic DBSCAN — density clustering on the ellipsoid
(engine-added; no reference analog, but built ONLY from kernels the
reference defines: every distance is geodesic Inverse s12, ref
geodesic.go Inverse).

DBSCAN (Ester et al., KDD'96) over geodesic distance, composed
entirely from operators this engine has already proven individually:

1. eps-neighborhood self-join  -> operators/spatial_join.distance_join
   (cell-cover equi-join at scale, closure-broadcast scan when the
   point set is small — both hash-oracled via sphere_radius_join);
2. core test                   -> one groupBy count per point
   (|N_eps(p)| >= min_pts, neighborhood INCLUDING p itself, the
   original paper's convention);
3. cluster resolution          -> connected components of the
   core-core edges (operators/components.py, auto-dispatched
   single-task closure / distributed star alternation);
4. border assignment           -> min cluster id over each non-core
   point's core neighbors (deterministic, unlike textbook DBSCAN's
   first-come assignment — required for the value-hash oracle gate).

Scale shape: the eps self-join is the only superlinear stage and it
is the celled equi-join, never all-pairs; everything downstream is
linear groupBys/joins on the (much smaller) pair list.  At 10^12
points the plan is: cell-cover shuffle, count, component closure on
core edges — exactly the pieces whose 100 TB behavior is already
argued in their own modules.

Verification: queries.pts_dbscan runs this over a PLANTED-cluster
point table (closed-form f(custkey): 24 deterministic centers +
uniform scatter) and the DuckDB oracle recomputes every role and
cluster id from the brute-force threshold join + recursive-CTE
min-label closure; eps is chosen with measured >= 50 m clearance to
the nearest pair distance so both engines agree bit for bit.
tests/test_clustering.py adds a driver-side reference DBSCAN parity
on random point sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geographiclib_go_spark.kernels.geodesic import WGS84_A, WGS84_F
from geographiclib_go_spark.operators import components as cc
from geographiclib_go_spark.operators import spatial_join as sj


def dbscan(points: DataFrame, eps_m: float, min_pts: int,
           id_col: str = "id",
           a: float = WGS84_A, f: float = WGS84_F,
           point_cols=("lat", "lon"),
           strategy: str = "auto") -> DataFrame:
    """(id, role, cluster_id) for every input point.

    role: 'core'   — >= min_pts points within eps_m (self included);
          'border' — non-core with at least one core neighbor;
          'noise'  — neither.
    cluster_id: minimum core id of the point's cluster (border points
    take the minimum cluster among their core neighbors); NULL for
    noise.  Ids must be unique non-null longs.

    strategy is forwarded to distance_join ('auto' picks the
    closure-broadcast scan for small point sets, the cell-cover
    equi-join otherwise).
    """
    ids = points.select(F.col(id_col).cast("long").alias("qid"),
                        F.col(point_cols[0]).alias("lat"),
                        F.col(point_cols[1]).alias("lon"))
    pairs = sj.distance_join(points, ids, radius_m=eps_m, a=a, f=f,
                             point_cols=point_cols,
                             query_cols=("lat", "lon"),
                             id_col="qid", strategy=strategy)
    # directed neighbor list (src -> dst), self-pair included — the
    # join emits (p, p) at s12 = 0, which is exactly the "including
    # p" the core test wants
    edges = (pairs.select(F.col("q_qid").alias("src"),
                          F.col(id_col).cast("long").alias("dst"))
             .localCheckpoint(eager=True))  # reused by 4 consumers

    deg = edges.groupBy("src").agg(F.count("*").alias("_n"))
    core = (deg.filter(F.col("_n") >= int(min_pts))
            .select(F.col("src").alias("node")))

    core_edges = (edges
                  .join(core.withColumnRenamed("node", "src"), "src")
                  .join(core.withColumnRenamed("node", "dst"), "dst")
                  .filter(F.col("src") != F.col("dst"))
                  .select(F.col("src").alias("id_a"),
                          F.col("dst").alias("id_b")))
    comp = cc.connected_components(core_edges)
    core_lab = (core.join(comp, core.node == comp.id, "left")
                .select(core.node,
                        F.coalesce("component_id", core.node)
                        .alias("cluster_id")))

    # border: non-core src with >= 1 core neighbor; deterministic
    # assignment to the smallest neighboring cluster id
    border_lab = (edges
                  .join(core_lab.withColumnRenamed("node", "dst")
                        .withColumnRenamed("cluster_id", "_dc"), "dst")
                  .join(core.withColumnRenamed("node", "src"),
                        "src", "left_anti")
                  .groupBy("src")
                  .agg(F.min("_dc").alias("cluster_id")))

    allp = points.select(F.col(id_col).cast("long").alias("id"))
    out = (allp
           .join(core_lab.withColumnRenamed("node", "id")
                 .withColumnRenamed("cluster_id", "_cc"), "id", "left")
           .join(border_lab.withColumnRenamed("src", "id")
                 .withColumnRenamed("cluster_id", "_bc"), "id", "left"))
    return out.select(
        "id",
        F.when(F.col("_cc").isNotNull(), F.lit("core"))
        .when(F.col("_bc").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise")).alias("role"),
        F.coalesce("_cc", "_bc").alias("cluster_id"))
