"""Hilbert curve cell ordering (engine-added storage-layout
primitive).

The geohash layout (sources/layout.py) clusters parquet by a Morton
(Z-order) key; Morton is cheap but takes long diagonal jumps — two
cells adjacent on the grid can be far apart in Z rank, which turns a
compact spatial read into scattered row-group touches.  The Hilbert
curve is the locality-optimal alternative: CONSECUTIVE ranks are
always grid neighbors (unit steps, no jumps), so a spatial region
maps to fewer, longer rank runs — fewer row groups for the same
region read.

Implementation is the classic level-by-level quadrant walk: for each
bit plane s = 2^(order-1) .. 1 the quadrant (rx, ry) contributes
s^2 * ((3*rx) XOR ry) to the rank and the coordinate frame is
reflected/transposed into the subquadrant.  Both engines run the
SAME unrolled integer/CASE arithmetic — Spark as a chain of column
expressions (whole-stage codegen, no UDF), DuckDB as one CTE per
level (hilbert_oracle_ctes) — so ranks are oracle-checked
bit-for-bit.  Properties (tests/test_hilbert.py): the map is a
bijection onto [0, 4^order) and consecutive ranks are Manhattan
distance 1 apart — the two properties that characterize the curve.

The registered query quantifies the layout claim: the summed rank
distance between horizontally adjacent occupied cells — the row-group
spread a range reader would touch — for Hilbert vs Morton on the
same grid, as exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def with_hilbert_rank(df, x_col: str, y_col: str, order: int,
                      out: str = "hd"):
    """Adds the Hilbert rank of integer grid cell (x, y),
    0 <= x, y < 2^order, as pure JVM integer/CASE expressions.

    One withColumns projection PER BIT PLANE, referencing the named
    columns of the previous level — composing the rotation as nested
    Column expressions instead would copy the (x, y) subtrees ~3x per
    level (3^order nodes; measured: Catalyst never finished compiling
    order 6).  Named intermediates keep the plan linear and
    CollapseProject leaves multiply-referenced non-cheap aliases
    alone."""
    n = 1 << order
    g = (df.withColumn("_hx", F.col(x_col).cast("long"))
         .withColumn("_hy", F.col(y_col).cast("long"))
         .withColumn(out, F.lit(0).cast("long")))
    s = n // 2
    while s > 0:
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        g = g.withColumns({"_rx": rx, "_ry": ry})
        refl = (F.col("_ry") == 0) & (F.col("_rx") == 1)
        swap = F.col("_ry") == 0
        x_r = F.when(refl, F.lit(n - 1) - F.col("_hx")) \
            .otherwise(F.col("_hx"))
        y_r = F.when(refl, F.lit(n - 1) - F.col("_hy")) \
            .otherwise(F.col("_hy"))
        g = g.withColumns({
            out: F.col(out) + F.lit(s * s)
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
            "_hx": F.when(swap, y_r).otherwise(x_r),
            "_hy": F.when(swap, x_r).otherwise(y_r),
        })
        s //= 2
    return g.drop("_hx", "_hy", "_rx", "_ry")


def morton_d_col(x: Column, y: Column, order: int) -> Column:
    """Z-order rank via the same unrolled shape (bit interleave) —
    the comparison baseline."""
    d = F.lit(0).cast("long")
    for b in range(order):
        xb = F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1))
        d = d + xb * F.lit(1 << (2 * b)) + yb * F.lit(1 << (2 * b + 1))
    return d


def hilbert_oracle_ctes(order: int, src: str = "cells",
                        out: str = "hd") -> str:
    """DuckDB CTE chain replaying hilbert_d_col: ``src`` must expose
    (x, y, ...); the final CTE ``out`` carries every src column plus
    hd.  Identical integer arithmetic, one CTE per bit plane."""
    n = 1 << order
    ctes = [f"h0 AS (SELECT *, CAST(0 AS BIGINT) AS hd, "
            f"CAST(x AS BIGINT) AS hx, CAST(y AS BIGINT) AS hy "
            f"FROM {src})"]
    lvl = 0
    s = n // 2
    while s > 0:
        prev = f"h{lvl}"
        lvl += 1
        ctes.append(f"""
h{lvl} AS (
  SELECT * EXCLUDE (hd, hx, hy, rx, ry),
         hd + {s * s} * xor(3 * rx, ry) AS hd,
         CASE WHEN ry = 0 THEN
                CASE WHEN rx = 1 THEN {n - 1} - hy ELSE hy END
              ELSE CASE WHEN rx = 1 AND ry = 0
                        THEN {n - 1} - hx ELSE hx END END AS hx,
         CASE WHEN ry = 0 THEN
                CASE WHEN rx = 1 THEN {n - 1} - hx ELSE hx END
              ELSE hy END AS hy
  FROM (SELECT *,
               CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM {prev})
)""")
        s //= 2
    ctes.append(f"{out} AS (SELECT * EXCLUDE (hx, hy) FROM h{lvl})")
    return ",\n".join(ctes)


def morton_oracle_expr(order: int, x: str = "x", y: str = "y") -> str:
    terms = []
    for b in range(order):
        terms.append(f"(({x} >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"(({y} >> {b}) & 1) * {1 << (2 * b + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
