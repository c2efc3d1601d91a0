"""Map-only nearest-dim join: for every row of a big fact table, the
k nearest rows of a SMALL dim table (landmarks, stations, hubs) by
exact geodesic distance (inverse.go:30-355 kernel as the metric).

This is the scale-critical shape of the flagship pipeline ("images
tiled + spatially joined per second"): the dim side is tiny, so the
correct 100 TB plan is NOT a shuffle join at all — the dim table is
baked into the UDF closure (effectively a broadcast) and the whole
join is a single map-only Arrow stage over the fact table.  No
shuffle, no window, no driver loop; scales linearly with executors.

Exactness: a chord-angle prefilter ranks dim rows per fact row on the
unit sphere (geographic lat/lon -> 3-vectors, one N x M matmul), then
the exact Karney inverse kernel runs only on candidates that could
beat the kth chord candidate.  The candidate margin uses the bound
  b * sigma12 <= s12 <= a * sigma12
(geodesic arc on the auxiliary sphere, line.go:114 k2 range: the
integrand sqrt(1 + k^2 sin^2 sigma) is within [1, a/b]), widened by a
safety factor for the (reduced-latitude vs geocentric) angle mismatch,
and is verified against the exhaustive N x M kernel evaluation in
tests/test_nearest.py.  For f = 0 the chord order IS the geodesic
order and the margin collapses to ties-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels.geodesic import (
    GeodesicModel, WGS84_A, WGS84_F)
from geographiclib_go_spark.kernels.inverse import inverse as kinverse

MAX_DIM_ROWS = 100_000  # closure-broadcast budget (3 float64 arrays)
CHUNK = 8192  # rows per kernel slice (keeps temporaries in cache)


def _unit_vectors(lat_deg: np.ndarray, lon_deg: np.ndarray) -> np.ndarray:
    la = np.radians(lat_deg)
    lo = np.radians(lon_deg)
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)],
                    axis=-1)


def nearest_dim_kernel(g: GeodesicModel, lat: np.ndarray, lon: np.ndarray,
                       dim_ids: np.ndarray, dim_lat: np.ndarray,
                       dim_lon: np.ndarray, dim_vec: np.ndarray,
                       k: int = 1):
    """Pure-numpy core: (ids[n,k] int64, s12[n,k] float64), columns
    ordered by ascending exact geodesic distance.  Pads with -1/NaN
    when k > len(dim)."""
    n = lat.size
    m = dim_ids.size
    kk = min(k, m)
    p = _unit_vectors(lat, lon)                      # (n, 3)
    cosang = np.clip(p @ dim_vec.T, -1.0, 1.0)       # (n, m)
    ang = np.arccos(cosang)                          # central angle, rad

    # kth smallest chord angle per row
    if kk < m:
        kth = np.partition(ang, kk - 1, axis=1)[:, kk - 1]
    else:
        kth = ang.max(axis=1)

    # margin: a dim row can beat the kth chord candidate in geodesic
    # distance only if  b * ang_j < a * kth  (plus slack for the
    # geographic-vs-auxiliary-sphere angle difference, O(f) small)
    f_abs = abs(g.f)
    ratio = (g.a / g.b) * (1.0 + 8.0 * f_abs) + 1e-12
    pad = 4.0 * f_abs + 1e-12                        # radians of slack
    cand = ang <= (kth[:, None] * ratio + pad)

    rows, cols = np.nonzero(cand)
    s12 = kinverse(g, lat[rows], lon[rows],
                   dim_lat[cols], dim_lon[cols], C.DISTANCE)["s12"]

    # per-row top-k among candidates: sort by (row, s12), take first kk
    order = np.lexsort((s12, rows))
    rows_o, cols_o, s_o = rows[order], cols[order], s12[order]
    # position of each candidate within its row group
    first = np.r_[True, rows_o[1:] != rows_o[:-1]]
    grp_start = np.maximum.accumulate(np.where(first,
                                               np.arange(rows_o.size), 0))
    pos = np.arange(rows_o.size) - grp_start
    keep = pos < kk

    out_ids = np.full((n, kk), -1, dtype=np.int64)
    out_s12 = np.full((n, kk), np.nan)
    out_ids[rows_o[keep], pos[keep]] = dim_ids[cols_o[keep]]
    out_s12[rows_o[keep], pos[keep]] = s_o[keep]
    return out_ids, out_s12


def make_nearest_dim_udf(dim_rows, k: int = 1,
                         a: float = WGS84_A, f: float = WGS84_F):
    """dim_rows: iterable of (id, lat, lon).  Returns a pandas UDF
    nearest(lat, lon):
      k == 1 -> struct<nn_id long, nn_s12 double>  (pure columnar —
               no per-row Python objects cross the Arrow boundary)
      k > 1  -> struct<nn_ids array<long>, nn_s12 array<double>>
               (ascending distance)."""
    dim = list(dim_rows)
    if not dim or len(dim) > MAX_DIM_ROWS:
        raise ValueError(f"dim side must have 1..{MAX_DIM_ROWS} rows")
    dim_ids = np.array([int(r[0]) for r in dim], dtype=np.int64)
    dim_lat = np.array([float(r[1]) for r in dim])
    dim_lon = np.array([float(r[2]) for r in dim])
    dim_vec = _unit_vectors(dim_lat, dim_lon)
    g = GeodesicModel(a, f)

    if k == 1:
        schema1 = T.StructType([
            T.StructField("nn_id", T.LongType(), False),
            T.StructField("nn_s12", T.DoubleType(), False),
        ])

        @pandas_udf(schema1)
        def nearest1(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
            la = lat.to_numpy(np.float64)
            lo = lon.to_numpy(np.float64)
            n = la.size
            out_id = np.empty(n, dtype=np.int64)
            out_s = np.empty(n)
            # slice the Arrow batch so the kernel's temporaries stay
            # cache-resident even with many concurrent workers
            step = CHUNK
            for lo_i in range(0, n, step):
                sl = slice(lo_i, min(lo_i + step, n))
                ids, s12 = nearest_dim_kernel(
                    g, la[sl], lo[sl], dim_ids, dim_lat, dim_lon,
                    dim_vec, 1)
                out_id[sl] = ids[:, 0]
                out_s[sl] = s12[:, 0]
            return pd.DataFrame({"nn_id": out_id, "nn_s12": out_s})

        return nearest1

    schema = T.StructType([
        T.StructField("nn_ids", T.ArrayType(T.LongType()), False),
        T.StructField("nn_s12", T.ArrayType(T.DoubleType()), False),
    ])

    @pandas_udf(schema)
    def nearest(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        ids, s12 = nearest_dim_kernel(g, la, lo, dim_ids, dim_lat,
                                      dim_lon, dim_vec, k)
        return pd.DataFrame({"nn_ids": list(ids), "nn_s12": list(s12)})

    return nearest


def nearest_dim_join(big: DataFrame, dim, k: int = 1,
                     a: float = WGS84_A, f: float = WGS84_F,
                     lat_col: str = "lat", lon_col: str = "lon",
                     id_out: str = "nn_id", s12_out: str = "s12",
                     rank_out: str = "rank") -> DataFrame:
    """Annotate `big` with its k nearest dim rows (exact geodesic).

    dim: DataFrame with (id-like first column, lat, lon) OR an iterable
    of (id, lat, lon) tuples.  k=1 adds scalar columns (nn_id, s12);
    k>1 posexplodes to one output row per (big row, rank).
    """
    if isinstance(dim, DataFrame):
        cols = dim.columns
        dim = [(r[cols[0]], r["lat"], r["lon"]) for r in dim.collect()]
    udf = make_nearest_dim_udf(dim, k=k, a=a, f=f)
    out = big.withColumn("_nn", udf(F.col(lat_col), F.col(lon_col)))
    if k == 1:
        return (out.withColumn(id_out, F.col("_nn.nn_id"))
                .withColumn(s12_out, F.col("_nn.nn_s12"))
                .drop("_nn"))
    zipped = F.arrays_zip(F.col("_nn.nn_ids").alias("i"),
                          F.col("_nn.nn_s12").alias("d"))
    out = out.select("*", F.posexplode(zipped).alias("_pos", "_pair"))
    return (out.withColumn(id_out, F.col("_pair.i"))
            .withColumn(s12_out, F.col("_pair.d"))
            .withColumn(rank_out, (F.col("_pos") + 1).cast("int"))
            .filter(F.col(id_out) >= 0)
            .drop("_nn", "_pos", "_pair"))
