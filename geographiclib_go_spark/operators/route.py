"""Route (polyline) proximity: point-to-great-circle-segment
distances (engine-added).

The classic cross-track query — "how far is each point from the
route A->B->C" — as the engine's flagship map-only shape: the route
is tiny, so its per-segment frame vectors are precomputed driver-side
and shipped in the UDF closure; the whole join is one Arrow stage
over the points, no shuffle.

Sphere geometry (f=0, closed form — which is what gives the
route_distance query a SQL oracle):

  p, a, b   unit vectors of the point and segment endpoints
  n̂         unit normal of the segment's great circle (a x b)
  xt        cross-track angle = asin(p . n̂)
  e2        = n̂ x a  (in-plane direction at a toward b; unit)
  phi       along-track angle of the foot point = atan2(t.e2, t.e1)
            with t = p - (p.n̂)n̂ and e1 = a
  d(P, seg) = R*|xt|                  if 0 <= phi <= arc(a,b)
            = R*min(ang(p,a), ang(p,b)) otherwise (endpoint clamp)

For the ellipsoid, the sphere pass is the prefilter (segment choice)
and the exact Karney kernel refines via the geodesic INTERCEPT
problem — vectorized ternary search along the frozen Line
(intercept_on_segments) — the same filter/refine pattern as the
spatial joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _unit(lat_deg, lon_deg):
    la = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lo = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)],
                    axis=-1)


def route_frames(route_lats, route_lons):
    """Per-segment frame constants (a, nhat, e2, arc) for a polyline —
    tiny, precomputed driver-side, shipped in the closure AND inlined
    into the SQL oracle so both engines use identical numbers."""
    v = _unit(route_lats, route_lons)
    if v.shape[0] < 2:
        raise ValueError("route needs at least 2 vertices")
    a = v[:-1]
    b = v[1:]
    n = np.cross(a, b)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    if np.any(nn < 1e-12):
        raise ValueError(
            "degenerate route segment (repeated or antipodal "
            "consecutive vertices) — drop duplicates / split "
            "antipodal legs before building frames")
    nhat = n / nn
    e2 = np.cross(nhat, a)
    arc = np.arctan2(nn[:, 0], np.einsum("ij,ij->i", a, b))
    return a, b, nhat, e2, arc


def segment_distances(lat, lon, frames, radius: float) -> np.ndarray:
    """(n_points, n_segments) matrix of distances to each segment."""
    a, b, nhat, e2, arc = frames
    p = _unit(lat, lon)                              # (n, 3)
    sin_xt = np.clip(p @ nhat.T, -1.0, 1.0)          # (n, m)
    xt = np.arcsin(sin_xt)
    t = p[:, None, :] - sin_xt[..., None] * nhat[None, :, :]
    phi = np.arctan2(np.einsum("nmj,mj->nm", t, e2),
                     np.einsum("nmj,mj->nm", t, a))
    inside = (phi >= 0.0) & (phi <= arc[None, :])
    d_line = np.abs(xt)
    d_a = np.arccos(np.clip(p @ a.T, -1.0, 1.0))
    d_b = np.arccos(np.clip(p @ b.T, -1.0, 1.0))
    d_end = np.minimum(d_a, d_b)
    return radius * np.where(inside, d_line, d_end)


def route_distance_join(points: DataFrame, route_lats, route_lons,
                        radius: float = 6371000.0,
                        lat_col: str = "lat", lon_col: str = "lon",
                        max_dist_m: float = None) -> DataFrame:
    """Annotate every point with its distance to each route segment
    (one output row per point x segment; map-only Arrow stage).  With
    max_dist_m, keep only rows within the corridor."""
    frames = route_frames(route_lats, route_lons)
    n_seg = frames[0].shape[0]

    schema = T.StructType([
        T.StructField("seg", T.ArrayType(T.IntegerType()), False),
        T.StructField("dist", T.ArrayType(T.DoubleType()), False),
    ])

    @pandas_udf(schema)
    def seg_dist(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        d = segment_distances(lat.to_numpy(np.float64),
                              lon.to_numpy(np.float64), frames, radius)
        segs = [list(range(n_seg))] * len(lat)
        return pd.DataFrame({"seg": segs, "dist": list(d)})

    out = points.withColumn("_sd", seg_dist(F.col(lat_col),
                                            F.col(lon_col)))
    zipped = F.arrays_zip(F.col("_sd.seg").alias("s"),
                          F.col("_sd.dist").alias("d"))
    out = (out.select("*", F.explode(zipped).alias("_p"))
           .withColumn("seg", F.col("_p.s"))
           .withColumn("route_dist_m", F.col("_p.d"))
           .drop("_sd", "_p"))
    if max_dist_m is not None:
        out = out.filter(F.col("route_dist_m") <= float(max_dist_m))
    return out


def route_segment_sql(route_lats, route_lons) -> str:
    """VALUES table seg(sid, ax,ay,az, bx,by,bz, nx,ny,nz,
    ex,ey,ez, arc) with the frame constants inlined — the SQL oracle
    shares the exact driver-side numbers."""
    a, b, nhat, e2, arc = route_frames(route_lats, route_lons)
    rows = []
    for i in range(a.shape[0]):
        vals = [i, *a[i], *b[i], *nhat[i], *e2[i], arc[i]]
        rows.append("(" + ", ".join(repr(float(v)) if j else str(i)
                                    for j, v in enumerate(vals)) + ")")
    return ", ".join(rows)


# --------------------------------------------------------------------------
# ellipsoidal interception (filter/refine over the Karney kernel)
# --------------------------------------------------------------------------

def intercept_on_segments(g, seg_lat1, seg_lon1, seg_lat2, seg_lon2,
                          seg_idx, lat, lon, iters: int = 60):
    """Exact-geodesic closest approach: for each point i, the
    distance to the nearest point ON its assigned geodesic segment
    seg_idx[i] (the geodesic INTERCEPT problem, solved by vectorized
    ternary search over the frozen Line — distance along a geodesic
    segment to an off-track point is unimodal inside the injectivity
    radius, which the sphere prefilter guarantees for corridor-scale
    queries).

    Returns (s_along, dist): meters from the segment start to the
    foot point, and the exact geodesic distance.  All iterations are
    whole-batch kernel calls — no per-point Python.
    """
    from geographiclib_go_spark.kernels import caps as C
    from geographiclib_go_spark.kernels import direct as kdir
    from geographiclib_go_spark.kernels import inverse as kinv

    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    a1 = np.asarray(seg_lat1, dtype=np.float64)[seg_idx]
    o1 = np.asarray(seg_lon1, dtype=np.float64)[seg_idx]
    a2 = np.asarray(seg_lat2, dtype=np.float64)[seg_idx]
    o2 = np.asarray(seg_lon2, dtype=np.float64)[seg_idx]

    from geographiclib_go_spark.kernels import geomath as gm
    base = kinv.gen_inverse(g, a1, o1, a2, o2,
                            C.DISTANCE | C.AZIMUTH)
    azi1 = gm.atan2d(base["salp1"], base["calp1"])
    line = kdir.line_init(g, a1, o1, azi1,
                          C.LATITUDE | C.LONGITUDE | C.DISTANCE_IN,
                          salp1=base["salp1"], calp1=base["calp1"])
    s13 = base["s12"]

    def d_at(t):
        pos = kdir.gen_position(g, line, False, t,
                                C.LATITUDE | C.LONGITUDE)
        return kinv.gen_inverse(g, pos["lat2"], pos["lon2"], lat, lon,
                                C.DISTANCE)["s12"]

    lo_t = np.zeros_like(s13)
    hi_t = s13.copy()
    for _ in range(iters):
        m1 = lo_t + (hi_t - lo_t) / 3.0
        m2 = hi_t - (hi_t - lo_t) / 3.0
        d1 = d_at(m1)
        d2 = d_at(m2)
        take_left = d1 <= d2
        hi_t = np.where(take_left, m2, hi_t)
        lo_t = np.where(take_left, lo_t, m1)
    t_best = 0.5 * (lo_t + hi_t)
    return t_best, d_at(t_best)


def route_nearest_ellipsoidal(points: DataFrame, route_lats, route_lons,
                              a: float, f: float,
                              lat_col: str = "lat",
                              lon_col: str = "lon") -> DataFrame:
    """Exact WGS84-style route proximity: the sphere cross-track
    kernel picks each point's best segment (prefilter — segment
    ORDER is robust far beyond the O(f) distance error), then the
    geodesic intercept refines the true distance and foot point on
    that segment.  One map-only Arrow stage; the route ships in the
    closure."""
    from geographiclib_go_spark.kernels.geodesic import GeodesicModel
    frames = route_frames(route_lats, route_lons)
    rla = np.asarray(route_lats, dtype=np.float64)
    rlo = np.asarray(route_lons, dtype=np.float64)
    g = GeodesicModel(a, f)

    schema = T.StructType([
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("s_along", T.DoubleType(), False),
        T.StructField("route_dist_m", T.DoubleType(), False),
    ])

    @pandas_udf(schema)
    def nearest(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        d = segment_distances(la, lo, frames, g.a)
        seg = d.argmin(axis=1).astype(np.int64)
        t, dist = intercept_on_segments(
            g, rla[:-1], rlo[:-1], rla[1:], rlo[1:], seg, la, lo)
        return pd.DataFrame({"seg": seg.astype(np.int32),
                             "s_along": t, "route_dist_m": dist})

    out = points.withColumn("_r", nearest(F.col(lat_col), F.col(lon_col)))
    return (out.withColumn("seg", F.col("_r.seg"))
            .withColumn("s_along", F.col("_r.s_along"))
            .withColumn("route_dist_m", F.col("_r.route_dist_m"))
            .drop("_r"))
