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

For the ellipsoid, run this as the prefilter and refine candidates
with the exact Karney kernel against densified route vertices — the
same filter/refine pattern as the spatial joins.
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
    a = v[:-1]
    b = v[1:]
    n = np.cross(a, b)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
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
