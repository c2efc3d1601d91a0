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

For the ellipsoid, the sphere pass is the prefilter (segment choice
+ foot-point seed) and the exact Karney kernel refines via the
geodesic INTERCEPT problem — a safeguarded Newton iteration on the
frozen Line using the reduced-length second variation
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


def segment_distances(lat, lon, frames, radius: float,
                      return_foot: bool = False):
    """(n_points, n_segments) matrix of distances to each segment.
    With return_foot, also return the along-track foot angle phi
    (n_points, n_segments) — the sphere estimate that seeds the
    ellipsoidal Newton refine."""
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
    d = radius * np.where(inside, d_line, d_end)
    if return_foot:
        return d, phi
    return d


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


def corridor_cover(route_lats, route_lons, radius_m: float, res: int,
                   sphere_radius: float = 6371000.0) -> np.ndarray:
    """Complete cell cover of the route CORRIDOR — the spherical
    sausage {p : dist(p, route) <= radius_m} — at quadtree resolution
    `res` (operators/cells).  Driver-side and tiny (the route is a
    handful of vertices); the cover is the broadcast prefilter that
    lets a corridor query prune a 10^12-row table to candidate cells
    BEFORE any distance kernel runs.

    Construction mirrors cells.cap_cover's completeness protocol:
    sample the radius_m + pad region on an exact geodesic
    (along-track phi, cross-track chi) grid at half the minimum cell
    width — the (phi, chi) chart's metric is ds^2 = cos^2(chi) dphi^2
    + dchi^2, so the true sample spacing only SHRINKS with |chi| —
    then union the endpoint cap covers (the clamp region past each
    vertex) and pad with a 1-ring expansion.  Losslessness is gated
    twice: a brute-force pytest and the registered query's
    algorithm-independent exhaustive SQL oracle."""
    from geographiclib_go_spark.operators import cells

    frames = route_frames(route_lats, route_lons)
    a, b, nhat, e2, arc = frames
    r = radius_m / sphere_radius
    w_min = cells.min_cell_width_rad(res)
    pad = cells.max_cell_width_rad(res) / 2
    rr = r + pad
    if rr >= np.pi / 2:  # corridor swallows a hemisphere: all cells
        n = 1 << res
        f, i, j = np.meshgrid(np.arange(6), np.arange(n), np.arange(n),
                              indexing="ij")
        return cells.fij_to_cell(f.ravel(), i.ravel(), j.ravel(), res)
    step = w_min / 2
    chi = np.arange(-int(np.ceil(rr / step)),
                    int(np.ceil(rr / step)) + 1) * step
    covers = []
    for s in range(a.shape[0]):
        phi = np.linspace(0.0, float(arc[s]),
                          int(np.ceil(arc[s] / step)) + 2)
        cp, cc = np.meshgrid(phi, chi, indexing="ij")
        base = (np.cos(cp)[..., None] * a[s]
                + np.sin(cp)[..., None] * e2[s])
        q = (np.cos(cc)[..., None] * base
             + np.sin(cc)[..., None] * nhat[s])
        la, lo = cells.xyz_to_latlon(q[..., 0].ravel(),
                                     q[..., 1].ravel(),
                                     q[..., 2].ravel())
        covers.append(cells.cell_from_latlon(la, lo, res))
    for vla, vlo in zip(route_lats, route_lons):
        covers.append(cells.cap_cover(float(vla), float(vlo), res, r))
    cand = np.unique(np.concatenate(covers))
    return cells.ring_expand(cand, res, 1)


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
                          seg_idx, lat, lon, iters: int = 16,
                          t0_frac=None):
    """Exact-geodesic closest approach: for each point i, the
    distance to the nearest point ON its assigned geodesic segment
    seg_idx[i] — the geodesic INTERCEPT problem.

    Solved by a safeguarded Newton iteration on the stationarity
    condition of the distance from the moving point P(t) on the
    frozen Line to the fixed point X:

        s'(t)  = -cos(beta)                    (first variation)
        s''(t) = sin^2(beta) * M12 / m12       (second variation)

    where beta is the angle at P between the line's forward azimuth
    and the geodesic P->X, and m12 / M12 are the reduced length and
    geodesic scale of P->X that the inverse kernel computes anyway —
    the Jacobi-field second variation (exact on the sphere, O(f)-
    consistent on the ellipsoid, which Newton absorbs).  A bisection
    bracket on the sign of s' safeguards every step (distance along
    the segment is unimodal inside the injectivity radius, which the
    sphere prefilter guarantees), and the sphere foot point seeds t.

    Each iteration is 2 whole-batch kernel sweeps (direct position +
    inverse with REDUCED_LENGTH|GEODESIC_SCALE) vs the previous
    ternary search's 4 sweeps x 60 iterations — ~7x less kernel work
    for a tighter answer (Newton is quadratic once bracketed; the
    ternary interval shrank only by (2/3)^iters).  No per-point
    Python anywhere.

    Returns (s_along, dist): meters from the segment start to the
    foot point, and the exact geodesic distance.
    """
    from geographiclib_go_spark.kernels import caps as C
    from geographiclib_go_spark.kernels import direct as kdir
    from geographiclib_go_spark.kernels import geomath as gm
    from geographiclib_go_spark.kernels import inverse as kinv

    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    a1 = np.asarray(seg_lat1, dtype=np.float64)[seg_idx]
    o1 = np.asarray(seg_lon1, dtype=np.float64)[seg_idx]
    a2 = np.asarray(seg_lat2, dtype=np.float64)[seg_idx]
    o2 = np.asarray(seg_lon2, dtype=np.float64)[seg_idx]

    base = kinv.gen_inverse(g, a1, o1, a2, o2,
                            C.DISTANCE | C.AZIMUTH)
    azi1 = gm.atan2d(base["salp1"], base["calp1"])
    line = kdir.line_init(g, a1, o1, azi1,
                          C.LATITUDE | C.LONGITUDE | C.AZIMUTH |
                          C.DISTANCE_IN,
                          salp1=base["salp1"], calp1=base["calp1"])
    s13 = base["s12"]

    def eval_g(t):
        """(s', s'', s) at P(t): 2 kernel sweeps, whole batch."""
        pos = kdir.gen_position(g, line, False, t,
                                C.LATITUDE | C.LONGITUDE | C.AZIMUTH)
        inv = kinv.gen_inverse(g, pos["lat2"], pos["lon2"], lat, lon,
                               C.DISTANCE | C.REDUCED_LENGTH |
                               C.GEODESIC_SCALE)
        beta = np.radians(gm.atan2d(inv["salp1"], inv["calp1"]) -
                          pos["azi2"])
        cb, sb = np.cos(beta), np.sin(beta)
        d1 = -cb
        d2 = sb * sb * inv["M12"] / np.maximum(np.abs(inv["m12"]),
                                               gm.TINY)
        return d1, d2, inv["s12"]

    zero = np.zeros_like(s13)
    g_lo, _, d_lo = eval_g(zero)
    g_hi, _, d_hi = eval_g(s13)
    # The segment arc is < pi (inverse picks the shorter geodesic and
    # route_frames rejects antipodal vertices), so the circle-distance
    # function d(t) has AT MOST ONE critical point on the segment —
    # the closest-approach foot (min) or its antipode (max), which
    # are pi apart.  Classify by the endpoint derivative signs:
    #   (-,+) fall-rise: interior minimum -> Newton;
    #   (+,+) monotone increasing       -> foot at the start;
    #   (-,-) monotone decreasing       -> foot at the end;
    #   (+,-) rise-fall, interior MAX   -> min at the nearer endpoint.
    interior = (g_lo < 0.0) & (g_hi > 0.0)
    rise_fall = (g_lo >= 0.0) & (g_hi <= 0.0)
    start_better = np.where(rise_fall, d_lo <= d_hi, g_lo >= 0.0)
    at_start = ~interior & start_better
    at_end = ~interior & ~start_better

    lo_t, hi_t = zero.copy(), s13.copy()
    if t0_frac is None:
        t = 0.5 * (lo_t + hi_t)
    else:
        t = np.clip(np.asarray(t0_frac, np.float64), 0.0, 1.0) * s13
    conv = ~interior  # endpoint rows are already done
    for _ in range(iters):
        gv, gp, _ = eval_g(t)
        neg = gv < 0.0
        lo_t = np.where(interior & neg & ~conv, t, lo_t)
        hi_t = np.where(interior & ~neg & ~conv, t, hi_t)
        step = gv / np.where(gp > gm.TINY, gp, np.inf)
        # A sub-micrometer Newton step means converged; freeze the
        # row (otherwise tn rounds onto the bracket boundary and the
        # open-interval test would discard the answer for a bisection
        # midpoint).
        conv = conv | (interior & np.isfinite(step) &
                       (np.abs(step) < 1e-6))
        tn = t - step
        ok = np.isfinite(tn) & (tn > lo_t) & (tn < hi_t)
        t = np.where(conv, t, np.where(ok, tn, 0.5 * (lo_t + hi_t)))
        if np.all(conv):
            break
    t_best = np.where(at_start, 0.0, np.where(at_end, s13, t))
    pos = kdir.gen_position(g, line, False, t_best,
                            C.LATITUDE | C.LONGITUDE)
    d_best = kinv.gen_inverse(g, pos["lat2"], pos["lon2"], lat, lon,
                              C.DISTANCE)["s12"]
    d_best = np.where(at_start, d_lo, np.where(at_end, d_hi, d_best))
    return t_best, d_best


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
        d, phi = segment_distances(la, lo, frames, g.a,
                                   return_foot=True)
        seg = d.argmin(axis=1).astype(np.int64)
        arc = frames[4]
        frac = np.clip(phi[np.arange(len(seg)), seg] / arc[seg],
                       0.0, 1.0)
        t, dist = intercept_on_segments(
            g, rla[:-1], rlo[:-1], rla[1:], rlo[1:], seg, la, lo,
            t0_frac=frac)
        return pd.DataFrame({"seg": seg.astype(np.int32),
                             "s_along": t, "route_dist_m": dist})

    out = points.withColumn("_r", nearest(F.col(lat_col), F.col(lon_col)))
    return (out.withColumn("seg", F.col("_r.seg"))
            .withColumn("s_along", F.col("_r.s_along"))
            .withColumn("route_dist_m", F.col("_r.route_dist_m"))
            .drop("_r"))
