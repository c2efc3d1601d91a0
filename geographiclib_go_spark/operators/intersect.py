"""Geodesic segment x segment intersections (engine-added).

The companion operator to the route-proximity intercept: where do
geodesic segments CROSS a route?  Classic uses: trajectory-vs-border
crossings, route conflict detection, polyline overlay.

Sphere closed form: two great circles meet at +/- (n_a x n_b)/|.|
(n = unit normal of each circle); the candidate that lies inside
BOTH arcs (the same along-track phi test the route kernel uses) is
the crossing.  This is the seed, the f=0 fast path, and the SQL
oracle.

Ellipsoid: Karney's iterated-gnomonic construction.  The ellipsoidal
gnomonic projection (kernels/gnomonic.py, semantics of the
reference's gnomonic.go:92-173) maps geodesics through the center to
straight lines and nearby geodesics to nearly-straight curves with
curvature O((f s/a)^2), so: project the four endpoints about the
current estimate, intersect the two straight chords in the plane,
reverse-project the plane point, repeat.  Each iteration cubes the
error; 4 iterations from the sphere seed reach kernel precision.  On
the sphere the projection is exactly gnomonic, the chords are exact
geodesic images, and one iteration is already exact.

Everything is whole-batch numpy over Arrow batches (map-only, the
route ships in the closure) — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from geographiclib_go_spark.operators.route import _unit, route_frames


def sphere_segment_intersections(la1, lo1, la2, lo2, frames):
    """Closed-form sphere intersections of n input segments x the m
    route segments.

    Returns (hit, lat, lon, frac_in, frac_rt): boolean (n, m) hit
    mask and, where hit, the crossing point in degrees plus the
    along-arc fractions in the input segment / route segment.
    """
    a1 = _unit(la1, lo1)                       # (n, 3)
    a2 = _unit(la2, lo2)
    ra, rb, nhat, e2, arc = frames             # (m, ...)
    nc = np.cross(a1, a2)                      # (n, 3) input normals
    ncn = np.linalg.norm(nc, axis=1)
    ok_seg = ncn > 1e-12                       # degenerate input seg
    arc_c = np.arctan2(ncn, np.einsum("ij,ij->i", a1, a2))

    d = np.cross(nhat[None, :, :], nc[:, None, :])   # (n, m, 3)
    dn = np.linalg.norm(d, axis=2)
    ok = ok_seg[:, None] & (dn > 1e-12)        # parallel circles: none
    with np.errstate(invalid="ignore", divide="ignore"):
        p = d / dn[..., None]

    # in-arc test, scale-invariant in the unnormalized input normal:
    # e2_c = (nc x a1)/|nc|, so p.e2_c = p.(nc x a1)/|nc|
    e2c = np.cross(nc, a1)                     # (n, 3), |.| = |nc|
    hit = np.zeros(ok.shape, dtype=bool)
    lat = np.zeros(ok.shape)
    lon = np.zeros(ok.shape)
    frac_in = np.zeros(ok.shape)
    frac_rt = np.zeros(ok.shape)
    for sign in (1.0, -1.0):
        q = sign * p                           # (n, m, 3)
        phi_r = np.arctan2(np.einsum("nmj,mj->nm", q, e2),
                           np.einsum("nmj,mj->nm", q, ra))
        with np.errstate(invalid="ignore", divide="ignore"):
            phi_c = np.arctan2(
                np.einsum("nmj,nj->nm", q, e2c) / ncn[:, None],
                np.einsum("nmj,nj->nm", q, a1))
        inside = (ok & ~hit
                  & (phi_r >= 0.0) & (phi_r <= arc[None, :])
                  & (phi_c >= 0.0) & (phi_c <= arc_c[:, None]))
        if inside.any():
            hit |= inside
            lat = np.where(inside, np.degrees(np.arcsin(
                np.clip(q[..., 2], -1.0, 1.0))), lat)
            lon = np.where(inside, np.degrees(
                np.arctan2(q[..., 1], q[..., 0])), lon)
            with np.errstate(invalid="ignore", divide="ignore"):
                frac_in = np.where(inside, phi_c / arc_c[:, None],
                                   frac_in)
                frac_rt = np.where(inside, phi_r / arc[None, :],
                                   frac_rt)
    return hit, lat, lon, frac_in, frac_rt


def refine_intersections_gnomonic(g, la1, lo1, la2, lo2,
                                  rb_la1, rb_lo1, rb_la2, rb_lo2,
                                  lat0, lon0, iters: int = 4):
    """Ellipsoidal refine of matched segment pairs from a seed point:
    iterated gnomonic chord intersection (module docstring).  All
    arrays are flat and aligned; returns (lat, lon) of the geodesic
    intersection to kernel precision."""
    from geographiclib_go_spark.kernels import gnomonic as gn

    lat0 = np.asarray(lat0, dtype=np.float64).copy()
    lon0 = np.asarray(lon0, dtype=np.float64).copy()
    for _ in range(iters):
        fa1 = gn.gnomonic_forward(g, lat0, lon0, la1, lo1)
        fa2 = gn.gnomonic_forward(g, lat0, lon0, la2, lo2)
        fb1 = gn.gnomonic_forward(g, lat0, lon0, rb_la1, rb_lo1)
        fb2 = gn.gnomonic_forward(g, lat0, lon0, rb_la2, rb_lo2)
        dxa = fa2["x"] - fa1["x"]
        dya = fa2["y"] - fa1["y"]
        dxb = fb2["x"] - fb1["x"]
        dyb = fb2["y"] - fb1["y"]
        det = dxa * dyb - dya * dxb
        rx = fb1["x"] - fa1["x"]
        ry = fb1["y"] - fa1["y"]
        with np.errstate(invalid="ignore", divide="ignore"):
            u = (rx * dyb - ry * dxb) / det
        X = fa1["x"] + u * dxa
        Y = fa1["y"] + u * dya
        rev = gn.gnomonic_reverse(g, lat0, lon0, X, Y)
        # keep the previous estimate where the projection degenerated
        # (over-the-horizon endpoint or parallel chords) — the sphere
        # seed guarantees this cannot happen for true crossings
        good = np.isfinite(rev["lat"]) & np.isfinite(rev["lon"])
        lat0 = np.where(good, rev["lat"], lat0)
        lon0 = np.where(good, rev["lon"], lon0)
    return lat0, lon0


def route_intersections(segments: DataFrame, route_lats, route_lons,
                        a: float, f: float,
                        cols=("lat1", "lon1", "lat2", "lon2"),
                        iters: int = 4) -> DataFrame:
    """Every crossing of each input geodesic segment with each route
    segment: one output row per (input row, route segment) hit, with
    the crossing point and along-arc fractions.

    Map-only Arrow stage (route in the closure).  f=0 returns the
    closed-form sphere crossing (which the SQL oracle recomputes);
    f != 0 refines with the iterated ellipsoidal gnomonic.

    Semantics and limits (by design):
    - collinear overlaps (segment lies on a route great circle) have
      no isolated crossing and emit nothing (dn ~ 0 guard);
    - at most one crossing per (segment, route segment) pair exists —
      the two great-circle intersection points are antipodal, and an
      arc shorter than pi cannot contain both;
    - frac_in / frac_rt are the SPHERE along-arc fractions (the seed
      geometry) even when f != 0 — the refined point itself is
      ellipsoidal-exact;
    - the gnomonic refine needs all four endpoints within the
      projection horizon (< ~90 deg) of the crossing; a segment
      longer than a quarter circumference can push an endpoint over
      the horizon, in which case the row safely keeps its sphere
      seed (split such segments upstream if f != 0 exactness is
      required at that range).
    """
    from geographiclib_go_spark.kernels.geodesic import GeodesicModel
    rla = np.asarray(route_lats, dtype=np.float64)
    rlo = np.asarray(route_lons, dtype=np.float64)
    frames = route_frames(rla, rlo)
    g = GeodesicModel(a, f)
    ellipsoidal = f != 0.0

    out_schema = T.StructType(segments.schema.fields + [
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("ilat", T.DoubleType(), False),
        T.StructField("ilon", T.DoubleType(), False),
        T.StructField("frac_in", T.DoubleType(), False),
        T.StructField("frac_rt", T.DoubleType(), False),
    ])

    def crossings(batches):
        # mapInPandas (not ArrayType+explode): the fan-out is emitted
        # as a flat frame via one vectorized .iloc take per batch —
        # no per-row Python list building anywhere
        for pdf in batches:
            la1 = pdf[cols[0]].to_numpy(np.float64)
            lo1 = pdf[cols[1]].to_numpy(np.float64)
            la2 = pdf[cols[2]].to_numpy(np.float64)
            lo2 = pdf[cols[3]].to_numpy(np.float64)
            hit, ilat, ilon, fin, frt = sphere_segment_intersections(
                la1, lo1, la2, lo2, frames)
            ii, jj = np.nonzero(hit)
            plat = ilat[ii, jj]
            plon = ilon[ii, jj]
            if ellipsoidal and len(ii):
                plat, plon = refine_intersections_gnomonic(
                    g, la1[ii], lo1[ii], la2[ii], lo2[ii],
                    rla[:-1][jj], rlo[:-1][jj],
                    rla[1:][jj], rlo[1:][jj],
                    plat, plon, iters=iters)
            out = pdf.iloc[ii].reset_index(drop=True)
            out["seg"] = jj.astype(np.int32)
            out["ilat"] = plat
            out["ilon"] = plon
            out["frac_in"] = fin[ii, jj]
            out["frac_rt"] = frt[ii, jj]
            yield out

    return segments.mapInPandas(crossings, out_schema)
