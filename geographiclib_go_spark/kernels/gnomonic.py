"""Ellipsoidal gnomonic projection, vectorized.

Semantics from /root/reference/geodesic/gnomonic.go:92-173.  Forward
is one inverse-kernel call; Reverse is a masked fixed-point iteration
(<= 10 iterations, trip at 0.01*sqrt(eps)*a) stepping along geodesic
lines.  Used by the tiling operator to build a tile's local plane for
raster<->vector pixel assignment.
"""

from __future__ import annotations

import numpy as np

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import geomath as gm
from geographiclib_go_spark.kernels import direct as kdirect
from geographiclib_go_spark.kernels import inverse as kinverse
from geographiclib_go_spark.kernels.geodesic import GeodesicModel


def gnomonic_forward(g: GeodesicModel, lat0, lon0, lat, lon) -> dict:
    """Project (lat, lon) about center (lat0, lon0) → x, y, azi, rk
    (gnomonic.go:92-106).  Over-the-horizon points (M12 <= 0) get NaN
    x/y."""
    caps = C.AZIMUTH | C.GEODESIC_SCALE | C.REDUCED_LENGTH
    inv = kinverse.inverse(g, lat0, lon0, lat, lon, caps)
    M12 = inv["M12"]
    with np.errstate(invalid="ignore", divide="ignore"):
        rho = inv["m12"] / M12
    sx, cx = gm.sincosd(inv["azi1"])
    ok = M12 > 0
    x = np.where(ok, rho * sx, np.nan)
    y = np.where(ok, rho * cx, np.nan)
    return {"x": x, "y": y, "azi": inv["azi2"], "rk": M12}


def gnomonic_reverse(g: GeodesicModel, lat0, lon0, x, y,
                     numit: int = 10) -> dict:
    """Un-project plane coords (x, y) about (lat0, lon0) → lat, lon,
    azi, rk (gnomonic.go:125-173).  Non-converged rows return NaN."""
    lat0 = gm.arr(lat0)
    lon0 = gm.arr(lon0)
    x = gm.arr(x)
    y = gm.arr(y)
    lat0, lon0, x, y = [a.astype(np.float64) for a in
                        np.broadcast_arrays(lat0, lon0, x, y)]
    azi0 = gm.atan2d(x, y)
    rho = np.hypot(x, y)
    a = g.a
    s = a * np.arctan(rho / a)
    little = rho <= a
    with np.errstate(divide="ignore"):
        rho = np.where(little, rho, 1 / rho)

    caps = (C.LATITUDE | C.LONGITUDE | C.AZIMUTH | C.DISTANCE_IN
            | C.REDUCED_LENGTH | C.GEODESIC_SCALE)
    L = kdirect.line_init(g, lat0, lon0, azi0, caps)
    trip = np.zeros(s.shape, dtype=np.int64)
    # reference (gnomonic.go:147,165): tripEpsilon = 0.01*sqrt(eps),
    # convergence when |ds| < tripEpsilon * a (~1 mm on Earth).  The
    # factor of a appears exactly once — folding it in here and again
    # at the comparison made the threshold ~6 km and cost ~1 m of
    # reverse accuracy at quarter-hemisphere range (r3 fix).
    trip_eps = 0.01 * np.sqrt(gm.EPSILON) * a

    pos = None
    for _ in range(numit):
        pos = kdirect.gen_position(g, L, False, s, caps)
        active = trip == 0
        if not active.any():
            break
        m12 = pos["m12"]
        M12 = pos["M12"]
        with np.errstate(invalid="ignore", divide="ignore"):
            ds = np.where(little,
                          ((m12 / M12) - rho) * M12 * M12,
                          (rho - (M12 / m12)) * m12 * m12)
        s = np.where(active, s - ds, s)
        trip = trip + (active & (np.abs(ds) < trip_eps)).astype(np.int64)

    conv = trip > 0
    nan = np.full(s.shape, np.nan)
    # azi: azimuth of the geodesic at the projected point (azi2) —
    # matches the C++ original; the Go port returns azi1 (the ray
    # azimuth at the center), but its tests only pin lat/lon
    # (gnomonic_test.go:20-29).
    return {
        "lat": np.where(conv, pos["lat2"], nan),
        "lon": np.where(conv, pos["lon2"], nan),
        "azi": np.where(conv, pos["azi2"], nan),
        "rk": np.where(conv, pos["M12"], nan),
    }
