"""Vectorized direct geodesic problem + geodesic-line stepping.

Batch re-expression of the reference's Line construction and position
solver (/root/reference/geodesic/line.go:75-454, direct.go:13-22): a
"line" here is a struct-of-arrays — one row per geodesic — so a single
call advances N independent geodesics (or, via the waypoint helpers,
N waypoints across many lines) in pure numpy.  Capability-mask gating
(which series to build) happens at plan-build time; per-row branches
from the scalar code become masks.
"""

from __future__ import annotations

import numpy as np

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import geomath as gm
from geographiclib_go_spark.kernels.geodesic import GeodesicModel


def line_init(g: GeodesicModel, lat1, lon1, azi1, caps: int,
              salp1=None, calp1=None):
    """Freeze point-1 state for N geodesic lines (line.go:75-194).

    Returns a dict of per-row arrays plus per-row series coefficient
    lists, keyed like the reference's Line fields.
    """
    caps |= C.LATITUDE | C.AZIMUTH | C.LONG_UNROLL
    lat1 = gm.lat_fix(gm.arr(lat1))
    lon1 = gm.arr(lon1)
    azi1 = gm.arr(azi1)
    if salp1 is None or calp1 is None:
        azi1 = gm.ang_normalize(azi1)
        salp1, calp1 = gm.sincosd(gm.ang_round(azi1))

    sbet1, cbet1 = gm.sincosd(gm.ang_round(lat1))
    sbet1 = sbet1 * g.f1
    sbet1, cbet1 = gm.norm(sbet1, cbet1)
    cbet1 = np.maximum(gm.TINY, cbet1)
    dn1 = np.sqrt(1 + g.ep2 * gm.sq(sbet1))

    # Clairaut: sin(alp0) = sin(alp1) * cos(bet1)
    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)
    ssig1 = sbet1
    somg1 = salp0 * sbet1
    csig1 = np.where((sbet1 != 0) | (calp1 != 0), cbet1 * calp1, 1.0)
    comg1 = csig1
    ssig1, csig1 = gm.norm(ssig1, csig1)

    k2 = gm.sq(calp0) * g.ep2
    eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)

    L = {
        "lat1": lat1, "lon1": lon1, "azi1": azi1,
        "salp1": salp1, "calp1": calp1, "dn1": dn1,
        "salp0": salp0, "calp0": calp0,
        "ssig1": ssig1, "csig1": csig1, "somg1": somg1, "comg1": comg1,
        "k2": k2, "mask": caps,
    }

    if caps & C.C1:
        L["a1m1"] = gm.a1m1f(eps)
        L["c1a"] = gm.c1f(eps)
        L["b11"] = gm.sin_cos_series(True, ssig1, csig1, L["c1a"])
        s, c = np.sin(L["b11"]), np.cos(L["b11"])
        L["stau1"] = ssig1 * c + csig1 * s
        L["ctau1"] = csig1 * c - ssig1 * s
    if caps & C.C1P:
        L["c1pa"] = gm.c1pf(eps)
    if caps & C.C2:
        L["a2m1"] = gm.a2m1f(eps)
        L["c2a"] = gm.c2f(eps)
        L["b21"] = gm.sin_cos_series(True, ssig1, csig1, L["c2a"])
    if caps & C.C3:
        L["c3a"] = g.c3f(eps)
        L["a3c"] = -g.f * salp0 * g.a3f(eps)
        L["b31"] = gm.sin_cos_series(True, ssig1, csig1, L["c3a"])
    if caps & C.C4:
        L["c4a"] = g.c4f(eps)
        L["a4"] = gm.sq(g.a) * calp0 * salp0 * g.e2
        L["b41"] = gm.sin_cos_series(False, ssig1, csig1, L["c4a"])
    return L


def gen_position(g: GeodesicModel, L: dict, arcmode: bool, s12_a12,
                 outmask: int) -> dict:
    """Position along frozen lines (line.go:290-454); returns output
    arrays keyed a12/lat2/lon2/azi2/s12/m12/M12/M21/S12area (NaN when
    not requested)."""
    s12_a12 = gm.arr(s12_a12)
    n = np.broadcast_shapes(s12_a12.shape, L["ssig1"].shape)
    nan = np.full(n, np.nan)
    out = {k: nan.copy() for k in
           ("a12", "lat2", "lon2", "azi2", "s12", "m12", "M12", "M21",
            "S12area")}
    outmask &= L["mask"] & C.OUT_MASK
    if not arcmode and not (L["mask"] & C.OUT_MASK & C.DISTANCE_IN):
        return out  # impossible distance calculation requested

    b12 = 0.0
    ab1 = 0.0
    if arcmode:
        out["a12"] = np.broadcast_to(s12_a12, n).copy()
        sig12 = gm.deg2rad(s12_a12)
        ssig12, csig12 = gm.sincosd(s12_a12)
    else:
        out["s12"] = np.broadcast_to(s12_a12, n).copy()
        tau12 = s12_a12 / (g.b * (1 + L["a1m1"]))
        with np.errstate(invalid="ignore"):  # inf distance → NaN result
            s, c = np.sin(tau12), np.cos(tau12)
        b12 = -gm.sin_cos_series(
            True, L["stau1"] * c + L["ctau1"] * s,
            L["ctau1"] * c - L["stau1"] * s, L["c1pa"])
        sig12 = tau12 - (b12 - L["b11"])
        ssig12, csig12 = np.sin(sig12), np.cos(sig12)
        if abs(g.f) > 0.01:
            # reverted series is inaccurate for |f| > 1/100: one Newton
            # polish (line.go:323-352)
            ssig2 = L["ssig1"] * csig12 + L["csig1"] * ssig12
            csig2 = L["csig1"] * csig12 - L["ssig1"] * ssig12
            b12 = gm.sin_cos_series(True, ssig2, csig2, L["c1a"])
            serr = ((1 + L["a1m1"]) * (sig12 + (b12 - L["b11"]))
                    - s12_a12 / g.b)
            sig12 = sig12 - serr / np.sqrt(1 + L["k2"] * gm.sq(ssig2))
            ssig12, csig12 = np.sin(sig12), np.cos(sig12)
        out["a12"] = gm.rad2deg(sig12)

    # sig2 = sig1 + sig12
    ssig2 = L["ssig1"] * csig12 + L["csig1"] * ssig12
    csig2 = L["csig1"] * csig12 - L["ssig1"] * ssig12
    dn2 = np.sqrt(1 + L["k2"] * gm.sq(ssig2))
    if outmask & (C.DISTANCE | C.REDUCED_LENGTH | C.GEODESIC_SCALE):
        if arcmode or abs(g.f) > 0.01:
            b12 = gm.sin_cos_series(True, ssig2, csig2, L["c1a"])
        ab1 = (1 + L["a1m1"]) * (b12 - L["b11"])
    sbet2 = L["calp0"] * ssig2
    cbet2 = np.hypot(L["salp0"], L["calp0"] * csig2)
    deg = cbet2 == 0  # salp0 = 0, csig2 = 0: break the degeneracy
    cbet2 = np.where(deg, gm.TINY, cbet2)
    csig2 = np.where(deg, gm.TINY, csig2)
    salp2, calp2 = L["salp0"], L["calp0"] * csig2

    if (outmask & C.DISTANCE) and arcmode:
        out["s12"] = g.b * ((1 + L["a1m1"]) * sig12 + ab1)

    if outmask & C.LONGITUDE:
        somg2 = L["salp0"] * ssig2
        comg2 = csig2
        east = np.where(np.signbit(L["salp0"]), -1.0, 1.0)
        if outmask & C.LONG_UNROLL:
            omg12 = east * (
                sig12 - (np.arctan2(ssig2, csig2)
                         - np.arctan2(L["ssig1"], L["csig1"]))
                + (np.arctan2(east * somg2, comg2)
                   - np.arctan2(east * L["somg1"], L["comg1"])))
        else:
            omg12 = np.arctan2(somg2 * L["comg1"] - comg2 * L["somg1"],
                               comg2 * L["comg1"] + somg2 * L["somg1"])
        lam12 = omg12 + L["a3c"] * (
            sig12 + (gm.sin_cos_series(True, ssig2, csig2, L["c3a"])
                     - L["b31"]))
        lon12 = gm.rad2deg(lam12)
        if outmask & C.LONG_UNROLL:
            out["lon2"] = L["lon1"] + lon12
        else:
            out["lon2"] = gm.ang_normalize(
                gm.ang_normalize(L["lon1"]) + gm.ang_normalize(lon12))

    if outmask & C.LATITUDE:
        out["lat2"] = gm.atan2d(sbet2, g.f1 * cbet2)

    if outmask & C.AZIMUTH:
        out["azi2"] = gm.atan2d(salp2, calp2)

    if outmask & (C.REDUCED_LENGTH | C.GEODESIC_SCALE):
        b22 = gm.sin_cos_series(True, ssig2, csig2, L["c2a"])
        ab2 = (1 + L["a2m1"]) * (b22 - L["b21"])
        j12 = (L["a1m1"] - L["a2m1"]) * sig12 + (ab1 - ab2)
        if outmask & C.REDUCED_LENGTH:
            # parens matter for cancellation at coincident points
            out["m12"] = g.b * ((dn2 * (L["csig1"] * ssig2)
                                 - L["dn1"] * (L["ssig1"] * csig2))
                                - L["csig1"] * csig2 * j12)
        if outmask & C.GEODESIC_SCALE:
            t = (L["k2"] * (ssig2 - L["ssig1"]) * (ssig2 + L["ssig1"])
                 / (L["dn1"] + dn2))
            out["M12"] = csig12 + ((t * ssig2 - csig2 * j12)
                                   * L["ssig1"] / L["dn1"])
            out["M21"] = csig12 - ((t * L["ssig1"] - L["csig1"] * j12)
                                   * ssig2 / dn2)

    if outmask & C.AREA:
        b42 = gm.sin_cos_series(False, ssig2, csig2, L["c4a"])
        deg0 = (L["calp0"] == 0) | (L["salp0"] == 0)
        # non-degenerate: tan(alp) = tan(alp0) * sec(sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(
                csig12 <= 0,
                L["csig1"] * (1 - csig12) + ssig12 * L["ssig1"],
                ssig12 * (L["csig1"] * ssig12 / (1 + csig12) + L["ssig1"]))
        salp12 = np.where(deg0, salp2 * L["calp1"] - calp2 * L["salp1"],
                          L["calp0"] * L["salp0"] * t)
        calp12 = np.where(deg0, calp2 * L["calp1"] + salp2 * L["salp1"],
                          gm.sq(L["salp0"])
                          + gm.sq(L["calp0"]) * L["csig1"] * csig2)
        out["S12area"] = (g.c2 * np.arctan2(salp12, calp12)
                          + L["a4"] * (b42 - L["b41"]))

    return out


def solve_position(g: GeodesicModel, L: dict, arcmode: bool, s12_a12,
                   outmask: int) -> dict:
    """Public position wrapper (line.go:250-275): fills point-1 echo
    fields with the reference's normalization conventions."""
    outmask &= C.OUT_MASK
    pr = gen_position(g, L, arcmode, s12_a12, outmask)
    if outmask & C.LONG_UNROLL:
        lon1 = L["lon1"]
    else:
        lon1 = gm.ang_normalize(L["lon1"])
    shape = pr["a12"].shape
    pr["lat1"] = np.broadcast_to(gm.lat_fix(L["lat1"]), shape).copy()
    pr["lon1"] = np.broadcast_to(lon1, shape).copy()
    pr["azi1"] = np.broadcast_to(gm.ang_normalize(L["azi1"]), shape).copy()
    return pr


def direct(g: GeodesicModel, lat1, lon1, azi1, s12,
           outmask: int = C.STANDARD) -> dict:
    """Direct problem by distance (direct.go:13-17)."""
    caps = outmask | C.DISTANCE_IN
    L = line_init(g, lat1, lon1, azi1, caps)
    return solve_position(g, L, False, s12, outmask)


def arc_direct(g: GeodesicModel, lat1, lon1, azi1, a12,
               outmask: int = C.STANDARD) -> dict:
    """Direct problem by spherical arc length (direct.go:19-22)."""
    L = line_init(g, lat1, lon1, azi1, outmask)
    return solve_position(g, L, True, a12, outmask)
