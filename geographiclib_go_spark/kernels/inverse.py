"""Vectorized inverse geodesic problem (masked Newton iteration).

Batch re-expression of the reference's inverse solver
(/root/reference/geodesic/inverse.go:30-744): canonicalize → dispatch
{meridian | equatorial | short-line | astroid-start + Newton} → area →
un-canonicalize.  The scalar code's per-row branches become boolean
masks over compacted subsets; the Newton loop runs as a fixed masked
iteration (cap MAXIT2 = 83, observed mean ≈ 2.85 on random WGS84
input per inverse.go:210-212) where converged rows freeze and drop out
of the active set.  This is the engine's spatial-join distance kernel.
"""

from __future__ import annotations

import numpy as np

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import geomath as gm
from geographiclib_go_spark.kernels.geodesic import GeodesicModel


def _lengths(g: GeodesicModel, eps, sig12, ssig1, csig1, dn1, ssig2, csig2,
             dn2, cbet1, cbet2, caps: int):
    """Distance / reduced-length / scale integrals via the C1, C2
    series (inverse.go:365-421).  Returns (s12b, m12b, m0, M12, M21)."""
    caps &= C.OUT_MASK
    nan = np.full_like(gm.arr(eps), np.nan)
    s12b, m12b, m0, M12, M21 = nan, nan.copy(), nan.copy(), nan.copy(), nan.copy()
    m0x = 0.0
    j12 = 0.0
    a1 = a2 = None
    c1a = c2a = None
    if caps & (C.DISTANCE | C.REDUCED_LENGTH | C.GEODESIC_SCALE):
        a1 = gm.a1m1f(eps)
        c1a = gm.c1f(eps)
        if caps & (C.REDUCED_LENGTH | C.GEODESIC_SCALE):
            a2 = gm.a2m1f(eps)
            c2a = gm.c2f(eps)
            m0x = a1 - a2
            a2 = 1 + a2
        a1 = 1 + a1

    if caps & C.DISTANCE:
        b1 = (gm.sin_cos_series(True, ssig2, csig2, c1a)
              - gm.sin_cos_series(True, ssig1, csig1, c1a))
        s12b = a1 * (sig12 + b1)
        if caps & (C.REDUCED_LENGTH | C.GEODESIC_SCALE):
            b2 = (gm.sin_cos_series(True, ssig2, csig2, c2a)
                  - gm.sin_cos_series(True, ssig1, csig1, c2a))
            j12 = m0x * sig12 + (a1 * b1 - a2 * b2)
    elif caps & (C.REDUCED_LENGTH | C.GEODESIC_SCALE):
        c2a = [None] + [a1 * c1a[i] - a2 * c2a[i] for i in range(1, gm.N_C2 + 1)]
        c2a[0] = np.zeros_like(gm.arr(eps))
        j12 = m0x * sig12 + (gm.sin_cos_series(True, ssig2, csig2, c2a)
                             - gm.sin_cos_series(True, ssig1, csig1, c2a))

    if caps & C.REDUCED_LENGTH:
        m0 = m0x + np.zeros_like(gm.arr(eps))
        # parens ensure accurate cancellation for coincident points
        m12b = (dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)
                - csig1 * csig2 * j12)

    if caps & C.GEODESIC_SCALE:
        csig12 = csig1 * csig2 + ssig1 * ssig2
        t = g.ep2 * (cbet1 - cbet2) * (cbet1 + cbet2) / (dn1 + dn2)
        M12 = csig12 + (t * ssig2 - csig2 * j12) * ssig1 / dn1
        M21 = csig12 - (t * ssig1 - csig1 * j12) * ssig2 / dn2
    return s12b, m12b, m0, M12, M21


def _astroid(x, y):
    """Positive root k of k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2 = 0
    (closed form; inverse.go:591-646), branch-free over arrays."""
    p = gm.sq(x)
    q = gm.sq(y)
    r = (p + q - 1) / 6
    easy = (q == 0) & (r <= 0)  # y = 0 with |x| <= 1
    with np.errstate(divide="ignore", invalid="ignore"):
        S = p * q / 4
        r2 = gm.sq(r)
        r3 = r * r2
        disc = S * (S + 2 * r3)
        u = r.copy()
        pos = disc >= 0
        # disc >= 0 branch
        T3 = S + r3
        T3 = T3 + np.where(T3 < 0, -np.sqrt(np.abs(disc)),
                           np.sqrt(np.abs(disc)))
        T = np.cbrt(T3)
        j = np.where(T != 0, r2 / np.where(T != 0, T, 1.0), 0.0)
        u_pos = u + T + j
        # disc < 0 branch (r < 0 here)
        ang = np.arctan2(np.sqrt(np.abs(-disc)), -(S + r3))
        u_neg = u + 2 * r * np.cos(ang / 3)
        u = np.where(pos, u_pos, u_neg)
        v = np.sqrt(gm.sq(u) + q)
        uv = np.where(u < 0, q / np.where(v - u != 0, v - u, 1.0), u + v)
        w = (uv - q) / (2 * v)
        k = uv / (np.sqrt(uv + gm.sq(w)) + w)
    return np.where(easy, 0.0, k)


def _inverse_start(g: GeodesicModel, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
                   lam12, slam12, clam12):
    """Newton starting guess (inverse.go:435-587).  Returns
    (sig12, salp1, calp1, salp2, calp2, dnm); sig12 >= 0 means a
    short-line shortcut solution was produced."""
    n = sbet1.shape
    sig12 = np.full(n, -1.0)
    salp2 = np.full(n, np.nan)
    calp2 = np.full(n, np.nan)
    dnm = np.full(n, np.nan)

    sbet12 = sbet2 * cbet1 - cbet2 * sbet1
    cbet12 = cbet2 * cbet1 + sbet2 * sbet1
    sbet12a = sbet2 * cbet1 + cbet2 * sbet1

    shortline = (cbet12 >= 0) & (sbet12 < 0.5) & (cbet2 * lam12 < 0.5)
    sbetm2 = gm.sq(sbet1 + sbet2)
    with np.errstate(invalid="ignore", divide="ignore"):
        sbetm2 = sbetm2 / (sbetm2 + gm.sq(cbet1 + cbet2))
    dnm_sl = np.sqrt(1 + g.ep2 * sbetm2)
    omg12_sl = lam12 / (g.f1 * dnm_sl)
    dnm = np.where(shortline, dnm_sl, dnm)
    somg12 = np.where(shortline, np.sin(omg12_sl), slam12)
    comg12 = np.where(shortline, np.cos(omg12_sl), clam12)

    salp1 = cbet2 * somg12
    with np.errstate(invalid="ignore", divide="ignore"):
        calp1 = np.where(
            comg12 >= 0,
            sbet12 + cbet2 * sbet1 * gm.sq(somg12) / (1 + comg12),
            sbet12a - cbet2 * sbet1 * gm.sq(somg12) / (1 - comg12))
    ssig12 = np.hypot(salp1, calp1)
    csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

    really_short = shortline & (ssig12 < g.etol2)
    if really_short.any():
        s2 = cbet1 * somg12
        with np.errstate(invalid="ignore", divide="ignore"):
            t = np.where(comg12 >= 0, gm.sq(somg12) / (1 + comg12),
                         1 - comg12)
        c2_ = sbet12 - cbet1 * sbet2 * t
        s2n, c2n = gm.norm(s2, c2_)
        salp2 = np.where(really_short, s2n, salp2)
        calp2 = np.where(really_short, c2n, calp2)
        sig12 = np.where(really_short, np.arctan2(ssig12, csig12), sig12)

    skip_astroid = (np.abs(g.n) > 0.1)  # scalar: too eccentric
    astro = (~really_short & (csig12 < 0)
             & (ssig12 < 6 * abs(g.n) * np.pi * gm.sq(cbet1)))
    if not skip_astroid and astro.any():
        ia = np.flatnonzero(astro)
        sb1, cb1 = sbet1[ia], cbet1[ia]
        sb2, cb2 = sbet2[ia], cbet2[ia]
        dn1a, dn2a = dn1[ia], dn2[ia]
        sl12, cl12 = slam12[ia], clam12[ia]
        sb12a = sbet12a[ia]
        lam12x = np.arctan2(-sl12, -cl12)  # lam12 - pi
        if g.f >= 0:  # x = dlong, y = dlat
            k2 = gm.sq(sb1) * g.ep2
            eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
            lamscale = g.f * cb1 * g.a3f(eps) * np.pi
            betscale = lamscale * cb1
            x = lam12x / lamscale
            y = sb12a / betscale
        else:  # f < 0: x = dlat, y = dlong
            cbet12a = cb2 * cb1 - sb2 * sb1
            bet12a = np.arctan2(sb12a, cbet12a)
            _, m12b, m0, _, _ = _lengths(
                g, np.full_like(sb1, g.n), np.pi + bet12a, sb1, -cb1, dn1a,
                sb2, cb2, dn2a, cb1, cb2, C.REDUCED_LENGTH)
            t = cb1 * cb2 * m0 * np.pi
            x = -1 + m12b / t
            with np.errstate(invalid="ignore", divide="ignore"):
                betscale = np.where(x < -0.01, sb12a / x,
                                    -g.f * gm.sq(cb1) * np.pi)
            lamscale = betscale / cb1
            y = lam12x / lamscale

        strip = (y > -gm.TOL1) & (x > -1 - gm.XTHRESH)
        # strip-near-cut estimates
        if g.f >= 0:
            salp1_s = np.minimum(1.0, -x)
            calp1_s = -np.sqrt(np.maximum(0.0, 1 - gm.sq(salp1_s)))
        else:
            calp1_s = np.maximum(np.where(x > -gm.TOL1, 0.0, -1.0), x)
            salp1_s = np.sqrt(np.maximum(0.0, 1 - gm.sq(calp1_s)))
        # astroid estimates (via omg12a; see inverse.go:531-576)
        k = _astroid(x, y)
        if g.f >= 0:
            t = -x * k / (1 + k)
        else:
            t = -y * (1 + k) / np.where(k != 0, k, np.nan)
        omg12a = lamscale * t
        somg12a = np.sin(omg12a)
        comg12a = -np.cos(omg12a)
        salp1_a = cb2 * somg12a
        with np.errstate(invalid="ignore", divide="ignore"):
            calp1_a = sb12a - cb2 * sb1 * gm.sq(somg12a) / (1 - comg12a)
        salp1[ia] = np.where(strip, salp1_s, salp1_a)
        calp1[ia] = np.where(strip, calp1_s, calp1_a)

    # Sanity check on the starting guess; backwards check lets NaN through
    ok = ~(salp1 <= 0)
    s_n, c_n = gm.norm(np.where(ok, salp1, 1.0), np.where(ok, calp1, 0.0))
    salp1 = np.where(ok, s_n, 1.0)
    calp1 = np.where(ok, c_n, 0.0)
    return sig12, salp1, calp1, salp2, calp2, dnm


def _lambda12(g: GeodesicModel, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
              salp1, calp1, slam120, clam120, diffp: bool):
    """Newton residual lambda12(alp1) - lam12 and its derivative
    (inverse.go:662-744).  Returns a dict of arrays."""
    calp1 = np.where((sbet1 == 0) & (calp1 == 0), -gm.TINY, calp1)

    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)

    ssig1 = sbet1
    somg1 = salp0 * sbet1
    comg1 = calp1 * cbet1
    csig1 = comg1
    ssig1, csig1 = gm.norm(ssig1, csig1)

    with np.errstate(invalid="ignore", divide="ignore"):
        salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
        t = np.where(cbet1 < -sbet1,
                     (cbet2 - cbet1) * (cbet1 + cbet2),
                     (sbet1 - sbet2) * (sbet1 + sbet2))
        calp2 = np.where(
            (cbet2 != cbet1) | (np.abs(sbet2) != -sbet1),
            np.sqrt(gm.sq(calp1 * cbet1) + t) / cbet2,
            np.abs(calp1))

    ssig2 = sbet2
    somg2 = salp0 * sbet2
    comg2 = calp2 * cbet2
    csig2 = comg2
    ssig2, csig2 = gm.norm(ssig2, csig2)

    y = csig1 * ssig2 - ssig1 * csig2
    x = csig1 * csig2 + ssig1 * ssig2
    sig12 = np.arctan2(np.maximum(0.0, y), x)
    somg12 = np.maximum(0.0, comg1 * somg2 - somg1 * comg2)
    comg12 = comg1 * comg2 + somg1 * somg2
    # eta = omg12 - lam120
    y = somg12 * clam120 - comg12 * slam120
    x = comg12 * clam120 + somg12 * slam120
    eta = np.arctan2(y, x)
    k2 = gm.sq(calp0) * g.ep2
    eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
    c3a = g.c3f(eps)
    b312 = (gm.sin_cos_series(True, ssig2, csig2, c3a)
            - gm.sin_cos_series(True, ssig1, csig1, c3a))
    domg12 = -g.f * g.a3f(eps) * salp0 * (sig12 + b312)
    lam12 = eta + domg12

    if diffp:
        with np.errstate(invalid="ignore", divide="ignore"):
            _, m12b, _, _, _ = _lengths(g, eps, sig12, ssig1, csig1, dn1,
                                        ssig2, csig2, dn2, cbet1, cbet2,
                                        C.REDUCED_LENGTH)
            dlam12 = np.where(calp2 == 0,
                              -2 * g.f1 * dn1 / sbet1,
                              m12b * g.f1 / (calp2 * cbet2))
    else:
        dlam12 = np.full_like(lam12, np.nan)

    return {"lam12": lam12, "salp2": salp2, "calp2": calp2, "sig12": sig12,
            "ssig1": ssig1, "csig1": csig1, "ssig2": ssig2, "csig2": csig2,
            "eps": eps, "domg12": domg12, "dlam12": dlam12}


def gen_inverse(g: GeodesicModel, lat1, lon1, lat2, lon2, outmask: int):
    """Full inverse algorithm over arrays (inverse.go:30-355).

    Returns dict with a12/s12/m12/M12/M21/S12area/lat1/lon1/lat2/lon2
    plus (salp1, calp1, salp2, calp2) for azimuth assembly.
    """
    outmask &= C.OUT_MASK
    lat1 = gm.arr(lat1).copy()
    lon1 = gm.arr(lon1)
    lat2 = gm.arr(lat2).copy()
    lon2 = gm.arr(lon2)
    lat1, lat2, lon1, lon2 = np.broadcast_arrays(lat1, lat2, lon1, lon2)
    lat1 = lat1.astype(np.float64).copy()
    lat2 = lat2.astype(np.float64).copy()
    shape = lat1.shape
    nan = np.full(shape, np.nan)
    out = {k: nan.copy() for k in
           ("a12", "s12", "m12", "M12", "M21", "S12area")}

    lat1 = gm.lat_fix(lat1)
    lat2 = gm.lat_fix(lat2)
    out["lat1"], out["lat2"] = lat1.copy(), lat2.copy()

    lat1 = gm.ang_round(lat1)
    lat2 = gm.ang_round(lat2)
    lon12, lon12s = gm.ang_diff(lon1, lon2)
    if outmask & C.LONG_UNROLL:
        out["lon1"] = lon1 + np.zeros(shape)
        out["lon2"] = (lon1 + lon12) + lon12s
    else:
        out["lon1"] = gm.ang_normalize(lon1) + np.zeros(shape)
        out["lon2"] = gm.ang_normalize(lon2) + np.zeros(shape)

    lon_sign = np.copysign(1.0, lon12)
    lon12 = lon12 * lon_sign
    lon12s = lon12s * lon_sign
    lam12 = gm.deg2rad(lon12)
    slam12, clam12 = gm.sincosde(lon12, lon12s)
    lon12s = (180.0 - lon12) - lon12s  # supplementary longitude diff

    # canonicalize: |lat1| >= |lat2| (NaN lat2 swaps in), lat1 <= 0
    swapp = np.where((np.abs(lat1) < np.abs(lat2)) | np.isnan(lat2),
                     -1.0, 1.0)
    do_swap = swapp < 0
    lon_sign = np.where(do_swap, -lon_sign, lon_sign)
    lat1_, lat2_ = (np.where(do_swap, lat2, lat1),
                    np.where(do_swap, lat1, lat2))
    lat1, lat2 = lat1_, lat2_
    lat_sign = np.copysign(1.0, -lat1)
    lat1 = lat1 * lat_sign
    lat2 = lat2 * lat_sign

    sbet1, cbet1 = gm.sincosd(lat1)
    sbet1 = sbet1 * g.f1
    sbet1, cbet1 = gm.norm(sbet1, cbet1)
    cbet1 = np.maximum(gm.TINY, cbet1)
    sbet2, cbet2 = gm.sincosd(lat2)
    sbet2 = sbet2 * g.f1
    sbet2, cbet2 = gm.norm(sbet2, cbet2)
    cbet2 = np.maximum(gm.TINY, cbet2)

    # enforce bet2 = +/- bet1 symmetry when the measures vanish
    m1 = cbet1 < -sbet1
    sbet2 = np.where(m1 & (cbet2 == cbet1), np.copysign(sbet1, sbet2), sbet2)
    cbet2 = np.where(~m1 & (np.abs(sbet2) == -sbet1), cbet1, cbet2)

    dn1 = np.sqrt(1 + g.ep2 * gm.sq(sbet1))
    dn2 = np.sqrt(1 + g.ep2 * gm.sq(sbet2))

    s12x = nan.copy()
    m12x = nan.copy()
    sig12 = nan.copy()
    salp1 = nan.copy()
    calp1 = nan.copy()
    salp2 = nan.copy()
    calp2 = nan.copy()
    M12 = nan.copy()
    M21 = nan.copy()
    a12 = nan.copy()

    meridian = (lat1 == -90) | (slam12 == 0)
    if meridian.any():
        im = np.flatnonzero(meridian)
        c1 = clam12[im]
        s1 = slam12[im]
        sb1, cb1, sb2, cb2 = sbet1[im], cbet1[im], sbet2[im], cbet2[im]
        ssig1m, csig1m = sb1, c1 * cb1
        ssig2m, csig2m = sb2, cb2  # calp2 = 1
        sig12m = np.arctan2(
            np.maximum(0.0, csig1m * ssig2m - ssig1m * csig2m),
            csig1m * csig2m + ssig1m * ssig2m)
        s12b, m12b, _, M12m, M21m = _lengths(
            g, np.full_like(sb1, g.n), sig12m, ssig1m, csig1m, dn1[im],
            ssig2m, csig2m, dn2[im], cb1, cb2,
            outmask | C.DISTANCE | C.REDUCED_LENGTH)
        ok = (sig12m < 1) | (m12b >= 0)
        zero_fix = (sig12m < 3 * gm.TINY) | (
            (sig12m < gm.TOL0) & ((s12b < 0) | (m12b < 0)))
        sig12m = np.where(zero_fix, 0.0, sig12m)
        m12b = np.where(zero_fix, 0.0, m12b)
        s12b = np.where(zero_fix, 0.0, s12b)
        keep = im[ok]
        salp1[keep] = s1[ok]
        calp1[keep] = c1[ok]
        salp2[keep] = 0.0
        calp2[keep] = 1.0
        sig12[keep] = sig12m[ok]
        s12x[keep] = (s12b * g.b)[ok]
        m12x[keep] = (m12b * g.b)[ok]
        M12[keep] = M12m[ok]
        M21[keep] = M21m[ok]
        a12[keep] = gm.rad2deg(sig12m[ok])
        # m12 < 0: prolate, too close to antipodal — fall to general
        meridian[im[~ok]] = False

    somg12 = np.full(shape, 2.0)
    comg12 = nan.copy()
    omg12 = nan.copy()

    equatorial = (~meridian & (sbet1 == 0)
                  & ((g.f <= 0) | (lon12s >= g.f * 180)))
    if equatorial.any():
        ie = np.flatnonzero(equatorial)
        calp1[ie] = 0.0
        calp2[ie] = 0.0
        salp1[ie] = 1.0
        salp2[ie] = 1.0
        lam = lam12[ie]
        s12x[ie] = g.a * lam
        sig12[ie] = lam / g.f1
        omg12[ie] = lam / g.f1
        m12x[ie] = g.b * np.sin(lam / g.f1)
        if outmask & C.GEODESIC_SCALE:
            M12[ie] = np.cos(lam / g.f1)
            M21[ie] = np.cos(lam / g.f1)
        a12[ie] = lon12[ie] / g.f1

    general = ~meridian & ~equatorial
    if general.any():
        ig = np.flatnonzero(general)
        sb1, cb1, sb2, cb2 = sbet1[ig], cbet1[ig], sbet2[ig], cbet2[ig]
        d1, d2 = dn1[ig], dn2[ig]
        lamg, slamg, clamg = lam12[ig], slam12[ig], clam12[ig]
        sig12g, salp1g, calp1g, salp2g, calp2g, dnm = _inverse_start(
            g, sb1, cb1, d1, sb2, cb2, d2, lamg, slamg, clamg)

        short = sig12g >= 0
        if short.any():
            isx = ig[short]
            dn_m = dnm[short]
            sg = sig12g[short]
            s12x[isx] = sg * g.b * dn_m
            m12x[isx] = gm.sq(dn_m) * g.b * np.sin(sg / dn_m)
            if outmask & C.GEODESIC_SCALE:
                M12[isx] = np.cos(sg / dn_m)
                M21[isx] = np.cos(sg / dn_m)
            a12[isx] = gm.rad2deg(sg)
            omg12[isx] = lamg[short] / (g.f1 * dn_m)
            sig12[isx] = sg
            salp1[isx] = salp1g[short]
            calp1[isx] = calp1g[short]
            salp2[isx] = salp2g[short]
            calp2[isx] = calp2g[short]

        newt = ~short
        if newt.any():
            inw = ig[newt]  # full-array indices of Newton rows
            k = inw.size
            sb1n, cb1n = sb1[newt], cb1[newt]
            sb2n, cb2n = sb2[newt], cb2[newt]
            d1n, d2n = d1[newt], d2[newt]
            slamn, clamn = slamg[newt], clamg[newt]
            sa1 = salp1g[newt].copy()
            ca1 = calp1g[newt].copy()
            # bracket (inverse.go:205-207)
            salp1a = np.full(k, gm.TINY)
            calp1a = np.ones(k)
            salp1b = np.full(k, gm.TINY)
            calp1b = np.full(k, -1.0)
            tripn = np.zeros(k, dtype=bool)
            tripb = np.zeros(k, dtype=bool)
            active = np.ones(k, dtype=bool)
            ssig1n = np.full(k, np.nan)
            csig1n = np.full(k, np.nan)
            ssig2n = np.full(k, np.nan)
            csig2n = np.full(k, np.nan)
            epsn = np.full(k, np.nan)
            domg12n = np.full(k, np.nan)
            sig12n = np.full(k, np.nan)
            sa2 = np.full(k, np.nan)
            ca2 = np.full(k, np.nan)

            for numit in range(gm.MAXIT2):
                if not active.any():
                    break
                ia = np.flatnonzero(active)
                r = _lambda12(g, sb1n[ia], cb1n[ia], d1n[ia], sb2n[ia],
                              cb2n[ia], d2n[ia], sa1[ia], ca1[ia],
                              slamn[ia], clamn[ia], numit < gm.MAXIT1)
                v = r["lam12"]
                dv = r["dlam12"]
                sig12n[ia] = r["sig12"]
                ssig1n[ia] = r["ssig1"]
                csig1n[ia] = r["csig1"]
                ssig2n[ia] = r["ssig2"]
                csig2n[ia] = r["csig2"]
                epsn[ia] = r["eps"]
                domg12n[ia] = r["domg12"]
                sa2[ia] = r["salp2"]
                ca2[ia] = r["calp2"]

                # reversed logic lets NaN escape (inverse.go:219)
                thresh = np.where(tripn[ia], 8.0, 1.0) * gm.TOL0
                done = tripb[ia] | ~(np.abs(v) >= thresh)
                active[ia[done]] = False
                live = ~done
                if not live.any():
                    continue
                il = ia[live]
                vl = v[live]
                dvl = dv[live]

                # update bracket (inverse.go:223-227)
                with np.errstate(divide="ignore", invalid="ignore"):
                    ratio = ca1[il] / sa1[il]
                    ratio_b = calp1b[il] / salp1b[il]
                    ratio_a = calp1a[il] / salp1a[il]
                upd_b = (vl > 0) & ((numit > gm.MAXIT1) | (ratio > ratio_b))
                upd_a = (vl < 0) & ((numit > gm.MAXIT1) | (ratio < ratio_a))
                ib = il[upd_b]
                salp1b[ib] = sa1[ib]
                calp1b[ib] = ca1[ib]
                iaa = il[upd_a]
                salp1a[iaa] = sa1[iaa]
                calp1a[iaa] = ca1[iaa]

                newton_ok = np.zeros(live.sum(), dtype=bool)
                if numit < gm.MAXIT1:
                    pos = dvl > 0
                    with np.errstate(divide="ignore", invalid="ignore"):
                        dalp1 = np.where(pos, -vl / np.where(pos, dvl, 1.0),
                                         np.nan)
                    sd = np.sin(dalp1)
                    cd = np.cos(dalp1)
                    nsalp1 = sa1[il] * cd + ca1[il] * sd
                    newton_ok = pos & (nsalp1 > 0) & (np.abs(dalp1) < np.pi)
                    inew = il[newton_ok]
                    if inew.size:
                        cdn = cd[newton_ok]
                        sdn = sd[newton_ok]
                        new_c = ca1[inew] * cdn - sa1[inew] * sdn
                        new_s = nsalp1[newton_ok]
                        new_s, new_c = gm.norm(new_s, new_c)
                        sa1[inew] = new_s
                        ca1[inew] = new_c
                        tripn[inew] = np.abs(vl[newton_ok]) <= 16 * gm.TOL0

                # bisection fallback (inverse.go:244-255)
                ibs = il[~newton_ok]
                if ibs.size:
                    ns = (salp1a[ibs] + salp1b[ibs]) / 2
                    nc = (calp1a[ibs] + calp1b[ibs]) / 2
                    ns, nc = gm.norm(ns, nc)
                    sa1[ibs] = ns
                    ca1[ibs] = nc
                    tripn[ibs] = False
                    tripb[ibs] = (
                        (np.abs(salp1a[ibs] - ns) + (calp1a[ibs] - nc)
                         < gm.TOLB)
                        | (np.abs(ns - salp1b[ibs]) + (nc - calp1b[ibs])
                           < gm.TOLB))

            # canonical lengths with the I2 integral (inverse.go:258-270)
            s12b, m12b, _, M12n, M21n = _lengths(
                g, epsn, sig12n, ssig1n, csig1n, d1n, ssig2n, csig2n, d2n,
                cb1n, cb2n,
                C.DISTANCE | C.REDUCED_LENGTH | C.GEODESIC_SCALE)
            s12x[inw] = s12b * g.b
            m12x[inw] = m12b * g.b
            M12[inw] = M12n
            M21[inw] = M21n
            a12[inw] = gm.rad2deg(sig12n)
            sig12[inw] = sig12n
            salp1[inw] = sa1
            calp1[inw] = ca1
            salp2[inw] = sa2
            calp2[inw] = ca2
            if outmask & C.AREA:
                # omg12 = lam12 - domg12
                sd, cd = np.sin(domg12n), np.cos(domg12n)
                somg12[inw] = slamn * cd - clamn * sd
                comg12[inw] = clamn * cd + slamn * sd

    if outmask & C.DISTANCE:
        out["s12"] = 0.0 + s12x
    if outmask & C.REDUCED_LENGTH:
        out["m12"] = 0.0 + m12x
    if outmask & C.GEODESIC_SCALE:
        out["M12"] = M12
        out["M21"] = M21
    out["a12"] = a12

    if outmask & C.AREA:
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        nz = (calp0 != 0) & (salp0 != 0)
        ssig1a, csig1a = gm.norm(sbet1, calp1 * cbet1)
        ssig2a, csig2a = gm.norm(sbet2, calp2 * cbet2)
        k2 = gm.sq(calp0) * g.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        A4 = gm.sq(g.a) * calp0 * salp0 * g.e2
        c4a = g.c4f(eps)
        b41 = gm.sin_cos_series(False, ssig1a, csig1a, c4a)
        b42 = gm.sin_cos_series(False, ssig2a, csig2a, c4a)
        s12a = np.where(nz, A4 * (b42 - b41), 0.0)

        need_omg = ~meridian & (somg12 == 2)
        somg12 = np.where(need_omg, np.sin(omg12), somg12)
        comg12 = np.where(need_omg, np.cos(omg12), comg12)

        gam = (~meridian & (comg12 > -0.7071) & (sbet2 - sbet1 < 1.75))
        # tan(Gamma/2) formula
        domg12_ = 1 + comg12
        dbet1 = 1 + cbet1
        dbet2 = 1 + cbet2
        alp12_g = 2 * np.arctan2(
            somg12 * (sbet1 * dbet2 + sbet2 * dbet1),
            domg12_ * (sbet1 * sbet2 + dbet1 * dbet2))
        # alp12 = alp2 - alp1 fallback
        salp12 = salp2 * calp1 - calp2 * salp1
        calp12 = calp2 * calp1 + salp2 * salp1
        zfix = (salp12 == 0) & (calp12 < 0)
        salp12 = np.where(zfix, gm.TINY * calp1, salp12)
        calp12 = np.where(zfix, -1.0, calp12)
        alp12 = np.where(gam, alp12_g, np.arctan2(salp12, calp12))

        s12a = s12a + g.c2 * alp12
        s12a = s12a * (swapp * lon_sign * lat_sign)
        out["S12area"] = s12a + 0.0

    # un-canonicalize azimuth sin/cos pairs (inverse.go:341-353)
    sw = do_swap
    salp1f = np.where(sw, salp2, salp1)
    salp2f = np.where(sw, salp1, salp2)
    calp1f = np.where(sw, calp2, calp1)
    calp2f = np.where(sw, calp1, calp2)
    if outmask & C.GEODESIC_SCALE:
        out["M12"] = np.where(sw, M21, M12)
        out["M21"] = np.where(sw, M12, M21)

    out["salp1"] = salp1f * (swapp * lon_sign)
    out["calp1"] = calp1f * (swapp * lat_sign)
    out["salp2"] = salp2f * (swapp * lon_sign)
    out["calp2"] = calp2f * (swapp * lat_sign)
    return out


def inverse(g: GeodesicModel, lat1, lon1, lat2, lon2,
            outmask: int = C.STANDARD) -> dict:
    """Inverse problem (inverse.go:13-20): gen_inverse + azimuths."""
    caps = outmask & C.OUT_MASK
    out = gen_inverse(g, lat1, lon1, lat2, lon2, caps)
    if caps & C.AZIMUTH:
        out["azi1"] = gm.atan2d(out["salp1"], out["calp1"])
        out["azi2"] = gm.atan2d(out["salp2"], out["calp2"])
    else:
        out["azi1"] = np.full_like(out["a12"], np.nan)
        out["azi2"] = np.full_like(out["a12"], np.nan)
    return out
