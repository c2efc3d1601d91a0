"""Vectorized angle/series primitives for the geodesic kernels.

Every function operates elementwise on float64 numpy arrays (scalars
are accepted and broadcast).  Semantics — including signed-zero, NaN
and near-cancellation behavior — follow the reference's scalar
primitives (/root/reference/geodesic/geomath.go:42-340) and are gated
by the edge-case vectors in geomath_test.go:20-289, replicated in
tests/test_geomath.py.  The reference is scalar Go; this module is a
from-scratch numpy re-expression designed for Arrow batches: branches
become masks, Clenshaw summation is unrolled, and the per-ellipsoid
coefficient tables are plain Python tuples computed once at the driver
(geomath.go:342-470) and closed over by the pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# Constants (geomath.go:7-39).
DIGITS = 53
GEODESIC_ORDER = 6
N_A1 = GEODESIC_ORDER
N_C1 = GEODESIC_ORDER
N_C1P = GEODESIC_ORDER
N_A2 = GEODESIC_ORDER
N_C2 = GEODESIC_ORDER
N_A3 = GEODESIC_ORDER
N_A3X = N_A3
N_C3 = GEODESIC_ORDER
N_C3X = (N_C3 * (N_C3 - 1)) // 2
N_C4 = GEODESIC_ORDER
N_C4X = (N_C4 * (N_C4 + 1)) // 2
MAXIT1 = 20
MAXIT2 = MAXIT1 + DIGITS + 10

EPSILON = np.finfo(np.float64).eps  # nextafter(1, 2) - 1
TINY = float(np.sqrt(2.0 ** -1022))  # underflow guard; tiny*eps > 0
TOL0 = EPSILON
TOL1 = 200 * TOL0
TOL2 = float(np.sqrt(TOL0))
TOLB = TOL0 * TOL2
XTHRESH = 1000 * TOL2

_D2R = np.pi / 180.0
_R2D = 180.0 / np.pi


def arr(x) -> np.ndarray:
    """Coerce to a float64 ndarray (no copy when already one)."""
    return np.asarray(x, dtype=np.float64)


def sq(x):
    return x * x


def atanh(x):
    """log1p-based atanh with enforced odd parity (geomath.go:49-59)."""
    x = arr(x)
    y = np.abs(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        y = np.log1p(2 * y / (1 - y)) / 2
    return np.where(x > 0, y, np.where(x < 0, -y, x))


def norm(sinx, cosx):
    """Normalize a (sin, cos) pair by sqrt(s^2+c^2) — NOT hypot, which
    misrounds on some platforms (geomath.go:62-69).  Divides by r
    directly (no reciprocal trick: x/r must round exactly like the
    reference's scalar division)."""
    r = np.sqrt(sinx * sinx + cosx * cosx)
    with np.errstate(invalid="ignore", divide="ignore"):
        return sinx / r, cosx / r


def sum2(u, v):
    """Error-free 2Sum: s = fl(u+v), t = u+v-s (Knuth; geomath.go:73-84).

    When s == 0 the sign of the zero is taken from s itself (i.e. the
    IEEE sum of u and v), matching the reference exactly.
    """
    u = arr(u)
    v = arr(v)
    s = u + v
    up = s - v
    vpp = s - up
    up = up - u
    vpp = vpp - v
    t = np.where(s != 0, 0.0 - (up + vpp), s)
    return s, t


def polyval(coeffs, x):
    """Horner evaluation of scalar coefficients over an array x.
    In-place multiply-add on one work buffer: one allocation total
    instead of two per Horner step (this is a kernel hot path)."""
    x = arr(x)
    if not np.ndim(x):
        y = float(coeffs[0])
        for c in coeffs[1:]:
            y = y * x + c
        return y
    y = np.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        y *= x
        y += c
    return y


def ang_round(x):
    """Coarsen near-zero angles to the 1/2^57 grid; tiny negatives
    become -0 (geomath.go:112-120)."""
    x = arr(x)
    z = 1.0 / 16.0
    y = np.abs(x)
    small = y < z
    # force the FP rounding z - (z - y); numpy does not re-associate
    y = np.where(small, z - (z - y), y)
    return np.copysign(y, x)


def remainder(x, y):
    """IEEE-754 remainder(x, y) for scalar y > 0, vectorized.

    numpy < 2.0 lacks an IEEE remainder; np.fmod (exact,
    round-toward-zero) plus a parity-correct tie adjustment reproduces
    math.Remainder for all finite x with |x| < 2^53 * y (the full
    domain the engine sees).  Inf/NaN propagate as NaN via fmod.
    """
    x = arr(x)
    with np.errstate(invalid="ignore"):
        w = np.fmod(x, y)
        n0 = (x - w) / y  # exact integer quotient of the fmod step
        h = 0.5 * y
        odd = np.fmod(n0, 2.0) != 0
        up = (w > h) | ((w == h) & odd)
        dn = (w < -h) | ((w == -h) & odd)
    return np.where(up, w - y, np.where(dn, w + y, w))


def ang_normalize(x):
    """Normalize an angle in degrees to [-180, 180); the sign of a
    resulting ±180 comes from x (geomath.go:123-129)."""
    x = arr(x)
    y = remainder(x, 360.0)
    return np.where(np.abs(y) == 180.0, np.copysign(180.0, x), y)


def lat_fix(x):
    """|lat| > 90 → NaN (geomath.go:132-138)."""
    x = arr(x)
    return np.where(np.abs(x) > 90, np.nan, x)


def ang_diff(x, y):
    """Exact y - x reduced to [-180, 180] with error term: returns
    (d, e) where d = fl(z), e = z - d (geomath.go:146-155)."""
    x = arr(x)
    y = arr(y)
    t1, t2 = sum2(remainder(-x, 360.0), remainder(y, 360.0))
    d, e = sum2(remainder(t1, 360.0), t2)
    fix = (d == 0) | (np.abs(d) == 180.0)
    sign_src = np.where(e == 0, y - x, -e)
    d = np.where(fix, np.copysign(d, sign_src), d)
    return d, e


def deg2rad(d):
    return arr(d) * _D2R


def rad2deg(r):
    return arr(r) * _R2D


def _round_half_away(v):
    """Go math.Round semantics: round half away from zero, elementwise."""
    return np.copysign(np.floor(np.abs(v) + 0.5), v)


def _quadrant_select(q, s, c):
    """Map (sin r, cos r) through quadrant shift q (mod 4)."""
    qm = q & 3
    sinx = np.choose(qm, [s, c, -s, -c])
    cosx = np.choose(qm, [c, -s, -c, s])
    return sinx, cosx


def sincosd(x):
    """sin/cos of x in degrees with exact quadrant reduction
    (geomath.go:170-203): sin 9 == cos 81 == -sin 123456789."""
    x = arr(x)
    with np.errstate(invalid="ignore"):
        r = np.fmod(x, 360.0)  # NaN for inf/NaN input
    v = r / 90.0
    v = np.where(np.isnan(v), 0.0, _round_half_away(v))
    q = v.astype(np.int64)
    r = r - 90.0 * v
    r = deg2rad(r)
    s, c = np.sin(r), np.cos(r)
    sinx, cosx = _quadrant_select(q, s, c)
    sinx = np.where(sinx == 0, np.copysign(sinx, x), sinx)
    return sinx, 0.0 + cosx


def sincosde(x, t):
    """sincosd with small correction t; x in [-180, 180]; angRound is
    applied to the reduced angle (geomath.go:211-246)."""
    x = arr(x)
    t = arr(t)
    v = x / 90.0
    v = np.where(np.isnan(v), 0.0, _round_half_away(v))
    q = v.astype(np.int64)
    r = x - 90.0 * v
    r = deg2rad(ang_round(r + t))
    s, c = np.sin(r), np.cos(r)
    sinx, cosx = _quadrant_select(q, s, c)
    sinx = np.where(sinx == 0, np.copysign(sinx, x), sinx)
    return sinx, 0.0 + cosx


def atan2d(y, x):
    """Degrees atan2 with quadrant rearrangement for accuracy; ±0 rules
    per geomath.go:251-285 (atan2d(±0, -1) = ±180)."""
    y = arr(y)
    x = arr(x)
    swap = np.abs(y) > np.abs(x)
    xs = np.where(swap, y, x)
    ys = np.where(swap, x, y)
    q = np.where(swap, 2, 0)
    negx = np.signbit(xs) & (xs < 0)  # x < 0 (−0 is NOT < 0, like Go)
    # note: (xs < 0) alone is the Go condition; signbit& keeps NaN out
    negx = xs < 0
    xs = np.where(negx, -xs, xs)
    q = q + negx.astype(np.int64)
    with np.errstate(invalid="ignore"):
        ang = rad2deg(np.arctan2(ys, xs))
    ang = np.where(q == 1, np.copysign(180.0, ys) - ang, ang)
    ang = np.where(q == 2, 90.0 - ang, ang)
    ang = np.where(q == 3, -90.0 + ang, ang)
    return ang


def isfinite(x):
    return np.isfinite(arr(x))


def sin_cos_series(sinp: bool, sinx, cosx, c):
    """Clenshaw summation of a trig series (geomath.go:309-340):
      sinp: sum(c[i] * sin(2i x), i=1..n)
      else: sum(c[i] * cos((2i+1) x), i=0..n-1)
    c is a sequence of per-row arrays (or scalars); c[0] unused when
    sinp.  The order is fixed (<= 6), so the loop fully unrolls.
    """
    k = len(c)
    n = k - (1 if sinp else 0)
    ar = 2 * (cosx - sinx) * (cosx + sinx)  # 2 cos(2x)
    y0 = 0.0
    y1 = 0.0
    if n & 1:
        k -= 1
        y0 = c[k] + np.zeros_like(ar)
    else:
        y0 = np.zeros_like(ar)
    y1 = np.zeros_like(ar)
    n //= 2
    while n:
        n -= 1
        k -= 1
        t = ar * y0
        t -= y1
        t += c[k]
        y1 = t
        k -= 1
        t = ar * y1
        t -= y0
        t += c[k]
        y0 = t
    if sinp:
        return 2 * sinx * cosx * y0
    return cosx * (y0 - y1)


# ---------------------------------------------------------------------------
# Per-ellipsoid coefficient tables (computed once, driver-side, from the
# third flattening n; geomath.go:342-470).  These are the canonical
# Karney series coefficients (Algorithms for geodesics, J. Geodesy 2013).
# ---------------------------------------------------------------------------

_A3_COEFF = (
    (-3, 128),
    (-2, -3, 64),
    (-1, -3, -1, 16),
    (3, -1, -2, 8),
    (1, -1, 2),
    (1, 1),
)

_C3_COEFF = (
    (3, 128), (2, 5, 128), (-1, 3, 3, 64), (-1, 0, 1, 8), (-1, 1, 4),
    (5, 256), (1, 3, 128), (-3, -2, 3, 64), (1, -3, 2, 32),
    (7, 512), (-10, 9, 384), (5, -9, 5, 192),
    (7, 512), (-14, 7, 512),
    (21, 2560),
)

_C4_COEFF = (
    (97, 15015), (1088, 156, 45045), (-224, -4784, 1573, 45045),
    (-10656, 14144, -4576, -858, 45045),
    (64, 624, -4576, 6864, -3003, 15015),
    (100, 208, 572, 3432, -12012, 30030, 45045),
    (1, 9009), (-2944, 468, 135135), (5792, 1040, -1287, 135135),
    (5952, -11648, 9152, -2574, 135135),
    (-64, -624, 4576, -6864, 3003, 135135),
    (8, 10725), (1856, -936, 225225), (-8448, 4992, -1144, 225225),
    (-1440, 4160, -4576, 1716, 225225),
    (-136, 63063), (1024, -208, 105105), (3584, -3328, 1144, 315315),
    (-128, 135135), (-2560, 832, 405405),
    (128, 99099),
)


def _polyval_scalar(coeffs, x: float) -> float:
    y = float(coeffs[0])
    for c in coeffs[1:]:
        y = y * x + float(c)
    return y


def init_a3x(n: float) -> tuple:
    """A3 coefficient table: polynomial-in-n per eps power
    (geomath.go:342-366).  _A3_COEFF rows are ordered eps^5..eps^0;
    the a3x output index k runs the same direction."""
    out = []
    for row in _A3_COEFF:
        poly, denom = row[:-1], float(row[-1])
        out.append(_polyval_scalar(poly, n) / denom)
    return tuple(out)


def init_c3x(n: float) -> tuple:
    """C3 coefficient table (geomath.go:368-412)."""
    out = []
    for row in _C3_COEFF:
        poly, denom = row[:-1], float(row[-1])
        out.append(_polyval_scalar(poly, n) / denom)
    return tuple(out)


def init_c4x(n: float) -> tuple:
    """C4 coefficient table (geomath.go:414-470)."""
    out = []
    for row in _C4_COEFF:
        poly, denom = row[:-1], float(row[-1])
        out.append(_polyval_scalar(poly, n) / denom)
    return tuple(out)


# --- per-row (eps is an array) series coefficient evaluators -------------

def a1m1f(eps):
    """A1 - 1 (geomath.go:473-481)."""
    eps = arr(eps)
    t = polyval((1.0, 4.0, 64.0, 0.0), sq(eps)) / 256.0
    return (t + eps) / (1 - eps)


def c1f(eps):
    """C1[1..6]; returns list with index 0 a zero placeholder
    (geomath.go:484-508)."""
    eps = arr(eps)
    eps2 = sq(eps)
    d = eps
    c = [np.zeros_like(eps)]
    rows = ((-1.0, 6.0, -16.0, 32.0), (-9.0, 64.0, -128.0, 2048.0),
            (9.0, -16.0, 768.0), (3.0, -5.0, 512.0),
            (-7.0, 1280.0), (-7.0, 2048.0))
    for row in rows:
        poly, denom = row[:-1], row[-1]
        t = polyval(poly, eps2)
        t *= d
        t /= denom
        c.append(t)
        d = d * eps
    return c


def c1pf(eps):
    """C1'[1..6] — reverted series (geomath.go:511-535)."""
    eps = arr(eps)
    eps2 = sq(eps)
    d = eps
    c = [np.zeros_like(eps)]
    rows = ((205.0, -432.0, 768.0, 1536.0), (4005.0, -4736.0, 3840.0, 12288.0),
            (-225.0, 116.0, 384.0), (-7173.0, 2695.0, 7680.0),
            (3467.0, 7680.0), (38081.0, 61440.0))
    for row in rows:
        poly, denom = row[:-1], row[-1]
        t = polyval(poly, eps2)
        t *= d
        t /= denom
        c.append(t)
        d = d * eps
    return c


def a2m1f(eps):
    """A2 - 1 (geomath.go:538-546)."""
    eps = arr(eps)
    t = polyval((-11.0, -28.0, -192.0, 0.0), sq(eps)) / 256.0
    return (t - eps) / (1 + eps)


def c2f(eps):
    """C2[1..6] (geomath.go:549-574)."""
    eps = arr(eps)
    eps2 = sq(eps)
    d = eps
    c = [np.zeros_like(eps)]
    rows = ((1.0, 2.0, 16.0, 32.0), (35.0, 64.0, 384.0, 2048.0),
            (15.0, 80.0, 768.0), (7.0, 35.0, 512.0),
            (63.0, 1280.0), (77.0, 2048.0))
    for row in rows:
        poly, denom = row[:-1], row[-1]
        t = polyval(poly, eps2)
        t *= d
        t /= denom
        c.append(t)
        d = d * eps
    return c
