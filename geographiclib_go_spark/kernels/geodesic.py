"""Ellipsoid model + precomputed series coefficient tables.

Mirrors the reference's Geodesic struct (/root/reference/geodesic/
geodesic.go:140-226): immutable per-ellipsoid configuration.  The
coefficient tables (a3x/c3x/c4x — 6+15+21 floats) are tiny, so the
Spark layer never broadcasts them explicitly: each pandas UDF closure
captures (a, f) and reconstructs the table once per Python worker.
"""

from __future__ import annotations

import math

import numpy as np

from geographiclib_go_spark.kernels import geomath as gm


class GeodesicModel:
    """Per-ellipsoid constants; all kernels take one of these."""

    __slots__ = ("a", "f", "f1", "e2", "ep2", "b", "c2", "n", "etol2",
                 "a3x", "c3x", "c4x")

    def __init__(self, a: float, f: float):
        if not (math.isfinite(a) and a > 0):
            raise ValueError("equatorial radius is not positive")
        f1 = 1.0 - f
        b = a * f1
        if not (math.isfinite(b) and b > 0):
            raise ValueError("polar semi-axis is not positive")
        self.a = float(a)
        self.f = float(f)
        self.f1 = f1
        self.e2 = f * (2.0 - f)
        self.ep2 = self.e2 / gm.sq(f1)
        self.b = b
        self.n = f / (2.0 - f)
        self.c2 = _authalic_radius_sq(a, b, self.e2)
        # "really short" sig12 threshold (geodesic.go:177-186)
        self.etol2 = 0.1 * gm.TOL2 / math.sqrt(
            max(0.001, abs(f)) * min(1.0, 1.0 - f / 2) / 2)
        self.a3x = gm.init_a3x(self.n)
        self.c3x = gm.init_c3x(self.n)
        self.c4x = gm.init_c4x(self.n)

    # --- per-row series evaluators (eps is an array) ---------------------

    def a3f(self, eps):
        """A3 from the precomputed x-table (geodesic.go:229-231)."""
        return gm.polyval(self.a3x, eps)

    def c3f(self, eps):
        """C3[1..5]; index 0 is a zero placeholder (geodesic.go:234-243)."""
        eps = gm.arr(eps)
        c = [np.zeros_like(eps)]
        mult = np.ones_like(eps)
        o = 0
        for ell in range(1, gm.N_C3):
            m = gm.N_C3 - ell - 1  # polynomial order in eps
            mult = mult * eps
            c.append(mult * gm.polyval(self.c3x[o:o + m + 1], eps))
            o += m + 1
        return c

    def c4f(self, eps):
        """C4[0..5] (geodesic.go:246-255)."""
        eps = gm.arr(eps)
        c = []
        mult = np.ones_like(eps)
        o = 0
        for ell in range(gm.N_C4):
            m = gm.N_C4 - ell - 1
            c.append(mult * gm.polyval(self.c4x[o:o + m + 1], eps))
            o += m + 1
            mult = mult * eps
        return c

    @property
    def ellipsoid_area(self) -> float:
        """4*pi*c2 (geodesic.go:272-274)."""
        return 4 * math.pi * self.c2


def _authalic_radius_sq(a: float, b: float, e2: float) -> float:
    """Authalic radius squared (geodesic.go:211-226)."""
    if e2 == 0:
        mult = 1.0
    else:
        if e2 > 0:
            dividend = float(gm.atanh(math.sqrt(e2)))
        else:
            dividend = math.atan(math.sqrt(-e2))
        mult = dividend / math.sqrt(abs(e2))
    return (a * a + b * b * mult) / 2.0


WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

_wgs84_model = None


def wgs84_model() -> GeodesicModel:
    global _wgs84_model
    if _wgs84_model is None:
        _wgs84_model = GeodesicModel(WGS84_A, WGS84_F)
    return _wgs84_model
