"""GeodSolve-style CLI over the scalar parity API (the engine analog
of /root/reference/examples/{direct,inverse}: same prompts, same
outputs, plus polygon/gnomonic modes and arbitrary ellipsoids).

Usage:
  python scripts/geodsolve.py direct  lat1 lon1 azi1 s12 [a f]
  python scripts/geodsolve.py inverse lat1 lon1 lat2 lon2 [a f]
  python scripts/geodsolve.py polygon lat1 lon1 lat2 lon2 ... [--polyline]
  python scripts/geodsolve.py gnomonic-fwd lat0 lon0 lat lon
  python scripts/geodsolve.py gnomonic-rev lat0 lon0 x y
With no point arguments, reads whitespace-separated values per line
from stdin (batch mode, like the piped use of the reference examples).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geographiclib_go_spark.kernels.api import (  # noqa: E402
    Geodesic, Gnomonic, PolygonArea)
from geographiclib_go_spark.kernels.geodesic import (  # noqa: E402
    WGS84_A, WGS84_F)


def _geod(vals):
    if len(vals) >= 2:
        return Geodesic(vals[0], vals[1])
    if len(vals) == 1:
        # a lone trailing value is ambiguous (a without f?) — refuse
        # rather than silently computing on WGS84
        raise SystemExit(
            "ellipsoid override needs BOTH a and f (got one value); "
            "omit both for WGS84")
    return Geodesic(WGS84_A, WGS84_F)


def solve(mode: str, v: list) -> str:
    if mode == "direct":
        g = _geod(v[4:])
        r = g.direct(v[0], v[1], v[2], v[3])
        return f"lat2: {r.lat2:.6f}, lon2: {r.lon2:.6f}, azi2: {r.azi2:.6f}"
    if mode == "inverse":
        g = _geod(v[4:])
        r = g.inverse(v[0], v[1], v[2], v[3])
        return (f"s12: {r.s12:.3f}, azi1: {r.azi1:.6f}, "
                f"azi2: {r.azi2:.6f}")
    if mode == "gnomonic-fwd":
        p = Gnomonic().forward(v[0], v[1], v[2], v[3])
        return (f"x: {p['x']:.3f}, y: {p['y']:.3f}, "
                f"azi: {p['azi']:.6f}, rk: {p['rk']:.8f}")
    if mode == "gnomonic-rev":
        p = Gnomonic().reverse(v[0], v[1], v[2], v[3])
        return (f"lat: {p['lat']:.6f}, lon: {p['lon']:.6f}, "
                f"azi: {p['azi']:.6f}, rk: {p['rk']:.8f}")
    raise SystemExit(f"unknown mode {mode!r}")


def main(argv):
    if not argv:
        raise SystemExit(__doc__)
    mode = argv[0]
    if mode not in ("direct", "inverse", "polygon",
                    "gnomonic-fwd", "gnomonic-rev"):
        raise SystemExit(f"unknown mode {mode!r}\n{__doc__}")
    rest = argv[1:]
    if mode == "polygon":
        polyline = "--polyline" in rest
        vals = [float(x) for x in rest if x != "--polyline"]
        pa = PolygonArea(Geodesic(WGS84_A, WGS84_F), polyline=polyline)
        for i in range(0, len(vals), 2):
            pa.add_point(vals[i], vals[i + 1])
        num, perimeter, area = pa.compute()
        print(f"num: {num}, perimeter: {perimeter:.3f}, "
              f"area: {area:.1f}")
        return
    if rest:
        print(solve(mode, [float(x) for x in rest]))
        return
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        print(solve(mode, [float(x) for x in line.split()]))


if __name__ == "__main__":
    main(sys.argv[1:])
