"""Rhumb (loxodrome) kernel gates.

The oracle for the registered rhumb queries is DuckDB recomputing the
ellipsoidal closed forms (queries._rhumb_sql); these tests pin the
kernel against INDEPENDENT references instead: the geodesic kernel
(meridian/equator coincidence), exact parallel arcs, a fine RK4
integration of the loxodrome ODE, and the analytic limits the divided
differences must hit branch-free.  The last test measures the
rounding-boundary clearances the driver hash gate relies on.
"""

import numpy as np
import pytest

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import geomath as gm
from geographiclib_go_spark.kernels import inverse as ki
from geographiclib_go_spark.kernels import rhumb as R
from geographiclib_go_spark.kernels.geodesic import GeodesicModel

W = R.WGS84


def test_meridian_matches_geodesic():
    """Along a meridian the rhumb IS the geodesic — two totally
    independent code paths (rectifying series vs Karney) must agree
    to sub-mm."""
    g = GeodesicModel(W.a, W.f)
    lat1 = np.array([-80.0, -10.0, 0.0, 37.5])
    lat2 = np.array([-20.0, 55.0, 90.0, 38.5])
    lon = np.full(4, 12.0)
    geod = ki.inverse(g, lat1, lon, lat2, lon, C.DISTANCE)["s12"]
    rh = R.rhumb_inverse(W, lat1, lon, lat2, lon)
    np.testing.assert_allclose(rh["s12"], geod, rtol=0, atol=5e-4)
    np.testing.assert_array_equal(rh["azi12"], np.zeros(4))


def test_equator_and_parallel_exact():
    g = GeodesicModel(W.a, W.f)
    geod = ki.inverse(g, np.array([0.0]), np.array([0.0]),
                      np.array([0.0]), np.array([137.0]),
                      C.DISTANCE)["s12"][0]
    rh = R.rhumb_inverse(W, 0.0, 0.0, 0.0, 137.0)
    assert abs(float(rh["s12"]) - geod) < 1e-6
    assert float(rh["azi12"]) == 90.0
    # E-W rhumb = parallel arc: nu(phi) cos(phi) dlam, exactly
    phi = np.deg2rad(40.0)
    nu = W.a / np.sqrt(1 - W.e2 * np.sin(phi) ** 2)
    exact = nu * np.cos(phi) * np.deg2rad(50.0)
    rh = R.rhumb_inverse(W, 40.0, 10.0, 40.0, 60.0)
    assert abs(float(rh["s12"]) - exact) < 1e-8


def test_ode_integration_oracle():
    """Integrate dphi/ds = cos(a)/M(phi), dlam/ds = sin(a)/(nu cos)
    with RK4 from point 1 along (azi12, s12) from the inverse kernel;
    the endpoint must be point 2 (independent of every series)."""
    cases = [(40.64, -73.78, 51.47, -0.46),
             (-33.87, 151.21, 35.68, 139.65),
             (10.0, -60.0, -45.0, 100.0)]
    for la1, lo1, la2, lo2 in cases:
        rh = R.rhumb_inverse(W, la1, lo1, la2, lo2)
        s12, azi = float(rh["s12"]), float(rh["azi12"])
        al = np.deg2rad(azi)
        ca, sa = np.cos(al), np.sin(al)
        n = 20000
        h = s12 / n
        phi, lam = np.deg2rad(la1), np.deg2rad(lo1)

        def deriv(p):
            w2 = 1 - W.e2 * np.sin(p) ** 2
            return (ca * w2 ** 1.5 / (W.a * (1 - W.e2)),
                    sa * np.sqrt(w2) / (W.a * np.cos(p)))

        for _ in range(n):
            k1p, k1l = deriv(phi)
            k2p, k2l = deriv(phi + h / 2 * k1p)
            k3p, k3l = deriv(phi + h / 2 * k2p)
            k4p, k4l = deriv(phi + h * k3p)
            phi += h / 6 * (k1p + 2 * k2p + 2 * k3p + k4p)
            lam += h / 6 * (k1l + 2 * k2l + 2 * k3l + k4l)
        assert abs(np.rad2deg(phi) - la2) < 1e-7
        assert abs(float(gm.ang_diff(np.rad2deg(lam), lo2)[0])) < 1e-7


def test_roundtrip_all_ellipsoids():
    """direct(inverse(p1, p2)) == p2 to ~1e-13 deg on sphere, WGS84,
    prolate (es < 0 branch) and |f| = 0.2 — the Newton polish makes
    direct the exact inverse of the kernel's own meridian series."""
    rng = np.random.default_rng(7)
    la1 = rng.uniform(-80, 80, 4000)
    lo1 = rng.uniform(-180, 180, 4000)
    la2 = rng.uniform(-80, 80, 4000)
    lo2 = rng.uniform(-180, 180, 4000)
    for f in (0.0, W.f, -0.1, 0.2):
        r = R.RhumbModel(6.4e6, f)
        rh = R.rhumb_inverse(r, la1, lo1, la2, lo2)
        d = R.rhumb_direct(r, la1, lo1, rh["azi12"], rh["s12"])
        assert np.abs(d["lat2"] - la2).max() < 5e-13
        assert np.abs(gm.ang_diff(d["lon2"], lo2)[0]).max() < 5e-13


def test_east_west_limit_branch_free():
    """dphi == 0 exactly and dphi -> 0 give the same s12 (divided
    differences, no CASE): the parallel value is the limit."""
    base = float(R.rhumb_inverse(W, 40.0, 10.0, 40.0, 60.0)["s12"])
    for dla in (1e-13, 1e-10, 1e-7):
        s = float(R.rhumb_inverse(W, 40.0, 10.0, 40.0 + dla, 60.0)["s12"])
        assert abs(s - base) < 1e-4 * max(1.0, dla / 1e-10)
    # and azi12 exactly 90 at the limit
    assert float(R.rhumb_inverse(W, 40.0, 10.0, 40.0, 60.0)["azi12"]) == 90.0


def test_pole_endpoint_meridian_branch():
    rh = R.rhumb_inverse(W, 40.0, 10.0, 90.0, 77.0)
    mu = R.mu_from_phi(W, np.array([np.deg2rad(40.0), np.pi / 2]))
    expected = W.A * (mu[1] - mu[0])
    assert abs(float(rh["s12"]) - expected) < 1e-6
    assert float(rh["azi12"]) == 0.0
    rh = R.rhumb_inverse(W, 40.0, 10.0, -90.0, 77.0)
    assert float(rh["azi12"]) == 180.0


def test_direct_past_pole_nan():
    d = R.rhumb_direct(W, 80.0, 0.0, 0.0, 5_000_000.0)
    assert np.isnan(float(d["lat2"])) and np.isnan(float(d["lon2"]))
    # just short of the pole stays finite
    d = R.rhumb_direct(W, 80.0, 0.0, 0.0, 1_000_000.0)
    assert 88.9 < float(d["lat2"]) < 89.1


def test_oracle_rounding_clearances():
    """The driver gate rounds rhumb_distance_buckets to whole km /
    1000 km buckets / 45-deg sectors and rhumb_destinations to 1e-6
    deg.  Measure the minimum distance of every registered row to its
    nearest rounding boundary at the LARGEST sf (deterministic
    closed-form inputs, so these margins are fixed numbers) and
    require them >> the ~1e-11-relative cross-engine float noise."""
    n = 15000  # sf0.1 customer count
    k = np.arange(1, n + 1, dtype=np.float64)
    lat = (k * 9973) % 17000 / 100.0 - 85.0
    lon = (k * 7919) % 36000 / 100.0 - 180.0
    rh = R.rhumb_inverse(W, np.full(n, 40.7128), np.full(n, -74.0060),
                         lat, lon)
    s12, azi = rh["s12"], rh["azi12"]
    km = s12 / 1000.0
    d_half = np.abs(km - np.floor(km) - 0.5).min()
    assert d_half > 1e-5, d_half  # km-rounding margin (>= 10 um)
    mm = s12 / 1e6
    d_floor = np.minimum(mm - np.floor(mm), np.ceil(mm) - mm).min()
    assert d_floor > 1e-7, d_floor  # 1000-km bucket margin (>= 0.1 m)
    sec = (azi + 180.0) / 45.0
    d_sec = np.minimum(sec - np.floor(sec), np.ceil(sec) - sec).min()
    assert d_sec > 1e-7, d_sec  # sector margin (>= 4.5e-6 deg)

    lats = np.array([la for _, la, _ in
                     __import__("geographiclib_go_spark.queries",
                                fromlist=["LANDMARKS"]).LANDMARKS
                     if abs(la) <= 65.0])
    lons = np.array([lo for _, la, lo in
                     __import__("geographiclib_go_spark.queries",
                                fromlist=["LANDMARKS"]).LANDMARKS
                     if abs(la) <= 65.0])
    lat1 = np.repeat(lats, 8)
    lon1 = np.repeat(lons, 8)
    azi1 = np.tile(np.repeat([40.0, -40.0, 140.0, -140.0], 2), lats.size)
    s = np.tile([800_000.0, 2_000_000.0], lats.size * 4)
    d = R.rhumb_direct(W, lat1, lon1, azi1, s)
    for v in (d["lat2"], d["lon2"]):
        x = v * 1e6
        m = np.abs(x - np.floor(x) - 0.5).min()
        assert m > 1e-4, m  # 1e-6-deg rounding margin (>= 1e-10 deg)
    assert np.abs(d["lat2"]).max() < 88.0  # no pole overrun
    assert np.abs(d["lon2"]).max() < 179.0  # no wrap ambiguity
