"""Gnomonic projection spot checks (gnomonic_test.go:9-29) + fwd/rev
roundtrip over a batch."""

import numpy as np
import pytest

from geographiclib_go_spark.kernels import gnomonic as kg
from geographiclib_go_spark.kernels.api import WGS84, Gnomonic

G = WGS84.model
PARIS = (48 + 50 / 60.0, 2 + 20 / 60.0)


def test_forward_paris_calais():
    g = Gnomonic(WGS84)
    r = g.forward(PARIS[0], PARIS[1], 50.9, 1.8)
    assert r["x"] == pytest.approx(-37543.7, abs=0.05)
    assert r["y"] == pytest.approx(230103, abs=0.25)


def test_reverse_paris_calais():
    g = Gnomonic(WGS84)
    r = g.reverse(PARIS[0], PARIS[1], -38e3, 230e3)
    assert r["lat"] == pytest.approx(50.899, abs=0.0005)
    assert r["lon"] == pytest.approx(1.79353, abs=0.000005)


def test_roundtrip_batch():
    """forward∘reverse == identity within the horizon, vectorized."""
    rng = np.random.default_rng(11)
    n = 2000
    lat0 = np.full(n, 40.0)
    lon0 = np.full(n, -75.0)
    # points within ~2000 km of the center (well inside the horizon)
    lat = 40.0 + rng.uniform(-15, 15, n)
    lon = -75.0 + rng.uniform(-15, 15, n)
    fwd = kg.gnomonic_forward(G, lat0, lon0, lat, lon)
    rev = kg.gnomonic_reverse(G, lat0, lon0, fwd["x"], fwd["y"])
    # the reference's fixed-point trip threshold is 0.01*sqrt(eps)*a
    # ≈ 0.95 mm (gnomonic.go:146), i.e. ~1e-8 deg
    assert np.nanmax(np.abs(rev["lat"] - lat)) < 2e-8
    assert np.nanmax(np.abs(rev["lon"] - lon)) < 2e-8


def test_over_horizon_is_nan():
    fwd = kg.gnomonic_forward(G, np.array([0.0]), np.array([0.0]),
                              np.array([0.0]), np.array([120.0]))
    assert np.isnan(fwd["x"][0]) and np.isnan(fwd["y"][0])


def test_reverse_roundtrip_far_points_submm():
    """Reverse must converge to the reference's ~1 mm trip threshold
    even at quarter-hemisphere range (r3: the trip threshold was
    accidentally scaled by an extra factor of a, costing ~1 m of
    accuracy on far points)."""
    import numpy as np
    from geographiclib_go_spark.kernels import caps as C
    from geographiclib_go_spark.kernels import gnomonic as gn
    from geographiclib_go_spark.kernels import inverse as kinv
    from geographiclib_go_spark.kernels.geodesic import wgs84_model
    g = wgs84_model()
    rng = np.random.default_rng(7)
    lat = rng.uniform(-50, 89, 500)
    lon = rng.uniform(-180, 180, 500)
    f = gn.gnomonic_forward(g, 40.0, -74.0, lat, lon)
    ok = np.isfinite(f["x"])
    assert ok.sum() > 100
    r = gn.gnomonic_reverse(g, 40.0, -74.0, f["x"][ok], f["y"][ok])
    d = kinv.gen_inverse(g, r["lat"], r["lon"], lat[ok], lon[ok],
                         C.DISTANCE)["s12"]
    assert np.nanmax(d) < 1e-3  # sub-mm, vs ~1.8 m before the fix
