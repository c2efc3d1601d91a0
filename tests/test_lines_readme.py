"""Doc-as-test goldens from the reference README
(/root/reference/readme/readme_test.go:13-111) + line regression cases,
exercising the scalar parity API and the batch waypoint path."""

import math

import numpy as np
import pytest

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import direct as kdirect
from geographiclib_go_spark.kernels.api import WGS84


def test_wellington_to_salamanca():
    r = WGS84.inverse(-41.32, 174.81, 40.96, -5.50)
    assert r.s12 == pytest.approx(19959679.267, abs=1e-3)


def test_point_southwest_of_perth():
    r = WGS84.direct(-32.06, 115.74, 225, 20000e3)
    assert r.lat2 == pytest.approx(32.11195529, abs=1e-8)
    assert r.lon2 == pytest.approx(-63.95925278, abs=1e-8)


def test_jfk_to_lhr_area():
    r = WGS84.inverse(40.6, -73.8, 51.6, -0.5, C.AREA)
    assert r.S12 == pytest.approx(40041368848742.5, abs=1e-1)


BEIJING_SFO_WAYPOINTS = [
    "0 40.10000 116.60000 42.91642",
    "1000000 46.37321 125.44903 48.99365",
    "2000000 51.78786 136.40751 57.29433",
    "3000000 55.92437 149.93825 68.24573",
    "4000000 58.27452 165.90776 81.68242",
    "5000000 58.43499 183.03167 96.29014",
    "6000000 56.37430 199.26948 109.99924",
    "7000000 52.45769 213.17327 121.33210",
    "8000000 47.19436 224.47209 129.98619",
    "9000000 41.02145 233.58294 136.34359",
    "9513998 37.60000 237.60000 138.89027",
]


def test_waypoints_beijing_to_sfo_by_distance():
    ln = WGS84.inverse_line(40.1, 116.6, 37.6, -122.4)
    ds = 1000e3
    n = int(math.ceil(ln.distance / ds))
    got = []
    for i in range(n + 1):
        s = min(ds * i, ln.distance)
        r = ln.position(s, C.STANDARD | C.LONG_UNROLL)
        got.append(f"{r.s12:.0f} {r.lat2:.5f} {r.lon2:.5f} {r.azi2:.5f}")
    assert got == BEIJING_SFO_WAYPOINTS


def test_waypoints_beijing_to_sfo_by_arc():
    ln = WGS84.inverse_line(40.1, 116.6, 37.6, -122.4)
    n = int(math.ceil(ln.arc))
    da = ln.arc / n
    got = []
    for i in range(n + 1):
        r = ln.arc_position(da * i,
                            C.LATITUDE | C.LONGITUDE | C.LONG_UNROLL)
        got.append(f"{r.lat2:.5f} {r.lon2:.5f}")
    assert len(got) == 87
    assert got[0] == "40.10000 116.60000"
    assert got[1] == "40.82573 117.49243"
    assert got[2] == "41.54435 118.40447"
    assert got[3] == "42.25551 119.33686"
    assert got[4] == "42.95886 120.29036"
    assert got[5] == "43.65403 121.26575"
    assert got[6] == "44.34062 122.26380"
    assert got[83] == "39.82385 235.05331"
    assert got[84] == "39.08884 235.91990"
    assert got[85] == "38.34746 236.76857"
    assert got[86] == "37.60000 237.60000"


def test_batch_waypoints_match_scalar_line():
    """The vectorized line (one line_init per row, all waypoints in one
    gen_position batch) reproduces the scalar loop — the shape the
    Spark explode(sequence(...)) plan produces."""
    ln = WGS84.inverse_line(40.1, 116.6, 37.6, -122.4)
    n = 10
    s_arr = np.linspace(0, ln.distance, n + 1)
    L = kdirect.line_init(
        WGS84.model,
        np.full(n + 1, 40.1), np.full(n + 1, 116.6),
        np.full(n + 1, ln.azi1),
        C.STANDARD | C.DISTANCE_IN | C.LONG_UNROLL)
    out = kdirect.solve_position(WGS84.model, L, False, s_arr,
                                 C.STANDARD | C.LONG_UNROLL)
    for i, s in enumerate(s_arr):
        r = ln.position(float(s), C.STANDARD | C.LONG_UNROLL)
        assert out["lat2"][i] == pytest.approx(r.lat2, abs=1e-12)
        assert out["lon2"][i] == pytest.approx(r.lon2, abs=1e-12)
        assert out["azi2"][i] == pytest.approx(r.azi2, abs=1e-12)


def test_direct_line_setdistance():
    """GeodSolve74-adjacent: DirectLine/ArcDirectLine register point 3."""
    ln = WGS84.direct_line(40.0, -75.0, 30.0, 10e6)
    assert ln.distance == pytest.approx(10e6, abs=1e-9)
    r = ln.position(ln.distance)
    d = WGS84.direct(40.0, -75.0, 30.0, 10e6)
    assert r.lat2 == pytest.approx(d.lat2, abs=1e-12)
    assert r.lon2 == pytest.approx(d.lon2, abs=1e-12)

    ln2 = WGS84.arc_direct_line(40.0, -75.0, 30.0, 90.0)
    assert ln2.arc == pytest.approx(90.0, abs=1e-12)
    r2 = ln2.arc_position(90.0)
    d2 = WGS84.arc_direct(40.0, -75.0, 30.0, 90.0)
    assert r2.lat2 == pytest.approx(d2.lat2, abs=1e-12)
    assert r2.s12 == pytest.approx(d2.s12, abs=1e-8)
