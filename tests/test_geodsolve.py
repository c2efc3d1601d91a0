"""GeodSolve regression suite — ported from the reference's
test_cases.go:110-678.  Each case pins a historical GeographicLib bug;
numbers and tolerances are verbatim."""

import math

import pytest

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels.api import WGS84, Geodesic

NAN = math.nan
INF = math.inf
approx = pytest.approx


def test_geodsolve0():
    r = WGS84.inverse(40.6, -73.8, 49.01666667, 2.55)
    assert r.azi1 == approx(53.47022, abs=0.5e-5)
    assert r.azi2 == approx(111.59367, abs=0.5e-5)
    assert r.s12 == approx(5853226, abs=0.5)


def test_geodsolve1():
    r = WGS84.direct(40.63972222, -73.77888889, 53.5, 5850e3)
    assert r.lat2 == approx(49.01467, abs=0.5e-5)
    assert r.lon2 == approx(2.56106, abs=0.5e-5)
    assert r.azi2 == approx(111.62947, abs=0.5e-5)


def test_geodsolve2_antipodal_prolate():
    geod = Geodesic(6.4e6, -1 / 150.0)
    r = geod.inverse(0.07476, 0, -0.07476, 180)
    assert r.azi1 == approx(90.00078, abs=0.5e-5)
    assert r.azi2 == approx(90.00078, abs=0.5e-5)
    assert r.s12 == approx(20106193, abs=0.5)
    r = geod.inverse(0.1, 0, -0.1, 180)
    assert r.azi1 == approx(90.00105, abs=0.5e-5)
    assert r.azi2 == approx(90.00105, abs=0.5e-5)
    assert r.s12 == approx(20106193, abs=0.5)


def test_geodsolve4_short_line():
    r = WGS84.inverse(36.493349428792, 0, 36.49334942879201, 0.0000008)
    assert r.s12 == approx(0.072, abs=0.5e-3)


def test_geodsolve5_point2_pole():
    r = WGS84.direct(0.01777745589997, 30, 0, 10e6)
    assert r.lat2 == approx(90, abs=0.5e-5)
    if r.lon2 < 0:
        assert r.lon2 == approx(-150, abs=0.5e-5)
        assert abs(r.azi2) == approx(180, abs=0.5e-5)
    else:
        assert r.lon2 == approx(30, abs=0.5e-5)
        assert r.azi2 == approx(0, abs=0.5e-5)


def test_geodsolve6_volatile_sbet12a():
    r = WGS84.inverse(88.202499451857, 0,
                      -88.202499451857, 179.981022032992859592)
    assert r.s12 == approx(20003898.214, abs=0.5e-3)
    r = WGS84.inverse(89.262080389218, 0,
                      -89.262080389218, 179.992207982775375662)
    assert r.s12 == approx(20003925.854, abs=0.5e-3)
    r = WGS84.inverse(89.333123580033, 0,
                      -89.333123580032997687, 179.99295812360148422)
    assert r.s12 == approx(20003926.881, abs=0.5e-3)


def test_geodsolve9_volatile_x():
    r = WGS84.inverse(56.320923501171, 0,
                      -56.320923501171, 179.664747671772880215)
    assert r.s12 == approx(19993558.287, abs=0.5e-3)


def test_geodsolve10_tol1():
    r = WGS84.inverse(52.784459512564, 0,
                      -52.784459512563990912, 179.634407464943777557)
    assert r.s12 == approx(19991596.095, abs=0.5e-3)


def test_geodsolve11_bet2_eq_neg_bet1():
    r = WGS84.inverse(48.522876735459, 0,
                      -48.52287673545898293, 179.599720456223079643)
    assert r.s12 == approx(19989144.774, abs=0.5e-3)


def test_geodsolve12_extreme_ellipsoids():
    geod = Geodesic(89.8, -1.83)
    r = geod.inverse(0, 0, -10, 160)
    assert r.azi1 == approx(120.27, abs=1e-2)
    assert r.azi2 == approx(105.15, abs=1e-2)
    assert r.s12 == approx(266.7, abs=1e-1)


def test_geodsolve14_nan_lon12():
    r = WGS84.inverse(0, 0, 1, NAN)
    assert math.isnan(r.azi1) and math.isnan(r.azi2) and math.isnan(r.s12)


def test_geodsolve15_eatanhe_negative_e2():
    geod = Geodesic(6.4e6, -1 / 150.0)
    r = geod.direct(1, 2, 3, 4, C.AREA)
    assert r.S12 == approx(23700, abs=0.5)


def test_geodsolve17_long_unroll():
    r = WGS84.direct(40, -75, -10, 2e7, C.STANDARD | C.LONG_UNROLL)
    assert r.lat2 == approx(-39, abs=1)
    assert r.lon2 == approx(-254, abs=1)
    assert r.azi2 == approx(-170, abs=1)

    line = WGS84.line(40, -75, -10)
    r = line.position(2e7, C.STANDARD | C.LONG_UNROLL)
    assert r.lat2 == approx(-39, abs=1)
    assert r.lon2 == approx(-254, abs=1)
    assert r.azi2 == approx(-170, abs=1)

    r = WGS84.direct(40, -75, -10, 2e7)
    assert r.lat2 == approx(-39, abs=1)
    assert r.lon2 == approx(105, abs=1)
    assert r.azi2 == approx(-170, abs=1)

    r = line.position(2e7)
    assert r.lat2 == approx(-39, abs=1)
    assert r.lon2 == approx(105, abs=1)
    assert r.azi2 == approx(-170, abs=1)


def test_geodsolve26_sphere_area_0_0():
    geod = Geodesic(6.4e6, 0)
    r = geod.inverse(1, 2, 3, 4, C.AREA)
    assert r.S12 == approx(49911046115.0, abs=0.5)


def test_geodsolve28_a12_placement():
    geod = Geodesic(6.4e6, 0.1)
    r = geod.direct(1, 2, 10, 5e6)
    assert r.a12 == approx(48.55570690, abs=0.5e-8)


def test_geodsolve29_unroll_inverse():
    r = WGS84.inverse(0, 539, 0, 181)
    assert r.lon1 == approx(179, abs=1e-10)
    assert r.lon2 == approx(-179, abs=1e-10)
    assert r.s12 == approx(222639, abs=0.5)
    r = WGS84.inverse(0, 539, 0, 181, C.STANDARD | C.LONG_UNROLL)
    assert r.lon1 == approx(539, abs=1e-10)
    assert r.lon2 == approx(541, abs=1e-10)
    assert r.s12 == approx(222639, abs=0.5)


def test_geodsolve33_signed_zero_equator():
    r = WGS84.inverse(0, 0, 0, 179)
    assert r.azi1 == approx(90.0, abs=0.5e-5)
    assert r.azi2 == approx(90.0, abs=0.5e-5)
    assert r.s12 == approx(19926189, abs=0.5)

    r = WGS84.inverse(0, 0, 0, 179.5)
    assert r.azi1 == approx(55.96650, abs=0.5e-5)
    assert r.azi2 == approx(124.03350, abs=0.5e-5)
    assert r.s12 == approx(19980862, abs=0.5)

    r = WGS84.inverse(0, 0, 0, 180)
    assert r.azi1 == approx(0.0, abs=0.5e-5)
    assert abs(r.azi2) == approx(180.0, abs=0.5e-5)
    assert r.s12 == approx(20003931, abs=0.5)

    r = WGS84.inverse(0, 0, 1, 180)
    assert r.azi1 == approx(0.0, abs=0.5e-5)
    assert abs(r.azi2) == approx(180.0, abs=0.5e-5)
    assert r.s12 == approx(19893357, abs=0.5)

    sphere = Geodesic(6.4e6, 0)
    r = sphere.inverse(0, 0, 0, 179)
    assert r.azi1 == approx(90.0, abs=0.5e-5)
    assert r.s12 == approx(19994492, abs=0.5)
    r = sphere.inverse(0, 0, 0, 180)
    assert r.azi1 == approx(0.0, abs=0.5e-5)
    assert abs(r.azi2) == approx(180.0, abs=0.5e-5)
    assert r.s12 == approx(20106193, abs=0.5)
    r = sphere.inverse(0, 0, 1, 180)
    assert r.azi1 == approx(0.0, abs=0.5e-5)
    assert abs(r.azi2) == approx(180.0, abs=0.5e-5)
    assert r.s12 == approx(19994492, abs=0.5)

    prolate = Geodesic(6.4e6, -1 / 300.0)
    r = prolate.inverse(0, 0, 0, 179)
    assert r.azi1 == approx(90.0, abs=0.5e-5)
    assert r.s12 == approx(19994492, abs=0.5)
    r = prolate.inverse(0, 0, 0, 180)
    assert r.azi1 == approx(90.0, abs=0.5e-5)
    assert r.azi2 == approx(90.0, abs=0.5e-5)
    assert r.s12 == approx(20106193, abs=0.5)
    r = prolate.inverse(0, 0, 0.5, 180)
    assert r.azi1 == approx(33.02493, abs=0.5e-5)
    assert r.azi2 == approx(146.97364, abs=0.5e-5)
    assert r.s12 == approx(20082617, abs=0.5)
    r = prolate.inverse(0, 0, 1, 180)
    assert r.azi1 == approx(0.0, abs=0.5e-5)
    assert abs(r.azi2) == approx(180.0, abs=0.5e-5)
    assert r.s12 == approx(20027270, abs=0.5)


def test_geodsolve55_nan_plus_equator_or_pole():
    r = WGS84.inverse(NAN, 0, 0, 90)
    assert math.isnan(r.azi1) and math.isnan(r.azi2) and math.isnan(r.s12)
    r = WGS84.inverse(NAN, 0, 90, 3)
    assert math.isnan(r.azi1) and math.isnan(r.azi2) and math.isnan(r.s12)


def test_geodsolve59_near_180():
    r = WGS84.inverse(5, 0.00000000000001, 10, 180)
    assert r.azi1 == approx(0.000000000000035, abs=1.5e-14)
    assert r.azi2 == approx(179.99999999999996, abs=1.5e-14)
    assert r.s12 == approx(18345191.174332713, abs=5e-9)


def test_geodsolve61_west_going():
    r = WGS84.direct(45, 0, -0.000000000000000003, 1e7,
                     C.STANDARD | C.LONG_UNROLL)
    assert r.lat2 == approx(45.30632, abs=0.5e-5)
    assert r.lon2 == approx(-180, abs=0.5e-5)
    assert abs(r.azi2) == approx(180, abs=0.5e-5)

    ln = WGS84.inverse_line(45, 0, 80, -0.000000000000000003)
    r = ln.position(1e7, C.STANDARD | C.LONG_UNROLL)
    assert r.lat2 == approx(45.30632, abs=0.5e-5)
    assert r.lon2 == approx(-180, abs=0.5e-5)
    assert abs(r.azi2) == approx(180, abs=0.5e-5)


def test_geodsolve65_east_going_line_sign():
    ln = WGS84.inverse_line(30, -0.000000000000000001, -31, 180)
    r = ln.position(1e7, C.ALL | C.LONG_UNROLL)
    assert r.lat1 == approx(30.0, abs=0.5e-5)
    assert r.lon1 == approx(0.0, abs=0.5e-5)
    assert abs(r.azi1) == approx(180.0, abs=0.5e-5)
    assert r.lat2 == approx(-60.23169, abs=0.5e-5)
    assert r.lon2 == approx(0.0, abs=0.5e-5)
    assert abs(r.azi2) == approx(180.0, abs=0.5e-5)
    assert r.s12 == approx(10000000, abs=0.5)
    assert r.a12 == approx(90.06544, abs=0.5e-5)
    assert r.m12 == approx(6363636, abs=0.5)
    assert r.M21 == approx(0.0013749, abs=0.5e-7)
    assert r.S12 == approx(0, abs=0.5)

    r = ln.position(2e7, C.ALL | C.LONG_UNROLL)
    assert r.lat2 == approx(-30.03547, abs=0.5e-5)
    assert r.lon2 == approx(-180.0, abs=0.5e-5)
    assert r.azi2 == approx(0.0, abs=0.5e-5)
    assert r.s12 == approx(20000000, abs=0.5)
    assert r.a12 == approx(179.96459, abs=0.5e-5)
    assert r.m12 == approx(54342, abs=0.5)
    assert r.M21 == approx(-0.9954339, abs=0.5e-7)
    assert r.S12 == approx(127516405431022.0, abs=0.5)


def test_geodsolve69_inverse_line_west_of_south():
    ln = WGS84.inverse_line(-5, -0.000000000000002, -10, 180)
    r = ln.position(2e7, C.STANDARD | C.LONG_UNROLL)
    assert r.lat2 == approx(4.96445, abs=0.5e-5)
    assert r.lon2 == approx(-180.0, abs=0.5e-5)
    assert r.azi2 == approx(0.0, abs=0.5e-5)
    r = ln.position(0.5 * ln.distance, C.STANDARD | C.LONG_UNROLL)
    assert r.lat2 == approx(-87.52461, abs=0.5e-5)
    assert r.lon2 == approx(-0.0, abs=0.5e-5)
    assert r.azi2 == approx(-180.0, abs=0.5e-5)


def test_geodsolve71_direct_line_s13():
    ln = WGS84.direct_line(1, 2, 45, 1e7)
    r = ln.position(0.5 * ln.distance, C.STANDARD | C.LONG_UNROLL)
    assert r.lat2 == approx(30.92625, abs=0.5e-5)
    assert r.lon2 == approx(37.54640, abs=0.5e-5)
    assert r.azi2 == approx(55.43104, abs=0.5e-5)


def test_geodsolve73_backwards_from_pole():
    r = WGS84.direct(90, 10, 180, -1e6)
    assert r.lat2 == approx(81.04623, abs=0.5e-5)
    assert r.lon2 == approx(-170, abs=0.5e-5)
    assert r.azi2 == approx(0, abs=0.5e-5)
    assert not math.copysign(1, r.azi2) < 0  # -0 normalized to +0


def test_geodsolve74_inaccurate_areas():
    r = WGS84.inverse(54.1589, 15.3872, 54.1591, 15.3877, C.ALL)
    assert r.azi1 == approx(55.723110355, abs=5e-9)
    assert r.azi2 == approx(55.723515675, abs=5e-9)
    assert r.s12 == approx(39.527686385, abs=5e-9)
    assert r.a12 == approx(0.000355495, abs=5e-9)
    assert r.m12 == approx(39.527686385, abs=5e-9)
    assert r.M12 == approx(0.999999995, abs=5e-9)
    assert r.M21 == approx(0.999999995, abs=5e-9)
    assert r.S12 == approx(286698586.30197, abs=5e-4)


def test_geodsolve76_wellington_salamanca():
    r = WGS84.inverse(-(41 + 19 / 60.0), 174 + 49 / 60.0,
                      40 + 58 / 60.0, -(5 + 30 / 60.0))
    assert r.azi1 == approx(160.39137649664, abs=0.5e-11)
    assert r.azi2 == approx(19.50042925176, abs=0.5e-11)
    assert r.s12 == approx(19960543.857179, abs=0.5e-6)


def test_geodsolve78_ngs_nonconvergence():
    r = WGS84.inverse(27.2, 0.0, -27.1, 179.5)
    assert r.azi1 == approx(45.82468716758, abs=0.5e-11)
    assert r.azi2 == approx(134.22776532670, abs=0.5e-11)
    assert r.s12 == approx(19974354.765767, abs=0.5e-6)


def test_geodsolve80_scale_special_cases():
    r = WGS84.inverse(0, 0, 0, 90, C.GEODESIC_SCALE)
    assert r.M12 == approx(-0.00528427534, abs=0.5e-10)
    assert r.M21 == approx(-0.00528427534, abs=0.5e-10)

    r = WGS84.inverse(0, 0, 1e-6, 1e-6, C.GEODESIC_SCALE)
    assert r.M12 == approx(1, abs=0.5e-10)
    assert r.M21 == approx(1, abs=0.5e-10)

    r = WGS84.inverse(20.001, 0, 20.001, 0, C.ALL)
    assert r.a12 == approx(0, abs=1e-13)
    assert r.s12 == approx(0, abs=1e-8)
    assert r.azi1 == approx(180, abs=1e-13)
    assert r.azi2 == approx(180, abs=1e-13)
    assert r.m12 == approx(0, abs=1e-8)
    assert r.M12 == approx(1, abs=1e-15)
    assert r.M21 == approx(1, abs=1e-15)
    assert r.S12 == approx(0, abs=1e-10)
    assert not math.copysign(1, r.a12) < 0
    assert not math.copysign(1, r.s12) < 0
    assert not math.copysign(1, r.m12) < 0

    r = WGS84.inverse(90, 0, 90, 180, C.ALL)
    assert r.a12 == approx(0, abs=1e-13)
    assert r.s12 == approx(0, abs=1e-8)
    assert r.azi1 == approx(0, abs=1e-13)
    assert r.azi2 == approx(180, abs=1e-13)
    assert r.m12 == approx(0, abs=1e-8)
    assert r.M12 == approx(1, abs=1e-15)
    assert r.M21 == approx(1, abs=1e-15)
    assert r.S12 == approx(127516405431022.0, abs=0.5)

    # an incapable line which can't take distance as input
    ln = WGS84.line(1, 2, 90, C.LATITUDE)
    r = ln.position(1000, C.NONE)
    assert math.isnan(r.a12)


def test_geodsolve84_inf_nan_inputs():
    r = WGS84.direct(0, 0, 90, INF)
    assert math.isnan(r.lat2) and math.isnan(r.lon2) and math.isnan(r.azi2)
    r = WGS84.direct(0, 0, 90, NAN)
    assert math.isnan(r.lat2) and math.isnan(r.lon2) and math.isnan(r.azi2)
    r = WGS84.direct(0, 0, INF, 1000)
    assert math.isnan(r.lat2) and math.isnan(r.lon2) and math.isnan(r.azi2)
    r = WGS84.direct(0, 0, NAN, 1000)
    assert math.isnan(r.lat2) and math.isnan(r.lon2) and math.isnan(r.azi2)
    r = WGS84.direct(0, INF, 90, 1000)
    assert r.lat2 == 0 and math.isnan(r.lon2) and r.azi2 == 90
    r = WGS84.direct(0, NAN, 90, 1000)
    assert r.lat2 == 0 and math.isnan(r.lon2) and r.azi2 == 90
    r = WGS84.direct(INF, 0, 90, 1000)
    assert math.isnan(r.lat2) and math.isnan(r.lon2) and math.isnan(r.azi2)
    r = WGS84.direct(NAN, 0, 90, 1000)
    assert math.isnan(r.lat2) and math.isnan(r.lon2) and math.isnan(r.azi2)


def test_geodsolve92_hypot_accuracy():
    r = WGS84.inverse(37.757540000000006, -122.47018,
                      37.75754, -122.470177)
    assert r.azi1 == approx(89.99999923, abs=1e-7)
    assert r.azi2 == approx(90.00000106, abs=1e-7)
    assert r.s12 == approx(0.264, abs=0.5e-3)


def test_geodsolve94_nan_lat2():
    r = WGS84.inverse(0, 0, NAN, 90)
    assert math.isnan(r.azi1) and math.isnan(r.azi2) and math.isnan(r.s12)


def test_geodsolve96_somg12_sentinel():
    g = Geodesic(6378137, 1 / 298.257222101)
    r = g.inverse(0, 0, 60.0832522871723, 89.8492185074635, C.AREA)
    assert r.S12 == approx(42426932221845, abs=0.5)


def _equiv(x, y):
    return (math.isnan(x) and math.isnan(y)) or (
        x == y and math.copysign(1, x) == math.copysign(1, y))


def test_azimuth_coincident_points_on_equator():
    """inverse_test.go:56-73: signed-zero azimuth convention for
    coincident equatorial points (sign-bit exact)."""
    for lat1, lat2, azi in ((0.0, -0.0, 180.0), (-0.0, 0.0, 0.0)):
        r = WGS84.inverse(lat1, 0, lat2, 0)
        assert _equiv(azi, r.azi1), (lat1, lat2, r.azi1)
        assert _equiv(azi, r.azi2), (lat1, lat2, r.azi2)


def test_nearly_antipodal_equatorial_north_south():
    """inverse_test.go:75-93."""
    for lat1, lat2, azi1, azi2 in ((0.0, 0.0, 56.0, 124.0),
                                   (-0.0, -0.0, 124.0, 56.0)):
        r = WGS84.inverse(lat1, 0, lat2, 179.5)
        assert r.azi1 == approx(azi1, abs=1)
        assert r.azi2 == approx(azi2, abs=1)


def test_exact_antipodal_equatorial_signs():
    """inverse_test.go:95-116 — sign-bit exact azimuths."""
    for lat1, lat2, lon2, azi1, azi2 in (
            (0.0, 0.0, 180.0, 0.0, 180.0),
            (-0.0, -0.0, 180.0, 180.0, 0.0),
            (0.0, 0.0, -180.0, -0.0, -180.0),
            (-0.0, -0.0, -180.0, -180.0, -0.0)):
        r = WGS84.inverse(lat1, 0, lat2, lon2)
        assert _equiv(azi1, r.azi1), (lat1, lat2, lon2, r.azi1)
        assert _equiv(azi2, r.azi2), (lat1, lat2, lon2, r.azi2)


def test_antipodal_equator_prolate_signs():
    """inverse_test.go:118-135."""
    g = Geodesic(6.4e6, -1 / 300.0)
    for lon2, azi in ((180.0, 90.0), (-180.0, -90.0)):
        r = g.inverse(0, 0, 0, lon2)
        assert _equiv(azi, r.azi1), (lon2, r.azi1)
        assert _equiv(azi, r.azi2), (lon2, r.azi2)


def test_cli_rejects_lone_ellipsoid_arg():
    """A single trailing ellipsoid value is ambiguous — the CLI must
    refuse instead of silently computing on WGS84 (ADVICE r1)."""
    import importlib
    geodsolve_cli = importlib.import_module("scripts.geodsolve")
    with pytest.raises(SystemExit, match="BOTH a and f"):
        geodsolve_cli.solve("direct", [10.0, 20.0, 30.0, 1e6, 6400000.0])
    # two values work; none default to WGS84
    out = geodsolve_cli.solve("inverse", [-41.32, 174.81, 40.96, -5.50])
    assert "s12:" in out
