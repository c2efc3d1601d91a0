"""Golden 20-case parity for the vectorized direct/arc-direct/inverse
kernels (reference: inverse_test.go:11-28, direct_test.go:11-28, 65-83).
All 20 cases run as ONE numpy batch — the same shape the pandas UDFs see."""

import numpy as np

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import direct as kdirect
from geographiclib_go_spark.kernels import inverse as kinverse
from geographiclib_go_spark.kernels.geodesic import wgs84_model

from tests.golden import COMMON_CASES, DELTAS, FIELDS

G = wgs84_model()
COLS = {f: COMMON_CASES[:, i] for i, f in enumerate(FIELDS)}
ALL_UNROLL = C.ALL | C.LONG_UNROLL


def _assert_fields(out, mapping):
    for want_field, got_key in mapping.items():
        want = COLS[want_field]
        got = out[got_key]
        d = DELTAS[want_field]
        err = np.max(np.abs(got - want))
        assert err <= d, (
            f"{want_field}: max |err| = {err:.3e} > {d} "
            f"(worst case {int(np.argmax(np.abs(got - want)))})")


INV_MAP = {"lat1": "lat1", "lon1": "lon1", "lat2": "lat2", "lon2": "lon2",
           "azi1": "azi1", "azi2": "azi2", "s12": "s12", "a12": "a12",
           "m12": "m12", "M12": "M12", "M21": "M21", "S12area": "S12area"}

DIR_MAP = {"lat1": "lat1", "lon1": "lon1", "azi1": "azi1", "lat2": "lat2",
           "lon2": "lon2", "azi2": "azi2", "s12": "s12", "a12": "a12",
           "m12": "m12", "M12": "M12", "M21": "M21", "S12area": "S12area"}


def test_inverse_common_cases():
    out = kinverse.inverse(G, COLS["lat1"], COLS["lon1"], COLS["lat2"],
                           COLS["lon2"], ALL_UNROLL)
    _assert_fields(out, INV_MAP)


def test_direct_common_cases():
    out = kdirect.direct(G, COLS["lat1"], COLS["lon1"], COLS["azi1"],
                         COLS["s12"], ALL_UNROLL)
    out["azi2"] = out["azi2"]
    _assert_fields(out, DIR_MAP)


def test_arc_direct_common_cases():
    out = kdirect.arc_direct(G, COLS["lat1"], COLS["lon1"], COLS["azi1"],
                             COLS["a12"], ALL_UNROLL)
    _assert_fields(out, DIR_MAP)


def test_direct_equatorial_signed_azimuths():
    """azimuths +/-0 and +/-180 for the direct problem
    (direct_test.go:43-62), sign-bit exact."""
    import math

    def equiv(x, y):
        return (math.isnan(x) and math.isnan(y)) or (
            x == y and math.copysign(1, x) == math.copysign(1, y))

    cases = [(0.0, 180.0, 180.0), (-0.0, -180.0, -180.0),
             (180.0, 180.0, 0.0), (-180.0, -180.0, -0.0)]
    azi1 = np.array([c[0] for c in cases])
    out = kdirect.direct(G, np.zeros(4), np.zeros(4), azi1,
                         np.full(4, 15e6), C.STANDARD | C.LONG_UNROLL)
    for (a1, wlon2, wazi2), lon2, azi2 in zip(cases, out["lon2"],
                                              out["azi2"]):
        assert equiv(wlon2, lon2), f"azi1={a1}: lon2={lon2!r} want {wlon2!r}"
        assert equiv(wazi2, azi2), f"azi1={a1}: azi2={azi2!r} want {wazi2!r}"


def test_inverse_direct_roundtrip_random():
    """direct ∘ inverse == identity over random pairs.  Each solution is
    accurate to ~15 nm (README.md:151-153); the composition of two plus
    the error-metric inverse bounds at 3e-8 m."""
    rng = np.random.default_rng(7)
    n = 20000
    lat1 = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lon1 = rng.uniform(-180, 180, n)
    lat2 = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lon2 = rng.uniform(-180, 180, n)
    inv = kinverse.inverse(G, lat1, lon1, lat2, lon2, C.STANDARD)
    fwd = kdirect.direct(G, lat1, lon1, inv["azi1"], inv["s12"], C.STANDARD)
    # compare endpoint via another inverse (metric error in meters)
    err = kinverse.inverse(G, fwd["lat2"], fwd["lon2"], lat2, lon2,
                           C.DISTANCE)
    assert np.nanmax(err["s12"]) < 3e-8, np.nanmax(err["s12"])
