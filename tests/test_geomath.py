"""Primitive-level parity tests, ported from the reference's
geomath_test.go:20-289 — sign-bit-exact (incl. -0 and NaN)."""

import math

import numpy as np
import pytest

from geographiclib_go_spark.kernels import geomath as gm

EPS = gm.EPSILON
MZ = -0.0
NAN = float("nan")
INF = float("inf")


def equiv(x, y):
    """Sign-bit-exact equivalence (geomath_test.go:291-294)."""
    x = float(x)
    y = float(y)
    return (math.isnan(x) and math.isnan(y)) or (
        x == y and math.copysign(1, x) == math.copysign(1, y))


def test_constants():
    assert gm.TINY * gm.EPSILON > 0
    assert gm.TINY + gm.EPSILON == gm.EPSILON
    assert gm.MAXIT2 == 83


ANG_ROUND_CASES = [
    (-EPS / 32, -EPS / 32), (-EPS / 64, MZ), (MZ, MZ), (0.0, 0.0),
    (EPS / 64, 0.0), (EPS / 32, EPS / 32),
    ((1 - 2 * EPS) / 64, (1 - 2 * EPS) / 64),
    ((1 - EPS) / 64, 1.0 / 64), ((1 - EPS / 2) / 64, 1.0 / 64),
    ((1 - EPS / 4) / 64, 1.0 / 64), (1.0 / 64, 1.0 / 64),
    ((1 + EPS / 2) / 64, 1.0 / 64), ((1 + EPS) / 64, 1.0 / 64),
    ((1 + 2 * EPS) / 64, (1 + 2 * EPS) / 64),
    ((1 - EPS) / 32, (1 - EPS) / 32), ((1 - EPS / 2) / 32, 1.0 / 32),
    ((1 - EPS / 4) / 32, 1.0 / 32), (1.0 / 32, 1.0 / 32),
    ((1 + EPS / 2) / 32, 1.0 / 32), ((1 + EPS) / 32, (1 + EPS) / 32),
    ((1 - EPS) / 16, (1 - EPS) / 16), ((1 - EPS / 2) / 16, (1 - EPS / 2) / 16),
    ((1 - EPS / 4) / 16, 1.0 / 16), (1.0 / 16, 1.0 / 16),
    ((1 + EPS / 4) / 16, 1.0 / 16), ((1 + EPS / 2) / 16, 1.0 / 16),
    ((1 + EPS) / 16, (1 + EPS) / 16), ((1 - EPS) / 8, (1 - EPS) / 8),
    ((1 - EPS / 2) / 8, (1 - EPS / 2) / 8), ((1 - EPS / 4) / 8, 1.0 / 8),
    ((1 + EPS / 2) / 8, 1.0 / 8), ((1 + EPS) / 8, (1 + EPS) / 8),
    (1 - EPS, 1 - EPS), (1 - EPS / 2, 1 - EPS / 2), (1 - EPS / 4, 1.0),
    (1.0, 1.0), (1 + EPS / 4, 1.0), (1 + EPS / 2, 1.0), (1 + EPS, 1 + EPS),
    (90.0 - 64 * EPS, 90 - 64 * EPS), (90.0 - 32 * EPS, 90.0), (90.0, 90.0),
]


def test_ang_round():
    vals = np.array([c[0] for c in ANG_ROUND_CASES])
    out = gm.ang_round(vals)
    for (v, want), got in zip(ANG_ROUND_CASES, out):
        assert equiv(want, got), f"ang_round({v!r}) = {got!r}, want {want!r}"


SINCOSD_CASES = [
    (-INF, NAN, NAN), (-810.0, -1.0, 0.0), (-720.0, MZ, 1.0),
    (-630.0, 1.0, 0.0), (-540.0, MZ, -1.0), (-450.0, -1.0, 0.0),
    (-360.0, MZ, 1.0), (-270.0, 1.0, 0.0), (-180.0, MZ, -1.0),
    (-90.0, -1.0, 0.0), (MZ, MZ, 1.0), (0.0, 0.0, 1.0), (90.0, 1.0, 0.0),
    (180.0, 0.0, -1.0), (270.0, -1.0, 0.0), (360.0, 0.0, 1.0),
    (450.0, 1.0, 0.0), (540.0, 0.0, -1.0), (630.0, -1.0, 0.0),
    (720.0, 0.0, 1.0), (810.0, 1.0, 0.0), (INF, NAN, NAN), (NAN, NAN, NAN),
]


def test_sincosd_edge_cases():
    vals = np.array([c[0] for c in SINCOSD_CASES])
    s, c = gm.sincosd(vals)
    for (v, ws, wc), gs, gc in zip(SINCOSD_CASES, s, c):
        assert equiv(ws, gs), f"sin({v}) = {gs!r}, want {ws!r}"
        assert equiv(wc, gc), f"cos({v}) = {gc!r}, want {wc!r}"


def test_sincosd_accuracy():
    s1, c1 = gm.sincosd(9.0)
    s2, c2 = gm.sincosd(81.0)
    s3, c3 = gm.sincosd(-123456789.0)
    assert equiv(s1, c2)
    assert equiv(s1, s3)
    assert equiv(c1, s2)
    assert equiv(c1, -c3)


ATAN2D_CASES = [
    (0.0, MZ, 180.0), (MZ, MZ, -180.0), (0.0, 0.0, 0.0), (MZ, 0.0, MZ),
    (0.0, -1.0, 180.0), (MZ, -1.0, -180.0), (0.0, 1.0, 0.0), (MZ, 1.0, MZ),
    (-1.0, 0.0, -90.0), (-1.0, MZ, -90.0), (1.0, 0.0, 90.0), (1.0, MZ, 90.0),
    (1.0, -INF, 180.0), (-1.0, -INF, -180.0), (1.0, INF, 0.0),
    (-1.0, INF, MZ), (INF, 1.0, 90.0), (INF, -1.0, 90.0), (-INF, 1.0, -90.0),
    (-INF, -1.0, -90.0), (INF, -INF, 135.0), (-INF, -INF, -135.0),
    (INF, INF, 45.0), (-INF, INF, -45.0), (NAN, 1.0, NAN), (1.0, NAN, NAN),
]


def test_atan2d_edge_cases():
    ys = np.array([c[0] for c in ATAN2D_CASES])
    xs = np.array([c[1] for c in ATAN2D_CASES])
    out = gm.atan2d(ys, xs)
    for (y, x, want), got in zip(ATAN2D_CASES, out):
        assert equiv(want, got), f"atan2d({y}, {x}) = {got!r}, want {want!r}"


def test_atan2d_accuracy():
    s = 7e-16
    assert float(gm.atan2d(s, -1.0)) == 180 - float(gm.atan2d(s, 1.0))


SUM_CASES = [
    (9.0, -9.0, 0.0), (-9.0, 9.0, 0.0), (MZ, 0.0, 0.0), (0.0, MZ, 0.0),
    (MZ, MZ, MZ), (0.0, 0.0, 0.0),
]


def test_sum2():
    us = np.array([c[0] for c in SUM_CASES])
    vs = np.array([c[1] for c in SUM_CASES])
    s, _ = gm.sum2(us, vs)
    for (u, v, want), got in zip(SUM_CASES, s):
        assert equiv(want, got), f"sum2({u}, {v}) = {got!r}, want {want!r}"


ANG_NORM_CASES = [
    (-900.0, -180.0), (-720.0, MZ), (-540.0, -180.0), (-360.0, MZ),
    (-180.0, -180.0), (MZ, MZ), (0.0, 0.0), (180.0, 180.0), (360.0, 0.0),
    (540.0, 180.0), (720.0, 0.0), (900.0, 180.0),
]


def test_ang_normalize():
    vals = np.array([c[0] for c in ANG_NORM_CASES])
    out = gm.ang_normalize(vals)
    for (v, want), got in zip(ANG_NORM_CASES, out):
        assert equiv(want, got), f"ang_normalize({v}) = {got!r}, want {want!r}"


ANG_DIFF_CASES = [
    (0.0, 0.0, 0.0), (0.0, MZ, MZ), (MZ, 0.0, 0.0), (MZ, MZ, 0.0),
    (5.0, 365.0, 0.0), (365.0, 5.0, MZ), (5.0, 185.0, 180.0),
    (185.0, 5.0, -180.0), (EPS, 180.0, 180.0), (-EPS, 180.0, -180.0),
    (EPS, -180.0, 180.0), (-EPS, -180.0, -180.0),
]


def test_ang_diff():
    xs = np.array([c[0] for c in ANG_DIFF_CASES])
    ys = np.array([c[1] for c in ANG_DIFF_CASES])
    d, _ = gm.ang_diff(xs, ys)
    for (x, y, want), got in zip(ANG_DIFF_CASES, d):
        assert equiv(want, got), f"ang_diff({x}, {y}) = {got!r}, want {want!r}"


def test_ang_diff_accuracy():
    x = 138 + 128 * EPS
    y = -164.0
    d, _ = gm.ang_diff(x, y)
    assert float(d) == 58 - 128 * EPS


def test_remainder_matches_math():
    rng = np.random.default_rng(42)
    xs = np.concatenate([
        rng.uniform(-1e6, 1e6, 5000),
        rng.uniform(-720, 720, 5000),
        np.array([0.0, MZ, 180.0, -180.0, 360.0, -360.0, 540.0, -540.0,
                  900.0, 123456789.0, 1e15]),
    ])
    got = gm.remainder(xs, 360.0)
    for x, g in zip(xs, got):
        want = math.remainder(x, 360.0)
        assert equiv(want, g), f"remainder({x!r}) = {g!r}, want {want!r}"


def test_atanh():
    assert float(gm.atanh(0.5)) == pytest.approx(math.atanh(0.5), abs=1e-16)
    assert equiv(gm.atanh(0.0), 0.0)
    assert equiv(gm.atanh(MZ), MZ)
    assert float(gm.atanh(-0.5)) == -float(gm.atanh(0.5))
