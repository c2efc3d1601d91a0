"""Clairaut latitude envelope (operators/envelope.py)."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from geographiclib_go_spark.kernels.api import Geodesic
from geographiclib_go_spark.kernels.geodesic import WGS84_A, WGS84_F
from geographiclib_go_spark.operators import envelope as env

SPHERE_A = 6371008.8


def _sample_max_lat(g, lat1, lon1, lat2, lon2, n=2000):
    ln = g.inverse_line(lat1, lon1, lat2, lon2)
    lats = [ln.position(ln.s13 * i / n).lat2 for i in range(n + 1)]
    return max(lats), min(lats)


def _py_envelope(g, f, lat1, lon1, lat2, lon2):
    r = g.inverse(lat1, lon1, lat2, lon2)
    ca1 = math.cos(math.radians(r.azi1))
    ca2 = math.cos(math.radians(r.azi2))
    beta1 = math.atan((1 - f) * math.tan(math.radians(lat1)))
    sin_a0 = math.sin(math.radians(r.azi1)) * math.cos(beta1)
    beta_v = math.acos(abs(sin_a0))
    vlat = math.degrees(math.atan(math.tan(beta_v) / (1 - f)))
    hi = vlat if (ca1 > 0 > ca2) else max(lat1, lat2)
    lo = -vlat if (ca1 < 0 < ca2) else min(lat1, lat2)
    return lo, hi, (1 if ca1 > 0 > ca2 else -1 if ca1 < 0 < ca2 else 0)


SEGS = [
    # vertex-straddling: 60N->60N across half the hemisphere peaks
    # far above the endpoints
    (60.0, -150.0, 60.0, 30.0 - 1e-3),
    (60.0, -60.0, 60.0, 20.0),
    (-45.0, 10.0, -45.0, 130.0),       # south vertex
    (10.0, 0.0, 50.0, 40.0),           # monotone: endpoint bound
    (-20.0, 170.0, 15.0, -160.0),      # dateline crossing
    (0.0, 0.0, 0.0, 90.0),             # equatorial segment
    (35.0, 5.0, 36.0, 6.0),            # short leg
]


@pytest.mark.parametrize("a,f", [(SPHERE_A, 0.0), (WGS84_A, WGS84_F)])
def test_envelope_bounds_dense_sampling(a, f):
    """The envelope is a TRUE bound (no false negatives) and, when a
    vertex is flagged inside, a TIGHT one — on the sphere AND on
    WGS84 (the reduced-latitude mapping)."""
    g = Geodesic(a, f)
    for lat1, lon1, lat2, lon2 in SEGS:
        lo, hi, vtx = _py_envelope(g, f, lat1, lon1, lat2, lon2)
        smax, smin = _sample_max_lat(g, lat1, lon1, lat2, lon2)
        assert smax <= hi + 1e-9, (lat1, lon1, lat2, lon2, smax, hi)
        assert smin >= lo - 1e-9, (lat1, lon1, lat2, lon2, smin, lo)
        if vtx == 1:    # sampled max approaches the vertex latitude
            assert hi - smax <= 1e-4
            assert hi > max(lat1, lat2) + 0.1
        if vtx == -1:
            assert smin - lo <= 1e-4
            assert lo < min(lat1, lat2) - 0.1


def test_operator_matches_python_reference(spark):
    g = Geodesic(SPHERE_A, 0.0)
    df = spark.createDataFrame(
        [(i, *s) for i, s in enumerate(SEGS)],
        "sid long, lat1 double, lon1 double, lat2 double, lon2 double")
    out = env.with_lat_envelope(df, "lat1", "lon1", "lat2", "lon2",
                                a=SPHERE_A, f=0.0)
    rows = {r.sid: r for r in out.collect()}
    for i, (lat1, lon1, lat2, lon2) in enumerate(SEGS):
        lo, hi, vtx = _py_envelope(g, 0.0, lat1, lon1, lat2, lon2)
        r = rows[i]
        assert r.vtx == vtx
        assert abs(r.lat_lo - lo) < 1e-9
        assert abs(r.lat_hi - hi) < 1e-9


def test_registered_query_clearances(spark, sf_dir):
    """The hash gate survives only if the kernel-vs-closed-form noise
    (~1e-12) cannot flip an azimuth SIGN test or a ROUND(.,6) digit.
    Measure both margins over every leg at this sf."""
    from geographiclib_go_spark import queries as Q
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", "ts", "event_id").toPandas()
    e = ev.event_id.astype("int64")
    lat = ((e * 131) % 6000) / 100.0 - 30.0
    lon = ((e * 211) % 12000) / 100.0 - 60.0
    ev = ev.assign(lat=lat, lon=lon).sort_values(
        ["user_id", "ts", "event_id"])
    legs = []
    for _, grp in ev.groupby("user_id"):
        arr = grp[["lat", "lon"]].to_numpy()
        for i in range(1, len(arr)):
            legs.append((*arr[i - 1], *arr[i]))
    legs = np.array(legs)
    p1, l1, p2, l2 = (np.radians(legs[:, i]) for i in range(4))
    dl = l2 - l1
    azi1 = np.arctan2(np.sin(dl) * np.cos(p2),
                      np.cos(p1) * np.sin(p2)
                      - np.sin(p1) * np.cos(p2) * np.cos(dl))
    azi2b = np.arctan2(np.sin(-dl) * np.cos(p1),
                       np.cos(p2) * np.sin(p1)
                       - np.sin(p2) * np.cos(p1) * np.cos(-dl))
    ca1, ca2 = np.cos(azi1), -np.cos(azi2b)
    # sign margins: closed-form cosines stay far from 0
    assert np.abs(ca1).min() > 1e-4
    assert np.abs(ca2).min() > 1e-4
    # rounding margins: vertex latitudes stay off the 1e-6 grid edges
    vlat = np.degrees(np.arccos(np.abs(np.sin(azi1) * np.cos(p1))))
    frac = np.abs((vlat * 1e6 + 0.5) % 1.0 - 0.5)
    assert frac.min() > 1e-4
    # and the query itself returns one row per leg
    out = Q.track_lat_envelope(spark, sf_dir)
    assert out.count() == len(legs)
