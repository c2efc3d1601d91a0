"""Geodesic Douglas-Peucker simplification (operators/simplify.py):
batch kernel vs textbook recursion, geometric edge cases, fixture
freshness, and the Spark operator end-to-end."""

import importlib.util
import os

import numpy as np
import pytest

from geographiclib_go_spark.operators import simplify as sy


def _random_tracks(seed, T, L):
    rng = np.random.default_rng(seed)
    lens = rng.integers(2, L + 1, T)
    lat = np.zeros((T, L))
    lon = np.zeros((T, L))
    for r in range(T):
        n = lens[r]
        lat[r, :n] = (np.cumsum(rng.integers(-5, 6, n)) / 100
                      + rng.integers(-5000, 5000) / 100)
        lon[r, :n] = (np.cumsum(rng.integers(-5, 6, n)) / 100
                      + rng.integers(-15000, 15000) / 100)
    return lat, lon, lens


@pytest.mark.parametrize("eps", [10.0, 500.0, 4000.0, 50000.0])
def test_batch_equals_recursive_random_ragged(eps):
    """Level-synchronous batch DP == stack recursion, bit for bit, on
    ragged integer-grid random walks (a layout dense in exact ratio
    ties, exercising the shared first-index tie rule)."""
    lat, lon, lens = _random_tracks(11, 400, 33)
    got = sy.dp_batch(lat, lon, lens, eps)
    for r in range(lat.shape[0]):
        want = sy.dp_recursive(lat[r, :lens[r]], lon[r, :lens[r]], eps)
        assert np.array_equal(got[r, :lens[r]], want), (r, eps)
        assert not got[r, lens[r]:].any()


def test_geometric_edges():
    # collinear (same meridian): only endpoints survive
    k = sy.dp_recursive([0.0, 1.0, 2.0, 3.0], [5.0, 5.0, 5.0, 5.0],
                        eps_m=1.0)
    assert list(np.flatnonzero(k)) == [0, 3]
    # a ~55 km deviator must survive a 1 km tolerance
    k = sy.dp_recursive([0.0, 0.5, 0.0], [0.0, 1.0, 2.0], eps_m=1000.0)
    assert k.all()
    # ...and be dropped by a 100 km tolerance
    k = sy.dp_recursive([0.0, 0.5, 0.0], [0.0, 1.0, 2.0],
                        eps_m=100_000.0)
    assert list(np.flatnonzero(k)) == [0, 2]
    # closed loop (first == last): degenerate chord falls back to
    # point distance, far point kept
    k = sy.dp_recursive([0.0, 10.0, 0.0], [0.0, 0.0, 0.0],
                        eps_m=1000.0)
    assert k.all()
    # tiny tracks
    assert sy.dp_recursive([1.0], [2.0], 10.0).tolist() == [True]
    assert sy.dp_recursive([1.0, 2.0], [2.0, 3.0], 10.0).all()
    b = sy.dp_batch(np.zeros((2, 3)), np.zeros((2, 3)),
                    np.array([1, 2]), 10.0)
    assert b[0].tolist() == [True, False, False]
    assert b[1].tolist() == [True, True, False]


def test_deviation_is_line_distance():
    """_dev_ratio equals sin(cross-track angle) from the classic
    bearing formula on a generic triple."""
    la1, lo1, la2, lo2, la3, lo3 = 10.0, 20.0, 15.0, 40.0, 14.0, 29.0
    u = sy.unit_vectors(np.array([la1, la2, la3]),
                        np.array([lo1, lo2, lo3]))
    got = sy._dev_ratio(u[0], u[1], u[2])

    def brg(a, b):
        p1, l1 = np.radians(a[0]), np.radians(a[1])
        p2, l2 = np.radians(b[0]), np.radians(b[1])
        dl = l2 - l1
        return np.arctan2(
            np.sin(dl) * np.cos(p2),
            np.cos(p1) * np.sin(p2)
            - np.sin(p1) * np.cos(p2) * np.cos(dl))

    d13 = np.arccos(np.clip(np.dot(u[0], u[2]), -1, 1))
    t13 = brg((la1, lo1), (la3, lo3))
    t12 = brg((la1, lo1), (la2, lo2))
    want = abs(np.sin(d13) * np.sin(t13 - t12))
    assert abs(got - want) < 1e-12


def test_track_simplify_fixture_fresh(tmp_path):
    """The committed DP fixture must equal a fresh rebuild (which
    itself asserts batch == recursive on every registered track) —
    guards against layout/eps edits without re-running
    scripts/build_fixtures.py."""
    import pyarrow.parquet as pq
    _spec = importlib.util.spec_from_file_location(
        "build_fixtures", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "build_fixtures.py"))
    bf = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(bf)
    n = 1500
    fresh = pq.read_table(
        bf.build_track_simplify(n, out_dir=str(tmp_path))).to_pandas()
    com = pq.read_table(os.path.join(
        bf.FIXTURE_DIR, "track_simplify.parquet")).to_pandas()
    com = com[com.c_custkey < n].reset_index(drop=True)
    assert np.array_equal(fresh.n_kept.to_numpy(), com.n_kept.to_numpy())
    assert np.array_equal(fresh.kept_mask.to_numpy(),
                          com.kept_mask.to_numpy())


def test_simplify_tracks_spark_operator(spark):
    """simplify_tracks end-to-end: kept_seq values are original seq
    ids (not positions), ascending, endpoints always present; agrees
    with dp_batch run directly."""
    import pandas as pd
    lat, lon, lens = _random_tracks(5, 40, 20)
    rows = []
    for t in range(40):
        for i in range(lens[t]):
            # seq ids offset by 100 to prove position->seq mapping
            rows.append((t, 100 + i * 3, lat[t, i], lon[t, i]))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tid", "seq", "lat", "lon"]))
    got = {r["tid"]: list(r["kept_seq"]) for r in
           sy.simplify_tracks(df, "tid", "seq", "lat", "lon",
                              eps_m=4000.0).collect()}
    keep = sy.dp_batch(lat, lon, lens, 4000.0)
    for t in range(40):
        want = [100 + int(i) * 3
                for i in np.flatnonzero(keep[t, :lens[t]])]
        assert got[t] == want, t
        assert got[t][0] == 100 and got[t][-1] == 100 + (lens[t]-1) * 3
