"""HMM map-matching (operators/mapmatch.py): batch Viterbi vs the
per-track reference DP, smoothing semantics, geometry, fixture
freshness, and the Spark operator end-to-end."""

import importlib.util
import os

import numpy as np
import pytest

from geographiclib_go_spark.operators import mapmatch as mm

ROUTE_LAT = [20.0, 23.0, 21.0, 24.0, 22.0, 26.0,
             23.0, 27.0, 25.0, 29.0, 26.0]
ROUTE_LON = [0.0, 4.0, 8.0, 12.0, 16.0, 20.0,
             24.0, 28.0, 32.0, 36.0, 40.0]


@pytest.fixture(scope="module")
def frames():
    return mm.seg_frames(ROUTE_LAT, ROUTE_LON)


def _random_tracks(seed, T, L):
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, L + 1, T)
    lat = np.zeros((T, L))
    lon = np.zeros((T, L))
    for r in range(T):
        n = lens[r]
        lon[r, :n] = np.sort(rng.uniform(0, 40, n))
        lat[r, :n] = rng.uniform(19, 30, n)
    return lat, lon, lens


@pytest.mark.parametrize("lam", [0.0, 0.01, 0.05, 0.3])
def test_batch_equals_loop(frames, lam):
    lat, lon, lens = _random_tracks(31, 250, 21)
    got = mm.viterbi_batch(lat, lon, lens, frames, lam)
    for r in range(250):
        want = mm.viterbi_loop(lat[r, :lens[r]], lon[r, :lens[r]],
                               frames, lam)
        assert np.array_equal(got[r, :lens[r]], want), (r, lam)
        assert (got[r, lens[r]:] == -1).all()


def test_smoothing_semantics(frames):
    """lam=0 is pure nearest-segment; a huge lam freezes the path on
    one segment (the one minimizing total emission); a single
    far-field outlier ping does not drag a smoothed path."""
    # pings hugging segment 4 with one outlier near segment 0
    lat = np.array([[22.0, 23.0, 22.5, 20.0, 23.0, 22.4]])
    lon = np.array([[16.5, 17.5, 18.0, 1.0, 19.0, 19.5]])
    lens = np.array([6])
    near = mm.viterbi_batch(lat, lon, lens, frames, 0.0)[0]
    E = mm.seg_dist_ratio(mm.unit_vectors(lat[0], lon[0]), frames)
    assert np.array_equal(near, np.argmin(E, axis=1))
    assert near[3] == 0                      # outlier snaps away
    sm = mm.viterbi_batch(lat, lon, lens, frames, 0.05)[0]
    assert sm[3] == sm[2]                    # smoothed through
    frozen = mm.viterbi_batch(lat, lon, lens, frames, 1e3)[0]
    assert (frozen == frozen[0]).all()
    assert frozen[0] == np.argmin(E.sum(axis=0))


def test_segment_distance_geometry(frames):
    """Inside the segment extent the ratio is the cross-track sin;
    beyond the end it's the endpoint distance."""
    u = mm.unit_vectors(np.array([20.0, 50.0]), np.array([2.0, 2.0]))
    r = mm.seg_dist_ratio(u, frames)
    # point 0 sits between waypoints 0-1 laterally: its distance to
    # segment 0 must be < its distance to either endpoint
    d0a = np.sqrt(1 - np.dot(u[0], frames[0][0]) ** 2)
    d0b = np.sqrt(1 - np.dot(u[0], frames[1][0]) ** 2)
    assert r[0, 0] < min(d0a, d0b)
    # point 1 is far north of everything: every segment distance is
    # its nearer-endpoint distance (foot outside), so r equals the
    # min over the two endpoint sines
    for s in range(10):
        da = np.sqrt(max(0.0, 1 - np.dot(u[1], frames[0][s]) ** 2))
        db = np.sqrt(max(0.0, 1 - np.dot(u[1], frames[1][s]) ** 2))
        assert np.isclose(r[1, s], min(da, db), atol=1e-12)


def test_degenerate_route_rejected():
    with pytest.raises(ValueError, match="degenerate"):
        mm.seg_frames([10.0, 10.0], [5.0, 5.0])


def test_map_match_fixture_fresh(tmp_path):
    import pyarrow.parquet as pq
    _spec = importlib.util.spec_from_file_location(
        "build_fixtures", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "build_fixtures.py"))
    bf = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(bf)
    n = 1500
    fresh = pq.read_table(
        bf.build_map_match(n, out_dir=str(tmp_path))).to_pandas()
    com = pq.read_table(os.path.join(
        bf.FIXTURE_DIR, "track_map_match.parquet")).to_pandas()
    com = com[com.c_custkey < n].reset_index(drop=True)
    for col in ("final_seg", "n_switches", "path_ck"):
        assert np.array_equal(fresh[col].to_numpy(),
                              com[col].to_numpy()), col


def test_match_tracks_spark_operator(spark, frames):
    import pandas as pd
    lat, lon, lens = _random_tracks(77, 30, 15)
    rows = [(t, i, lat[t, i], lon[t, i])
            for t in range(30) for i in range(lens[t])]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tid", "seq", "lat", "lon"]))
    got = {r["tid"]: list(r["matched_seg"]) for r in
           mm.match_tracks(df, "tid", "seq", "lat", "lon",
                           ROUTE_LAT, ROUTE_LON, lam=0.05).collect()}
    want = mm.viterbi_batch(lat, lon, lens, frames, 0.05)
    for t in range(30):
        assert got[t] == list(want[t, :lens[t]]), t
