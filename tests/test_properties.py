"""Property-based invariants (hypothesis) for the angle primitives and
kernels — randomized coverage beyond the reference's fixed edge
vectors (the reference itself uses none; SURVEY.md §5)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import geomath as gm
from geographiclib_go_spark.kernels.direct import direct
from geographiclib_go_spark.kernels.geodesic import GeodesicModel
from geographiclib_go_spark.kernels.inverse import inverse

finite_deg = st.floats(allow_nan=False, allow_infinity=False,
                       min_value=-1e8, max_value=1e8)
lat_deg = st.floats(min_value=-90.0, max_value=90.0)
lon_deg = st.floats(min_value=-540.0, max_value=540.0)

WGS84 = GeodesicModel(6378137.0, 1 / 298.257223563)


@given(finite_deg)
@settings(max_examples=300, deadline=None)
def test_ang_normalize_range_and_ieee(x):
    y = float(gm.ang_normalize(np.array([x]))[0])
    assert -180.0 <= y < 180.0 or (y == 180.0 and x >= 0)
    # equals IEEE remainder up to the +-180 sign convention
    r = math.remainder(x, 360.0)
    if abs(r) != 180.0:
        assert y == r


@given(finite_deg)
@settings(max_examples=300, deadline=None)
def test_sincosd_pythagorean_and_quadrant(x):
    s, c = gm.sincosd(np.array([x]))
    s, c = float(s[0]), float(c[0])
    assert abs(s * s + c * c - 1.0) < 1e-15
    # exact values at multiples of 90
    if x == round(x) and round(x) % 90 == 0:
        assert s in (-1.0, 0.0, 1.0) and c in (-1.0, 0.0, 1.0)


@given(finite_deg, finite_deg)
@settings(max_examples=300, deadline=None)
def test_ang_diff_is_exact(x, y):
    d, e = gm.ang_diff(np.array([x]), np.array([y]))
    d, e = float(d[0]), float(e[0])
    assert -180.0 <= d <= 180.0
    assert abs(e) <= 0.5e-9  # error term below half-ulp of degrees span


@given(st.floats(min_value=-1e15, max_value=1e15),
       st.floats(min_value=-1e15, max_value=1e15))
@settings(max_examples=300, deadline=None)
def test_sum2_error_free(u, v):
    s, t = gm.sum2(np.array([u]), np.array([v]))
    s, t = float(s[0]), float(t[0])
    assert s == u + v
    # the residual is exactly the rounding error (Knuth 2Sum property
    # holds when no overflow): s + t reproduces u + v in higher
    # precision — check via fractions to avoid float re-rounding
    from fractions import Fraction
    assert Fraction(s) + Fraction(t) == Fraction(u) + Fraction(v)


@given(lat_deg, lon_deg, finite_deg,
       st.floats(min_value=1.0, max_value=19_000_000.0))
@settings(max_examples=100, deadline=None)
def test_direct_inverse_roundtrip_property(lat1, lon1, azi1, s12):
    d = direct(WGS84, np.array([lat1]), np.array([lon1]),
               np.array([azi1]), np.array([s12]), C.STANDARD)
    inv = inverse(WGS84, np.array([lat1]), np.array([lon1]),
                  d["lat2"], d["lon2"], C.DISTANCE)
    # minimality: the inverse may only find an equal-or-shorter path
    assert float(inv["s12"][0]) <= s12 + 1e-8
    # inside the uniqueness zone it must recover the distance exactly
    if s12 < 0.92 * math.pi * WGS84.b * WGS84.b / WGS84.a:
        assert abs(float(inv["s12"][0]) - s12) < 2e-8


@given(lat_deg, lon_deg, lat_deg, lon_deg)
@settings(max_examples=100, deadline=None)
def test_inverse_symmetry_property(lat1, lon1, lat2, lon2):
    """inverse(p1,p2).s12 == inverse(p2,p1).s12 (path symmetry)."""
    a = inverse(WGS84, np.array([lat1]), np.array([lon1]),
                np.array([lat2]), np.array([lon2]), C.DISTANCE)
    b = inverse(WGS84, np.array([lat2]), np.array([lon2]),
                np.array([lat1]), np.array([lon1]), C.DISTANCE)
    sa, sb = float(a["s12"][0]), float(b["s12"][0])
    assert abs(sa - sb) <= 1e-8 * max(1.0, sa)


@given(lat_deg, st.floats(min_value=-180.0, max_value=180.0),
       st.integers(min_value=1, max_value=14))
@settings(max_examples=300, deadline=None)
def test_cell_hierarchy_property(lat, lon, res):
    """Parent containment: the cell at res-1 is cell@res >> 2, and the
    cell's center maps back into the same cell (randomized version of
    the fixed test_cells vectors)."""
    from geographiclib_go_spark.operators import cells as kcells
    c = int(kcells.cell_from_latlon(np.array([lat]),
                                    np.array([lon]), res)[0])
    p = int(kcells.cell_from_latlon(np.array([lat]),
                                    np.array([lon]), res - 1)[0])
    assert c >> 2 == p
    cla, clo = kcells.cell_center(np.array([c]), res)
    c2 = int(kcells.cell_from_latlon(cla, clo, res)[0])
    assert c2 == c


# --------------------------------------------------------------------------
# sketch-hash + raw-media kernels (round 2)
# --------------------------------------------------------------------------

from geographiclib_go_spark.operators import sketch_hash as sk
from geographiclib_go_spark.sources import media as md

texts_st = st.lists(
    st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
            min_size=0, max_size=60),
    min_size=1, max_size=8)


def _naive_poly(s, base, mod):
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


@given(texts_st)
@settings(max_examples=60, deadline=None)
def test_shingle_sets_match_naive(texts):
    h1, hw, offs = sk.shingle_sets(texts, 5)
    for i, s in enumerate(texts):
        got = set(zip(h1[offs[i]:offs[i + 1]].tolist(),
                      hw[offs[i]:offs[i + 1]].tolist()))
        if len(s) < 5:
            want = {(0, 0)}
        else:
            want = set()
            for j in range(len(s) - 4):
                w = s[j:j + 5]
                a = _naive_poly(w, sk.B1, sk.P1)
                want.add((a, a * sk.P2 + _naive_poly(w, sk.B2, sk.P2)))
        assert got == want, (i, s)


@given(texts_st)
@settings(max_examples=60, deadline=None)
def test_simhash_batch_matches_per_doc(texts):
    """Batch result must be independent of batch composition: each
    document's signature equals its singleton-batch signature."""
    batch = sk.simhash_batch(texts)
    for i, s in enumerate(texts):
        assert batch[i] == sk.simhash_batch([s])[0], (i, s)


@given(texts_st, st.integers(min_value=2, max_value=24))
@settings(max_examples=40, deadline=None)
def test_fingerprint_batch_matches_per_doc(texts, window):
    batch = sk.fingerprint_batch(texts, window)
    for i, s in enumerate(texts):
        assert batch[i] == sk.fingerprint_batch([s], window)[0]


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=500),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    import numpy as _np
    s = _np.asarray(samples, dtype=_np.int16)
    got, got_rate = md.wav_decode(md.wav_encode(s, rate))
    assert got_rate == rate
    assert _np.array_equal(got, s)


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=6),
       st.integers(min_value=1, max_value=8),
       st.integers(min_value=1, max_value=8))
@settings(max_examples=60, deadline=None)
def test_rawv_roundtrip_property(vid, n, h, w):
    import numpy as _np
    frames = md.video_frames_for(vid, n, h, w)
    assert _np.array_equal(md.rawv_decode(md.rawv_encode(frames)), frames)
