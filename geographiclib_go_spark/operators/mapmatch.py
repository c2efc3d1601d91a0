"""HMM map-matching of ping tracks onto a route (Viterbi decode).

The classic trajectory operator Spark lacks: assign every GPS ping to
a route segment such that emission cost (spherical distance ping ->
segment) plus transition cost (lam per segment hop) is minimized over
the WHOLE track — pure nearest-segment assignment flickers between
parallel/crossing segments; Viterbi smooths it.

Geometry is trig-free past the one-time unit-vector conversion
(decisions use sin-ratios from dot/cross products only, as in
operators/simplify.py): the distance ratio of ping p to segment
(a, b) is |p . n|/|n| (n = a x b) when the foot of the perpendicular
lies within the segment — tested by the two tangent-plane signs
p . (b - a cos(arc)) >= 0 and p . (a - b cos(arc)) >= 0 — else the
sin of the angle to the nearer endpoint.

Two independent implementations, same contract as simplify.py:
``viterbi_loop`` (per-track python DP over (step, state, prev-state),
the fixture oracle) and ``viterbi_batch`` (one [T, S, S] broadcast
min per step for every track at once).  scripts/build_fixtures.py
asserts batch == loop on every registered track; ties resolve by the
shared first-index argmin on bit-identical doubles.

Spark plan (``match_tracks``): groupBy(track) collect_list — the one
shuffle — then a pandas_udf Viterbi-decodes thousands of tracks per
Arrow batch; per-step cost is O(T * S^2) vectorized numpy.  The route
(S segments) ships in the UDF closure like every dim table on the
broadcast paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from geographiclib_go_spark.operators.simplify import unit_vectors


def seg_frames(route_lat, route_lon):
    """Per-segment precompute: endpoint unit vectors a, b, the plane
    normal n = a x b (unnormalized), |n|, cos(arc), and the two
    tangent-plane vectors for the within-segment test."""
    u = unit_vectors(np.asarray(route_lat, dtype=np.float64),
                     np.asarray(route_lon, dtype=np.float64))
    a, b = u[:-1], u[1:]
    n = np.cross(a, b)
    nn = np.sqrt(np.sum(n * n, axis=-1))
    if np.any(nn == 0.0):
        raise ValueError("degenerate route segment (identical or "
                         "antipodal endpoints)")
    cosarc = np.sum(a * b, axis=-1)
    ta = b - a * cosarc[:, None]     # tangent at a toward b
    tb = a - b * cosarc[:, None]     # tangent at b toward a
    return a, b, n, nn, ta, tb


def seg_dist_ratio(u_p, frames):
    """sin(angular distance) from point(s) u_p (..., 3) to every
    segment; returns (..., S)."""
    a, b, n, nn, ta, tb = frames
    p = u_p[..., None, :]                       # (..., 1, 3)
    ct = np.abs(np.sum(p * n, axis=-1)) / nn    # cross-track sin
    inside = ((np.sum(p * ta, axis=-1) >= 0.0)
              & (np.sum(p * tb, axis=-1) >= 0.0))
    pxa = np.cross(p, a)
    pxb = np.cross(p, b)
    da = np.sqrt(np.sum(pxa * pxa, axis=-1))    # sin(angle to a)
    db = np.sqrt(np.sum(pxb * pxb, axis=-1))
    return np.where(inside, ct, np.minimum(da, db))


def viterbi_loop(lat_deg, lon_deg, frames, lam):
    """Reference decode, one track: python DP with first-index
    argmin ties; returns seg[L] int64."""
    u = unit_vectors(np.asarray(lat_deg, dtype=np.float64),
                     np.asarray(lon_deg, dtype=np.float64))
    E = seg_dist_ratio(u, frames)               # [L, S]
    L, S = E.shape
    cost = E[0].copy()
    back = np.zeros((L, S), dtype=np.int64)
    for i in range(1, L):
        new = np.empty(S)
        for s in range(S):
            best_c, best_p = np.inf, 0
            for p in range(S):
                c = cost[p] + lam * abs(s - p)
                if c < best_c:                  # strict: first min
                    best_c, best_p = c, p
            new[s] = best_c + E[i, s]
            back[i, s] = best_p
        cost = new
    end = 0
    for s in range(1, S):
        if cost[s] < cost[end]:
            end = s
    seg = np.empty(L, dtype=np.int64)
    seg[L - 1] = end
    for i in range(L - 1, 0, -1):
        seg[i - 1] = back[i, seg[i]]
    return seg


def viterbi_batch(lat_deg, lon_deg, lengths, frames, lam):
    """Vectorized decode over a padded [T, L] block: per step one
    [T, S, S] broadcast min (np.argmin = first-index ties, matching
    viterbi_loop).  Returns seg[T, L] (-1 past each track's end)."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)
    lengths = np.asarray(lengths, dtype=np.int64)
    T, L = lat.shape
    u = unit_vectors(lat, lon)
    E = seg_dist_ratio(u, frames)               # [T, L, S]
    S = E.shape[-1]
    hop = lam * np.abs(np.arange(S)[None, :, None]
                       - np.arange(S)[None, None, :])   # [1, S(s), S(p)]
    cost = E[:, 0, :].copy()                    # [T, S]
    back = np.zeros((T, L, S), dtype=np.int64)
    alive = lengths > 1
    for i in range(1, L):
        step = alive & (i < lengths)
        if not step.any():
            break
        tot = cost[step, None, :] + hop         # [t, S(s), S(p)]
        back[np.flatnonzero(step), i] = np.argmin(tot, axis=-1)
        cost[step] = np.min(tot, axis=-1) + E[step, i, :]
    seg = np.full((T, L), -1, dtype=np.int64)
    rows = np.flatnonzero(lengths > 0)
    # first-index argmin over the final costs
    seg[rows, lengths[rows] - 1] = np.argmin(cost[rows], axis=-1)
    for i in range(L - 1, 0, -1):
        rows = np.flatnonzero(lengths > i)
        cur = seg[rows, i]
        seg[rows, i - 1] = back[rows, i, cur]
    return seg


_SEG_SCHEMA = ArrayType(IntegerType())


def match_tracks(df: DataFrame, id_col: str, seq_col: str,
                 lat_col: str, lon_col: str,
                 route_lat, route_lon, lam: float,
                 parallelism: int = None) -> DataFrame:
    """Map-match every track in df; returns (id_col, matched_seg
    array<int> — route segment per ping, in seq order).

    parallelism: explicit task fan-out for the Viterbi stage.  The
    grouped track rows are byte-light but compute-heavy, so AQE's
    size-based coalescing collapses the post-agg exchange to a few
    partitions and serializes the decode (measured 3/32 cores at
    sf0.1).  Pass the slot count when tracks-per-slot is small; leave
    None at cluster scale, where collect_list output bytes grow with
    the compute and AQE sizes the exchange correctly."""
    r_lat = [float(x) for x in route_lat]
    r_lon = [float(x) for x in route_lon]

    @F.pandas_udf(_SEG_SCHEMA)
    def _mm(lats: pd.Series, lons: pd.Series) -> pd.Series:
        frames = seg_frames(np.asarray(r_lat), np.asarray(r_lon))
        n = len(lats)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(v) for v in lats), dtype=np.int64,
                           count=n)
        L = int(lens.max())
        la = np.zeros((n, L))
        lo = np.zeros((n, L))
        for r in range(n):
            la[r, :lens[r]] = lats.iloc[r]
            lo[r, :lens[r]] = lons.iloc[r]
        seg = viterbi_batch(la, lo, lens, frames, lam)
        return pd.Series([seg[r, :lens[r]].astype(np.int32)
                          for r in range(n)])

    pts = F.sort_array(F.collect_list(
        F.struct(F.col(seq_col).alias("s"),
                 F.col(lat_col).alias("la"),
                 F.col(lon_col).alias("lo"))))
    grouped = df.groupBy(id_col).agg(pts.alias("_pts"))
    if parallelism:
        grouped = grouped.repartition(parallelism, F.col(id_col))
    return grouped.select(F.col(id_col),
                          _mm(F.col("_pts.la"), F.col("_pts.lo"))
                          .alias("matched_seg"))
