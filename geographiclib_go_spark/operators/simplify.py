"""Geodesic polyline simplification (Douglas-Peucker, sphere).

Spark has no trajectory-simplification operator; this one follows the
engine's house pattern: a numpy batch kernel behind one Arrow stage.

Deviation metric: great-circle-LINE deviation.  Points become 3D unit
vectors once; a point p's deviation from the chord (a, b) is
R * asin(|p . n| / |n|) with n = a x b.  All *decisions* (split
vs drop, argmax within a segment) compare |p . n| / |n| against
sin(eps / R) — multiply/divide/abs only, no transcendental inside the
comparison — so the only float noise between implementations is the
one-time unit-vector trig (~1 ulp).  Registered layouts must follow
the planted-clearance protocol: every decision margin measured >= 1e6x
that noise (scripts/build_fixtures.py asserts it when building the
oracle fixture).

Two independent implementations ship on purpose:

- ``dp_recursive`` — the textbook stack recursion, one track at a
  time.  Used by the fixture builder, i.e. it IS the oracle.
- ``dp_batch`` — level-synchronous over a [T, L] block of tracks: one
  vectorized deviation pass per recursion LEVEL for every unresolved
  point of every track at once (np.maximum.at segmented argmax), not
  per segment.  Used by the Spark operator.

The Spark plan (``simplify_tracks``): groupBy(track) collect_list
(sorted by seq) — ONE shuffle, the same exchange any per-track
analytic needs — then a pandas_udf runs dp_batch over thousands of
tracks per Arrow batch and returns the kept seq indices.  Tracks are
bounded per key (pings per device), so the collected row is bounded;
at 100 TB this is the standard trajectory shape: shuffle once by
track, Arrow-kernel everything else, explode back if row-per-point
output is wanted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType


def unit_vectors(lat_deg, lon_deg):
    """Unit sphere vectors, shape (..., 3)."""
    la = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lo = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)],
                    axis=-1)


def _dev_ratio(u_a, u_b, u_p):
    """sin(line deviation angle) of p from the great circle through
    (a, b): |p . (a x b)| / |a x b|.  Degenerate a==b (zero cross
    product) falls back to sin(angle p-a) = |p x a| — the distance to
    the point itself, which is what DP wants for a closed loop."""
    n = np.cross(u_a, u_b)
    nn = np.sqrt(np.sum(n * n, axis=-1))
    num = np.abs(np.sum(u_p * n, axis=-1))
    pxa = np.cross(u_p, u_a)
    alt = np.sqrt(np.sum(pxa * pxa, axis=-1))
    safe = np.where(nn > 0.0, nn, 1.0)
    return np.where(nn > 0.0, num / safe, alt)


def dp_recursive(lat_deg, lon_deg, eps_m, radius_m=6371000.0):
    """Textbook Douglas-Peucker on one track; returns keep bool[L].
    Strict split rule: a segment splits iff its max deviation > eps;
    argmax ties go to the smallest index."""
    u = unit_vectors(lat_deg, lon_deg)
    L = u.shape[0]
    keep = np.zeros(L, dtype=bool)
    if L == 0:
        return keep
    keep[0] = keep[L - 1] = True
    if L <= 2:
        return keep
    thr = np.sin(min(eps_m / radius_m, np.pi / 2))
    stack = [(0, L - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        r = _dev_ratio(u[i], u[j], u[i + 1:j])
        k_rel = 0
        best = r[0]
        for t in range(1, r.shape[0]):       # first strict max
            if r[t] > best:
                best = r[t]
                k_rel = t
        if best > thr:
            k = i + 1 + k_rel
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def dp_batch(lat_deg, lon_deg, lengths, eps_m, radius_m=6371000.0):
    """Level-synchronous DP over a padded [T, L] block; lengths[T]
    gives each track's true point count.  Returns keep bool[T, L].

    Per iteration every unresolved point evaluates its deviation from
    its CURRENT segment's endpoints in one vectorized pass; segmented
    max/argmax via np.maximum.at on (track, segment-start) keys; split
    segments reassign their points' endpoint indices.  Iteration
    count = DP recursion depth (worst case L, typically ~log L) —
    never per-segment Python."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)
    T, L = lat.shape
    lengths = np.asarray(lengths, dtype=np.int64)
    keep = np.zeros((T, L), dtype=bool)
    if T == 0 or L == 0:
        return keep
    rows = np.arange(T)
    keep[rows[lengths > 0], 0] = True
    last = np.maximum(lengths - 1, 0)
    keep[rows[lengths > 0], last[lengths > 0]] = True
    u = unit_vectors(lat, lon)                       # [T, L, 3]
    thr = np.sin(min(eps_m / radius_m, np.pi / 2))

    idx_l = np.tile(np.arange(L), T)
    idx_t = np.repeat(rows, L)
    interior = (idx_l > 0) & (idx_l < (lengths[idx_t] - 1))
    t = idx_t[interior]
    l = idx_l[interior]
    seg_i = np.zeros(t.shape[0], dtype=np.int64)
    seg_j = lengths[t] - 1

    while t.shape[0]:
        ratio = _dev_ratio(u[t, seg_i], u[t, seg_j], u[t, l])
        key = t * L + seg_i
        segmax = np.full(T * L, -1.0)
        np.maximum.at(segmax, key, ratio)
        smax = segmax[key]
        # first-index argmax per segment, matching dp_recursive's tie
        # rule (same floats -> same winner; clearance protocol keeps
        # near-ties out of registered layouts)
        argmin_l = np.full(T * L, L + 1, dtype=np.int64)
        is_max = ratio == smax
        np.minimum.at(argmin_l, key[is_max], l[is_max])
        k = argmin_l[key]
        split = smax > thr
        won = split & (l == k)        # only the argmin of the ties
        keep[t[won], l[won]] = True
        # points in split segments move to their half; the argmax
        # point and all points of non-split segments resolve
        alive = split & (l != k)
        new_i = np.where(l > k, k, seg_i)
        new_j = np.where(l < k, k, seg_j)
        t, l = t[alive], l[alive]
        seg_i, seg_j = new_i[alive], new_j[alive]
    return keep


_KEPT_SCHEMA = ArrayType(IntegerType())


def simplify_tracks(df: DataFrame, id_col: str, seq_col: str,
                    lat_col: str, lon_col: str, eps_m: float,
                    radius_m: float = 6371000.0,
                    parallelism: int = None) -> DataFrame:
    """Simplify every track in df (rows = points) with geodesic
    Douglas-Peucker; returns one row per track:
    (id_col, kept_seq array<int> — the seq values of surviving
    points, ascending).  One shuffle (the groupBy), then a single
    Arrow stage running dp_batch over the whole batch of tracks.

    parallelism: explicit fan-out for the DP stage — same rationale
    as mapmatch.match_tracks: the grouped rows are byte-light but
    compute-heavy, so AQE's size-based coalescing under-parallelizes
    the Arrow stage at small scale.  Leave None at cluster scale."""
    @F.pandas_udf(_KEPT_SCHEMA)
    def _dp(lats: pd.Series, lons: pd.Series) -> pd.Series:
        n = len(lats)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(v) for v in lats), dtype=np.int64,
                           count=n)
        L = int(lens.max()) if n else 0
        la = np.zeros((n, L)), np.zeros((n, L))
        la, lo = la
        for r in range(n):                    # ragged -> padded copy
            la[r, :lens[r]] = lats.iloc[r]
            lo[r, :lens[r]] = lons.iloc[r]
        keep = dp_batch(la, lo, lens, eps_m, radius_m)
        return pd.Series(
            [np.flatnonzero(keep[r, :lens[r]]).astype(np.int32)
             for r in range(n)])

    pts = F.sort_array(F.collect_list(
        F.struct(F.col(seq_col).alias("s"),
                 F.col(lat_col).alias("la"),
                 F.col(lon_col).alias("lo"))))
    g = df.groupBy(id_col).agg(pts.alias("_pts"))
    if parallelism:
        g = g.repartition(parallelism, F.col(id_col))
    g = g.withColumn("_kept_pos",
                     _dp(F.col("_pts.la"), F.col("_pts.lo")))
    # kept positions -> original seq values, JVM-side
    kept = F.transform("_kept_pos",
                       lambda p: F.col("_pts.s")[p])
    return g.select(F.col(id_col), kept.alias("kept_seq"))
