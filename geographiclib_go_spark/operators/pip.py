"""Point-in-polygon on the sphere (engine-added; north rule).

Winding/ray-cast test in (lon, lat) with dateline and pole handling:
vertex longitudes are reduced relative to each query point with the
reference's exact angle difference (geomath.go:146-155), so edges that
straddle the dateline are handled without special cases.  Edges are
interpreted with latitude linear in longitude (adequate for tile
boundaries; the geodesic kernels remain the authority for distances).

Pole-circling rings (|sum of longitude steps| ~ 360, e.g. Antarctica
or the polar test rings) separate both poles; containment is resolved
by counting meridian crossings between the point and the NORTH pole
and XOR-ing with whether the north pole itself is enclosed (enclosed
pole = pole nearest the vertex mean latitude — reliable for real
tiles, which never wind around a distant pole).
"""

from __future__ import annotations

import numpy as np

from geographiclib_go_spark.kernels import geomath as gm


def ring_winding(lons) -> int:
    """Net meridian winding of a closed ring: 0 for ordinary rings,
    +/-1 when the ring encircles a pole (cf. the reference's transit
    counting, polygon.go:262-275)."""
    lons = gm.arr(lons)
    nxt = np.roll(lons, -1)
    d, _ = gm.ang_diff(lons, nxt)
    return int(np.round(d.sum() / 360.0))


def pole_inside(lats, lons) -> tuple:
    """(north_pole_inside, south_pole_inside) for a closed ring."""
    w = ring_winding(lons)
    if w == 0:
        return False, False
    north = float(np.mean(gm.arr(lats))) > 0
    return (north, not north)


def points_in_ring(lat, lon, ring_lats, ring_lons) -> np.ndarray:
    """Vectorized containment of N points in one closed ring.

    Returns bool array of shape (N,).  Boundary points follow the
    half-open crossing convention (deterministic, side unspecified).
    """
    lat = gm.arr(lat)
    lon = gm.arr(lon)
    rla = gm.arr(ring_lats)
    rlo = gm.arr(ring_lons)
    m = rla.size
    if m < 3:
        return np.zeros(lat.shape, dtype=bool)

    # reduce each vertex lon relative to each point lon: (N, M)
    dlon, _ = gm.ang_diff(lon[:, None], rlo[None, :])
    la = np.broadcast_to(rla[None, :], dlon.shape)

    d1 = dlon
    d2 = np.roll(dlon, -1, axis=1)
    la1 = la
    la2 = np.roll(la, -1, axis=1)

    # half-open straddle test of the point's meridian: a sign change in
    # reduced longitude crosses meridian 0 only if the SHORT arc passes
    # through 0 (|d1|+|d2| < 180); otherwise it crosses the point's
    # anti-meridian (dateline relative to the point) — irrelevant to
    # the northward ray.
    straddle = ((d1 <= 0) != (d2 <= 0)) & \
        (np.abs(d1) + np.abs(d2) < 180.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(straddle, (0.0 - d1) / (d2 - d1), 0.0)
        lat_x = la1 + (la2 - la1) * t
    north_cross = straddle & (lat_x > lat[:, None])
    crossings = north_cross.sum(axis=1)

    n_inside, _ = pole_inside(rla, rlo)
    return (crossings % 2 == 1) ^ bool(n_inside)


def ring_cells(ring_lats, ring_lons, res: int, pad_rings: int = 1):
    """Complete cell cover of a ring at resolution `res` (engine-added
    cover planner).  Samples the ring's lat/lon bbox at half-cell
    granularity (dateline-aware, pole-aware) and pads by `pad_rings`
    rings, guaranteeing a superset of every cell the ring touches —
    the PIP refine step restores exactness."""
    from geographiclib_go_spark.operators import cells as kcells

    rla = gm.arr(ring_lats)
    rlo = gm.arr(ring_lons)
    n_in, s_in = pole_inside(rla, rlo)
    lat_min, lat_max = float(rla.min()), float(rla.max())
    if n_in:
        lat_max = 90.0
    if s_in:
        lat_min = -90.0

    # longitude extent: accumulate reduced steps from vertex 0
    d, _ = gm.ang_diff(rlo[0], rlo)
    if n_in or s_in or (d.max() - d.min()) > 300:
        lon_lo, lon_hi = -180.0, 180.0
        lon0 = 0.0
    else:
        lon_lo, lon_hi = float(d.min()), float(d.max())
        lon0 = float(rlo[0])

    # sample step: half of a typical cell width in degrees
    step = max(90.0 / (1 << res) / 2, 1e-4)
    lat_pad = min(90.0, max(lat_max - lat_min, step))
    lats = np.arange(lat_min - step, lat_max + 2 * step, step)
    lats = np.clip(lats, -90, 90)
    lons = np.arange(lon_lo - step, lon_hi + 2 * step, step)
    glat, glon = np.meshgrid(lats, lons)
    cand = kcells.cell_from_latlon(
        glat.ravel(), gm.ang_normalize(glon.ravel() + lon0), res)
    cand = np.unique(cand)
    if pad_rings:
        cand = kcells.ring_expand(cand, res, pad_rings)
    return cand
