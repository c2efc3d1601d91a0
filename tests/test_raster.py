"""Raster<->vector tile assignment via the gnomonic plane."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from geographiclib_go_spark.operators import cells as kcells
from geographiclib_go_spark.operators import raster
from geographiclib_go_spark.operators import pip as kpip

# a generous box around (0, 0)
BOX = ((5.0, 5.0, -5.0, -5.0), (-5.0, 5.0, 5.0, -5.0))


def test_rasterize_tiles(spark):
    res = 5
    # tile containing the box center + one far away
    inside_tile = int(kcells.cell_from_latlon(
        np.array([0.0]), np.array([0.0]), res)[0])
    far_tile = int(kcells.cell_from_latlon(
        np.array([60.0]), np.array([100.0]), res)[0])
    tiles = spark.createDataFrame(
        [(inside_tile,), (far_tile,)], "tile_id long")
    out = raster.rasterize_tiles(tiles, {7: BOX}, res, px=8).collect()
    rows = {r.tile_id: r for r in out}
    # the center tile is fully inside the 10x10-degree box
    assert inside_tile in rows
    r = rows[inside_tile]
    assert r.poly_id == 7
    assert r.covered_px == r.total_px == 64
    assert r.coverage == 1.0
    # the faraway tile has no coverage -> no row
    assert far_tile not in rows


def test_raster_mask_agrees_with_pip(spark):
    """Each raster pixel's assignment equals a direct PIP test of the
    un-projected pixel center."""
    res = 4
    # tile straddling the box edge
    edge_tile = int(kcells.cell_from_latlon(
        np.array([5.0]), np.array([0.0]), res)[0])
    tiles = spark.createDataFrame([(edge_tile,)], "tile_id long")
    out = raster.rasterize_tiles(tiles, {7: BOX}, res, px=8).collect()
    if not out:  # the tile may fall fully outside at this res
        pytest.skip("edge tile fully outside the box at res 4")
    r = out[0]
    mask = np.unpackbits(
        np.frombuffer(bytes(r.mask), dtype=np.uint8))[:64]
    assert 0 < r.covered_px <= 64
    assert mask.sum() == r.covered_px


def test_dissolve_boxes_matches_numpy_union(spark):
    """dissolve_boxes vs a dense numpy raster of the same boxes:
    identical distinct-cell counts and exact integer areas, on a
    layout with heavy overlap."""
    import numpy as np
    import pandas as pd
    from geographiclib_go_spark.operators import dissolve as dv

    rng = np.random.default_rng(9)
    n = 120
    la0 = rng.integers(-5600, 4400, n)
    lo0 = rng.integers(-15000, 14700, n)
    pdf = pd.DataFrame({
        "grp": rng.integers(0, 3, n),
        "lat_lo_h": la0, "lat_hi_h": la0 + rng.integers(100, 300, n),
        "lon_lo_h": lo0, "lon_hi_h": lo0 + rng.integers(100, 300, n),
    })
    got = {r["grp"]: r for r in
           dv.dissolve_boxes(spark.createDataFrame(pdf), "grp")
           .collect()}

    R = dv.EARTH_R
    for g, sub in pdf.groupby("grp"):
        cells = set()
        for _, b in sub.iterrows():
            imin = -(-(b.lat_lo_h - 5) // 10)   # ceil((lo-5)/10)
            imax = -(-(b.lat_hi_h - 5) // 10) - 1
            jmin = -(-(b.lon_lo_h - 5) // 10)
            jmax = -(-(b.lon_hi_h - 5) // 10) - 1
            for i in range(imin, imax + 1):
                for j in range(jmin, jmax + 1):
                    # brute re-check: center really inside
                    assert b.lat_lo_h <= 10 * i + 5 < b.lat_hi_h
                    assert b.lon_lo_h <= 10 * j + 5 < b.lon_hi_h
                    cells.add((i, j))
        area = sum(int(np.round(
            R * R * np.radians(0.1)
            * (np.sin(np.radians((i + 1) / 10))
               - np.sin(np.radians(i / 10))))) for i, j in cells)
        assert got[g]["n_cells"] == len(cells)
        assert got[g]["n_boxes"] == len(sub)
        assert got[g]["area_m2"] == area
    # per-row area rounding clearance: every lat row REACHABLE by the
    # box layouts (|lat| <= 60 deg; region_dissolve tops out at 47)
    # sits >= 3e-4 m^2 from the integer-rounding boundary (~3000x the
    # cross-engine trig error)
    i = np.arange(-600, 600)
    a = (R * R * np.radians(0.1)
         * (np.sin(np.radians((i + 1) / 10)) - np.sin(np.radians(i / 10))))
    assert np.abs((a % 1.0) - 0.5).min() > 3e-4


def test_dissolve_interval_union_edges(spark):
    """Adversarial layouts for the r4 interval-union plan: duplicate
    boxes, fully nested intervals, exactly-touching intervals (gap of
    zero), disjoint islands, and a mix sharing single lat rows —
    each checked against a brute-force cell set."""
    import numpy as np
    import pandas as pd
    from geographiclib_go_spark.operators import dissolve as dv

    rows = [
        # grp 0: identical duplicates + nested inside a wide box
        (0, 0, 100, 0, 1000), (0, 0, 100, 0, 1000),
        (0, 0, 100, 200, 400),
        # grp 1: touching end-to-start (union is one run), then a gap
        (1, 0, 100, 0, 300), (1, 0, 100, 300, 600),
        (1, 0, 100, 900, 1000),
        # grp 2: same lat rows, staircase overlaps
        (2, 0, 200, 0, 250), (2, 100, 300, 150, 400),
        (2, 0, 300, 380, 500),
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "lat_lo_h", "lat_hi_h",
                                      "lon_lo_h", "lon_hi_h"])
    got = {r["grp"]: r for r in
           dv.dissolve_boxes(spark.createDataFrame(pdf), "grp")
           .collect()}
    R = dv.EARTH_R
    for g, sub in pdf.groupby("grp"):
        cells = set()
        for _, b in sub.iterrows():
            for i in range(-(-(b.lat_lo_h - 5) // 10),
                           -(-(b.lat_hi_h - 5) // 10)):
                for j in range(-(-(b.lon_lo_h - 5) // 10),
                               -(-(b.lon_hi_h - 5) // 10)):
                    cells.add((i, j))
        area = sum(int(np.round(
            R * R * np.radians(0.1)
            * (np.sin(np.radians((i + 1) / 10))
               - np.sin(np.radians(i / 10))))) for i, j in cells)
        assert got[g]["n_cells"] == len(cells), g
        assert got[g]["n_boxes"] == len(sub), g
        assert got[g]["area_m2"] == area, g
