"""Raster <-> vector tile assignment via the gnomonic local plane.

North-rule operator: for each tile (a cell at tile resolution), build
a WxH pixel raster in the tile's gnomonic tangent plane
(gnomonic.go:92-106 — geodesics through the center project to
straight lines, so the plane is the right chart for local geometry),
un-project pixel centers back to lat/lon (gnomonic.go:125-173), and
assign each pixel to the polygons covering it.  The whole grid of a
tile is one numpy batch inside mapInPandas — pixels never exist as
Spark rows.

Output: one row per (tile, polygon) with the pixel-coverage fraction
+ the per-pixel bitmask packed as bytes — the shape a downstream
image/label pipeline joins on.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geographiclib_go_spark.kernels.geodesic import (
    GeodesicModel, WGS84_A, WGS84_F)
from geographiclib_go_spark.kernels import gnomonic as kgnom
from geographiclib_go_spark.operators import cells as kcells
from geographiclib_go_spark.operators import pip as kpip

RASTER_SCHEMA = T.StructType([
    T.StructField("tile_id", T.LongType(), False),
    T.StructField("poly_id", T.LongType(), False),
    T.StructField("covered_px", T.LongType(), False),
    T.StructField("total_px", T.LongType(), False),
    T.StructField("coverage", T.DoubleType(), False),
    T.StructField("mask", T.BinaryType(), False),
])


def rasterize_tiles(tiles: DataFrame, polygons: dict, tile_res: int,
                    px: int = 16, a: float = WGS84_A,
                    f: float = WGS84_F) -> DataFrame:
    """tiles: DataFrame with a tile_id column (cells at tile_res);
    polygons: poly_id -> (lats, lons).  Returns RASTER_SCHEMA rows for
    every (tile, polygon) pair with nonzero pixel coverage."""
    polys = {int(k): (np.asarray(v[0], np.float64),
                      np.asarray(v[1], np.float64))
             for k, v in polygons.items()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = GeodesicModel(a, f)
        for pdf in batches:
            out = {k: [] for k in ("tile_id", "poly_id", "covered_px",
                                   "total_px", "coverage", "mask")}
            tile_ids = np.unique(pdf["tile_id"].to_numpy(np.int64))
            for t in tile_ids:
                clat, clon = kcells.cell_center(np.int64(t), tile_res)
                clat = float(clat)
                clon = float(clon)
                # plane extent: tile circumradius in meters
                half = (kcells.max_cell_width_rad(tile_res) / 2) * g.a
                xs = (np.arange(px) + 0.5) / px * 2 * half - half
                gx, gy = np.meshgrid(xs, xs)
                rev = kgnom.gnomonic_reverse(
                    g, np.full(gx.size, clat), np.full(gx.size, clon),
                    gx.ravel(), gy.ravel())
                for pid, (rla, rlo) in polys.items():
                    inside = kpip.points_in_ring(rev["lat"], rev["lon"],
                                                 rla, rlo)
                    cov = int(inside.sum())
                    if cov == 0:
                        continue
                    out["tile_id"].append(int(t))
                    out["poly_id"].append(pid)
                    out["covered_px"].append(cov)
                    out["total_px"].append(px * px)
                    out["coverage"].append(cov / (px * px))
                    out["mask"].append(np.packbits(inside).tobytes())
            yield pd.DataFrame(out) if out["tile_id"] else pd.DataFrame(
                {k: pd.Series([], dtype=o) for k, o in (
                    ("tile_id", "int64"), ("poly_id", "int64"),
                    ("covered_px", "int64"), ("total_px", "int64"),
                    ("coverage", "float64"), ("mask", "object"))})

    return (tiles.select("tile_id").distinct()
            .mapInPandas(run, RASTER_SCHEMA))


def rasterize_patches(centers: DataFrame, polygons: dict,
                      half_m: float, px: int = 16, a: float = WGS84_A,
                      f: float = WGS84_F) -> DataFrame:
    """Raster patches around explicit anchor points instead of cell
    centers: `centers` is (tile_id, clat, clon); each anchor gets a
    (2*half_m)^2 gnomonic-plane raster, un-projected and assigned to
    polygons exactly like rasterize_tiles.  Same map-only plan (one
    numpy grid per anchor inside mapInPandas, pixels never become
    rows).  With f=0 the un-projection is the closed-form spherical
    gnomonic, which is what lets the raster_coverage query carry a
    full SQL oracle."""
    polys = {int(k): (np.asarray(v[0], np.float64),
                      np.asarray(v[1], np.float64))
             for k, v in polygons.items()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = GeodesicModel(a, f)
        xs = (np.arange(px) + 0.5) / px * 2 * half_m - half_m
        gx, gy = np.meshgrid(xs, xs)
        for pdf in batches:
            out = {k: [] for k in ("tile_id", "poly_id", "covered_px",
                                   "total_px", "coverage", "mask")}
            for t, clat, clon in zip(pdf["tile_id"].to_numpy(np.int64),
                                     pdf["clat"].to_numpy(np.float64),
                                     pdf["clon"].to_numpy(np.float64)):
                rev = kgnom.gnomonic_reverse(
                    g, np.full(gx.size, clat), np.full(gx.size, clon),
                    gx.ravel(), gy.ravel())
                for pid, (rla, rlo) in polys.items():
                    inside = kpip.points_in_ring(rev["lat"], rev["lon"],
                                                 rla, rlo)
                    cov = int(inside.sum())
                    if cov == 0:
                        continue
                    out["tile_id"].append(int(t))
                    out["poly_id"].append(pid)
                    out["covered_px"].append(cov)
                    out["total_px"].append(px * px)
                    out["coverage"].append(cov / (px * px))
                    out["mask"].append(np.packbits(inside).tobytes())
            yield pd.DataFrame(out) if out["tile_id"] else pd.DataFrame(
                {k: pd.Series([], dtype=o) for k, o in (
                    ("tile_id", "int64"), ("poly_id", "int64"),
                    ("covered_px", "int64"), ("total_px", "int64"),
                    ("coverage", "float64"), ("mask", "object"))})

    return centers.select("tile_id", "clat", "clon") \
                  .mapInPandas(run, RASTER_SCHEMA)
