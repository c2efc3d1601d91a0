"""SQL-facing function registry: the geodesic engine for `spark.sql`.

A user of the reference consumes a library API; a Spark SQL user
consumes FUNCTIONS.  This module registers the engine's kernels under
stable SQL names so plain SQL text — BI tools, `spark.sql(...)`
strings, views — can call the exact Karney machinery without touching
the DataFrame API:

    geo_distance(lat1, lon1, lat2, lon2)        -> meters (WGS84)
    geo_azimuth(lat1, lon1, lat2, lon2)         -> forward azi1, deg
    geo_destination(lat1, lon1, azi1, s12_m)    -> struct(lat2, lon2)
    geo_cell(lat, lon, res)                     -> int64 cell id
    sphere_distance(lat1, lon1, lat2, lon2)     -> meters (f=0 sphere)

All are the same Arrow pandas UDFs the DataFrame operators use (no
per-row Python); registration is idempotent per SparkSession.  The
ellipsoid of the geo_* family is fixed at registration (WGS84 by
default) because SQL function signatures cannot carry the model —
register under another prefix for another ellipsoid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.kernels import direct as kdirect
from geographiclib_go_spark.kernels import geomath as gm
from geographiclib_go_spark.kernels import inverse as kinverse
from geographiclib_go_spark.kernels.geodesic import (
    GeodesicModel, WGS84_A, WGS84_F)

SPHERE_R = 6371000.0


def _inverse_scalar_udf(a: float, f: float, out: str):
    g = GeodesicModel(a, f)
    mask = C.DISTANCE if out == "s12" else C.AZIMUTH

    @pandas_udf(T.DoubleType())
    def fn(lat1: pd.Series, lon1: pd.Series,
           lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        r = kinverse.gen_inverse(
            g, lat1.to_numpy(np.float64), lon1.to_numpy(np.float64),
            lat2.to_numpy(np.float64), lon2.to_numpy(np.float64), mask)
        if out == "s12":
            return pd.Series(r["s12"])
        return pd.Series(gm.atan2d(r["salp1"], r["calp1"]))
    return fn


def _destination_udf(a: float, f: float):
    g = GeodesicModel(a, f)
    schema = T.StructType([
        T.StructField("lat2", T.DoubleType()),
        T.StructField("lon2", T.DoubleType()),
    ])

    @pandas_udf(schema)
    def fn(lat1: pd.Series, lon1: pd.Series, azi1: pd.Series,
           s12: pd.Series) -> pd.DataFrame:
        L = kdirect.line_init(
            g, lat1.to_numpy(np.float64), lon1.to_numpy(np.float64),
            azi1.to_numpy(np.float64),
            C.LATITUDE | C.LONGITUDE | C.DISTANCE_IN)
        p = kdirect.gen_position(g, L, False,
                                 s12.to_numpy(np.float64),
                                 C.LATITUDE | C.LONGITUDE)
        return pd.DataFrame({"lat2": p["lat2"], "lon2": p["lon2"]})
    return fn


def _cell_udf():
    from geographiclib_go_spark.operators import cells as kcells

    @pandas_udf(T.LongType())
    def fn(lat: pd.Series, lon: pd.Series, res: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        rr = res.to_numpy(np.int64)
        out = np.zeros(len(la), np.int64)
        for r in np.unique(rr):        # res is ~1 distinct literal
            m = rr == r
            out[m] = kcells.cell_from_latlon(la[m], lo[m], int(r))
        return pd.Series(out)
    return fn


def register_sql_functions(spark: SparkSession,
                           a: float = WGS84_A, f: float = WGS84_F,
                           prefix: str = "geo") -> list:
    """Register the engine's SQL functions; returns the names."""
    names = []

    def reg(name, udf):
        spark.udf.register(name, udf)
        names.append(name)

    reg(f"{prefix}_distance", _inverse_scalar_udf(a, f, "s12"))
    reg(f"{prefix}_azimuth", _inverse_scalar_udf(a, f, "azi1"))
    reg(f"{prefix}_destination", _destination_udf(a, f))
    reg(f"{prefix}_cell", _cell_udf())
    reg("sphere_distance", _inverse_scalar_udf(SPHERE_R, 0.0, "s12"))
    return names
