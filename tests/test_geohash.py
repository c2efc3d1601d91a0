"""Geohash encode: Spark bitwise column path vs an independent
pure-python interval-halving reference, a canonical vector, and the
DuckDB SQL mirror."""

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from geographiclib_go_spark.operators import geohash as gh


def py_geohash(lat, lon, precision):
    """Classic bit-by-bit interval halving (independent of the
    Morton-spread construction under test)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[5 * i:5 * i + 5]:
            v = v * 2 + b
        out.append(gh.B32[v])
    return "".join(out)


def _pts(n, seed):
    rng = random.Random(seed)
    return [(i, rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9))
            for i in range(n)]


def test_canonical_vector(spark):
    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    got = df.select(gh.geohash_col(F.col("lat"), F.col("lon"), 8)
                    .alias("g")).collect()[0]["g"]
    assert got == "u4pruydq"


def test_matches_interval_halving_reference(spark):
    pts = _pts(300, 11)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    for p in (4, 6, 8):
        got = {r["id"]: r["g"] for r in df.select(
            "id", gh.geohash_col(F.col("lat"), F.col("lon"), p)
            .alias("g")).collect()}
        for i, lat, lon in pts:
            assert got[i] == py_geohash(lat, lon, p), (i, lat, lon, p)


def test_prefix_hierarchy(spark):
    pts = _pts(100, 23)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    rows = df.select(
        gh.geohash_col(F.col("lat"), F.col("lon"), 8).alias("g8"),
        gh.geohash_col(F.col("lat"), F.col("lon"), 4).alias("g4")) \
        .collect()
    for r in rows:
        assert r["g8"][:4] == r["g4"]


def test_duckdb_mirror_agrees(spark):
    pts = _pts(200, 37)
    pdf = pd.DataFrame(pts, columns=["id", "lat", "lon"])
    con = duckdb.connect()
    con.register("pts", pdf)
    sql = ("WITH " + gh.geohash_cte_sql("pts", "lat", "lon", 6)
           + " SELECT id, gh FROM gh ORDER BY id")
    got_sql = dict(con.execute(sql).fetchall())
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got_spark = {r["id"]: r["g"] for r in df.select(
        "id", gh.geohash_col(F.col("lat"), F.col("lon"), 6)
        .alias("g")).collect()}
    assert got_sql == got_spark


def test_poles_and_dateline_clamp(spark):
    cases = [(90.0, 180.0), (-90.0, -180.0), (0.0, 0.0),
             (89.999999, 179.999999)]
    df = spark.createDataFrame(cases, "lat double, lon double")
    rows = df.select(gh.geohash_col(F.col("lat"), F.col("lon"), 6)
                     .alias("g")).collect()
    got = [r["g"] for r in rows]
    assert got[2] == "s00000"
    assert all(len(g) == 6 for g in got)
    # exact north pole / antimeridian clamp into the last cell
    assert got[0] == "zzzzzz"
