"""Spark-side parity: the Arrow pandas UDFs must reproduce the numpy
kernels bit-for-bit (same code path, but through Arrow + the JVM), and
the golden 20-case table must survive the full Spark round trip."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from geographiclib_go_spark.kernels import caps as C
from geographiclib_go_spark.functions.geodesic_udfs import (
    make_direct_udf, make_inverse_udf, make_waypoint_udf, with_geodesic)

from tests.golden import COMMON_CASES, DELTAS, FIELDS

COLS = {f: COMMON_CASES[:, i] for i, f in enumerate(FIELDS)}


@pytest.fixture(scope="module")
def golden_df(spark):
    pdf = pd.DataFrame({f: COMMON_CASES[:, i] for i, f in enumerate(FIELDS)})
    pdf = pdf.rename(columns={
        "s12": "want_s12", "a12": "want_a12", "azi2": "want_azi2",
        "lat2": "want_lat2", "lon2": "want_lon2", "m12": "want_m12",
        "M12": "want_sc12", "M21": "want_sc21", "S12area": "want_area"})
    return spark.createDataFrame(pdf)


def test_inverse_udf_golden(spark, golden_df):
    inv = make_inverse_udf(mask=C.ALL | C.LONG_UNROLL)
    df = with_geodesic(
        golden_df,
        inv(F.col("lat1"), F.col("lon1"),
            F.col("want_lat2"), F.col("want_lon2")))
    rows = df.select("s12", "azi1", "azi2", "a12", "m12", "scale_m12",
                     "scale_m21", "s12_area", "want_s12", "want_a12",
                     "want_m12", "want_sc12", "want_sc21",
                     "want_area").toPandas()
    assert np.abs(rows.s12 - rows.want_s12).max() <= DELTAS["s12"]
    assert np.abs(rows.azi1 - COLS["azi1"]).max() <= DELTAS["azi1"]
    assert np.abs(rows.azi2 - COLS["azi2"]).max() <= DELTAS["azi2"]
    assert np.abs(rows.a12 - rows.want_a12).max() <= DELTAS["a12"]
    assert np.abs(rows.m12 - rows.want_m12).max() <= DELTAS["m12"]
    assert np.abs(rows.scale_m12 - rows.want_sc12).max() <= DELTAS["M12"]
    assert np.abs(rows.scale_m21 - rows.want_sc21).max() <= DELTAS["M21"]
    assert np.abs(rows.s12_area - rows.want_area).max() <= DELTAS["S12area"]


def test_direct_udf_golden(spark, golden_df):
    d = make_direct_udf(mask=C.ALL | C.LONG_UNROLL)
    df = with_geodesic(
        golden_df,
        d(F.col("lat1"), F.col("lon1"), F.col("azi1"),
          F.col("want_s12")))
    rows = df.select("lat2", "lon2", "azi2", "a12",
                     "want_lat2", "want_lon2", "want_azi2",
                     "want_a12").toPandas()
    assert np.abs(rows.lat2 - rows.want_lat2).max() <= DELTAS["lat2"]
    assert np.abs(rows.lon2 - rows.want_lon2).max() <= DELTAS["lon2"]
    assert np.abs(rows.azi2 - rows.want_azi2).max() <= DELTAS["azi2"]
    assert np.abs(rows.a12 - rows.want_a12).max() <= DELTAS["a12"]


def test_capability_mask_prunes_udf_outputs(spark, golden_df):
    """A DISTANCE-only inverse UDF must emit only s12/a12 — the engine's
    compute-pruning contract (capabilities.go:32-67 analog)."""
    inv = make_inverse_udf(mask=C.DISTANCE)
    df = golden_df.withColumn(
        "g", inv(F.col("lat1"), F.col("lon1"),
                 F.col("want_lat2"), F.col("want_lon2")))
    names = [f.name for f in df.schema["g"].dataType.fields]
    assert names == ["s12", "a12"]


def test_waypoint_explode_plan(spark):
    """The waypoint fan-out plan: lines x explode(sequence(0, n)) ->
    vectorized position kernel.  Matches the scalar line API."""
    from geographiclib_go_spark.kernels.api import WGS84

    lines = spark.createDataFrame(
        pd.DataFrame({
            "line_id": [0, 1],
            "lat1": [40.1, -33.9],
            "lon1": [116.6, 18.4],
            "azi1": [42.916420879536, 70.0],
            "s13": [9513997.9*1.0, 12000000.0],
            "n": [10, 5],
        }))
    way = make_waypoint_udf(mask=C.STANDARD | C.LONG_UNROLL)
    df = (lines
          .withColumn("i", F.explode(F.sequence(F.lit(0), F.col("n"))))
          .withColumn("s", F.col("i") * F.col("s13") / F.col("n")))
    df = with_geodesic(df, way(F.col("lat1"), F.col("lon1"),
                               F.col("azi1"), F.col("s")))
    out = df.select("line_id", "i", "lat2", "lon2").orderBy(
        "line_id", "i").toPandas()
    assert len(out) == 11 + 6
    ln = WGS84.direct_line(40.1, 116.6, 42.916420879536, 9513997.9)
    for i in (0, 5, 10):
        r = ln.position(i * 9513997.9 / 10, C.STANDARD | C.LONG_UNROLL)
        row = out[(out.line_id == 0) & (out.i == i)].iloc[0]
        assert row.lat2 == pytest.approx(r.lat2, abs=1e-12)
        assert row.lon2 == pytest.approx(r.lon2, abs=1e-12)


def test_sql_registry_functions(spark):
    """The SQL registry exposes the exact kernels to plain SQL text:
    geo_distance/geo_azimuth match gen_inverse, geo_destination
    round-trips through geo_distance, geo_cell matches the cell
    operator."""
    import numpy as np
    import pandas as pd

    from geographiclib_go_spark.functions.sql_registry import (
        register_sql_functions)
    from geographiclib_go_spark.kernels import caps as Cc
    from geographiclib_go_spark.kernels import inverse as kinv
    from geographiclib_go_spark.kernels.geodesic import wgs84_model
    from geographiclib_go_spark.operators import cells as kcells

    names = register_sql_functions(spark)
    assert "geo_distance" in names and "sphere_distance" in names
    rng = np.random.default_rng(61)
    n = 200
    pdf = pd.DataFrame({
        "i": np.arange(n),
        "lat1": rng.uniform(-85, 85, n), "lon1": rng.uniform(-180, 180, n),
        "lat2": rng.uniform(-85, 85, n), "lon2": rng.uniform(-180, 180, n),
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("pts_sql")
    got = spark.sql("""
        SELECT i, geo_distance(lat1, lon1, lat2, lon2) AS d,
               geo_azimuth(lat1, lon1, lat2, lon2) AS az,
               geo_destination(lat1, lon1,
                   geo_azimuth(lat1, lon1, lat2, lon2),
                   geo_distance(lat1, lon1, lat2, lon2)) AS dest,
               geo_cell(lat1, lon1, 6) AS cell
        FROM pts_sql
    """).toPandas().set_index("i").sort_index()
    g = wgs84_model()
    want = kinv.inverse(g, pdf.lat1.to_numpy(), pdf.lon1.to_numpy(),
                        pdf.lat2.to_numpy(), pdf.lon2.to_numpy(),
                        Cc.DISTANCE | Cc.AZIMUTH)
    assert np.allclose(got.d.to_numpy(), want["s12"], rtol=0, atol=1e-8)
    assert np.allclose(got.az.to_numpy(), want["azi1"], rtol=0,
                       atol=1e-10)
    dest = pd.DataFrame(got.dest.tolist(), index=got.index)
    err = kinv.gen_inverse(g, dest.lat2.to_numpy(), dest.lon2.to_numpy(),
                           pdf.lat2.to_numpy(), pdf.lon2.to_numpy(),
                           Cc.DISTANCE)["s12"]
    assert np.nanmax(err) < 1e-8
    want_cell = kcells.cell_from_latlon(pdf.lat1.to_numpy(),
                                        pdf.lon1.to_numpy(), 6)
    assert np.array_equal(got.cell.to_numpy(), want_cell)
