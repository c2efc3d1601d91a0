"""Geodesic latitude envelope via Clairaut's relation (engine-added).

For a geodesic segment the extreme latitude is NOT at an endpoint
when the segment straddles a vertex (the point where the azimuth
crosses +/-90 deg).  Clairaut's constant sin(alpha0) =
sin(azi)*cos(beta) (beta = reduced latitude, tan(beta) =
(1-f)*tan(phi)) gives the vertex latitude in closed form, so exact
per-segment latitude bounds cost two azimuths — no sampling, no
iteration:

- north vertex inside the segment  <=>  cos(azi1) > 0 > cos(azi2)
  (heading turns from northbound to southbound); then
  lat_hi = phi(beta_v), cos(beta_v) = \\|sin(alpha0)\\|;
- south vertex inside              <=>  cos(azi1) < 0 < cos(azi2);
  then lat_lo = -phi(beta_v);
- otherwise the bound is the corresponding endpoint latitude.

This is the pruning primitive for segment indexing: a segment can
touch a latitude band only if its envelope does, and the envelope is
exact — no false negatives, unlike endpoint-only boxes, which are
WRONG for vertex-straddling segments (route 60N->60N across a pole
region reaches far above 60).

The azimuths come from the batch inverse kernel (kernels/inverse.py,
any ellipsoid); the vertex mapping is plain JVM trig columns in
whole-stage codegen.  Map-only: no shuffle beyond whatever produced
the segments.  Holds for segments shorter than half a circuit (legs,
route edges) — the only case an index cares about.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lat_envelope_cols(lat1: Column, lat2: Column, azi1: Column,
                      azi2: Column, f: float):
    """(vtx, lat_lo, lat_hi) Columns from endpoint latitudes and the
    kernel's forward azimuths (degrees).  vtx: 1 north vertex inside,
    -1 south vertex inside, 0 extremes at endpoints."""
    one_f = 1.0 - f
    ca1 = F.cos(F.radians(azi1))
    ca2 = F.cos(F.radians(azi2))
    beta1 = F.atan(F.lit(one_f) * F.tan(F.radians(lat1)))
    sin_a0 = F.sin(F.radians(azi1)) * F.cos(beta1)
    beta_v = F.acos(F.abs(sin_a0))
    vlat = F.degrees(F.atan(F.tan(beta_v) / F.lit(one_f)))
    north = (ca1 > 0) & (ca2 < 0)
    south = (ca1 < 0) & (ca2 > 0)
    vtx = (F.when(north, F.lit(1)).when(south, F.lit(-1))
           .otherwise(F.lit(0)).cast("long"))
    lat_hi = F.when(north, vlat).otherwise(F.greatest(lat1, lat2))
    lat_lo = F.when(south, -vlat).otherwise(F.least(lat1, lat2))
    return vtx, lat_lo, lat_hi


def with_lat_envelope(segs: DataFrame, lat1: str, lon1: str,
                      lat2: str, lon2: str, a: float,
                      f: float) -> DataFrame:
    """Adds (azi1, azi2, vtx, lat_lo, lat_hi) to a segment frame via
    one inverse-kernel Arrow stage + JVM trig columns."""
    from geographiclib_go_spark.functions.geodesic_udfs import (
        make_inverse_udf)
    from geographiclib_go_spark.kernels import caps as C
    inv = make_inverse_udf(a=a, f=f, mask=C.AZIMUTH)
    g = segs.withColumn("_g", inv(F.col(lat1), F.col(lon1),
                                  F.col(lat2), F.col(lon2)))
    vtx, lo, hi = lat_envelope_cols(
        F.col(lat1), F.col(lat2),
        F.col("_g.azi1"), F.col("_g.azi2"), f)
    return (g.withColumn("azi1", F.col("_g.azi1"))
            .withColumn("azi2", F.col("_g.azi2"))
            .withColumn("vtx", vtx)
            .withColumn("lat_lo", lo)
            .withColumn("lat_hi", hi)
            .drop("_g"))
