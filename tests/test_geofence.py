"""Streaming geofence enter/exit vs its stateless batch twin,
including a transition that straddles the micro-batch boundary."""

import os
import tempfile

from geographiclib_go_spark.streaming import polygon_stream as ps

# two overlapping 60 km fences on the sphere-ish equator + one far
FENCES = [(7, 0.0, 0.0, 60_000.0), (8, 0.0, 0.9, 60_000.0),
          (9, 40.0, 100.0, 60_000.0)]

# device 1 walks east through both fences; device 2 jumps in and out
# of fence 7.  lon degrees ~111 km at the equator.
PINGS = [
    # (device, seq, lat, lon)
    (1, 0, 0.0, -2.0),   # outside all
    (1, 1, 0.0, -0.3),   # in 7
    (1, 2, 0.0, 0.45),   # in 7 and 8 (overlap)
    (1, 3, 0.0, 1.2),    # in 8 only
    (1, 4, 0.0, 3.0),    # outside
    (2, 0, 0.0, 0.1),    # in 7
    (2, 1, 0.0, 2.0),    # out
    (2, 2, 0.05, 0.0),   # in 7 again
]
SCHEMA = "device_id long, seq long, lat double, lon double"


def _rows(df):
    return sorted((r["device_id"], r["seq"], r["fence_id"],
                   r["transition"]) for r in df.collect())


def test_streaming_matches_batch_across_boundary(spark):
    batch = ps.geofence_transitions_batch(
        spark.createDataFrame(PINGS, SCHEMA), FENCES)
    want = _rows(batch)
    # sanity on the constructed scenario itself
    assert (1, 1, 7, "enter") in want
    assert (1, 2, 8, "enter") in want
    assert (1, 3, 7, "exit") in want
    assert (1, 4, 8, "exit") in want
    # device 2's re-entry (seq 2) arrives in the SECOND micro-batch:
    # detecting it needs the carried state mask
    b1 = [p for p in PINGS if not (p[0] == 2 and p[1] == 2)]
    b2 = [p for p in PINGS if p[0] == 2 and p[1] == 2]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, "b1"))
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
        out = ps.geofence_transitions(stream, FENCES)
        q = (out.writeStream.format("memory").queryName("geofence")
             .outputMode("update").start())
        try:
            q.processAllAvailable()
            spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(
                os.path.join(src, "b2"))
            q.processAllAvailable()
            got = _rows(spark.sql("select * from geofence"))
        finally:
            q.stop()
    assert got == want
    assert (2, 2, 7, "enter") in got  # the cross-boundary re-entry


def test_no_transition_no_rows(spark):
    pings = [(5, 0, 20.0, 20.0), (5, 1, 20.0, 21.0)]  # never inside
    out = ps.geofence_transitions_batch(
        spark.createDataFrame(pings, SCHEMA), FENCES)
    assert out.count() == 0
