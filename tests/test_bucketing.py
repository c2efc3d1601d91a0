"""Bucketed co-located cell joins: shuffle-free plan + correct rows."""

import numpy as np

from pyspark.sql import functions as F

from geographiclib_go_spark.plans import bucketing as bk


def test_bucketed_join_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    a = (spark.range(4000)
         .select(F.col("id").alias("aid"),
                 ((F.col("id") * 37 % 1700) / 10.0 - 85.0).alias("lat"),
                 ((F.col("id") * 91 % 3600) / 10.0 - 180.0).alias("lon")))
    b = (spark.range(3000)
         .select(F.col("id").alias("bid"),
                 ((F.col("id") * 53 % 1700) / 10.0 - 85.0).alias("lat"),
                 ((F.col("id") * 71 % 3600) / 10.0 - 180.0).alias("lon")))

    ta = bk.bucketize_points(spark, a, "bk_a", res=3, buckets=8)
    tb = bk.bucketize_points(spark, b, "bk_b", res=3, buckets=8)
    try:
        j = bk.colocated_cell_join(ta.select("aid", "cell"),
                                   tb.select("bid", "cell"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the one-time bucketing already paid the shuffle: the join
        # itself must not exchange either side
        assert "Exchange" not in plan, plan[:2000]

        got = j.count()
        # independent result: plain shuffle join on freshly computed cells
        from geographiclib_go_spark.operators.spatial_join import with_cell
        ca = with_cell(a, 3, out="cell").select("aid", "cell")
        cb = with_cell(b, 3, out="cell").select("bid", "cell")
        assert got == ca.join(cb, "cell").count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 << 20))
