"""Geohash-clustered layout: pruned region reads are exact and the
physical plan shows both pruning layers."""

import os

from pyspark.sql import functions as F

from geographiclib_go_spark.sources import layout


def _pts(spark, n=4000):
    df = spark.range(n).select(
        F.col("id"),
        (((F.col("id") * 9973) % 17000) / 100.0 - 85.0).alias("lat"),
        (((F.col("id") * 7919) % 36000) / 100.0 - 180.0).alias("lon"))
    return df


def test_region_read_exact_and_pruned(spark, tmp_path):
    path = os.path.join(str(tmp_path), "pts_layout")
    df = _pts(spark)
    layout.write_spatial(df, path, precision=8, part_prefix=2)

    full = spark.read.parquet(path)
    # pick a prefix that actually has data
    some = full.groupBy(full.gh.substr(1, 3).alias("p3")) \
        .count().orderBy(F.desc("count")).first()
    prefix = some["p3"]

    got = layout.read_region(spark, path, prefix)
    want = full.filter(full.gh.startswith(prefix))
    got_ids = {r["id"] for r in got.select("id").collect()}
    want_ids = {r["id"] for r in want.select("id").collect()}
    assert got_ids == want_ids and len(got_ids) == some["count"]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    # partition pruning engaged: the gh_part equality (with its
    # literal value) is classified as a PARTITION filter — Catalyst
    # prunes the non-matching directories before listing footers
    part = plan.split("PartitionFilters")[1].split("]")[0]
    assert "gh_part" in part and prefix[:2] in part, plan
    # the range predicate on the sort column reaches the parquet
    # scan as pushed filters -> row-group min/max pruning
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "GreaterThanOrEqual(gh," in pushed, plan
    assert "LessThan(gh," in pushed, plan


def test_rowgroups_sorted_within_partition(spark, tmp_path):
    """sortWithinPartitions leaves each output file internally sorted
    by gh, so parquet min/max stats are tight contiguous ranges."""
    path = os.path.join(str(tmp_path), "pts_sorted")
    layout.write_spatial(_pts(spark, 2000), path, precision=8,
                         part_prefix=2)
    full = spark.read.parquet(path)
    import pyarrow.parquet as pq
    files = [f.replace("file:", "") for f in full.inputFiles()]
    assert files
    for f in files[:8]:
        col = pq.read_table(f, columns=["gh"])["gh"].to_pylist()
        assert col == sorted(col)
