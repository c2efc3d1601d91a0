"""Spatial storage layout: geohash-clustered parquet with
partition- and row-group-level scan pruning (engine-added).

At 100 TB the scan is the query: a region query over a table laid
out in row-arrival order reads everything.  This module writes the
layout that makes region scans cheap and provides the matching
reader:

- write_spatial(df, path, ...): adds gh{P} (geohash of the row's
  lat/lon) and partitions the parquet by its gh_part prefix —
  directory-level partition pruning — then sorts WITHIN each
  partition by the full geohash, so every parquet row group's
  min/max statistics span a tight contiguous geohash range —
  row-group (predicate-pushdown) pruning inside each file.
- read_region(spark, path, prefix): a region = a geohash prefix =
  ONE contiguous string range [prefix, prefix + '~'), expressed as a
  partition-column equality (prunes directories before listing file
  footers) AND a sort-column range (prunes row groups via parquet
  stats).  Catalyst shows both: PartitionFilters on gh_part,
  PushedFilters on gh.

The geohash prefix property (operators/geohash.py) is what makes
"spatial region" collapse to "string range" — no bounding-box
post-filter is needed for prefix-aligned regions, and arbitrary
boxes are a union of a few prefixes plus an exact PIP refine
(operators/pip.py).  tests/test_layout.py asserts the pruning is
visible in the physical plan and that pruned reads return exactly
the rows of a full-scan filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geographiclib_go_spark.operators import geohash as gh


def write_spatial(df: DataFrame, path: str, lat_col: str = "lat",
                  lon_col: str = "lon", precision: int = 8,
                  part_prefix: int = 2) -> None:
    """Write df as geohash-clustered parquet: directory partitions on
    the gh prefix (bounded fan-out: 32^part_prefix dirs max, far
    fewer over real land-biased data), rows sorted by full geohash
    within each partition for tight row-group stats."""
    out = (df.withColumn("gh", gh.geohash_col(F.col(lat_col),
                                              F.col(lon_col),
                                              precision))
           .withColumn("gh_part", F.col("gh").substr(1, part_prefix)))
    # sort key leads with the partition column: the dynamic-partition
    # writer requires rows ordered by partition columns and would
    # otherwise insert its OWN sort (by gh_part alone), which
    # re-orders rows and destroys the gh clustering inside each file
    (out.repartition(F.col("gh_part"))
        .sortWithinPartitions("gh_part", "gh")
        .write.mode("overwrite")
        .partitionBy("gh_part")
        .parquet(path))


def read_region(spark: SparkSession, path: str,
                prefix: str, part_prefix: int = 2) -> DataFrame:
    """All rows whose geohash starts with `prefix` (prefix length >=
    part_prefix), with both pruning layers engaged: the gh_part
    equality prunes partitions at planning time, the gh range prunes
    row groups at scan time ('~' sorts after every base32 digit, so
    [prefix, prefix || '~') is exactly the prefix set)."""
    if len(prefix) < part_prefix:
        raise ValueError("prefix must be at least the partition prefix")
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("gh_part") == prefix[:part_prefix])
        & (F.col("gh") >= prefix)
        & (F.col("gh") < prefix + "~"))
