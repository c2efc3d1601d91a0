"""Bucketed co-located joins on the cell key (SURVEY.md §2.B /
"Partitioning & shuffle" design claim).

For repeated big-big spatial joins on the same cell key (images x
observations, images x labels, ...), shuffling both sides every run
is the dominant cost at 10^12 rows.  Writing both tables bucketed by
the cell key once lets every subsequent equi-join run WITHOUT any
Exchange: Spark's bucket join matches bucket files pairwise, so the
join is map-side and the only cost is the scan.

Sandbox realization: managed tables in the local warehouse
(saveAsTable + bucketBy — Spark's bucketing metadata lives in the
catalog, so plain .parquet() paths cannot carry it).  On a cluster
the same calls target the production catalog; with Iceberg the
equivalent is a bucket partition transform on the cell column.

Verified in tests/test_bucketing.py: the bucketed join plan contains
no Exchange and results match the shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geographiclib_go_spark.operators.spatial_join import with_cell


def write_bucketed(df: DataFrame, table: str, key: str = "cell",
                   buckets: int = 64, sort: bool = True) -> None:
    """Persist df as a managed table bucketed (and optionally sorted)
    by `key` — the one-time shuffle that buys shuffle-free joins for
    every later query against this table."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketize_points(spark: SparkSession, df: DataFrame, table: str,
                     res: int, lat_col: str = "lat", lon_col: str = "lon",
                     buckets: int = 64) -> DataFrame:
    """Assign cells at `res` and persist bucketed by cell; returns the
    reloaded (bucket-metadata-carrying) table."""
    cells = with_cell(df, res, lat_col, lon_col, out="cell")
    write_bucketed(cells, table, "cell", buckets)
    return spark.table(table)


def colocated_cell_join(left: DataFrame, right: DataFrame,
                        key: str = "cell", how: str = "inner") -> DataFrame:
    """Equi-join two tables bucketed on `key`: with matching bucket
    counts Spark plans a SortMergeJoin over bucket files with NO
    Exchange on either side."""
    return left.join(right, key, how)
