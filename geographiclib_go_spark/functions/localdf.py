"""JVM-evaluated small local DataFrames (engine infrastructure).

``spark.createDataFrame(list_of_tuples)`` builds a PYTHON-RDD-backed
relation: every evaluation of the plan schedules Python worker tasks
for the pickled rows (and a downstream ``coalesce`` chains them into
one task that round-trips the worker once per slice).  Measured on
local[32]: 0.4-1.7 s per evaluation for a 12-row landmark table, and
4.7 s once an explode fan-out sat on top — for 88 output rows.  The
same rows shipped as one Arrow batch (``createDataFrame(pandas)``)
evaluate as a JVM LocalRelation in ~10 ms, zero Python tasks.

Every small dim table on a query path (landmarks, polygon vertices,
raster centers, cell-cover tables, route anchors) should go through
``literal_df`` — at cluster scale these frames are broadcast once per
query, so a Python-task evaluation tax multiplies across the whole
suite.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fields(schema) -> list:
    """[(name, cast_type_string)] from a DDL string or StructType."""
    if isinstance(schema, T.StructType):
        return [(f.name, f.dataType.simpleString()) for f in schema.fields]
    return [tuple(s.strip().rsplit(" ", 1)) for s in schema.split(",")]


def literal_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Small local DataFrame that evaluates JVM-side (one Arrow batch
    -> LocalRelation), never as Python tasks.  `schema` is a DDL
    string ("qid long, lat double") or a StructType; values are cast
    column-wise so int/float mixing in `rows` is safe."""
    fields = _fields(schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    pdf = pd.DataFrame([tuple(r) for r in rows],
                       columns=[n for n, _ in fields])
    df = spark.createDataFrame(pdf)
    return df.select(*[F.col(n).cast(t).alias(n) for n, t in fields])
