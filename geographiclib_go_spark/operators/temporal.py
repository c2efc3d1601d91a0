"""Temporal joins (engine-added): as-of join.

Spark has no native as-of join; the scale-correct plan is the classic
union + last-ignorenulls window:

  tag right rows 0 / left rows 1 -> union -> window per key ordered
  by (ts, side, seq) -> last(right payload, ignorenulls) over
  unbounded-preceding..current -> keep left rows.

One shuffle on the key (the window exchange), no range cross product,
no per-key driver loop — the same shape pandas' merge_asof takes
in-memory, expressed as a distributed plan.  At equal timestamps the
right row sorts BEFORE the left row, so "at or before" semantics
match DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              right_cols: list, seq_col: str = None,
              prefix: str = "r_") -> DataFrame:
    """For every left row, the single right row with the greatest
    ts <= left.ts sharing `on` (backward as-of; left rows with no
    prior right row get nulls).

    right_cols: right payload columns to carry (emitted as
    <prefix><name>).  seq_col: optional right-side column appended to
    the window order as a deterministic tie-break when two right rows
    share (on, ts).
    """
    carry = list(right_cols)
    if seq_col and seq_col not in carry:
        carry.append(seq_col)

    r = right.select(
        F.col(on).alias(on), F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(f"{prefix}{c}") for c in carry]
    ).withColumn("_side", F.lit(0))
    l = left
    for c in carry:
        l = l.withColumn(f"{prefix}{c}", F.lit(None).cast(
            dict(r.dtypes)[f"{prefix}{c}"]))
    l = l.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if seq_col:
        order.append(F.col(f"{prefix}{seq_col}").asc_nulls_first())
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u
    for c in carry:
        filled = filled.withColumn(
            f"{prefix}{c}",
            F.last(F.col(f"{prefix}{c}"), ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if seq_col and seq_col not in right_cols:
        out = out.drop(f"{prefix}{seq_col}")
    return out
