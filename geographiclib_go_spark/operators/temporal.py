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

The carried right columns are packed into ONE struct and
last-ignorenulls is applied to the struct, not per column (ADVICE
r2): per-column fill could stitch different right rows together when
a payload column is NULL on the true as-of match — the struct keeps
the payload row-consistent and preserves genuine NULLs inside the
matched row, matching ASOF semantics exactly.
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

    # one struct per right row: a right row is always a NON-null
    # struct (even when every payload field is null), a left row is a
    # null struct — last-ignorenulls then selects whole rows, never
    # stitching fields from different right rows
    r = right.select(
        F.col(on).alias(on), F.col(ts_col).alias(ts_col),
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("_payload"),
    ).withColumn("_side", F.lit(0))
    l = (left.withColumn("_payload", F.lit(None).cast(
            r.schema["_payload"].dataType))
         .withColumn("_side", F.lit(1)))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if seq_col:
        order.append(F.col(f"_payload.{seq_col}").asc_nulls_first())
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.withColumn(
        "_payload", F.last(F.col("_payload"), ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_payload.{c}"))
    return out.drop("_payload")
