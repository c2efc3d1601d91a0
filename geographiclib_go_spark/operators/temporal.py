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


def interval_join(left: DataFrame, right: DataFrame,
                  l_start: str, l_end: str, r_start: str, r_end: str,
                  bucket: int = 21_600_000_000,
                  strategy: str = "bucket") -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose half-open
    integer intervals [l_start, l_end) x [r_start, r_end) strictly
    overlap.  Interval bounds are integer columns (the suite uses
    epoch microseconds) so the overlap predicate is float-free.

    strategy='bucket' — the large x large scale plan.  Both sides
    explode to the fixed-width buckets their interval covers
    (F.sequence, JVM-side), the join is a plain hash equi-join on the
    bucket key plus the overlap predicate, and instead of a distinct
    pass each surviving pair is kept only in its CANONICAL bucket —
    the bucket containing greatest(l_start, r_start), the overlap's
    first instant.  A pair meeting in k shared buckets is emitted by
    exactly one of them, so the plan has no dedup shuffle: explode,
    one equi-join, filter.  At 100 TB the bucket width trades fan-out
    (interval_len / bucket replicas per row) against per-bucket
    populations; intervals are assumed short relative to the span of
    the data (activity windows, not year-long ranges).

    strategy='broadcast' — small right side: broadcast nested-loop
    with the raw predicate, no explode.  Used as the oracle twin in
    strategy-agreement tests.
    """
    if strategy == "broadcast":
        cond = ((F.col(l_start) < F.col(r_end))
                & (F.col(r_start) < F.col(l_end)))
        return left.join(F.broadcast(right), cond, "inner")

    if strategy != "bucket":
        raise ValueError(f"unknown interval_join strategy {strategy!r}")

    b = F.lit(int(bucket)).cast("long")
    lb = left.withColumn(
        "_bk", F.explode(F.sequence(
            F.floor(F.col(l_start) / b),
            F.floor((F.col(l_end) - F.lit(1)) / b))))
    rb = right.withColumn(
        "_bk", F.explode(F.sequence(
            F.floor(F.col(r_start) / b),
            F.floor((F.col(r_end) - F.lit(1)) / b))))
    joined = lb.join(rb, "_bk", "inner").filter(
        (F.col(l_start) < F.col(r_end))
        & (F.col(r_start) < F.col(l_end)))
    canonical = F.floor(F.greatest(F.col(l_start), F.col(r_start)) / b)
    return joined.filter(F.col("_bk") == canonical).drop("_bk")
