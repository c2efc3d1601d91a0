"""From-scratch HyperLogLog distinct sketch (engine-added).

The sketch is a REGISTER TABLE, not an opaque blob: rows of
(group..., bucket, max_rho).  That representation is what makes it a
first-class distributed operator —

- build: one vectorized hash pass (sketch_hash.fulltext_hash_batch)
  + a (group, bucket) max aggregation: map-side partial max, one
  shuffle, 2^p rows per group out.
- merge: register tables from different partitions/days/tables merge
  by the same groupBy-max — associative and idempotent, so sketches
  are unionable across snapshots (the streaming/cube-friendly
  property that makes HLL useful at 100 TB).
- estimate: the classic alpha_m * m^2 / sum(2^-M_j) harmonic
  estimator with the small-range linear-counting correction.

Determinism/oracle: the value hash is the explicit 62-bit polynomial
hash, bucket = hw mod m, and rho = position of the lowest set bit of
hw div m (P(rho = k) = 2^-k; computed branch-free as
bit_count((x XOR (x-1)))) — all exact integer arithmetic that DuckDB
reproduces bit-for-bit, so the doc_hll_distinct query carries a full
value-hash oracle (sketch registers are rarely oracle-checkable;
here they are).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geographiclib_go_spark.operators import sketch_hash as sk

# rho when hw >> p == 0: the hash rest is 56 bits wide (62-bit hash,
# p=6), and the standard HLL convention is rho(0) = w + 1 = 57 —
# distinct from rho=56 (55 trailing zeros), avoiding a tiny estimator
# bias at extreme cardinalities (ADVICE r2).  Keep in sync with the
# inline 57 in the queries.py SQL oracles.
RHO_EMPTY_REST = 57


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def fulltext_hash_udf():
    @pandas_udf(T.LongType())
    def hw(text: pd.Series) -> pd.Series:
        return pd.Series(sk.fulltext_hash_batch(text.tolist()))
    return hw


def hll_registers(df: DataFrame, text_col: str, group_cols: list,
                  p: int = 6) -> DataFrame:
    """(group..., bucket, max_rho) register table — the mergeable
    sketch.  Merging two register tables = unionByName + the same
    groupBy max."""
    m = 1 << p
    hw = fulltext_hash_udf()(F.col(text_col))
    # hw < 2^62 exceeds double mantissa — keep the split integer-exact
    # (shift, not float division)
    rest = F.shiftright(hw, p)
    rho = (F.when(rest == 0, F.lit(RHO_EMPTY_REST))
           .otherwise(F.bit_count(rest.bitwiseXOR(rest - 1)))
           .cast("long"))
    return (df
            .withColumn("_bucket", F.pmod(hw, F.lit(m)).cast("long"))
            .withColumn("_rho", rho)
            .groupBy(*group_cols, F.col("_bucket").alias("bucket"))
            .agg(F.max("_rho").alias("max_rho")))


def hll_estimate(registers: DataFrame, group_cols: list,
                 p: int = 6) -> DataFrame:
    """Per-group cardinality estimate from a register table.
    Buckets absent from the table are empty registers (value 0,
    contributing 2^0 = 1 to the harmonic sum); the small-range
    linear-counting branch (E <= 2.5m and zeros > 0) is applied
    exactly as in the oracle."""
    m = 1 << p
    alpha = _alpha(m)
    agg = (registers.groupBy(*group_cols)
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
                F.count("*").alias("_nb")))
    zeros = (F.lit(m) - F.col("_nb")).cast("double")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros)
    small = (raw <= 2.5 * m) & (zeros > 0)
    est = F.when(small, F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
           .otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_estimate"))


def hll_distinct(df: DataFrame, text_col: str,
                 group_cols: list, p: int = 6) -> DataFrame:
    """Convenience: build registers then estimate, per group."""
    regs = hll_registers(df, text_col, group_cols, p)
    return hll_estimate(regs, group_cols, p)
