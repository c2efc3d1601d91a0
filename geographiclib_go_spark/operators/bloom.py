"""Bloom-filter semi-join pruning (engine-added).

An explicit, deterministic runtime filter: build a Bloom bitmap over
the join keys of the SMALL side, ship it as a literal array, and
drop fact-side rows with a map-only bit-probe expression BEFORE the
shuffle/join.  At 100 TB the exchange the probe prevents is the
dominant cost of a selective semi-join — this is the hand-rolled,
oracle-checkable analog of Spark's AQE runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.*), with three properties
the built-in doesn't give:

- **deterministic**: key -> bit indices via the shared 31-bit affine
  family h_i(key) = ((a_i * (key mod P1) + b_i) mod P1) mod m with
  (a_i, b_i) from the fixed splitmix64 stream — identical on every
  executor, every retry, and in the SQL oracle;
- **mergeable register table**: the bitmap is rows of (word, bits)
  (32 bits per word so every value stays positive in both engines);
  register tables from different partitions/days/snapshots merge by
  groupBy + bit_or, exactly like the HLL/CMS register tables;
- **bounded driver state**: materializing the literal array collects
  m/32 longs (1024 for the default m = 2^15) — a bounded planning
  probe, not data-dependent driver state.

Guarantee: no false negatives (every true key passes); false
positives ~ (1 - e^{-k n / m})^k are then removed by the real join —
the probe only PRUNES, it never decides membership.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geographiclib_go_spark.operators.sketch_hash import P1
from geographiclib_go_spark.sources.images import splitmix64

BLOOM_M = 1 << 15        # bits
BLOOM_K = 4              # hash probes
WORD = 32                # bits per register word (positive in int64)


def bloom_params(k: int = BLOOM_K):
    """(a, b) int64 arrays for the k probe hashes — fixed splitmix64
    stream shared between executors and the SQL oracle builder."""
    j = np.arange(k, dtype=np.uint64)
    a = (splitmix64(j + np.uint64(0xB100F)) % np.uint64(P1 - 1)
         + np.uint64(1)).astype(np.int64)
    b = (splitmix64(j + np.uint64(0x5EED5)) % np.uint64(P1)) \
        .astype(np.int64)
    return a, b


def _bit_indexes(key: Column, m: int, k: int) -> list:
    """k bit-index Columns for an integer key column; all
    intermediates < 2^62."""
    a, b = bloom_params(k)
    km = F.pmod(key.cast("long"), F.lit(P1))
    return [((F.lit(int(a[i])) * km + F.lit(int(b[i]))) % P1 % m)
            for i in range(k)]


def bloom_registers(keys: DataFrame, key_col: str, m: int = BLOOM_M,
                    k: int = BLOOM_K) -> DataFrame:
    """(word, bits) register table over the key set: one explode of k
    constant structs + one partial-aggregable bit_or shuffle,
    <= m/WORD rows out regardless of key count."""
    idx = _bit_indexes(F.col(key_col), m, k)
    # 2^(i mod 32) via pow: exact in float64 for exponents <= 31 and
    # avoids shiftleft's python-int-only numBits argument
    cells = [F.struct((i / WORD).cast("long").alias("word"),
                      F.pow(F.lit(2.0), (i % WORD).cast("double"))
                      .cast("long").alias("bit"))
             for i in idx]
    return (keys.select(F.explode(F.array(*cells)).alias("c"))
            .groupBy(F.col("c.word").alias("word"))
            .agg(F.bit_or(F.col("c.bit")).alias("bits")))


def bloom_literal(registers: DataFrame, m: int = BLOOM_M) -> list:
    """Dense python list of m/WORD register words (missing words are
    0) — the bounded collect that turns the register table into a
    shippable literal."""
    n_words = m // WORD
    words = [0] * n_words
    for r in registers.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_might_contain(key: Column, words: list, m: int = BLOOM_M,
                        k: int = BLOOM_K) -> Column:
    """Map-only membership probe: all k bits set in the literal word
    array.  Pure JVM expressions (element_at + shifts) — whole-stage
    codegen, no join, no shuffle on the probed side."""
    arr = F.lit(words)
    cond = F.lit(True)
    for i in _bit_indexes(key, m, k):
        word = F.element_at(arr, (i / WORD).cast("int") + 1)
        bit = F.pow(F.lit(2.0), (i % WORD).cast("double")).cast("long")
        # single-bit mask: & != 0 <=> the bit is set, and evaluates
        # the pow() once per probe instead of twice
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_prefilter(fact: DataFrame, keys: DataFrame, fact_key: str,
                    key_col: str, m: int = BLOOM_M,
                    k: int = BLOOM_K) -> DataFrame:
    """fact rows whose ``fact_key`` might be in ``keys`` — the
    pre-shuffle pruning stage of a selective semi-join.  Follow with
    the real join to remove false positives."""
    regs = bloom_registers(keys, key_col, m, k)
    words = bloom_literal(regs, m)
    return fact.filter(bloom_might_contain(F.col(fact_key), words, m, k))


def bloom_oracle_sql(keys_sql: str, fact_table: str, fact_key: str,
                     group_col: str, m: int = BLOOM_M,
                     k: int = BLOOM_K) -> str:
    """DuckDB replay of build + probe + exact-semi comparison.  The
    probe verdict is a function of the KEY alone, so the oracle
    probes each distinct fact key once (k-row join against the
    register words) and joins the verdict back to the fact rows."""
    a, b = bloom_params(k)
    probes = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})"
                       for i in range(k))
    return f"""
WITH keys AS ({keys_sql}),
probes(i, a, b) AS (VALUES {probes}),
kidx AS (
  -- (((key % P1) + P1) % P1) = Spark's pmod: DuckDB's % is
  -- sign-preserving, so negative keys would otherwise map to
  -- different bit indexes than the engine's build/probe
  SELECT k.key, p.i,
         ((p.a * (((k.key % {P1}) + {P1}) % {P1}) + p.b) % {P1}) % {m}
           AS idx
  FROM keys k CROSS JOIN probes p
),
regs AS (
  SELECT idx // {WORD} AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(idx % {WORD} AS INT)) AS bits
  FROM kidx GROUP BY idx // {WORD}
),
fkeys AS (SELECT DISTINCT {fact_key} AS key FROM {fact_table}),
fidx AS (
  SELECT fk.key, p.i,
         ((p.a * (((fk.key % {P1}) + {P1}) % {P1}) + p.b) % {P1}) % {m}
           AS idx
  FROM fkeys fk CROSS JOIN probes p
),
verdict AS (
  SELECT key,
         bool_and(COALESCE((r.bits >> CAST(fidx.idx % {WORD} AS INT))
                           & 1, 0) = 1) AS pass,
         bool_and(key IN (SELECT key FROM keys)) AS exact
  FROM fidx LEFT JOIN regs r ON r.word = fidx.idx // {WORD}
  GROUP BY key
)
SELECT f.{group_col},
       CAST(SUM(CASE WHEN v.pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom,
       CAST(SUM(CASE WHEN v.exact THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact
FROM {fact_table} f JOIN verdict v ON v.key = f.{fact_key}
GROUP BY f.{group_col} ORDER BY f.{group_col}
"""
