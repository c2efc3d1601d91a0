"""Deterministic split assignment and stratified sampling
(engine-added; training-data pipeline operators).

A training corpus needs train/val/test membership that is (a) stable
across reruns and cluster layouts — Spark's df.sample() is
partition-order dependent and reshuffles membership whenever the
input repartitions — and (b) a pure function of the example id, so
late-arriving shards land in the same split and dedup/filter stages
commute with splitting.

Both operators therefore key on a polynomial string hash of the id
(Horner recurrence mod a 31-bit prime), evaluated entirely JVM-side:
`aggregate(transform(sequence(...)))` over the id's code points runs
in whole-stage codegen — no Python, no UDF, no shuffle — and the
identical arithmetic is emitted as DuckDB SQL (power-sum form with an
inlined B^m table) so the driver hash-gate verifies every membership
decision bit for bit (queries.doc_train_val_split,
doc_stratified_sample).

Scale shape: map-only (a projection + filter on each row), so it
composes with scan pushdown and adds zero stages to any plan.  Split
fractions become integer cutoffs on [0, P): exact, no float
boundaries to disagree across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit prime modulus + small odd base: Horner products stay far
# below 2^63 (acc < P ~ 2^31, acc*B + 127 < 2^39) and the squaring
# finalizer peaks at (P-1)^2 + c < 2^62, so both engines use plain
# 64-bit integer arithmetic with no overflow anywhere.
SPLIT_P = 2_147_483_629
SPLIT_B = 131
_MIX_C1 = 98_765_431
_MIX_C2 = 12_345_677
_MAX_ID_LEN = 40  # power-table length for the SQL mirror


def id_hash(id_col: Column, salt: str = "") -> Column:
    """Uniform deterministic hash of CAST(id AS STRING) into
    [0, SPLIT_P): Horner polynomial over code points, then two
    modular-squaring rounds.  The Horner pass alone is a ROLLING
    hash — nearly linear in trailing characters, so sequential ids
    land in one narrow band and threshold splits collapse (measured:
    5000 sequential ids ALL below the 0.8 cutoff).  x -> (x^2 + c)
    mod P twice destroys that affine structure (empirically: 0.8
    cutoff captures 0.7996, independent salts agree 49.9% — see
    tests/test_sampling.py).  Pure JVM expression (codegen); salt
    prepended so independent consumers (split vs sample) draw
    independent streams."""
    s = F.concat(F.lit(salt), id_col.cast("string"))
    codes = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.ascii(s.substr(i, F.lit(1))).cast("long"))
    h = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, x: (acc * SPLIT_B + x) % SPLIT_P)
    h = (h * h + F.lit(_MIX_C1)) % SPLIT_P
    return (h * h + F.lit(_MIX_C2)) % SPLIT_P


def _cutoffs(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper cutoff) pairs over [0, SPLIT_P) in
    insertion order; exact integer boundaries."""
    total = sum(weights.values())
    acc = 0.0
    out = []
    for name, w in weights.items():
        acc += w / total
        out.append((name, min(int(acc * SPLIT_P), SPLIT_P)))
    out[-1] = (out[-1][0], SPLIT_P)  # close float residue
    return out


def assign_split(df: DataFrame, id_col: str,
                 weights: dict[str, float] | None = None,
                 salt: str = "split:",
                 out_col: str = "split") -> DataFrame:
    """Add a deterministic split label column.  weights default to
    98/1/1 train/val/test; any name->weight dict works."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    h = id_hash(F.col(id_col), salt)
    expr = None
    for name, cut in _cutoffs(weights):
        cond = h < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, id_col: str,
                      fractions: dict, stratum_col: Column,
                      salt: str = "sample:") -> DataFrame:
    """Keep each row iff hash(id) < fraction(stratum) * P — exact
    per-stratum rates, membership independent of partitioning and of
    every other stratum's rows (no count pre-pass, map-only)."""
    h = id_hash(F.col(id_col), salt)
    keep = F.lit(False)
    for value, frac in fractions.items():
        cut = min(int(frac * SPLIT_P), SPLIT_P)
        keep = keep | ((stratum_col == F.lit(value)) & (h < F.lit(cut)))
    return df.filter(keep)


# ------------------------------------------------------------------
# DuckDB mirrors (power-sum form of the same Horner hash)
# ------------------------------------------------------------------

def hash_cte_sql(table: str, id_col: str, salt: str = "") -> str:
    """CTE list ending in `hh(id, h)`: the identical id hash for
    every row of `table` (sum of code*B^(L-i) mod P == Horner)."""
    pows = ", ".join(f"({m}, {pow(SPLIT_B, m, SPLIT_P)})"
                     for m in range(_MAX_ID_LEN))
    return f"""
pw(m, q) AS (VALUES {pows}),
ss AS (SELECT {id_col} AS id,
              '{salt}' || CAST({id_col} AS VARCHAR) AS s
       FROM {table}),
sc AS (SELECT id, s, length(s) AS L,
              unnest(generate_series(1, length(s))) AS i
       FROM ss),
h0 AS (SELECT id,
              CAST(SUM(CAST(unicode(substr(s, CAST(i AS INT), 1))
                            AS BIGINT) * q) % {SPLIT_P} AS BIGINT) AS h
       FROM sc JOIN pw ON pw.m = L - CAST(i AS INT)
       GROUP BY id),
h1 AS (SELECT id, (h * h + {_MIX_C1}) % {SPLIT_P} AS h FROM h0),
hh AS (SELECT id, (h * h + {_MIX_C2}) % {SPLIT_P} AS h FROM h1)"""


def split_case_sql(weights: dict[str, float]) -> str:
    """CASE expression over hh.h matching assign_split's cutoffs."""
    parts = []
    for name, cut in _cutoffs(weights):
        parts.append(f"WHEN h < {cut} THEN '{name}'")
    return "CASE " + " ".join(parts) + " END"
