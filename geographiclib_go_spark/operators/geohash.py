"""Geohash cell encoding (engine-added; complements the S2-style
cube-face index in operators/cells.py with the rectangular
lat/lon-interleave family most external datasets ship with).

Encoding is the classic construction: quantize lat to 5p/2 bits of
[-90, 90) and lon to 5p/2 bits of [-180, 180), Morton-interleave
(lon first), emit base32 digits.  Everything is integer/bitwise
Spark column arithmetic — shiftleft/bitwiseAND magic-mask spreads,
whole-stage codegen, no UDF, no Python — and the identical operation
sequence is emitted as DuckDB SQL (geohash_cte_sql), so every cell
id in a registered query is hash-verified bit for bit
(queries.pts_geohash_rollup).

Scale shape: a pure per-row projection.  Geohash strings give free
PREFIX hierarchy — substr(gh, 1, k) is the enclosing coarser cell —
so rollups along the pyramid are plain string-prefix groupBys, and
range scans over a region become SQL BETWEEN on the encoded column
(the property layout.py exploits for min/max row-group pruning).

Precision must be even here (odd geohash lengths split the extra
bit to lon; even lengths keep lat/lon symmetric at 5p/2 bits each),
which covers the standard even tilings (gh2..gh12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# magic-mask Morton spread constants (interleave-by-one, 64-bit)
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(x: Column) -> Column:
    """Insert a zero bit between consecutive bits of x (<= 32 bits)."""
    for sh, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Base32 geohash string of (lat, lon) at even `precision`."""
    if precision % 2 or not 2 <= precision <= 12:
        raise ValueError("precision must be even, 2..12")
    half = 5 * precision // 2
    n = 1 << half
    lat_i = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    lon_i = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    lat_i = F.least(F.greatest(lat_i, F.lit(0)), F.lit(n - 1)).cast("long")
    lon_i = F.least(F.greatest(lon_i, F.lit(0)), F.lit(n - 1)).cast("long")
    bits = F.shiftleft(_spread_bits(lon_i), 1) \
        .bitwiseOR(_spread_bits(lat_i))
    chars = [
        F.lit(B32).substr(
            (F.shiftrightunsigned(bits, 5 * (precision - 1 - i))
             .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
            F.lit(1))
        for i in range(precision)]
    return F.concat(*chars)


def geohash_cte_sql(src: str, lat: str, lon: str,
                    precision: int = 8) -> str:
    """CTE list ending in gh(..., gh): the identical encode over
    `src` (which must expose lat/lon columns) — same quantization,
    same five spread steps, same base32 digit extraction, so the
    two engines agree on every boundary case bit for bit."""
    if precision % 2 or not 2 <= precision <= 12:
        raise ValueError("precision must be even, 2..12")
    half = 5 * precision // 2
    n = 1 << half
    digits = " || ".join(
        f"substr('{B32}', CAST(((bits >> {5 * (precision - 1 - i)}) & 31)"
        " AS INT) + 1, 1)"
        for i in range(precision))
    # one CTE per spread step keeps the expressions readable and the
    # operation ORDER identical to _spread_bits
    ctes = [f"q AS (SELECT *, "
            f"CAST(LEAST(GREATEST(FLOOR(({lat} + 90.0) / 180.0 * {float(n)}),"
            f" 0), {n - 1}) AS BIGINT) AS yi, "
            f"CAST(LEAST(GREATEST(FLOOR(({lon} + 180.0) / 360.0 * {float(n)}),"
            f" 0), {n - 1}) AS BIGINT) AS xi FROM {src})"]
    prev = "q"
    for k, (sh, mask) in enumerate(_SPREAD):
        py = "yi" if k == 0 else f"y{k - 1}"
        px = "xi" if k == 0 else f"x{k - 1}"
        ctes.append(
            f"s{k} AS (SELECT *, "
            f"(({py} | ({py} << {sh})) & {mask}) AS y{k}, "
            f"(({px} | ({px} << {sh})) & {mask}) AS x{k} FROM {prev})")
        prev = f"s{k}"
    ctes.append(f"bb AS (SELECT *, ((x4 << 1) | y4) AS bits FROM {prev})")
    ctes.append(f"gh AS (SELECT *, {digits} AS gh FROM bb)")
    return ",\n".join(ctes)
