"""Driver-style correctness check: run every queries() entry on Spark
at a given sf dir and compare with oracle_sql() through DuckDB —
row count, column names, and order-insensitive values.

Usage: python scripts/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(pdf: pd.DataFrame) -> list:
    cols = sorted(pdf.columns)
    rows = []
    for _, r in pdf[cols].iterrows():
        rows.append(tuple(norm_cell(r[c]) for c in cols))
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as ent
    from geographiclib_go_spark.session import build_session

    spark = build_session(app="oracle-check", master="local[8]",
                          shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = ent.queries()
    if len(sys.argv) > 2:  # optional name filter
        want = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in want}
    oracles = ent.oracle_sql()
    results = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {e}"
            print(f"{name:32s} SPARK ERROR: {e}")
            continue
        finally:
            # queries cache() intra-query intermediates; don't let 83
            # entries' caches pile up in the one local-mode JVM
            spark.catalog.clearCache()
        wall = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only: {len(sdf)} rows ({wall:.1f}s)"
            print(f"{name:32s} rows-only  {len(sdf):7d} rows  {wall:5.1f}s")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            print(f"{name:32s} ORACLE ERROR: {e}")
            continue
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_rows = len(sdf) == len(odf)
        ok_vals = ok_cols and ok_rows and canon(sdf) == canon(odf)
        status = "OK" if ok_vals else "MISMATCH"
        results[name] = status
        print(f"{name:32s} {status:9s} rows {len(sdf)}/{len(odf)} "
              f"cols={ok_cols}  {wall:5.1f}s")
        if not ok_vals and ok_cols and ok_rows:
            a, b = canon(sdf), canon(odf)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"    spark : {x}")
                print(f"    duckdb: {y}")
        elif not ok_cols:
            print(f"    spark cols : {sorted(sdf.columns)}")
            print(f"    duckdb cols: {sorted(odf.columns)}")

    bad = [k for k, v in results.items() if v == "MISMATCH"
           or "ERROR" in str(v)]
    print(f"\n{len(results) - len(bad)}/{len(results)} clean; "
          f"problems: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
