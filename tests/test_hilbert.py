"""Hilbert curve ordering (operators/hilbert.py)."""

import numpy as np

from pyspark.sql import functions as F

from geographiclib_go_spark.operators import hilbert as hb


def _py_xy2d(n, x, y):
    """Scalar reference (classic quadrant-walk formulation)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _full_grid(spark, order):
    n = 1 << order
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"))
    out = hb.with_hilbert_rank(df, "x", "y", order) \
        .withColumn("md", hb.morton_d_col(F.col("x"), F.col("y"),
                                          order))
    return {(r.x, r.y): (r.hd, r.md) for r in out.collect()}


def test_bijection_and_unit_steps_order5(spark):
    """The two properties that characterize the curve: ranks are a
    permutation of [0, 4^order) and consecutive ranks are Manhattan
    distance exactly 1 apart (Morton, by contrast, jumps)."""
    order, n = 5, 32
    grid = _full_grid(spark, order)
    by_rank = {}
    for (x, y), (hd, md) in grid.items():
        by_rank[hd] = (x, y)
    assert sorted(by_rank) == list(range(n * n))      # bijection
    steps = [abs(by_rank[d + 1][0] - by_rank[d][0])
             + abs(by_rank[d + 1][1] - by_rank[d][1])
             for d in range(n * n - 1)]
    assert set(steps) == {1}                          # unit continuity
    # Morton is NOT unit-continuous on the same grid
    by_m = {md: (x, y) for (x, y), (hd, md) in grid.items()}
    msteps = [abs(by_m[d + 1][0] - by_m[d][0])
              + abs(by_m[d + 1][1] - by_m[d][1])
              for d in range(n * n - 1)]
    assert max(msteps) > 1


def test_matches_python_reference_order4(spark):
    grid = _full_grid(spark, 4)
    for (x, y), (hd, _md) in grid.items():
        assert hd == _py_xy2d(16, x, y), (x, y)


def test_order2_golden(spark):
    """Pinned first ranks of the order-2 curve (n=4): the canonical
    U-shape through the lower-left quadrant."""
    grid = _full_grid(spark, 2)
    path = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3),
            (1, 2), (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1),
            (2, 0), (3, 0)]
    for d, (x, y) in enumerate(path):
        assert grid[(x, y)][0] == d, (d, x, y, grid[(x, y)])


def test_oracle_ctes_match_kernel(spark):
    """The DuckDB CTE chain reproduces the Spark ranks bit-for-bit
    on the full order-4 grid."""
    import duckdb
    con = duckdb.connect()
    sql = ("WITH cells AS (SELECT (i % 16) AS x, (i // 16) AS y "
           "FROM range(256) t(i)),\n"
           + hb.hilbert_oracle_ctes(4, src="cells", out="hc")
           + "\nSELECT x, y, hd FROM hc")
    duck = {(r[0], r[1]): r[2] for r in con.sql(sql).fetchall()}
    grid = _full_grid(spark, 4)
    assert duck == {k: v[0] for k, v in grid.items()}


def test_dense_boxes_hilbert_needs_fewer_runs(spark):
    """Moon et al.'s clustering property, the fact the layout claim
    rests on: over unaligned 8x8 query boxes on the full grid,
    Hilbert ranks form decisively fewer contiguous runs (measured
    581 vs 1032 on this exact box set).  Note the NAIVE metric —
    summed |rank diff| between adjacent cells — actually favors
    Morton (38936 vs 32736 here), which is why the registered query
    counts runs, not rank spans."""
    grid = _full_grid(spark, 5)
    hruns = mruns = 0
    for x0 in range(0, 25, 3):
        for y0 in range(0, 25, 3):
            for idx in (0, 1):
                vals = sorted(grid[(x, y)][idx]
                              for x in range(x0, x0 + 8)
                              for y in range(y0, y0 + 8))
                runs = 1 + sum(b - a > 1 for a, b in
                               zip(vals, vals[1:]))
                if idx == 0:
                    hruns += runs
                else:
                    mruns += runs
    assert hruns == 581 and mruns == 1032
    assert hruns < 0.6 * mruns


def test_locality_query_counts_runs(spark, sf_dir):
    from geographiclib_go_spark import queries as Q
    r = Q.customer_hilbert_locality(spark, sf_dir).collect()[0]
    assert r.n_box_cells > 0
    assert 0 < r.hilbert_runs <= r.n_box_cells
    assert 0 < r.morton_runs <= r.n_box_cells
