"""Moran's I over a cell lattice (operators/moran.py)."""

import numpy as np

from geographiclib_go_spark.operators import moran as mo


def _py_moran(cells, nx_wrap):
    """Float textbook formula over occupied cells (dict key->x)."""
    n = len(cells)
    xbar = sum(cells.values()) / n
    num = w = 0.0
    for (iy, ix), xa in cells.items():
        for dy, dx in mo.OFFSETS:
            key = (iy + dy, (ix + dx + nx_wrap) % nx_wrap)
            if key in cells:
                num += (xa - xbar) * (cells[key] - xbar)
                w += 1
    den = sum((x - xbar) ** 2 for x in cells.values())
    return (n / w) * num / den, int(w)


def _run(spark, cells, nx_wrap=72):
    df = spark.createDataFrame(
        [(int(iy), int(ix), int(x)) for (iy, ix), x in cells.items()],
        "iy long, ix long, x long")
    return mo.morans_i_grid(df, nx_wrap=nx_wrap).collect()[0]


def test_matches_python_reference_random(spark):
    rng = np.random.RandomState(3)
    cells = {}
    while len(cells) < 60:
        cells[(int(rng.randint(0, 8)), int(rng.randint(0, 12)))] = \
            int(rng.randint(1, 40))
    r = _run(spark, cells, nx_wrap=12)
    expect, w = _py_moran(cells, 12)
    assert r.w_pairs == w
    assert abs(r.moran_r6 - expect) < 2e-6
    # the scaled-integer identity reproduces the float formula
    assert abs(r.n_cells * r.num / (r.w_pairs * r.den) - expect) < 1e-12


def test_checkerboard_negative_blobs_positive(spark):
    """Under QUEEN weights a checkerboard is only mildly negative
    (the four diagonal neighbors share its color and nearly cancel
    the four orthogonal opposites); row stripes are strongly negative
    in the vertical direction but diluted by the in-row positives, so
    the sharp discriminator is the two-blob field (strong positive)
    vs checkerboard (negative)."""
    checker = {(iy, ix): 1 + 9 * ((iy + ix) % 2)
               for iy in range(6) for ix in range(8)}
    blobs = {(iy, ix): 10 if ix < 4 else 1
             for iy in range(6) for ix in range(8)}
    assert _run(spark, checker, nx_wrap=8).moran_r6 < 0
    assert _run(spark, blobs, nx_wrap=8).moran_r6 > 0.5


def test_longitude_wraparound_neighbors(spark):
    """Two occupied columns at ix=0 and ix=nx-1 are adjacent through
    the wrap; without wrapping they would have zero pairs."""
    cells = {(iy, 0): 5 + iy for iy in range(4)}
    cells.update({(iy, 11): 9 - iy for iy in range(4)})
    r = _run(spark, cells, nx_wrap=12)
    py_i, py_w = _py_moran(cells, 12)
    assert r.w_pairs == py_w
    assert abs(r.moran_r6 - py_i) < 2e-6
    r2 = _run(spark, cells, nx_wrap=1000)   # wrap disabled in range
    assert r2.w_pairs < r.w_pairs


def test_degenerate_constant_field_is_null(spark):
    cells = {(iy, ix): 7 for iy in range(3) for ix in range(3)}
    r = _run(spark, cells, nx_wrap=10)
    assert r.moran_r6 is None and r.den == 0
