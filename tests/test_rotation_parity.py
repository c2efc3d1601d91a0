"""Executable parity gates for the registry-rotation casualties
(ADVICE r4 item 1): the driver's CORRECTNESS draw caps at 50 queries
per round, so __spark_entry__.queries() rotates previously-green
entries past the cap to make room for new work.  A comment claiming
"a twin would catch a regression" is not a check — this test IS the
check: every query whose newest official driver row is left behind
by the r5 rotation runs here against its own ORACLE_SQL through
DuckDB, with the same column-sorted order-insensitive value
comparison the driver uses.
"""

import importlib.util
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the 13 r3-green queries pushed past the r5 draw cap — the only
# registered entries whose newest official driver row will predate
# round 4 after this round (see __spark_entry__.queries() ordering).
# ellip_route_nearest joined the list when image_embed_knn entered
# the draw (besides this gate it is also pinned by the fixture-
# freshness + intercept-kernel pytests, tests/test_spatial_spark.py);
# route_distance joined when image_embed_ivf_knn entered (also pinned
# by the cross-track kernel pytests in tests/test_spatial_spark.py).
ROTATED_OUT = [
    "rollup_order_volume", "cube_order_volume", "part_type_pivot",
    "part_type_unpivot", "sphere_distance_buckets", "tile_counts",
    "tile_pyramid", "events_props_sum", "events_moving_window",
    "track_bearing_rose", "events_hourly", "ellip_route_nearest",
    "route_distance",
    # displaced by the closing-session tokenizer/packing/LM additions
    # (which had no official row at all and now take draw slots
    # 47-50); these four keep their r3 official rows plus this gate
    "raster_coverage", "region_dissolve", "ellip_nearest_landmark",
    "sphere_nearest_landmark",
]

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canon(pdf: pd.DataFrame) -> list:
    cols = sorted(pdf.columns)
    return sorted(tuple(_norm_cell(r[c]) for c in cols)
                  for _, r in pdf[cols].iterrows())


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_rotated_out_are_actually_out_of_draw(entry):
    """The list above must track the registry: each entry exists and
    sits past the driver's 50-row cap (a rotation edit that pulls one
    back in-draw should retire it from this gate, not double-run)."""
    names = list(entry.queries())
    for q in ROTATED_OUT:
        assert q in names, q
        assert names.index(q) >= 50, (q, names.index(q))


@pytest.mark.parametrize("name", ROTATED_OUT)
def test_rotation_casualty_matches_oracle(name, entry, spark, sf_dir,
                                          duck):
    got = entry.queries()[name](spark, sf_dir).toPandas()
    spark.catalog.clearCache()
    want = duck.sql(entry.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _canon(got) == _canon(want), name
