"""Driver-contract pins for __spark_entry__.py: every registered
query carries a full DuckDB oracle (the round gate hashes values, so
a silently missing oracle would demote a query to rows-only without
anyone noticing), no orphaned oracles, and the flagship entry()
returns rows with its documented schema."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as ent


def test_every_query_has_a_full_oracle():
    q = ent.queries()
    o = ent.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {sorted(set(q) - set(o))}; "
        f"orphaned oracles: {sorted(set(o) - set(q))}")
    assert len(q) >= 85
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_flagship_runs(spark):
    df = ent.entry(spark)
    assert [f.name for f in df.schema.fields] == ["qid", "rank",
                                                  "dist_m"]
    assert df.count() > 0
