"""Count-Min sketch operator (operators/cms.py).

Covers: the CMS overestimate guarantee, mergeability of the register
table, kernel-vs-pure-python hash parity, repartition invariance,
and the Spark-explode vs stream-tokenizer consistency the oracle
relies on.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from geographiclib_go_spark.operators import cms
from geographiclib_go_spark.operators import sketch_hash as sk

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the  quick\tbrown\nfox",
    "pack my box with five dozen liquor jugs",
    "the THE The tHe",
    "",
    "   \t\n  ",
    "heavy heavy heavy heavy heavy heavy heavy heavy",
    "unicode tokens: ﬀöó ŧ ﬀöó",
    "x" * 100 + " y",          # token longer than TOKEN_MAX
]


def _exact_counts(texts):
    import re
    counts = {}
    for t in texts:
        for tok in re.split("[ \t\n\x0b\f\r]+", t):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    return counts


def _docs_df(spark, texts=DOCS):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def _py_cell(tok, r, width):
    """Pure-python reference of the cell mapping."""
    a, b, c = cms_a, cms_b, cms_c = cms.cms_params()
    t1 = t2 = 0
    for ch in tok[:sk.TOKEN_MAX]:
        t1 = (t1 * sk.B1 + ord(ch)) % sk.P1
        t2 = (t2 * sk.B2 + ord(ch)) % sk.P2
    return ((int(a[r]) * t1 % sk.P1 + int(b[r]) * t2 % sk.P1
             + int(c[r])) % sk.P1) % width


def test_registers_match_python_reference(spark):
    regs = {(r.row, r.col): r.cnt
            for r in cms.cms_registers(_docs_df(spark), "text",
                                       depth=3, width=64).collect()}
    expect = {}
    for tok, cnt in _exact_counts(DOCS).items():
        for r in range(3):
            key = (r, _py_cell(tok, r, 64))
            expect[key] = expect.get(key, 0) + cnt
    assert regs == expect


def test_estimate_overestimates_and_is_tight_for_heavy(spark):
    docs = _docs_df(spark)
    regs = cms.cms_registers(docs, "text")
    exact = _exact_counts(DOCS)
    toks = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r.tok: r.cms_est
           for r in cms.cms_estimate(toks, regs, "tok").collect()}
    assert set(est) == set(exact)
    for tok, cnt in exact.items():
        assert est[tok] >= cnt          # CMS never underestimates
    # with 9 tiny docs in a 4x2048 sketch there are no collisions:
    # every estimate is exact, including the planted heavy hitter
    assert est["heavy"] == 8
    assert est == exact


def test_register_tables_merge(spark):
    """union + groupBy-sum of two half-corpus sketches == the
    whole-corpus sketch (the snapshot-merge property)."""
    half1 = cms.cms_registers(_docs_df(spark, DOCS[:4]), "text",
                              depth=2, width=32)
    half2 = cms.cms_registers(_docs_df(spark, DOCS[4:]), "text",
                              depth=2, width=32)
    merged = (half1.unionByName(half2).groupBy("row", "col")
              .agg(F.sum("cnt").alias("cnt")))
    whole = cms.cms_registers(_docs_df(spark), "text",
                              depth=2, width=32)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_repartition_invariance(spark):
    base = _docs_df(spark)
    a = cms.cms_registers(base.repartition(7), "text")
    b = cms.cms_registers(base.coalesce(1), "text")
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))


def test_spark_split_matches_stream_tokenizer(spark):
    """The exact-count side (JVM regex explode) and the register side
    (sketch_hash.tokenize_stream) must see the same token multiset —
    the consistency the doc_heavy_hitters oracle is built on."""
    toks = (_docs_df(spark)
            .select(F.explode(F.split(F.col("text"),
                                      cms.WS_REGEX_JAVA)).alias("tok"))
            .filter(F.length("tok") > 0)
            .groupBy("tok").agg(F.count("*").alias("n")).collect())
    spark_counts = {r.tok: r.n for r in toks}

    codes, lens = sk.batch_codes(DOCS)
    start, length, _ = sk.tokenize_stream(codes, lens)
    kernel_counts = {}
    for s, ln in zip(start, length):
        tok = "".join(chr(c) for c in codes[s:s + ln])
        kernel_counts[tok] = kernel_counts.get(tok, 0) + 1
    assert spark_counts == kernel_counts == _exact_counts(DOCS)


def test_collision_forces_overestimate(spark):
    """With width=1, every token lands in the same cell, so every
    estimate equals the total token count — the guarantee stays an
    OVERestimate even under total collision."""
    docs = _docs_df(spark)
    regs = cms.cms_registers(docs, "text", depth=2, width=1)
    exact = _exact_counts(DOCS)
    total = sum(exact.values())
    toks = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r.tok: r.cms_est
           for r in cms.cms_estimate(toks, regs, "tok",
                                     depth=2, width=1).collect()}
    assert all(v == total for v in est.values())


def test_scale_preset_recovers_exact_topk(spark):
    """cms_heavy_hitters_scale (no full-vocab shuffle) must surface
    every exact top-k token of the fixture corpus among its
    candidates, and every estimate must respect the CMS overestimate
    guarantee (est >= true count)."""
    from pyspark.sql import functions as F
    from geographiclib_go_spark.operators import cms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {r["tok"]: r["n"] for r in
             (docs.select(F.explode(F.split("text",
                                            cms.WS_REGEX_JAVA))
                          .alias("tok"))
              .filter(F.length("tok") > 0)
              .groupBy("tok").agg(F.count("*").alias("n"))
              .orderBy(F.desc("n"), "tok").limit(10).collect())}
    got = {r["tok"]: r["cms_est"] for r in
           cms.cms_heavy_hitters_scale(docs, "text", k=30).collect()}
    missing = set(exact) - set(got)
    assert not missing, f"scale preset missed exact top tokens: {missing}"
    for tok, n in exact.items():
        assert got[tok] >= n  # overestimate-only guarantee
