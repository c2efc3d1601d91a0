"""Shingle inverted-index cosine pairs (operators/tfidf.py)."""

import itertools
import math
import re

from geographiclib_go_spark.operators import tfidf as tfi


def _docs_df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def _py_tokens(text):
    return [t for t in re.split("[ \t\n\x0b\f\r]+", text) if t]


def _py_shingles(text):
    toks = _py_tokens(text)
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


def _py_cosine(a, b):
    ta, tb = _py_tokens(a), _py_tokens(b)
    ca = {t: ta.count(t) for t in set(ta)}
    cb = {t: tb.count(t) for t in set(tb)}
    dot = sum(ca[t] * cb[t] for t in set(ca) & set(cb))
    na = math.sqrt(sum(v * v for v in ca.values()))
    nb = math.sqrt(sum(v * v for v in cb.values()))
    return dot / (na * nb) if na and nb else 0.0


DOCS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "alpha beta gamma delta epsilon zeta eta iota",     # near-dup of 0
    "one two three four five six",
    "totally different words entirely here now",
    "alpha beta",                                       # too short: no shingle
    "x",
]


def test_shingle_index_matches_python(spark):
    got = {}
    for r in tfi.shingle_index(_docs_df(spark, DOCS)).collect():
        got.setdefault(r.doc_id, set()).add(r.tri)
    expect = {i: _py_shingles(t) for i, t in enumerate(DOCS)
              if _py_shingles(t)}
    assert got == expect            # short docs absent on both sides


def test_pairs_match_brute_force(spark):
    out = tfi.tf_cosine_pairs(_docs_df(spark, DOCS), min_sim=0.7,
                              max_df=10).collect()
    got = {(r.id_a, r.id_b) for r in out}
    # brute force over pairs sharing >=1 (rare: all rare here) shingle
    expect = set()
    for i, j in itertools.combinations(range(len(DOCS)), 2):
        if (_py_shingles(DOCS[i]) & _py_shingles(DOCS[j])
                and _py_cosine(DOCS[i], DOCS[j]) >= 0.7):
            expect.add((i, j))
    assert got == expect == {(0, 1)}
    r = out[0]
    # integer payloads match the python reference exactly
    assert (r.dot, r.na2, r.nb2) == (7, 8, 8)


def test_common_shingle_pairs_are_not_candidates(spark):
    """Pairs sharing only shingles with df > max_df are skipped —
    the stated recall contract."""
    common = "spark shuffle join " * 3
    docs = [common + f"tail{i}" for i in range(6)]
    out = tfi.tf_cosine_pairs(_docs_df(spark, docs), min_sim=0.1,
                              max_df=3).collect()
    assert out == []                # shared shingles all have df=6 > 3
    # raising max_df readmits them
    out2 = tfi.tf_cosine_pairs(_docs_df(spark, docs), min_sim=0.1,
                               max_df=6).collect()
    assert len(out2) == 15          # all C(6,2) pairs, cosine ~ 0.9


def test_integer_threshold_equals_float_cosine(spark):
    """The integer inequality keeps exactly the pairs whose float
    cosine is >= min_sim (no boundary cases in this corpus)."""
    out = tfi.tf_cosine_pairs(_docs_df(spark, DOCS), min_sim=0.5,
                              max_df=10).collect()
    for r in out:
        sim = r.dot / math.sqrt(r.na2 * r.nb2)
        assert sim >= 0.5 - 1e-12
