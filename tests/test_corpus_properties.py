"""Property-based invariants (hypothesis) for the corpus-prep oracle
formulations: the DuckDB ORACLE_SQL replays of BPE training, sequence
packing, and LM scoring are each driven over RANDOM small corpora and
compared with the independent pure-Python references from their fixed-
corpus test modules — randomized coverage of the tricky parts (the
left-to-right fold's overlap handling, ties in the merge argmax,
chunk-boundary spans, smoothing arithmetic) beyond the committed
fixtures.  The Spark formulations are pinned to the same references on
the fixed corpora (tests/test_{bpe,packing,lm}.py), so oracle == ref
here closes the triangle without a Spark session per example.
"""

import duckdb
from hypothesis import given, settings, strategies as st

from geographiclib_go_spark.operators import bpe, lm, packing
from tests.test_bpe import _py_reference as bpe_ref
from tests.test_lm import _py_reference as lm_ref
from tests.test_packing import _py_reference as pack_ref

# small alphabet + short words force merge collisions, self-pairs
# (the overlap-handling edge), and argmax ties
word = st.text(alphabet="abc", min_size=1, max_size=5)
doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


def _docs_table(con, texts):
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))


@given(corpus)
@settings(max_examples=40, deadline=None)
def test_bpe_oracle_matches_reference_on_random_corpora(texts):
    con = duckdb.connect()
    _docs_table(con, texts)
    got = [tuple(r) for r in
           con.execute(bpe.bpe_oracle_sql(rounds=4)).fetchall()]
    assert got == bpe_ref(texts, 4)


@given(corpus)
@settings(max_examples=40, deadline=None)
def test_bpe_apply_oracle_matches_reference_on_random_corpora(texts):
    """The apply replay must match the reference tokenizer EVEN WHEN
    rounds exceed merge exhaustion (the identity-round contract) —
    rounds=6 over tiny corpora regularly exhausts early."""
    from tests.test_bpe import _py_apply
    con = duckdb.connect()
    _docs_table(con, texts)
    got = sorted(tuple(r) for r in
                 con.execute(bpe.bpe_apply_oracle_sql(6)).fetchall())
    assert got == _py_apply(list(enumerate(texts)), 6)


@given(corpus)
@settings(max_examples=40, deadline=None)
def test_packing_oracle_matches_reference_on_random_corpora(texts):
    con = duckdb.connect()
    _docs_table(con, texts)
    got = sorted(tuple(r) for r in
                 con.execute(packing.seq_pack_oracle_sql()).fetchall())
    assert got == pack_ref(list(enumerate(texts)))


@given(corpus)
@settings(max_examples=40, deadline=None)
def test_lm_oracle_matches_reference_on_random_corpora(texts):
    con = duckdb.connect()
    _docs_table(con, texts)
    got = sorted(tuple(r) for r in
                 con.execute(lm.lm_score_oracle_sql()).fetchall())
    assert got == lm_ref(list(enumerate(texts)))
