"""Bloom-filter semi-join pruning (operators/bloom.py)."""

import numpy as np

from pyspark.sql import functions as F

from geographiclib_go_spark.operators import bloom as bl
from geographiclib_go_spark.operators.sketch_hash import P1

M, K = 1 << 10, 3         # deliberately small so collisions happen


def _py_indexes(key, m=M, k=K):
    a, b = bl.bloom_params(k)
    km = key % P1
    return [((int(a[i]) * km + int(b[i])) % P1) % m for i in range(k)]


def _py_words(keys, m=M, k=K):
    words = [0] * (m // bl.WORD)
    for key in keys:
        for idx in _py_indexes(key, m, k):
            words[idx // bl.WORD] |= 1 << (idx % bl.WORD)
    return words


def _keys_df(spark, keys):
    return spark.createDataFrame([(int(x),) for x in keys], "key long")


def test_registers_match_python_reference(spark):
    keys = [1, 7, 42, 9999, 123456789, 0]
    regs = bl.bloom_registers(_keys_df(spark, keys), "key", M, K)
    got = [0] * (M // bl.WORD)
    for r in regs.collect():
        got[int(r.word)] = int(r.bits)
    assert got == _py_words(keys)
    assert bl.bloom_literal(regs, M) == _py_words(keys)


def test_no_false_negatives_and_probe_parity(spark):
    rng = np.random.RandomState(7)
    keys = sorted(set(int(x) for x in rng.randint(0, 10**9, 200)))
    words = _py_words(keys)
    probe_keys = keys + [int(x) for x in rng.randint(0, 10**9, 500)]
    df = _keys_df(spark, probe_keys).withColumn(
        "pass", bl.bloom_might_contain(F.col("key"), words, M, K))
    got = {r.key: r["pass"] for r in df.collect()}
    for key in keys:                       # every true key passes
        assert got[key]
    for key in probe_keys:                 # probe == python reference
        expect = all(words[i // bl.WORD] >> (i % bl.WORD) & 1
                     for i in _py_indexes(key))
        assert got[key] == expect
    # the small filter must actually collide somewhere
    false_pos = [k for k in probe_keys if got[k] and k not in set(keys)]
    assert false_pos


def test_register_tables_merge(spark):
    """bit_or-merge of two half-set registers == whole-set registers
    (the snapshot-merge property)."""
    a_keys, b_keys = [1, 2, 3, 500], [500, 999, 12345]
    ra = bl.bloom_registers(_keys_df(spark, a_keys), "key", M, K)
    rb = bl.bloom_registers(_keys_df(spark, b_keys), "key", M, K)
    merged = (ra.unionByName(rb).groupBy("word")
              .agg(F.bit_or("bits").alias("bits")))
    assert bl.bloom_literal(merged, M) == _py_words(a_keys + b_keys)


def test_empty_key_set_passes_nothing(spark):
    words = [0] * (M // bl.WORD)
    df = _keys_df(spark, [5, 77, 123]).withColumn(
        "pass", bl.bloom_might_contain(F.col("key"), words, M, K))
    assert not any(r["pass"] for r in df.collect())


def test_prefilter_superset_of_semi_join(spark):
    rng = np.random.RandomState(11)
    fact = _keys_df(spark, [int(x) for x in rng.randint(0, 5000, 400)])
    keys = _keys_df(spark, [int(x) for x in rng.randint(0, 5000, 60)]) \
        .withColumnRenamed("key", "k")
    pre = bl.bloom_prefilter(fact, keys.withColumnRenamed("k", "key"),
                             "key", "key", M, K)
    exact = fact.join(keys, fact.key == keys.k, "semi")
    pre_keys = {r.key for r in pre.collect()}
    exact_keys = {r.key for r in exact.collect()}
    assert exact_keys <= pre_keys
