"""Deterministic split / stratified sample: JVM hash equals the
pure-python Horner reference, membership is partition-invariant, and
rates land near their targets."""

from pyspark.sql import functions as F

from geographiclib_go_spark.operators import sampling as smp


def _py_hash(ident, salt=""):
    h = 0
    for ch in salt + str(ident):
        h = (h * smp.SPLIT_B + ord(ch)) % smp.SPLIT_P
    h = (h * h + smp._MIX_C1) % smp.SPLIT_P
    return (h * h + smp._MIX_C2) % smp.SPLIT_P


def test_jvm_hash_matches_python(spark):
    ids = [0, 1, 7, 123, 99991, 2**40 + 17]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["h"] for r in df.select(
        "doc_id", smp.id_hash(F.col("doc_id"), "s:").alias("h")).collect()}
    assert got == {i: _py_hash(i, "s:") for i in ids}


def test_split_partitions_and_is_repartition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)],
                               "doc_id long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = smp.assign_split(df, "doc_id", w)
    b = smp.assign_split(df.repartition(13), "doc_id", w)
    rows_a = {r["doc_id"]: r["split"] for r in a.collect()}
    rows_b = {r["doc_id"]: r["split"] for r in b.collect()}
    assert rows_a == rows_b
    assert len(rows_a) == 5000        # total partition, no dropped rows
    counts = a.groupBy("split").count().collect()
    got = {r["split"]: r["count"] for r in counts}
    assert set(got) == {"train", "val", "test"}
    assert abs(got["train"] / 5000 - 0.8) < 0.03
    assert abs(got["val"] / 5000 - 0.1) < 0.02
    assert abs(got["test"] / 5000 - 0.1) < 0.02


def test_split_matches_cutoff_rule(spark):
    df = spark.createDataFrame([(i,) for i in range(300)],
                               "doc_id long")
    w = {"train": 0.5, "val": 0.5}
    out = smp.assign_split(df, "doc_id", w)
    cuts = smp._cutoffs(w)
    for r in out.select("doc_id", "split").collect():
        h = _py_hash(r["doc_id"], "split:")
        want = next(name for name, cut in cuts if h < cut)
        assert r["split"] == want


def test_stratified_sample_exact_membership(spark):
    rows = [(i, "big" if i % 3 == 0 else "small") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    fr = {"big": 0.4, "small": 0.1}
    out = smp.stratified_sample(df, "doc_id", fr, F.col("stratum"))
    got = {(r["doc_id"], r["stratum"]) for r in out.collect()}
    want = {(i, s) for i, s in rows
            if _py_hash(i, "sample:")
            < min(int(fr[s] * smp.SPLIT_P), smp.SPLIT_P)}
    assert got == want
    # rates near targets
    n_big = sum(1 for _, s in got if s == "big")
    n_small = len(got) - n_big
    assert abs(n_big / 1000 - 0.4) < 0.06
    assert abs(n_small / 2000 - 0.1) < 0.04


def test_salts_decorrelate_streams(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)],
                               "doc_id long")
    h1 = smp.id_hash(F.col("doc_id"), "a:").alias("h1")
    h2 = smp.id_hash(F.col("doc_id"), "b:").alias("h2")
    half = smp.SPLIT_P // 2
    rows = df.select(h1, h2).collect()
    agree = sum(1 for r in rows
                if (r["h1"] < half) == (r["h2"] < half))
    assert 0.4 < agree / 2000 < 0.6
