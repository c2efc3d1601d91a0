"""Corpus-prep operators (operators/corpus.py): each checked against
an INDEPENDENT pure-python brute force — not the SQL oracle the
driver runs, so the three implementations (Spark expressions, DuckDB
SQL, python sets/loops) triangulate each other."""

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from geographiclib_go_spark.operators import corpus as cp

SF_DIR = "/root/testdata/sf0.001"


def _docs_pdf(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source", "lang", "text").toPandas())


def _grams(text, n):
    tok = text.strip().split(" ")
    return [" ".join(tok[i:i + n]) for i in range(len(tok) - n + 1)]


def test_ngram_col_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c d e"), (2, "x")],
        "doc_id long, text string")
    out = df.select(
        "doc_id",
        cp.ngram_col(cp._tokens(), 4).alias("g")).collect()
    got = {r["doc_id"]: r["g"] for r in out}
    assert got[0] == []          # 3 tokens < 4: no descending sequence
    assert got[1] == ["a b c d", "b c d e"]
    assert got[2] == []


def test_decontaminate_matches_python_sets(spark, sf_dir):
    pdf = _docs_pdf(spark, sf_dir)
    eval_grams = set()
    for _, r in pdf[pdf.doc_id % cp.DECON_EVAL_MOD == 0].iterrows():
        eval_grams.update(_grams(r.text, cp.DECON_NGRAM))
    want = {}
    for _, r in pdf[pdf.doc_id % cp.DECON_EVAL_MOD != 0].iterrows():
        dirty = any(g in eval_grams
                    for g in _grams(r.text, cp.DECON_NGRAM))
        n_train, n_dirty = want.get(r.source, (0, 0))
        want[r.source] = (n_train + 1, n_dirty + int(dirty))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["source"]: (r["n_train"], r["n_dirty"])
           for r in cp.decontaminate(docs).collect()}
    assert got == want


def test_repetition_flag_semantics(spark):
    # doc 0: 'a' is 4/8 of the doc -> flagged (strictly over 1/8);
    # doc 1 all distinct (exactly 1/8 each) -> clean under strict >;
    # doc 2 top token 2/16 = exactly 1/8 -> clean; bigram dup surplus
    # counted exactly.
    rows = [(0, "s", "a a a a b c d e"),
            (1, "s", "p q r s t u v w"),
            (2, "s", "a a b c d e f g h i j k l m n o")]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    out = cp.repetition_stats(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    assert r["n_flagged"] == 1          # only doc 0
    assert r["sum_ntok"] == 32
    # doc 0 bigrams: 'a a' x3 dup surplus 2; others unique
    assert r["sum_dup2"] == 2


def test_substring_dedup_keep_first(spark):
    span = " ".join(f"w{i}" for i in range(cp.SUBSTR_WINDOW))
    rows = [(10, "s", span + " tailA unique1 unique2"),
            (20, "s", "headB headC " + span),       # copies 10's span
            (30, "s", " ".join(f"x{i}" for i in range(20)))]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    out = cp.substring_dedup(df).collect()[0]
    assert out["n_docs"] == 3
    assert out["n_removed"] == 1        # doc 20 removed, keeper 10 kept


def test_domain_mix_integer_math(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = cp.domain_mix(docs).collect()
    pdf = _docs_pdf(spark, sf_dir)
    counts = pdf.groupby("lang").size().to_dict()
    w = {d: math.floor(math.sqrt(n * cp.MIX_W_SCALE))
         for d, n in counts.items()}
    tw = sum(w.values())
    for r in got:
        assert r["n_docs"] == counts[r["domain"]]
        assert r["w"] == w[r["domain"]]
        assert r["quota"] == (cp.MIX_BUDGET * w[r["domain"]]) // tw
    # quotas never overspend the budget
    assert sum(r["quota"] for r in got) <= cp.MIX_BUDGET


def test_bm25_matches_pure_python(spark, sf_dir):
    pdf = _docs_pdf(spark, sf_dir)
    toks = [t.strip().split(" ") for t in pdf.text]
    N = len(toks)
    sdl = sum(len(t) for t in toks)
    scores = []
    for t in toks:
        dl = len(t)
        s = 0.0
        for term in cp.BM25_TERMS:
            tf = t.count(term)
            if tf == 0:
                continue
            df_ = sum(1 for u in toks if term in u)
            idf = (2.0 * (N - df_) + 1.0) / (2.0 * df_ + 1.0)
            s += idf * ((tf * 2.2) / (tf + 0.3 + (0.9 * (dl * N)) / sdl))
        scores.append(s)
    pdf = pdf.assign(score=scores)
    want = pdf.sort_values(["score", "doc_id"],
                           ascending=[False, True]).head(cp.BM25_K)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = cp.bm25_topk(docs).collect()
    assert [r["doc_id"] for r in got] == want.doc_id.tolist()
    for r, (_, w) in zip(got, want.iterrows()):
        assert r["score_r"] == pytest.approx(w.score, abs=5e-7)


def test_image_tile_rebalance_equals_plain_window(spark):
    """The salted two-phase top-K must equal the single-window plain
    ranking — checked against the committed tiles fixture in pandas."""
    from geographiclib_go_spark import queries as Q
    import pyarrow.parquet as pq
    import os
    fix = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "geographiclib_go_spark",
        "fixtures", "images_tiles.parquet")
    tiles = pq.read_table(fix).to_pandas()
    want = {}
    for tid, grp in tiles.groupby("tile_id"):
        ids = sorted(grp.image_id)
        if len(ids) > 8:
            want[tid] = (len(ids), ",".join(ids[:8]))
    got = {r["tile_id"]: (r["n_total"], r["kept_ids"])
           for r in Q.image_tile_rebalance(spark, None).collect()}
    assert got == want


def test_image_caption_conflict_counts(spark):
    """Conflicts match the numpy generator chains exactly."""
    import numpy as np
    from collections import defaultdict
    from geographiclib_go_spark import queries as Q
    from geographiclib_go_spark.sources import images as im
    ids = np.arange(Q._IMG_QUERY_N, dtype=np.uint64)
    ph = im.phash_for_ids(ids)
    lat, lon = im.latlon_for_ids(ids, ph)
    caps = im._caption_for(ids, lat, lon)
    by_ph = defaultdict(list)
    for p, c in zip(ph.tolist(), caps):
        by_ph[p].append(c)
    want = {p: (len(cs), len(set(cs)), min(cs))
            for p, cs in by_ph.items() if len(set(cs)) > 1}
    got = {r["phash"]: (r["n_images"], r["n_captions"],
                        r["first_caption"])
           for r in Q.image_caption_conflict(spark, None).collect()}
    assert got == want


def test_decon_eval_grams_persisted_and_probed(spark, tmp_path,
                                               monkeypatch):
    """doc_decontaminate writes the eval n-gram snapshot once per
    fingerprint and probes the committed parquet on reruns: the
    second call must not rebuild the gram set, must keep one snapshot
    version, and must return identical rows."""
    from geographiclib_go_spark import queries as Q
    from geographiclib_go_spark.plans import lineage as lin

    monkeypatch.setenv("SPARK_GRAFT_STORE", str(tmp_path))
    calls = []
    real = cp.eval_grams

    def spy(docs, *a, **kw):
        calls.append(1)
        return real(docs, *a, **kw)

    monkeypatch.setattr(cp, "eval_grams", spy)

    first = Q.doc_decontaminate(spark, SF_DIR).collect()
    assert calls == [1]
    hist1 = lin.snapshot_history(str(tmp_path), "decon_eval_grams")
    assert len(hist1) == 1

    second = Q.doc_decontaminate(spark, SF_DIR).collect()
    assert calls == [1]                  # resume: no rebuild
    hist2 = lin.snapshot_history(str(tmp_path), "decon_eval_grams")
    assert len(hist2) == 1 and hist2[0]["version"] == hist1[0]["version"]
    assert first == second


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """streaming_decontaminate_events probing the SAME persisted eval
    n-gram artifact must flag exactly the dirty docs the batch
    operator (and the pure-python brute force) flags."""
    from geographiclib_go_spark.streaming import polygon_stream as ps

    pdf = _docs_pdf(spark, SF_DIR)
    eval_grams = set()
    for _, r in pdf[pdf.doc_id % cp.DECON_EVAL_MOD == 0].iterrows():
        eval_grams.update(_grams(r.text, cp.DECON_NGRAM))
    want_dirty = {
        int(r.doc_id)
        for _, r in pdf[pdf.doc_id % cp.DECON_EVAL_MOD != 0].iterrows()
        if any(g in eval_grams for g in _grams(r.text, cp.DECON_NGRAM))}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    grams_path = str(tmp_path / "eval_grams")
    cp.eval_grams(docs).write.parquet(grams_path)
    grams = spark.read.parquet(grams_path)

    # train docs arrive as two micro-batches
    src = tmp_path / "arrivals"
    src.mkdir()
    train = pdf[pdf.doc_id % cp.DECON_EVAL_MOD != 0][
        ["doc_id", "text"]].reset_index(drop=True)
    half = len(train) // 2
    spark.createDataFrame(train.iloc[:half]).coalesce(1).write.parquet(
        str(src / "b0"))
    spark.createDataFrame(train.iloc[half:]).coalesce(1).write.parquet(
        str(src / "b1"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))

    out = ps.streaming_decontaminate_events(stream, grams)
    q = (out.writeStream.format("memory").queryName("decon_events")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        ev = spark.sql("SELECT * FROM decon_events").toPandas()
    finally:
        q.stop()
    assert set(ev.doc_id) == want_dirty
    assert len(want_dirty) > 0
    # every emitted gram really is an eval-suite gram
    assert set(ev.gram) <= eval_grams


def test_regex_scrub_matches_python_re(spark, sf_dir):
    import re
    pat = re.compile(cp.SCRUB_PATTERN)
    pdf = _docs_pdf(spark, sf_dir)
    want = {}
    for _, r in pdf.iterrows():
        hits = pat.findall(r.text)
        red = pat.sub(cp.SCRUB_REPL, r.text)
        n_docs, n_hit, n_m, delta = want.get(r.source, (0, 0, 0, 0))
        want[r.source] = (n_docs + 1, n_hit + (len(hits) > 0),
                          n_m + len(hits),
                          delta + len(r.text) - len(red))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["source"]: (r["n_docs"], r["n_hit_docs"], r["n_matches"],
                         r["chars_delta"])
           for r in cp.regex_scrub(docs).collect()}
    assert got == want
    assert sum(v[2] for v in want.values()) > 0  # gate is non-trivial


def test_streaming_scrub_matches_batch(spark, tmp_path):
    """streaming_scrub_events over micro-batched arrivals must make
    the same per-doc scrub decisions as python re (and therefore as
    the batch doc_regex_scrub rollup)."""
    import re
    from geographiclib_go_spark.streaming import polygon_stream as ps

    pat = re.compile(cp.SCRUB_PATTERN)
    pdf = _docs_pdf(spark, SF_DIR)[["doc_id", "text"]] \
        .reset_index(drop=True)
    want = {int(r.doc_id): (len(pat.findall(r.text)),
                            len(r.text) - len(pat.sub(cp.SCRUB_REPL,
                                                      r.text)),
                            pat.sub(cp.SCRUB_REPL, r.text))
            for _, r in pdf.iterrows()}

    src = tmp_path / "arrivals"
    src.mkdir()
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        str(src / "b0"))
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        str(src / "b1"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    out = ps.streaming_scrub_events(stream)
    q = (out.writeStream.format("memory").queryName("scrub_events")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        ev = spark.sql("SELECT * FROM scrub_events").toPandas()
    finally:
        q.stop()
    got = {int(r.doc_id): (int(r.n_hits), int(r.chars_delta),
                           r.text_clean)
           for _, r in ev.iterrows()}
    assert got == want
    assert sum(v[0] for v in want.values()) > 0
