"""Checkpoint recovery for the streaming ingest gates (VERDICT r4
item 4): the seven gates are batch-parity-tested, but resumability is
a north-rule requirement (BASELINE.json) and until r5 nothing ever
KILLED a stream mid-flight.  These tests run a gate with a real
checkpointLocation + exactly-once file sink, stop the query between
micro-batches, restart it from the same checkpoint, and assert the
final event set equals the batch twin exactly — no loss (the
checkpoint resumes from the unprocessed file), no dupes (the sink's
_spark_metadata commit log masks any replayed output).
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from geographiclib_go_spark.operators import dedup as ded
from geographiclib_go_spark.operators import sampling as smp
from geographiclib_go_spark.sources import images as im
from geographiclib_go_spark.streaming import polygon_stream as ps


def _run_until_drained(build_query, sink, checkpoint):
    """Start the gate's writeStream (parquet sink, checkpointed),
    drain everything available, stop."""
    q = (build_query()
         .writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination(120)
    finally:
        q.stop()


def test_ingest_dedup_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_ingest_dedup_events killed after micro-batch 1 and
    restarted from its checkpoint must classify EVERY batch doc like
    queries.docs_incremental_dedup — the restart neither drops the
    unprocessed arrivals nor duplicates the committed events."""
    from geographiclib_go_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    lab = smp.assign_split(docs, "doc_id",
                           weights={"corpus": 0.8, "batch": 0.2},
                           salt="ingest:")
    corpus = lab.filter(F.col("split") == "corpus")
    batch = lab.filter(F.col("split") == "batch").select("doc_id",
                                                         "text")

    corpus_md5 = corpus.select(F.md5("text").alias("_h")).distinct()
    corpus_bands = ded.minhash_band_table(corpus, num_hashes=64,
                                          bands=8)
    corpus_texts = corpus.select("doc_id", "text")
    stat = {}
    for df, name in ((corpus_md5, "md5"), (corpus_bands, "bands"),
                     (corpus_texts, "texts")):
        df.write.mode("overwrite").parquet(str(tmp_path / name))
        stat[name] = spark.read.parquet(str(tmp_path / name))

    src = tmp_path / "arrivals"
    src.mkdir()
    pdf = batch.orderBy("doc_id").toPandas()
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_ingest_dedup_events(
            stream, stat["md5"], stat["bands"], stat["texts"],
            threshold=0.8, num_hashes=64, bands=8)

    # leg 1: only b0 exists; drain, then the query is STOPPED
    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()

    # b1 arrives while no query is running
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        str(src / "b1"))

    # leg 2: a NEW query object restarts from the same checkpoint
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert len(ev) > leg1  # the restart actually processed b1

    exact_ids = set(ev[ev.kind == "exact"].doc_id)
    near_ids = set(ev[ev.kind == "near"].doc_id) - exact_ids
    got = {int(d): ("exact_dup" if d in exact_ids
                    else "near_dup" if d in near_ids else "new")
           for d in pdf.doc_id}
    want = {r["doc_id"]: r["status"]
            for r in Q.docs_incremental_dedup(spark, sf).collect()}
    assert got == want

    # no loss / no dupes, stated precisely: the kill-and-restart
    # run's event MULTISET equals an uninterrupted run's over the
    # same arrivals (multi-band collision repeats are part of the
    # gate's documented contract, so per-row uniqueness is NOT the
    # invariant — a replayed micro-batch, however, would double its
    # whole contribution and break multiset equality)
    sink2 = str(tmp_path / "sink_oneshot")
    ckpt2 = str(tmp_path / "ckpt_oneshot")
    _run_until_drained(build, sink2, ckpt2)
    one = spark.read.parquet(sink2).toPandas()
    key = lambda df: sorted(  # noqa: E731
        (int(r.doc_id), r.kind,
         -1 if r.matched_id is None or r.matched_id != r.matched_id
         else int(r.matched_id),
         round(-1.0 if r.jaccard is None or r.jaccard != r.jaccard
               else float(r.jaccard), 9))
        for r in df.itertuples(index=False))
    assert key(ev) == key(one)


def test_corridor_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_corridor_events killed between micro-batches and
    restarted from its checkpoint must emit exactly the batch
    corridor query's (image_id, seg, dist_r) set — no loss, no
    dupes."""
    from geographiclib_go_spark import queries as Q

    want = {(r.image_id, int(r.seg), float(r.dist_r))
            for r in Q.route_corridor_images(spark, None).collect()}

    import pandas as pd

    n = Q._IMG_QUERY_N
    ids = np.arange(n, dtype=np.uint64)
    ph = im.phash_for_ids(ids)
    lat, lon = im.latlon_for_ids(ids, ph)
    pdf = pd.DataFrame({
        "image_id": [f"img_{int(i):012d}" for i in ids],
        "lat": np.asarray(lat, np.float64),
        "lon": np.asarray(lon, np.float64)})
    src = tmp_path / "arrivals"
    src.mkdir()
    half = n // 2
    schema = "image_id string, lat double, lon double"
    spark.createDataFrame(pdf.iloc[:half], schema) \
        .coalesce(1).write.parquet(str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_corridor_events(
            stream, Q._ROUTE_LATS, Q._ROUTE_LONS,
            Q._CORRIDOR_M, Q._CORRIDOR_RES)

    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()

    spark.createDataFrame(pdf.iloc[half:], schema) \
        .coalesce(1).write.parquet(str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert leg1 < len(ev)
    got = {(r.image_id, int(r.seg), float(r.dist_r))
           for _, r in ev.iterrows()}
    assert got == want
    assert len(got) == len(ev)  # exactly-once: no duplicate rows


def test_pq256_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_pq256_near_dup_events killed between micro-batches
    and restarted from its checkpoint must emit exactly the
    independent numpy replay's (qid, vec_id, adc) event set over ALL
    arrivals — the vector-ingest face gets the same no-loss/no-dupes
    guarantee as the text and corridor gates."""
    from geographiclib_go_spark.operators import pq_arrow as pqa
    from geographiclib_go_spark.sources import vectors as vx

    n, dim, m, ksub, cells, nprobe = 2000, 64, 16, 32, 8, 3
    sample = vx.q_for_ids(np.arange(512), dim)
    seeds = pqa.train_coarse_kmeans(sample, cells, 2)
    books = pqa.train_codebooks_kmeans(sample, m, ksub, 2,
                                       seeds=seeds)
    enc = pqa.ivfpq_encode_arrow(
        vx.generate_vectors(spark, n, dim), books, seeds)
    enc.write.mode("overwrite").parquet(str(tmp_path / "enc"))
    encoded = spark.read.parquet(str(tmp_path / "enc"))

    import pandas as pd

    arr_ids = np.arange(n, n + 30)
    ax = vx.q_for_ids(arr_ids, dim)
    pdf = pd.DataFrame({"vid": arr_ids.astype(np.int64),
                        "q": list(ax)})

    # numpy replay over ALL arrivals: per vector, candidates from its
    # nprobe cells, exact reconstruction distance
    x = vx.q_for_ids(np.arange(n), dim)
    cell, codes = pqa.numpy_encode(x, books, seeds)
    b, s = books.astype(np.int64), seeds.astype(np.int64)
    sub = dim // m
    recon = s[cell].copy()
    for j in range(m):
        recon[:, j * sub:(j + 1) * sub] += b[j][codes[:, j]]
    probes = pqa.coarse_probes(ax, s, nprobe)
    want, adcs = set(), []
    for t, qid in enumerate(arr_ids):
        cand = np.nonzero(np.isin(cell, probes[t]))[0]
        d = ax[t] - recon[cand]
        adc = (d * d).sum(axis=1, dtype=np.int64)
        adcs.extend(adc.tolist())
        for i, a in zip(cand, adc):
            want.add((int(qid), int(i), int(a)))
    max_adc = int(np.quantile(np.array(adcs), 0.05))
    want = {w for w in want if w[2] <= max_adc}
    assert want

    src = tmp_path / "arrivals"
    src.mkdir()
    spark.createDataFrame(pdf.iloc[:15]).coalesce(1).write.parquet(
        str(src / "b0"))
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema("vid long, q array<long>")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_pq256_near_dup_events(
            stream, encoded, books, seeds, max_adc=max_adc,
            nprobe=nprobe)

    # leg 1: drain b0, STOP; b1 lands while nothing runs; restart
    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()
    spark.createDataFrame(pdf.iloc[15:]).coalesce(1).write.parquet(
        str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert len(ev) > leg1
    got = {(int(r.qid), int(r.vec_id), int(r.adc))
           for _, r in ev.iterrows()}
    assert got == want
    assert len(got) == len(ev)  # exactly-once: no duplicate rows


def test_image_embed_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_image_embed_events — the decode->embed->IVF-probe
    ingest face — killed between micro-batches and restarted from its
    checkpoint must emit exactly the independent numpy replay's
    (image_id, matched_id, ssd) event set over ALL arrivals: the
    restart neither re-decodes committed arrivals (no dupes) nor
    drops the file that landed while the query was down (no loss)."""
    from geographiclib_go_spark.operators import multimodal as mm
    from geographiclib_go_spark.operators import similarity as sim

    n, split, max_ssd, nprobe = 1400, 1000, 200_000, 3
    seeds = np.array([13, 157, 311, 487, 601, 733, 859, 977])
    X = im.pixel_embed_for_ids(
        np.arange(n, dtype=np.uint64)).astype(np.int64)
    cent = X[seeds]

    idx = (mm.pixel_embeddings(im.generate_images(spark, split))
           .withColumn("cluster", sim.int_ivf_clusters(cent)))
    idx.write.mode("overwrite").partitionBy("cluster") \
        .parquet(str(tmp_path / "ivf_idx"))
    index = spark.read.parquet(str(tmp_path / "ivf_idx"))

    def order(V, top):
        d = ((V[:, None, :].astype(object)
              - cent[None, :, :].astype(object)) ** 2).sum(axis=2)
        return np.argsort(d, axis=1, kind="stable")[:, :top]

    ca = order(X[:split], 1)[:, 0]
    qa = order(X[split:], nprobe)
    want = set()
    for qi in range(n - split):
        cand = np.where(np.isin(ca, qa[qi]))[0]
        ssd = ((X[split + qi].astype(object)
                - X[cand].astype(object)) ** 2).sum(axis=1)
        for ci, s in zip(cand[ssd <= max_ssd], ssd[ssd <= max_ssd]):
            want.add((f"img_{split + qi:012d}", f"img_{ci:012d}",
                      int(s)))
    assert want

    arrivals = im.generate_images(spark, n).filter(
        F.substring("image_id", 5, 12).cast("long") >= split)
    src = tmp_path / "arrivals"
    src.mkdir()
    arrivals.filter(F.substring("image_id", 5, 12).cast("long")
                    < 1200).coalesce(1).write.parquet(str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema(im.IMAGES_SCHEMA)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_image_embed_events(
            stream, index, cent, max_ssd=max_ssd, nprobe=nprobe)

    # leg 1: drain b0, STOP; b1 lands while nothing runs; restart
    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()
    arrivals.filter(F.substring("image_id", 5, 12).cast("long")
                    >= 1200).coalesce(1).write.parquet(str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert len(ev) > leg1
    got = {(r.image_id, r.matched_id, int(r.ssd))
           for _, r in ev.iterrows()}
    assert got == want
    assert len(got) == len(ev)  # exactly-once: no duplicate rows


def test_decontaminate_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_decontaminate_events killed between micro-batches and
    restarted from its checkpoint must emit exactly the (doc_id, gram)
    multiset an uninterrupted run emits over the same arrivals, and
    flag exactly the docs a pure-python brute force flags — the
    stream-static snapshot probe resumes with no loss and no dupes."""
    from geographiclib_go_spark.operators import corpus as cp

    sf = "/root/testdata/sf0.001"
    pdf = (spark.read.parquet(f"{sf}/documents.parquet")
           .select("doc_id", "text").toPandas())

    def grams(text):
        tok = text.strip().split(" ")
        n = cp.DECON_NGRAM
        return [" ".join(tok[i:i + n]) for i in range(len(tok) - n + 1)]

    eval_grams = set()
    for _, r in pdf[pdf.doc_id % cp.DECON_EVAL_MOD == 0].iterrows():
        eval_grams.update(grams(r.text))
    train = pdf[pdf.doc_id % cp.DECON_EVAL_MOD != 0][
        ["doc_id", "text"]].reset_index(drop=True)
    want_dirty = {int(r.doc_id) for _, r in train.iterrows()
                  if any(g in eval_grams for g in grams(r.text))}
    assert len(want_dirty) > 0

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    grams_path = str(tmp_path / "eval_grams")
    cp.eval_grams(docs).write.parquet(grams_path)
    stat_grams = spark.read.parquet(grams_path)

    src = tmp_path / "arrivals"
    src.mkdir()
    half = len(train) // 2
    spark.createDataFrame(train.iloc[:half]).coalesce(1).write.parquet(
        str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_decontaminate_events(stream, stat_grams)

    # leg 1: only b0 exists; drain, STOP
    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()

    # b1 arrives while no query runs; restart from the same checkpoint
    spark.createDataFrame(train.iloc[half:]).coalesce(1).write.parquet(
        str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert leg1 < len(ev)
    assert set(int(d) for d in ev.doc_id) == want_dirty
    assert set(ev.gram) <= eval_grams

    # multiset equality vs an uninterrupted run (a doc can hit the
    # same gram in several windows ONCE per distinct (doc, gram) pair
    # per emission contract — whatever the contract emits, a replayed
    # micro-batch would double its contribution)
    sink2 = str(tmp_path / "sink_oneshot")
    ckpt2 = str(tmp_path / "ckpt_oneshot")
    _run_until_drained(build, sink2, ckpt2)
    one = spark.read.parquet(sink2).toPandas()
    key = lambda df: sorted(  # noqa: E731
        (int(r.doc_id), r.gram) for r in df.itertuples(index=False))
    assert key(ev) == key(one)


def test_scrub_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_scrub_events (stateless map-only redaction) killed
    between micro-batches and restarted must produce exactly one
    event per arriving doc with the same redactions an uninterrupted
    run produces — the file-sink commit log masks any replay."""
    sf = "/root/testdata/sf0.001"
    pdf = (spark.read.parquet(f"{sf}/documents.parquet")
           .select("doc_id", "text").toPandas())

    src = tmp_path / "arrivals"
    src.mkdir()
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_scrub_events(stream)

    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()
    assert leg1 == half

    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert len(ev) == len(pdf)          # exactly one event per doc
    assert ev.doc_id.is_unique          # no replayed micro-batch

    sink2 = str(tmp_path / "sink_oneshot")
    ckpt2 = str(tmp_path / "ckpt_oneshot")
    _run_until_drained(build, sink2, ckpt2)
    one = spark.read.parquet(sink2).toPandas()
    key = lambda df: sorted(  # noqa: E731
        (int(r.doc_id), int(r.n_hits), int(r.chars_delta), r.text_clean)
        for r in df.itertuples(index=False))
    assert key(ev) == key(one)


def test_image_dedup_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_image_dedup_events (phash pigeonhole probe of the
    persisted corpus chunk table) killed between micro-batches and
    restarted from its checkpoint emits exactly an uninterrupted
    run's event multiset — the image-axis ingest gate resumes with
    no loss and no dupes."""
    from geographiclib_go_spark.operators import dedup as ded

    n, split = 1200, 1000
    ids = np.arange(n, dtype=np.uint64)
    ph = im.phash_for_ids(ids)
    corpus_ph = np.unique(ph[:split])
    batch = [(f"img_{i:012d}", int(ph[i])) for i in range(split, n)]

    chunks = ded.hamming_chunk_table(
        spark.createDataFrame(
            [(int(p),) for p in corpus_ph], "phash long"),
        sig_col="phash", id_col="phash", max_hamming=4)
    chunks.write.mode("overwrite").parquet(str(tmp_path / "chunks"))
    corpus_chunks = spark.read.parquet(str(tmp_path / "chunks"))

    src = tmp_path / "arrivals"
    src.mkdir()
    half = len(batch) // 2
    spark.createDataFrame(batch[:half], "image_id string, phash long") \
        .coalesce(1).write.parquet(str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream
                  .schema("image_id string, phash long")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_image_dedup_events(stream, corpus_chunks,
                                               max_hamming=4)

    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()

    spark.createDataFrame(batch[half:], "image_id string, phash long") \
        .coalesce(1).write.parquet(str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert leg1 < len(ev)

    sink2 = str(tmp_path / "sink_oneshot")
    ckpt2 = str(tmp_path / "ckpt_oneshot")
    _run_until_drained(build, sink2, ckpt2)
    one = spark.read.parquet(sink2).toPandas()
    key = lambda df: sorted(  # noqa: E731
        (r.image_id, int(r.matched_phash), int(r.hamming))
        for r in df.itertuples(index=False))
    assert key(ev) == key(one)
    # exact dups really are exact: every hamming-0 event's phash is
    # in the corpus
    zero = ev[ev.hamming == 0]
    assert set(int(p) for p in zero.matched_phash) <= set(
        int(p) for p in corpus_ph)


def test_vector_qa_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_vector_qa_events (stateless per-vector QA) killed
    between micro-batches and restarted emits exactly one decision
    row per arriving vector, equal to an uninterrupted run's."""
    sf = "/root/testdata/sf0.001"
    pdf = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())

    src = tmp_path / "arrivals"
    src.mkdir()
    half = len(pdf) // 2
    schema = "vec_id long, embedding array<float>"
    spark.createDataFrame(pdf.iloc[:half], schema) \
        .coalesce(1).write.parquet(str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_vector_qa_events(stream)

    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()
    assert leg1 == half

    spark.createDataFrame(pdf.iloc[half:], schema) \
        .coalesce(1).write.parquet(str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink).toPandas()
    assert len(ev) == len(pdf)
    assert ev.vec_id.is_unique

    sink2 = str(tmp_path / "sink_oneshot")
    ckpt2 = str(tmp_path / "ckpt_oneshot")
    _run_until_drained(build, sink2, ckpt2)
    one = spark.read.parquet(sink2).toPandas()
    key = lambda df: sorted(  # noqa: E731
        (int(r.vec_id), int(r.n2), int(r.qmax),
         bool(r.norm_ok), bool(r.spiky))
        for r in df.itertuples(index=False))
    assert key(ev) == key(one)


def test_bpe_tokenize_gate_recovers_from_checkpoint(spark, tmp_path):
    """streaming_bpe_tokenize_events killed between micro-batches and
    restarted from its checkpoint must emit exactly the per-word
    event multiset an uninterrupted run emits over the same arrivals
    — folded per doc, exactly the batch doc_bpe_apply counts — so
    the persisted-vocab probe resumes with no loss and no dupes."""
    from geographiclib_go_spark.operators import bpe

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    vpath = str(tmp_path / "vocab")
    bpe.train_vocab(docs, 20).write.parquet(vpath)
    vocab = spark.read.parquet(vpath)
    batch = sorted(map(tuple,
                       bpe.apply_bpe(docs, vocab).collect()))

    pdf = docs.select("doc_id", "text").toPandas()
    src = tmp_path / "arrivals"
    src.mkdir()
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        str(src / "b0"))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def build():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        return ps.streaming_bpe_tokenize_events(stream, vocab)

    # leg 1: only b0 exists; drain, STOP
    _run_until_drained(build, sink, ckpt)
    leg1 = spark.read.parquet(sink).count()

    # b1 arrives while no query runs; restart from the checkpoint
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        str(src / "b1"))
    _run_until_drained(build, sink, ckpt)

    ev = spark.read.parquet(sink)
    assert leg1 < ev.count()
    folded = sorted(map(tuple, ev.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_syms").alias("n_tokens"),
        F.sum(F.length("w")).cast("long").alias("n_chars"))
        .collect()))
    assert folded == batch

    # multiset equality vs an uninterrupted run
    sink2 = str(tmp_path / "sink_oneshot")
    ckpt2 = str(tmp_path / "ckpt_oneshot")
    _run_until_drained(build, sink2, ckpt2)
    key = lambda df: sorted(  # noqa: E731
        (int(r.doc_id), r.w, int(r.n_syms))
        for r in df.toPandas().itertuples(index=False))
    assert key(ev) == key(spark.read.parquet(sink2))
