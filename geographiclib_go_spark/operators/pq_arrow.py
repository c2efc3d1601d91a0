"""IVF-PQ at REALISTIC parameters (ksub=256, m=16 in the registered
query's shape, k-means-trained
codebooks) — the scale path VERDICT r4 asked for to replace the
literal-expression toy quantizer in operators/pq.py.

Why a second implementation: pq.py inlines its codebooks as Catalyst
literal expressions, which is elegant (whole-stage codegen, DuckDB
replay) but the per-row cost and codegen size grow O(m*ksub) — fine
at ksub=16, hopeless at the FAISS-standard ksub=256.  Here the
codebooks live as numpy arrays shipped once into Arrow-batched
kernels (mapInPandas over the task-broadcast closure — the
standard Spark mechanism for sub-megabyte read-only state;
16x256x4 int64 = 128 KB):

- **train** (train_codebooks_kmeans): per-subspace Lloyd k-means in
  exact int64 arithmetic (floor-div centroid updates, argmin ties to
  the lowest code id, empty clusters keep their previous centroid)
  over a BOUNDED deterministic sample — the FAISS convention (PQ
  training never scans the corpus).  Driver-side numpy on <= train_n
  rows; deterministic, so the engine and any replay train the exact
  same books.
- **encode** (ivfpq_encode_arrow): one map-only Arrow stage; each
  batch finds the nearest coarse cell, then quantizes the RESIDUAL
  x - seeds[cell] — the FAISS IndexIVFPQ default, and the step that
  makes ksub=256 resolve WITHIN-cluster distances instead of
  spending its codes re-describing cluster centers (the flat-PQ
  variant measured recall@10 ~0.19 on the clustered corpus; the
  residual path's gate is in tests/test_pq.py).  Argmins use the
  ||x||^2 + ||c||^2 - 2 x.c matmul expansion — exact in int64 (all
  magnitudes bounded by the generator/QSCALE envelope, see
  sources/vectors.py).  Output (vid, cell, code array<int>) is the
  write-once index snapshot, PARTITIONED BY cell: 1 byte per
  sub-space per vector at scale.
- **probe** (ivfpq_topk_arrow): queries are a bounded frame; their
  per-(query, cell) residual ADC lookup tables (n_q x n_cells x m x
  ksub int64 — 16 MB dense at the fixture shape; at scale slice to
  the probed cells) and nprobe nearest cells are computed
  driver-side in numpy, the (qid, cell) probe pairs ship as a
  broadcast JVM LocalRelation (functions/localdf), the equi-join on
  cell partition-prunes the snapshot, and survivors are scored by
  ONE Arrow kernel doing a fancy-indexed LUT gather —
  lut[qid, cell, j, code_j] summed over j — then ranked by the
  standard streaming window top-k.

Everything stays exact int64 end to end, so an independent numpy
replay (scripts/build_fixtures.build_pq256_topk; the committed
fixture parquet is the DuckDB oracle) reproduces encode, probe, and
ranking bit-identically.  Recall vs the exact integer-L2 brute force
is gated in tests/test_pq.py.

Reference scope note: the geodesic reference (geographiclib-go) has
no ANN surface; this operator is engine-added LLM-data-layer work
(SURVEY.md §2 "beyond the reference"), patterned on Jegou et al.,
"Product Quantization for Nearest Neighbor Search" (TPAMI 2011) and
the FAISS IndexIVFPQ design.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["train_codebooks_kmeans", "train_coarse_kmeans",
           "kmeans_int", "ivfpq_encode_arrow", "pq_luts",
           "coarse_probes", "ivfpq_topk_arrow", "ivfpq_rerank_topk",
           "numpy_encode", "numpy_adc_topk", "numpy_rerank_topk"]


# --------------------------------------------------------------------------
# exact-integer k-means (driver-side numpy, bounded sample)
# --------------------------------------------------------------------------

def _sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, k) exact int64 squared L2 via the matmul expansion.
    Inputs must be int64; all magnitudes are bounded by the
    generator envelope so no intermediate can overflow."""
    x = x.astype(np.int64, copy=False)
    c = c.astype(np.int64, copy=False)
    x2 = (x * x).sum(axis=1, dtype=np.int64)[:, None]
    c2 = (c * c).sum(axis=1, dtype=np.int64)[None, :]
    xc = x @ c.T
    return x2 + c2 - 2 * xc


def kmeans_int(sample: np.ndarray, k: int, iters: int) -> np.ndarray:
    """(k, d) int64 centroids: Lloyd with floor-div updates, argmin
    ties to the lowest centroid id (np.argmin first-min), empty
    clusters keep their previous centroid.  Init = the first k
    sample rows (the engine's seed-row convention)."""
    sample = sample.astype(np.int64, copy=False)
    if sample.shape[0] < k:
        raise ValueError(
            f"k-means needs >= k training rows: got {sample.shape[0]} "
            f"< k={k} (raise train_n or lower ksub/n_cells)")
    cents = sample[:k].copy()
    for _ in range(iters):
        assign = np.argmin(_sq_dists(sample, cents), axis=1)
        # vectorized exact update: per-cluster int64 sums via
        # scatter-add, floor-div means; empty clusters keep their
        # previous centroid (same math as the per-cluster loop, ~50x
        # faster at ksub=256)
        sums = np.zeros((k, sample.shape[1]), np.int64)
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        nz = counts > 0
        cents[nz] = sums[nz] // counts[nz, None]
    return cents


def train_codebooks_kmeans(sample: np.ndarray, m: int, ksub: int,
                           iters: int = 4,
                           seeds: np.ndarray = None) -> np.ndarray:
    """(m, ksub, sub) int64 codebooks: independent k-means per
    subspace over the bounded training sample.  When the coarse
    quantizer `seeds` is given, training runs on the RESIDUALS
    sample - seeds[nearest_cell] (the FAISS IVF-PQ convention — the
    codebook must model what the encoder will quantize)."""
    if seeds is not None:
        cell = np.argmin(_sq_dists(sample.astype(np.int64),
                                   seeds.astype(np.int64)), axis=1)
        sample = sample.astype(np.int64) - seeds[cell].astype(np.int64)
    n, dim = sample.shape
    sub = dim // m
    return np.stack([
        kmeans_int(sample[:, j * sub:(j + 1) * sub], ksub, iters)
        for j in range(m)])


def train_coarse_kmeans(sample: np.ndarray, n_cells: int,
                        iters: int = 4) -> np.ndarray:
    """(n_cells, dim) int64 coarse-quantizer centroids."""
    return kmeans_int(sample, n_cells, iters)


# --------------------------------------------------------------------------
# numpy reference kernels (shared by the Arrow stages AND the
# independent fixture replay — one definition of the math)
# --------------------------------------------------------------------------

def numpy_encode(x: np.ndarray, books: np.ndarray,
                 seeds: np.ndarray) -> tuple:
    """(cell (n,), codes (n, m)) for int64 vectors x: nearest coarse
    cell, then the RESIDUAL x - seeds[cell] quantized per
    subspace."""
    m, ksub, sub = books.shape
    x = x.astype(np.int64, copy=False)
    seeds = seeds.astype(np.int64, copy=False)
    cell = np.argmin(_sq_dists(x, seeds), axis=1).astype(np.int32)
    res = x - seeds[cell]
    codes = np.empty((x.shape[0], m), np.int32)
    for j in range(m):
        d = _sq_dists(res[:, j * sub:(j + 1) * sub], books[j])
        codes[:, j] = np.argmin(d, axis=1)
    return cell, codes


def numpy_adc_topk(q: np.ndarray, books: np.ndarray, seeds: np.ndarray,
                   cell: np.ndarray, codes: np.ndarray,
                   k: int, nprobe: int) -> list:
    """[(qid, vec_id, adc, rank)] — the full IVF-PQ probe replayed in
    numpy over a pre-encoded corpus, with per-(query, cell) residual
    LUTs.  Ranking ties (equal adc) break to the lower vec_id, same
    as the engine's window order."""
    m, ksub, sub = books.shape
    q = q.astype(np.int64, copy=False)
    seeds = seeds.astype(np.int64, copy=False)
    jj = np.arange(m)[None, :]
    out = []
    for qid in range(q.shape[0]):
        probe = np.argsort(_sq_dists(q[qid:qid + 1], seeds)[0],
                           kind="stable")[:nprobe]
        mask = np.isin(cell, probe)
        cand = np.nonzero(mask)[0]
        lutv = np.zeros((seeds.shape[0], m, ksub), np.int64)
        for c in probe:
            r = q[qid] - seeds[c]
            lutv[c] = np.stack([
                _sq_dists(r[None, j * sub:(j + 1) * sub],
                          books[j])[0] for j in range(m)])
        adc = lutv[cell[cand][:, None], jj, codes[cand]].sum(
            axis=1, dtype=np.int64)
        order = np.lexsort((cand, adc))[:k]
        out.extend((qid, int(cand[i]), int(adc[i]), r + 1)
                   for r, i in enumerate(order))
    return out


# --------------------------------------------------------------------------
# Arrow stages
# --------------------------------------------------------------------------

def ivfpq_encode_arrow(vecs: DataFrame, books: np.ndarray,
                       seeds: np.ndarray) -> DataFrame:
    """(vid, cell, code array<int>): the compressed index, one
    map-only Arrow stage (numpy matmul argmin per batch).  At scale
    this frame is the persisted artifact, PARTITIONED BY cell."""
    b = books.astype(np.int64)
    s = seeds.astype(np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            cell, codes = numpy_encode(x, b, s)
            yield pd.DataFrame({
                "vid": pdf["vid"].to_numpy(np.int64),
                "cell": cell,
                "code": list(codes)})

    return vecs.select("vid", "q").mapInPandas(
        run, "vid long, cell int, code array<int>")


def coarse_probes(q: np.ndarray, seeds: np.ndarray,
                  nprobe: int) -> np.ndarray:
    """(n_q, nprobe) int32 nearest coarse cells per query (exact int
    L2, ties to the lower cell — stable argsort)."""
    d = _sq_dists(q, seeds.astype(np.int64))
    return np.argsort(d, axis=1, kind="stable")[:, :nprobe] \
        .astype(np.int32)


def pq_luts(q: np.ndarray, books: np.ndarray, seeds: np.ndarray,
            probes: np.ndarray):
    """Compact residual ADC lookup tables: an (n_q * nprobe, m, ksub)
    int64 block — one row per PROBED (query, cell) pair — plus an
    (n_q, n_cells) int32 row map (-1 for unprobed cells, which the
    scoring kernel can never see: candidates only arrive through the
    broadcast (qid, cell) probe join).
    luts[rowmap[qid, c], j, k] = ||(q_qid - seeds[c])_sub_j - books[j][k]||^2.
    The compact block is what ships in the mapInPandas closure —
    n_q*nprobe rows instead of a dense n_q*n_cells cube (~8x smaller
    at the registered nprobe=8/n_cells=64 shape, and INDEPENDENT of
    n_cells, so a cluster-scale deployment with thousands of cells
    pays only for what it probes); the gather stays O(1) via the
    tiny row map."""
    m, ksub, sub = books.shape
    q = q.astype(np.int64, copy=False)
    seeds = seeds.astype(np.int64, copy=False)
    n_q, nprobe = probes.shape
    luts = np.zeros((n_q * nprobe, m, ksub), np.int64)
    rowmap = np.full((n_q, seeds.shape[0]), -1, np.int32)
    row = 0
    for qid in range(n_q):
        for c in probes[qid]:
            r = q[qid] - seeds[c]
            luts[row] = np.stack([
                _sq_dists(r[None, j * sub:(j + 1) * sub],
                          books[j])[0] for j in range(m)])
            rowmap[qid, c] = row
            row += 1
    return luts, rowmap


def _adc_scored(spark: SparkSession, encoded: DataFrame,
                q: np.ndarray, books: np.ndarray,
                seeds: np.ndarray, nprobe: int) -> DataFrame:
    """(qid, vec_id, adc) for every candidate in each query's nprobe
    cells: broadcast the (qid, cell) probe pairs (JVM LocalRelation),
    equi-join on cell (static INSET partition prune + partition-
    pruned read of the cell-partitioned snapshot), score survivors
    with ONE Arrow LUT-gather kernel.  Shared by the top-k and
    re-rank probes."""
    from geographiclib_go_spark.functions.localdf import literal_df

    probes = coarse_probes(q.astype(np.int64), seeds, nprobe)
    luts, rowmap = pq_luts(q.astype(np.int64),
                           books.astype(np.int64), seeds, probes)
    pairs = [(qid, int(c))
             for qid in range(q.shape[0]) for c in probes[qid]]
    pframe = literal_df(spark, pairs, "qid int, cell int")

    # the probed cell set is driver-known — push it as a STATIC
    # partition filter so the cell-partitioned snapshot scan prunes
    # at planning time (the equi-join alone leaves pruning to DPP's
    # discretion); semantically a no-op on top of the join
    needed = sorted({c for _, c in pairs})
    cand = (encoded.filter(F.col("cell").isin(needed))
            .join(F.broadcast(pframe), "cell")
            .select("qid", "cell",
                    F.col("vid").alias("vec_id"), "code"))
    m = books.shape[0]
    jj = np.arange(m)[None, :]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["code"].to_numpy()).astype(np.int64)
            qids = pdf["qid"].to_numpy(np.int64)
            cells = pdf["cell"].to_numpy(np.int64)
            rows = rowmap[qids, cells]
            adc = luts[rows[:, None], jj, codes].sum(
                axis=1, dtype=np.int64)
            yield pd.DataFrame({
                "qid": qids,
                "vec_id": pdf["vec_id"].to_numpy(np.int64),
                "adc": adc})

    return cand.mapInPandas(score, "qid long, vec_id long, adc long")


def ivfpq_topk_arrow(spark: SparkSession, encoded: DataFrame,
                     q: np.ndarray, books: np.ndarray,
                     seeds: np.ndarray, k: int,
                     nprobe: int) -> DataFrame:
    """IVF-PQ probe against the encoded snapshot, ranked by ADC with
    the streaming window top-k.  Returns (qid, vec_id, adc, rank)."""
    scored = _adc_scored(spark, encoded, q, books, seeds, nprobe)
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(),
                                          F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id", "adc", "rank"))


def ivfpq_rerank_topk(spark: SparkSession, encoded: DataFrame,
                      vecs: DataFrame, q: np.ndarray,
                      books: np.ndarray, seeds: np.ndarray,
                      k: int, rerank: int, nprobe: int) -> DataFrame:
    """Two-stage ANN — the production FAISS shape: the compressed
    index nominates an ADC top-`rerank` shortlist per query (cheap,
    memory-resident codes), then the shortlist's RAW vectors are
    fetched by id (a bounded rerank x n_q semi-join against the
    vector table — at 10^12 rows this touches `rerank` rows per
    query, not the corpus) and re-ranked by exact integer L2.
    Returns (qid, vec_id, dist, rank), ties to the lower vec_id.
    Measured on the 100k fixture corpus: recall@10 vs exact brute
    force 0.61 (ADC only) -> 0.99 @ rerank=50 -> 1.00 @ rerank=100
    (gated in tests/test_pq.py)."""
    scored = _adc_scored(spark, encoded, q, books, seeds, nprobe)
    wa = Window.partitionBy("qid").orderBy(F.col("adc").asc(),
                                           F.col("vec_id").asc())
    short = (scored.withColumn("r", F.row_number().over(wa))
             .filter(F.col("r") <= rerank)
             .select("qid", "vec_id"))
    fetched = short.join(
        vecs.select(F.col("vid").alias("vec_id"), "q"), "vec_id")
    qm = q.astype(np.int64)

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            qids = pdf["qid"].to_numpy(np.int64)
            d = qm[qids] - x
            yield pd.DataFrame({
                "qid": qids,
                "vec_id": pdf["vec_id"].to_numpy(np.int64),
                "dist": (d * d).sum(axis=1, dtype=np.int64)})

    rescored = fetched.mapInPandas(
        exact, "qid long, vec_id long, dist long")
    we = Window.partitionBy("qid").orderBy(F.col("dist").asc(),
                                           F.col("vec_id").asc())
    return (rescored.withColumn("rank", F.row_number().over(we))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id", "dist", "rank"))


def numpy_rerank_topk(q: np.ndarray, x: np.ndarray,
                      books: np.ndarray, seeds: np.ndarray,
                      cell: np.ndarray, codes: np.ndarray,
                      k: int, rerank: int, nprobe: int) -> list:
    """[(qid, vec_id, dist, rank)] — the two-stage probe replayed in
    numpy: ADC shortlist (same ranking as numpy_adc_topk), exact
    integer re-rank."""
    short = numpy_adc_topk(q, books, seeds, cell, codes,
                           rerank, nprobe)
    q = q.astype(np.int64, copy=False)
    by_q = {}
    for qid, vid, _, _ in short:
        by_q.setdefault(qid, []).append(vid)
    out = []
    for qid in sorted(by_q):
        cand = np.array(sorted(by_q[qid]), np.int64)
        d = q[qid] - x[cand].astype(np.int64)
        dist = (d * d).sum(axis=1, dtype=np.int64)
        order = np.lexsort((cand, dist))[:k]
        out.extend((qid, int(cand[i]), int(dist[i]), r + 1)
                   for r, i in enumerate(order))
    return out
