"""Product-quantization ANN (IVF-PQ): the 100-TB memory-bound scale
path that plain IVF (operators/similarity.py) still lacks — the
corpus is stored as M small sub-space code ids (here 4 bytes/vector
vs 256 bytes of floats), queries scan codes with per-query lookup
tables (ADC, asymmetric distance computation), and an IVF coarse
quantizer prunes the scan to nprobe cells.  This is the
FAISS IndexIVFPQ shape (Jegou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) re-expressed relationally:

- **train**: codebook for sub-space j = the j-th sub-vectors of the
  ``ksub`` smallest-vid corpus rows (seed-row init, the same
  convention as operators/kmeans.py seed centroids and the IVF seed
  centroids in queries.emb_ivf_topk) — deterministic, re-derivable
  by the SQL oracle from the same parquet.  k-means-refined
  codebooks drop in unchanged (any (m, ksub, sub)-shaped list works).
- **encode** (write-once index): each vector's sub-space slice maps
  to its nearest code by EXACT integer squared-L2 over quantized
  coordinates (kmeans.quantized, scale 1e6), ties to the lower code
  id — one map-only pass, JVM whole-stage codegen (array_min over a
  literal struct array; no Python).  Persist through
  plans/lineage.run_stage partitioned by coarse cell, like the IVF
  index snapshot.
- **probe** (ADC): each query precomputes an M x ksub integer
  distance LUT (on the tiny broadcast query side), candidates cost M
  element_at lookups + (M-1) adds each, then one partial-aggregated
  top-k.  With the coarse quantizer the scan touches only nprobe
  cells — on a cluster a cell-partitioned snapshot makes this a
  partition-pruned read.

Everything after the float->int quantization is exact BIGINT
arithmetic, so encode, probe, and ranking replay bit-identically in
DuckDB (pq_oracle_sql) — the same trick that put iterative k-means
under the full hash gate.  Residual (per-cell re-centered) encoding
is the one FAISS refinement deliberately left out: it multiplies the
codebook tables by n_cells for a recall gain the integer oracle
can't justify here; the docstring-documented drop-in is a
codebooks-per-cell dict.

Reference scope note: the geodesic reference (geographiclib-go) has
no ANN surface; this operator is part of the engine-added LLM-data
layer (SURVEY.md §2 "beyond the reference").

Scale note: the literal-expression codebooks here cap ksub at toy
size (per-row cost and codegen grow O(m*ksub)).  The
realistic-parameter path — ksub=256, m=16, k-means-trained books,
residual encoding, Arrow ADC kernels — is operators/pq_arrow.py
(queries.emb_ivfpq256_topk / emb_ivfpq256_rerank_topk); this module
remains the fully-SQL-replayable small-parameter variant whose every
arithmetic step the DuckDB oracle re-derives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geographiclib_go_spark.operators.kmeans import QSCALE, quantized

__all__ = ["train_codebooks", "coarse_seeds", "pq_encode", "pq_adc_topk",
           "ivfpq_encode", "ivfpq_topk", "pq_oracle_sql", "quantized"]


def _int_l2(a, b):
    """Exact integer squared L2 between two long-array columns."""
    return F.aggregate(F.zip_with(a, b, lambda u, v: (u - v) * (u - v)),
                       F.lit(0).cast("long"), lambda acc, t: acc + t)


def _lit_vec(vals):
    return F.array(*[F.lit(int(v)) for v in vals])


def _sub(col, j: int, sub: int):
    """1-based slice of sub-space j (length `sub`) from a long array."""
    return F.slice(col, j * sub + 1, sub)


def train_codebooks(vecs: DataFrame, m: int, ksub: int,
                    dim: int) -> list[list[list[int]]]:
    """Seed-row codebooks: books[j][k] = sub-vector j of the k-th
    smallest-vid quantized corpus row.  The collect is `ksub` rows
    behind a distributed top-k — bounded regardless of corpus size."""
    sub = dim // m
    rows = (vecs.orderBy("vid").limit(ksub)
            .select("q").collect())
    return [[list(r.q[j * sub:(j + 1) * sub]) for r in rows]
            for j in range(m)]


def coarse_seeds(vecs: DataFrame, n_cells: int,
                 dim: int) -> list[list[int]]:
    """Coarse-quantizer centroids: the n_cells smallest-vid quantized
    rows (full-dimension)."""
    return [list(r.q) for r in
            vecs.orderBy("vid").limit(n_cells).select("q").collect()]


def _argmin_code(qsub, codes) -> "F.Column":
    """Index of the nearest code (exact int L2, ties to lower id)."""
    structs = F.array(*[
        F.struct(_int_l2(qsub, _lit_vec(c)).alias("d"),
                 F.lit(ci).cast("int").alias("k"))
        for ci, c in enumerate(codes)])
    return F.array_min(structs).getField("k")


def pq_encode(vecs: DataFrame, books, dim: int) -> DataFrame:
    """(vid, c0..c{m-1}): the compressed index — one int code per
    sub-space.  Map-only, literal codebooks inlined into codegen."""
    m = len(books)
    sub = dim // m
    return vecs.select(
        "vid",
        *[_argmin_code(_sub(F.col("q"), j, sub), books[j])
          .alias(f"c{j}") for j in range(m)])


def ivfpq_encode(vecs: DataFrame, books, seeds, dim: int) -> DataFrame:
    """pq_encode plus the coarse cell id (nearest coarse seed by
    exact int L2, ties to lower cell).  At scale this frame is the
    persisted artifact, PARTITIONED BY cell."""
    enc = pq_encode(vecs, books, dim)
    cell = F.array_min(F.array(*[
        F.struct(_int_l2(F.col("q"), _lit_vec(s)).alias("d"),
                 F.lit(ci).cast("int").alias("cell"))
        for ci, s in enumerate(seeds)])).getField("cell")
    return vecs.select("vid", cell.alias("cell")).join(enc, "vid")


def _with_luts(queries: DataFrame, books, dim: int,
               qid_col: str = "vid") -> DataFrame:
    """Attach the per-query ADC lookup tables: lut{j}[k] = exact int
    L2 between the query's sub-vector j and code k.  Computed once on
    the (broadcast-sized) query side; candidates only element_at it."""
    m = len(books)
    sub = dim // m
    return queries.select(
        F.col(qid_col).alias("qid"),
        *[F.array(*[_int_l2(_sub(F.col("q"), j, sub), _lit_vec(c))
                    for c in books[j]]).alias(f"lut{j}")
          for j in range(m)])


def _adc(m: int):
    expr = F.element_at(F.col("lut0"), F.col("c0") + 1)
    for j in range(1, m):
        expr = expr + F.element_at(F.col(f"lut{j}"), F.col(f"c{j}") + 1)
    return expr


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(),
                                          F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id", "adc", "rank"))


def pq_adc_topk(encoded: DataFrame, queries: DataFrame, books,
                dim: int, k: int) -> DataFrame:
    """Flat PQ scan (FAISS IndexPQ): broadcast LUT-carrying queries x
    full code table, M lookups per candidate, partial top-k.  Use the
    IVF-pruned form for anything bigger than one executor's scan."""
    m = len(books)
    j = encoded.crossJoin(F.broadcast(_with_luts(queries, books, dim)))
    return _topk(j.select("qid", F.col("vid").alias("vec_id"),
                          _adc(m).alias("adc")), k)


def ivfpq_topk(encoded: DataFrame, queries: DataFrame, books, seeds,
               dim: int, k: int, nprobe: int) -> DataFrame:
    """IVF-PQ probe: each query explodes to its nprobe nearest coarse
    cells (exact int L2, ties to lower cell), equi-joins the code
    table on cell (partition-pruned against a cell-partitioned
    snapshot), then ADC + top-k on the surviving candidates only."""
    m = len(books)
    cells = F.slice(F.array_sort(F.array(*[
        F.struct(_int_l2(F.col("q"), _lit_vec(s)).alias("d"),
                 F.lit(ci).cast("int").alias("cell"))
        for ci, s in enumerate(seeds)])), 1, nprobe)
    q = (_with_luts(queries, books, dim)
         .join(queries.select(F.col("vid").alias("qid"), "q"), "qid")
         .withColumn("cell", F.explode(F.transform(
             cells, lambda s: s.getField("cell"))))
         .drop("q"))
    j = encoded.join(F.broadcast(q), "cell")
    return _topk(j.select("qid", F.col("vid").alias("vec_id"),
                          _adc(m).alias("adc")), k)


def pq_oracle_sql(m: int, ksub: int, dim: int, n_cells: int,
                  nprobe: int, k: int, n_queries: int,
                  table: str = "embeddings", id_col: str = "vec_id",
                  vec_col: str = "embedding") -> str:
    """DuckDB replay of quantize -> seed codebooks/cells -> encode ->
    coarse probe -> ADC top-k, all in exact BIGINT arithmetic.
    Emits (qid, vec_id, adc, rank) like ivfpq_topk."""
    sub = dim // m
    l2 = ("list_sum(list_transform(list_zip({a}, {b}), "
          "x -> (x[1]-x[2])*(x[1]-x[2])))")
    return f"""
WITH vecs AS (
  SELECT {id_col} AS vid,
         [CAST(ROUND(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT)
          for x in {vec_col}] AS q
  FROM {table}
),
subsp AS (SELECT UNNEST(RANGE({m})) AS j),
cb AS (
  SELECT s.j, sd.k, list_slice(sd.q, s.j*{sub}+1, (s.j+1)*{sub}) AS cv
  FROM subsp s,
       (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS INT) AS k, q
        FROM (SELECT vid, q FROM vecs ORDER BY vid LIMIT {ksub})) sd
),
cells AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS INT) AS cell, q AS sv
  FROM (SELECT vid, q FROM vecs ORDER BY vid LIMIT {n_cells})
),
enc AS (
  SELECT vid, j, k FROM (
    SELECT v.vid, cb.j, cb.k,
           ROW_NUMBER() OVER (PARTITION BY v.vid, cb.j
               ORDER BY {l2.format(
                   a=f'list_slice(v.q, cb.j*{sub}+1, (cb.j+1)*{sub})',
                   b='cb.cv')} ASC, cb.k ASC) AS rnk
    FROM vecs v CROSS JOIN cb)
  WHERE rnk = 1
),
cassign AS (
  SELECT vid, cell FROM (
    SELECT v.vid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vid
               ORDER BY {l2.format(a='v.q', b='c.sv')} ASC,
                        c.cell ASC) AS rnk
    FROM vecs v CROSS JOIN cells c)
  WHERE rnk = 1
),
q AS (SELECT vid AS qid, q FROM vecs WHERE vid < {n_queries}),
probes AS (
  SELECT qid, cell FROM (
    SELECT q.qid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.qid
               ORDER BY {l2.format(a='q.q', b='c.sv')} ASC,
                        c.cell ASC) AS rnk
    FROM q CROSS JOIN cells c)
  WHERE rnk <= {nprobe}
),
lut AS (
  SELECT q.qid, cb.j, cb.k,
         {l2.format(a=f'list_slice(q.q, cb.j*{sub}+1, (cb.j+1)*{sub})',
                    b='cb.cv')} AS d
  FROM q CROSS JOIN cb
),
scored AS (
  SELECT p.qid, e.vid AS vec_id, CAST(SUM(l.d) AS BIGINT) AS adc
  FROM probes p
  JOIN cassign a ON a.cell = p.cell
  JOIN enc e ON e.vid = a.vid
  JOIN lut l ON l.qid = p.qid AND l.j = e.j AND l.k = e.k
  GROUP BY p.qid, e.vid
),
ranked AS (
  SELECT qid, vec_id, adc,
         ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY adc ASC, vec_id ASC) AS rank
  FROM scored
)
SELECT qid, vec_id, adc, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""
