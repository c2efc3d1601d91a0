"""Deterministic synthetic embedding corpus for the realistic-scale
ANN path (IVF-PQ at ksub=256): clustered integer vectors derivable
bit-identically by the distributed generator (mapInPandas over
spark.range — the same blind-spot-free source pattern as
sources/images.py) and by any driver-side numpy replay.

Vectors are born QUANTIZED (int64 coordinates, the operators/kmeans
QSCALE discipline) so every distance downstream — k-means training,
PQ encode, coarse assignment, ADC — is exact integer arithmetic and
the whole pipeline replays hash-identically in an independent numpy
implementation.

Structure: each vector belongs to one of N_TRUE_CLUSTERS latent
clusters (splitmix64 pick); its coordinates are the cluster center
(amplitude +-10000) plus per-vector noise (amplitude +-1000).  The
cluster structure is what makes IVF pruning measurable — on uniform
noise every coarse cell is equidistant and nprobe recall says
nothing.  Bounds: |q_j| <= 11000, so a full-dim squared L2 is
<= 64 * 22000^2 ~ 3.1e10 — int64-safe with 8 decimal orders of
margin, including the matmul expansions in operators/pq_arrow.

The test/bench corpus size (PQ256_N = 100k) lives here so the Spark
query, the fixture builder, and the recall pytest all draw the same
table.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from geographiclib_go_spark.sources.images import splitmix64

N_TRUE_CLUSTERS = 32
_CENTER_AMP = 10000   # cluster-center coordinate amplitude
_NOISE_AMP = 1000     # per-vector noise amplitude

# canonical corpus shape for the ksub=256 PQ path (query, fixture
# builder, recall pytest, bench all share these)
PQ256_N = 100_000
PQ256_DIM = 64


def q_for_ids(ids: np.ndarray, dim: int = PQ256_DIM) -> np.ndarray:
    """(n, dim) int64 quantized vectors for the given vector ids —
    THE generator: the Spark source and every numpy replay call this
    same function, so determinism is structural."""
    ids = ids.astype(np.uint64)
    n = ids.size
    cid = (splitmix64(ids ^ np.uint64(0xC1)) %
           np.uint64(N_TRUE_CLUSTERS)).astype(np.uint64)
    out = np.empty((n, dim), np.int64)
    for j in range(dim):
        ju = np.uint64(j)
        center = (splitmix64((cid * np.uint64(dim) + ju) ^ np.uint64(0xC2))
                  % np.uint64(2 * _CENTER_AMP + 1)).astype(np.int64) \
            - _CENTER_AMP
        jg = np.uint64((j * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        noise = (splitmix64(ids ^ jg)
                 % np.uint64(2 * _NOISE_AMP + 1)).astype(np.int64) \
            - _NOISE_AMP
        out[:, j] = center + noise
    return out


def generate_vectors(spark: SparkSession, n: int,
                     dim: int = PQ256_DIM) -> DataFrame:
    """(vid long, q array<long>): the distributed face of q_for_ids —
    mapInPandas over spark.range, no driver-side loops, columnar all
    the way (at 10^12 rows this is a parquet scan of the same
    schema; the generator stands in for the Iceberg table)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.uint64)
            q = q_for_ids(ids, dim)
            yield pd.DataFrame({
                "vid": ids.astype(np.int64),
                "q": list(q)})

    return (spark.range(0, n)
            .repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(gen, "vid long, q array<long>"))
