"""Deduplication operators for training-data pipelines (engine-added).

Five dedup families, each scale-minded:

- exact_dedup: hash-groupBy on md5(text) — one shuffle, map-side
  partial agg; the survivor choice (min doc_id) is deterministic.
- minhash LSH: shingle -> k minhashes -> b bands -> band-bucket join.
  Signatures are computed in one vectorized pandas UDF (numpy 2-D
  hashing, no per-row Python loops over hash functions); candidate
  generation is a self-join on (band, band_hash) buckets — the classic
  shuffle-friendly LSH plan where only colliding buckets pair up.
- simhash: 64-bit sign-sketch of token hashes; near-dups = Hamming
  distance <= h via chunk-band join (pigeonhole: any pair with <= h
  differing bits shares at least one of h+1 chunks).
- ngram_jaccard: exact verification kernel used to confirm LSH
  candidates (and usable standalone at small scale).
- embedding near-dup: cosine >= tau pairs; see similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geographiclib_go_spark.sources.images import splitmix64


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every exact-duplicate group."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def duplicate_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, keeper_id) for groups with >1 member."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keeper_id"))
            .filter(F.col("n_dups") > 1))


def _shingle_hashes(texts: pd.Series, shingle: int) -> list:
    """Per-document array of 64-bit shingle hashes (character
    shingles, whitespace-normalized)."""
    out = []
    for s in texts:
        b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
        if b.size < shingle:
            out.append(np.zeros(1, dtype=np.uint64))
            continue
        n = b.size - shingle + 1
        # polynomial hash of each shingle, vectorized via cumulative trick
        windows = np.lib.stride_tricks.sliding_window_view(b, shingle)
        h = np.zeros(n, dtype=np.uint64)
        for k in range(shingle):
            h = h * np.uint64(1099511628211) + windows[:, k]
        out.append(np.unique(h))
    return out


def minhash_signature_udf(num_hashes: int = 64, shingle: int = 5):
    """array<long> MinHash signature per document.  The k hash
    functions are splitmix64 streams seeded 0..k-1; the min reduction
    is a single vectorized 2-D min."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(text: pd.Series) -> pd.Series:
        seeds = splitmix64(np.arange(num_hashes, dtype=np.uint64))
        sigs = []
        for hs in _shingle_hashes(text, shingle):
            # (k, n_shingles) xor-mix then min over shingles
            mixed = splitmix64(hs[None, :] ^ seeds[:, None])
            sigs.append(mixed.min(axis=1).astype(np.int64).tolist())
        return pd.Series(sigs)

    return minhash_sig


def minhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       bands: int = 16, shingle: int = 5) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    rows_per_band = num_hashes/bands; collision threshold ~
    (1/bands)^(1/rows_per_band).  Output: (id_a, id_b) with id_a <
    id_b, deduped across bands.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, shingle)
    s = df.select(F.col(id_col).alias("doc_id"),
                  sig(F.col(text_col)).alias("_sig"))
    # band hash = xxhash of the band's slice
    bands_df = s.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col("_sig")[b * rows_per_band + r]
                                  for r in range(rows_per_band)])
                     .alias("band_hash"))
            for b in range(bands)])).alias("bb"))
    bands_df = bands_df.select("doc_id", "bb.band", "bb.band_hash")
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    pairs = (a.join(b, ["band", "band_hash"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
             .distinct())
    return pairs


def ngram_jaccard_udf(shingle: int = 5):
    """Exact shingle-set Jaccard for candidate pair verification."""

    @pandas_udf(T.DoubleType())
    def jaccard(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        ha = _shingle_hashes(text_a, shingle)
        hb = _shingle_hashes(text_b, shingle)
        out = np.zeros(len(ha))
        for i, (x, y) in enumerate(zip(ha, hb)):
            inter = np.intersect1d(x, y, assume_unique=True).size
            union = x.size + y.size - inter
            out[i] = inter / union if union else 0.0
        return pd.Series(out)

    return jaccard


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 64, bands: int = 16,
                        shingle: int = 5) -> DataFrame:
    """Full LSH pipeline: candidates -> exact Jaccard verify ->
    (id_a, id_b, jaccard) pairs above threshold."""
    cand = minhash_candidates(docs, text_col, id_col, num_hashes, bands,
                              shingle)
    texts = docs.select(F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("_t"))
    cand = (cand
            .join(texts.withColumnRenamed("doc_id", "id_a")
                  .withColumnRenamed("_t", "_ta"), "id_a")
            .join(texts.withColumnRenamed("doc_id", "id_b")
                  .withColumnRenamed("_t", "_tb"), "id_b"))
    jac = ngram_jaccard_udf(shingle)
    return (cand.withColumn("jaccard", jac(F.col("_ta"), F.col("_tb")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash_udf(bits: int = 64):
    """64-bit SimHash over whitespace tokens (weight 1 each)."""

    @pandas_udf(T.LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, s in enumerate(text):
            toks = s.split()
            if not toks:
                out[i] = 0
                continue
            hs = splitmix64(np.array(
                [hash_token(t) for t in toks], dtype=np.uint64))
            bitmat = ((hs[:, None] >> np.arange(bits, dtype=np.uint64))
                      & np.uint64(1)).astype(np.int64)
            votes = (2 * bitmat - 1).sum(axis=0)
            v = np.uint64(0)
            for bpos in range(bits - 1, -1, -1):
                v = (v << np.uint64(1)) | np.uint64(votes[bpos] > 0)
            out[i] = np.int64(v.astype(np.int64))
        return pd.Series(out)

    return simhash


def hash_token(t: str) -> int:
    """Deterministic 64-bit FNV-1a of a token (Python's hash() is
    salted per-process — unusable across executors)."""
    h = 0xCBF29CE484222325
    for ch in t.encode("utf-8", "ignore"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: chunk-band join (pigeonhole over
    max_hamming+1 chunks) then exact popcount filter."""
    chunks = max_hamming + 1
    width = 64 // chunks
    sh = simhash_udf()
    s = docs.select(F.col(id_col).alias("doc_id"),
                    sh(F.col(text_col)).alias("simhash"))
    parts = s.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned("simhash", c * width)
                     .bitwiseAND(F.lit((1 << width) - 1))
                     .alias("chunk_val"))
            for c in range(chunks)])).alias("cc"))
    parts = parts.select("doc_id", "simhash", "cc.chunk", "cc.chunk_val")
    a = parts.alias("a")
    b = parts.alias("b")
    pairs = (a.join(b, ["chunk", "chunk_val"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
