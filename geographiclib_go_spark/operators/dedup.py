"""Deduplication operators for training-data pipelines (engine-added).

Five dedup families, each scale-minded:

- exact_dedup: hash-groupBy on md5(text) — one shuffle, map-side
  partial agg; the survivor choice (min doc_id) is deterministic.
- minhash LSH: shingle -> k minhashes -> b bands -> band-bucket join.
  Signatures come from the batch-vectorized polynomial-hash kernels
  in operators/sketch_hash.py (one code-point stream per Arrow batch,
  no per-document Python); candidate generation is a self-join on
  exact (band, band-values) buckets — the classic shuffle-friendly
  LSH plan where only colliding buckets pair up.  The band key is the
  exact value tuple (not a rehash), so the DuckDB oracle reproduces
  the candidate set bit for bit (sketch_hash.minhash_pairs_oracle_sql).
- simhash: 64-bit sign-sketch of token hashes; near-dups = Hamming
  distance <= h via chunk-band join (pigeonhole: any pair with <= h
  differing bits shares at least one of h+1 chunks).
- ngram_jaccard: exact verification kernel used to confirm LSH
  candidates (and usable standalone at small scale).
- embedding near-dup: cosine >= tau pairs; see similarity.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geographiclib_go_spark.operators import sketch_hash as sk


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


def minhash_signature_udf(num_hashes: int = 64, shingle: int = 5):
    """array<long> MinHash signature per document — one segmented
    (permute, min-reduceat) pass per hash function over the batch's
    concatenated shingle-hash stream (sketch_hash.minhash_sigs)."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(text: pd.Series) -> pd.Series:
        sig = sk.minhash_sigs(text.tolist(), num_hashes, shingle)
        return pd.Series(sig.tolist())

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
    # band key = the exact value tuple of the band's slice (a struct
    # equi-join key): no rehash, so the candidate set is reproducible
    # in the SQL oracle and hash collisions cannot inject pairs
    bands_df = s.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.struct(*[F.col("_sig")[b * rows_per_band + r]
                                .alias(f"v{r}")
                                for r in range(rows_per_band)])
                     .alias("band_key"))
            for b in range(bands)])).alias("bb"))
    bands_df = bands_df.select("doc_id", "bb.band", "bb.band_key")
    # persist the (tiny) band table before the self-join: Spark does
    # not reuse subplans across self-join sides, so without this the
    # signature UDF and the document scan run TWICE (r2 plan audit).
    # At cluster scale the signature table is written once and the
    # join reads it; cache() is the sandbox analog.
    bands_df = bands_df.cache()
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    pairs = (a.join(b, ["band", "band_key"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
             .distinct())
    return pairs


def ngram_jaccard_udf(shingle: int = 5):
    """Exact shingle-set Jaccard for candidate pair verification
    (62-bit wide shingle hashes -> collision odds ~2^-62, so the
    value equals the true character-shingle-set Jaccard)."""

    @pandas_udf(T.DoubleType())
    def jaccard(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        return pd.Series(
            sk.jaccard_pairs(text_a.tolist(), text_b.tolist(), shingle))

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
    # asNondeterministic stops Catalyst from inlining the UDF into
    # both the filter AND the projection (the extracted-python-UDF
    # rule otherwise evaluates jaccard twice per candidate — seen in
    # the r2 plan audit); the function is pure, so results are
    # unaffected, the verify kernel just runs once per pair.
    jac = ngram_jaccard_udf(shingle).asNondeterministic()
    return (cand.withColumn("jaccard", jac(F.col("_ta"), F.col("_tb")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash_udf(bits: int = 64):
    """64-bit SimHash over whitespace tokens (weight = multiplicity),
    batch-vectorized on the code-point stream
    (sketch_hash.simhash_batch: tokenize once, then per-bit modular
    mixers + segmented vote sums — no per-document Python)."""

    @pandas_udf(T.LongType())
    def simhash(text: pd.Series) -> pd.Series:
        return pd.Series(sk.simhash_batch(text.tolist(), bits))

    return simhash


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: chunk-band join (pigeonhole over
    max_hamming+1 chunks) then exact popcount filter.

    Scale note: chunk width is 64 // (max_hamming+1) bits, so the
    bucket space is 2^width per chunk — at max_hamming=8 that is 128
    buckets, fine for corpus shards up to ~10^6 docs but quadratic
    inside buckets beyond that.  At billions of rows keep
    max_hamming <= 3 (16-bit chunks, 65k buckets) and shard the join
    by a document-hash prefix, or recurse the pigeonhole (split each
    chunk collision group by a second-level chunking) — the standard
    multi-index Hamming-join construction."""
    sh = simhash_udf()
    s = docs.select(F.col(id_col).alias("doc_id"),
                    sh(F.col(text_col)).alias("simhash"))
    return hamming_band_pairs(s, sig_col="simhash", id_col="doc_id",
                              max_hamming=max_hamming)


def hamming_chunk_table(sigs: DataFrame, sig_col: str, id_col: str,
                        max_hamming: int,
                        bits: int = 64) -> DataFrame:
    """(_id, _sig, chunk, chunk_val) — the persistable pigeonhole
    index artifact for 64-bit signatures: each signature exploded to
    its max_hamming+1 disjoint chunks.  Written once per corpus
    snapshot (plans/lineage.run_stage), probed by any batch or stream
    with a plain (chunk, chunk_val) equi-join — the image analog of
    minhash_band_table."""
    chunks = max_hamming + 1
    width = bits // chunks
    parts = sigs.select(
        F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned(sig_col, c * width)
                     .bitwiseAND(F.lit((1 << width) - 1))
                     .alias("chunk_val"))
            for c in range(chunks)])).alias("cc"))
    return parts.select("_id", "_sig", "cc.chunk", "cc.chunk_val")


def hamming_band_pairs(sigs: DataFrame, sig_col: str, id_col: str,
                       max_hamming: int,
                       bits: int = 64) -> DataFrame:
    """All id pairs whose 64-bit signatures differ in <= max_hamming
    bits — the pigeonhole chunk-band join, usable for ANY 64-bit
    signature column (SimHash text sketches, image perceptual
    hashes, ...).  Splitting into max_hamming+1 chunks guarantees a
    pair within the bound shares at least one whole chunk (lossless
    recall); the exact popcount filter removes false candidates.

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    parts = hamming_chunk_table(sigs, sig_col, id_col, max_hamming,
                                bits)
    # persist before the self-join (see minhash_candidates: avoids
    # running any upstream signature UDF once per join side)
    parts = parts.cache()
    a = parts.alias("a")
    b = parts.alias("b")
    pairs = (a.join(b, ["chunk", "chunk_val"])
             .filter(F.col("a._id") < F.col("b._id"))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a._sig").alias("sh_a"),
                     F.col("b._sig").alias("sh_b"))
             .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (pairs.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def minhash_band_table(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       bands: int = 16, shingle: int = 5) -> DataFrame:
    """(doc_id, band, band_key) — the persistable LSH index artifact.

    One row per (document, band); band_key is the exact signature
    value tuple (a struct of longs), so the table is plain parquet and
    a probe is an equi-join on (band, band_key).  At ingest scale this
    is written ONCE per corpus snapshot (plans/lineage.run_stage) and
    every arriving batch probes it without re-reading corpus text."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, shingle)
    s = docs.select(F.col(id_col).alias("doc_id"),
                    sig(F.col(text_col)).alias("_sig"))
    out = s.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.struct(*[F.col("_sig")[b * rows_per_band + r]
                                .alias(f"v{r}")
                                for r in range(rows_per_band)])
                     .alias("band_key"))
            for b in range(bands)])).alias("bb"))
    return out.select("doc_id", "bb.band", "bb.band_key")


def minhash_probe_pairs(batch_bands: DataFrame, corpus_bands: DataFrame,
                        batch_docs: DataFrame, corpus_docs: DataFrame,
                        threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle: int = 5) -> DataFrame:
    """Probe stage of incremental dedup: batch band keys equi-join
    corpus band keys ONLY (never corpus x corpus or batch x batch),
    then the exact-Jaccard refine fetches text for CANDIDATE ids
    alone — the corpus text scan is pruned to the collision set, and
    the corpus signatures come from `corpus_bands` (a persisted
    artifact), not from recomputation.
    Output: (id_a = batch doc, id_b = corpus doc, jaccard >= threshold)."""
    cand = (batch_bands.alias("a")
            .join(corpus_bands.alias("b"), ["band", "band_key"])
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())
    ta = batch_docs.select(F.col(id_col).alias("id_a"),
                           F.col(text_col).alias("_ta"))
    tb = corpus_docs.select(F.col(id_col).alias("id_b"),
                            F.col(text_col).alias("_tb"))
    cand = cand.join(ta, "id_a").join(tb, "id_b")
    jac = ngram_jaccard_udf(shingle).asNondeterministic()
    return (cand.withColumn("jaccard", jac(F.col("_ta"), F.col("_tb")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_cross_pairs(docs: DataFrame, side_col: str,
                        left_val: str, right_val: str,
                        threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 64, bands: int = 16,
                        shingle: int = 5) -> DataFrame:
    """Asymmetric (ingest-time) LSH near-dup join: candidate pairs
    only BETWEEN the two sides of `side_col` — the incremental-dedup
    shape where a new batch probes an existing corpus.  This is the
    single-call convenience form: both band tables are computed here
    (the shared cache() avoids running the signature UDF once per
    join side).  For the real ingest contract — corpus signatures
    persisted once, probed by every batch — build the corpus side
    with minhash_band_table + plans/lineage.run_stage and call
    minhash_probe_pairs directly (see queries.docs_incremental_dedup).
    Output: (id_a = left side, id_b = right side, jaccard)."""
    sides = docs.select(F.col(id_col).alias("doc_id"),
                        F.col(side_col).alias("_side"),
                        F.col(text_col).alias(text_col))
    bands_df = minhash_band_table(
        sides, text_col, "doc_id", num_hashes, bands, shingle) \
        .join(sides.select("doc_id", "_side"), "doc_id").cache()
    left_docs = sides.filter(F.col("_side") == left_val)
    right_docs = sides.filter(F.col("_side") == right_val)
    return minhash_probe_pairs(
        bands_df.filter(F.col("_side") == left_val)
        .select("doc_id", "band", "band_key"),
        bands_df.filter(F.col("_side") == right_val)
        .select("doc_id", "band", "band_key"),
        left_docs, right_docs, threshold=threshold,
        text_col=text_col, id_col="doc_id", shingle=shingle)


def shingle_set_arrays(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       shingle: int = 5) -> DataFrame:
    """(doc_id, sset): each document's DISTINCT 62-bit character-
    shingle hashes as a SORTED array — the exact set representation
    the MinHash/Jaccard family sketches (same sketch_hash kernels,
    one vectorized pass per Arrow batch).  Documents shorter than the
    shingle width carry the {0} sentinel, matching minhash_sigs."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def sh(text: pd.Series) -> pd.Series:
        _h1, hw, offs = sk.shingle_sets(text.tolist(), shingle)
        return pd.Series([hw[offs[i]:offs[i + 1]].tolist()
                          for i in range(offs.size - 1)])

    return df.select(F.col(id_col).alias("doc_id"),
                     sh(F.col(text_col)).alias("sset"))


def shingle_hash_rows(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      shingle: int = 5) -> DataFrame:
    """(doc_id, hw): shingle_set_arrays exploded to one row per
    distinct shingle hash — the posting-list form."""
    return (shingle_set_arrays(df, text_col, id_col, shingle)
            .select("doc_id", F.explode("sset").alias("hw")))




def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle: int = 5,
                        tau100: int = 90) -> DataFrame:
    """EXACT n-gram-Jaccard near-duplicate join via prefix filtering
    (the AllPairs/PPJoin principle — Bayardo et al. WWW'07, Xiao et
    al. WWW'08; MapReduce formulation Vernica et al. SIGMOD'10, all
    public) — the lossless complement of the probabilistic MinHash
    path.  Three stacked exact filters before any verification:

    - **df-ordered prefix index**: the shingle universe is totally
      ordered by ASCENDING global document frequency (ties by hash),
      so each document's prefix — its first ``s - ceil(tau*s) + 1``
      set elements in that order — holds its RAREST shingles.  If
      J(A,B) >= tau, the first common element of A and B sits inside
      both prefixes (else the overlap would fit in ceil(tau*s)-1 <
      tau*s <= |A inter B| suffix slots), so the prefix-prefix
      equi-join is provably lossless while hot shingles stay out of
      the postings.
    - **length filter** (join predicate): tau*sa <= sb and
      tau*sb <= sa, in exact integers.
    - **positional filter** (join predicate): a match at set ranks
      (ra, rb) can witness at most ``1 + min(sa-ra, sb-rb)`` common
      elements, which must reach the required overlap
      ``alpha = ceil(tau/(1+tau) * (sa+sb))``.
    - **verify**: each surviving pair joins its two COMPACT sorted
      set arrays (the Vernica et al. record-join shape — two
      equi-joins against the per-doc array table, broadcast-sized
      here) and the exact intersection count is a JVM
      ``array_intersect`` inside whole-stage codegen, threshold
      applied as the integer inequality
      ``100*inter >= tau100*(sa+sb-inter)``.  No row-explode join:
      the posting-list verify shuffled |cand| x set_size rows; the
      array verify moves each set once per pair and never leaves
      the JVM.

    Everything emitted is exact int64, and the DuckDB oracle checks
    losslessness with an algorithm-INDEPENDENT plan: the exhaustive
    shared-shingle join with no prefix filter.  Output:
    (id_a < id_b, n_inter, n_union).

    Scale/corpus note: prefix postings are rare-by-construction on
    natural text, where df distributions are zipfian.  A degenerate
    shingle space defeats ANY exact filter: the fixture corpus at
    width 5 has only ~2k distinct shingles across the whole table,
    so every posting is hot and candidate fan-out is quadratic-ish
    (measured: 5.3M candidates at tau=0.9/sf0.1).  Widening the
    shingle until it spans multiple words restores combination-sized
    rarity — width 15 on the same corpus yields 131x the distinct
    shingles and 266 candidates for 254 true pairs.  Shingle width
    is the knob that encodes "what counts as shared text"; the
    filter cascade is the 100-TB design."""
    sets = (shingle_set_arrays(df, text_col, id_col, shingle)
            .withColumn("s", F.size("sset"))
            .cache())
    rows = sets.select("doc_id", "s", F.explode("sset").alias("hw"))
    dfreq = rows.groupBy("hw").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("doc_id").orderBy("_df", "hw")
    pref = (rows.join(dfreq, "hw")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.expr(
                f"s - ({tau100} * s + 99) DIV 100 + 1"))
            .select("doc_id", "hw", "rn", "s")
            .cache())
    a, b = pref.alias("a"), pref.alias("b")
    cand = (a.join(b, "hw")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: tau*max(sa,sb) <= min(sa,sb)
            .filter((100 * F.col("b.s") >= tau100 * F.col("a.s"))
                    & (100 * F.col("a.s") >= tau100 * F.col("b.s")))
            # positional filter: the overlap this match can still
            # witness must reach alpha = ceil(tau/(1+tau)*(sa+sb))
            .filter(F.expr(
                f"1 + least(a.s - a.rn, b.s - b.rn) >= "
                f"({tau100} * (a.s + b.s) + {100 + tau100} - 1) "
                f"DIV {100 + tau100}"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())
    ver = (cand
           .join(sets.select(F.col("doc_id").alias("id_a"),
                             F.col("sset").alias("_seta"),
                             F.col("s").alias("_sa")), "id_a")
           .join(sets.select(F.col("doc_id").alias("id_b"),
                             F.col("sset").alias("_setb"),
                             F.col("s").alias("_sb")), "id_b")
           # arrays are unique per doc, so the JVM array_intersect
           # size IS |A inter B| — whole-stage codegen, no Arrow
           # round-trip for the verify
           .withColumn("n_inter",
                       F.size(F.array_intersect("_seta", "_setb"))
                       .cast("long")))
    return (ver
            .withColumn("n_union",
                        F.col("_sa") + F.col("_sb") - F.col("n_inter"))
            .filter(100 * F.col("n_inter")
                    >= tau100 * F.col("n_union"))
            .select("id_a", "id_b",
                    F.col("n_inter").cast("long").alias("n_inter"),
                    F.col("n_union").cast("long").alias("n_union")))
