"""Sequence packing — GPT-style concat-and-chunk of tokenized
documents into fixed-length training rows (engine-added LLM-pipeline
operator).

Pretraining consumes fixed-length token sequences, not documents;
the standard packing strategy concatenates the tokenized corpus in a
deterministic order and slices it every ``seq_len`` tokens, letting
documents span chunk boundaries.  The relational formulation:

- per-doc token counts (whitespace tokens, the corpus-wide
  map-only pass),
- a **per-shard** running-offset window gives each document its
  half-open token span ``[start, start + n_tok)``,
- each document explodes to the chunk ids its span covers
  (``start div L .. (start + n_tok - 1) div L``) and contributes
  ``min(end, (c+1)L) - max(start, cL)`` tokens to each,
- one aggregate per (shard, chunk) reports docs, boundary-split
  docs, and token fill.

Scale design: a GLOBAL running sum would be a single-partition
window sort — the classic scale smell — so packing is sharded by a
deterministic doc->shard map (``doc_id % n_shards`` here; any
deterministic map works, e.g. operators/sampling.id_hash for
adversarial id spaces).  Shards pack independently and in parallel;
chunk ids are per-shard, which is exactly how a multi-worker data
loader consumes packed corpora.  Every quantity is an exact BIGINT
(integer ``div``), so the DuckDB oracle replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geographiclib_go_spark.operators.cms import WS_REGEX_JAVA

SEQ_LEN = 256
N_SHARDS = 8


def seq_pack(docs: DataFrame, seq_len: int = SEQ_LEN,
             n_shards: int = N_SHARDS, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(shard, chunk_id, n_docs, n_split_docs, n_tokens) for the
    concat-and-chunk packing of the corpus at ``seq_len``."""
    d = (docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.filter(F.split(F.col(text_col), WS_REGEX_JAVA),
                            lambda x: F.length(x) > 0))
             .cast("long").alias("n_tok"))
         .filter(F.col("n_tok") > 0)
         .withColumn("shard", F.col("doc_id") % n_shards))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    spans = (d.withColumn(
                 "start",
                 F.coalesce(F.sum("n_tok").over(w),
                            F.lit(0).cast("long")))
             .withColumn("endo", F.col("start") + F.col("n_tok"))
             .withColumn("c0", F.expr(f"start div {seq_len}"))
             .withColumn("c1", F.expr(f"(endo - 1) div {seq_len}")))
    per_chunk = (spans.select(
        "shard", "c0", "c1", "start", "endo",
        F.explode(F.sequence("c0", "c1")).alias("chunk_id")))
    tok = (F.least(F.col("endo"), (F.col("chunk_id") + 1) * seq_len)
           - F.greatest(F.col("start"), F.col("chunk_id") * seq_len))
    return (per_chunk
            .groupBy("shard", "chunk_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("c1") > F.col("c0")).cast("long"))
                  .alias("n_split_docs"),
                 F.sum(tok).alias("n_tokens"))
            .orderBy("shard", "chunk_id"))


def seq_pack_oracle_sql(seq_len: int = SEQ_LEN,
                        n_shards: int = N_SHARDS,
                        table: str = "documents") -> str:
    """DuckDB replay: identical shard map, window frame, chunk
    explode, and integer arithmetic."""
    from geographiclib_go_spark.operators.sketch_hash import WS_REGEX
    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '{WS_REGEX}'),
                              x -> length(x) > 0)) AS BIGINT) AS n_tok,
         doc_id % {n_shards} AS shard
  FROM {table}
),
spans AS (
  SELECT shard, doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS start
  FROM d WHERE n_tok > 0
),
bounds AS (
  SELECT shard, start, start + n_tok AS endo,
         CAST(start // {seq_len} AS BIGINT) AS c0,
         CAST((start + n_tok - 1) // {seq_len} AS BIGINT) AS c1
  FROM spans
),
per_chunk AS (
  SELECT shard, c0, c1, start, endo,
         unnest(range(c0, c1 + 1)) AS chunk_id
  FROM bounds
)
SELECT shard, chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c1 > c0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_split_docs,
       CAST(sum(least(endo, (chunk_id + 1) * {seq_len})
                - greatest(start, chunk_id * {seq_len})) AS BIGINT)
         AS n_tokens
FROM per_chunk
GROUP BY shard, chunk_id
ORDER BY shard, chunk_id
"""
