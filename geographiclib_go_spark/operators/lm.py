"""Bigram language-model scoring (engine-added LLM-pipeline
operator).

The CCNet-style corpus quality signal: score every document by its
average bigram log-probability under a count-based LM with add-one
smoothing — low scores flag boilerplate, gibberish, and
out-of-distribution text.  The classic tool (KenLM) is a sequential
C++ trainer; the distributed shape used here:

- **counts are two aggregations** over the corpus word stream
  (unigram and adjacent-bigram counts over the same alphanumeric
  word spec as the BPE trainer — operators/bpe.py); their output is
  vocabulary-bounded, not corpus-bounded.
- **scoring is one join per table**: each document's bigrams join
  the bigram and unigram count tables (vocabulary-sized; broadcast
  or shuffle as the optimizer picks) and aggregate to
  ``sum ln((c_ab + 1) / (c_a + V))`` — add-one smoothing with the
  distinct-vocabulary size V shipped as a broadcast 1-row join.
- the query trains on the corpus it scores, so the DuckDB oracle
  replays the WHOLE algorithm end-to-end; the operator itself takes
  any counts pair, so a reference-corpus LM (the true CCNet shape —
  train on trusted text, score candidates) is the same call with
  different count inputs.

Counts and bigram multiplicities are exact BIGINTs; only the final
per-doc sum is floating point, rounded to 4 decimals on BOTH
engines (the repo's ROUND discipline for cross-libm float drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geographiclib_go_spark.operators.bpe import WORD_RE
from geographiclib_go_spark.operators.cms import WS_REGEX_JAVA

LOGP_ROUND = 4


def _word_arrays(docs: DataFrame, id_col: str,
                 text_col: str) -> DataFrame:
    """(doc_id, ws): the in-order alphanumeric word array (non-words
    removed BEFORE pairing, so bigrams are over the filtered
    sequence)."""
    ws = F.filter(
        F.filter(F.split(F.col(text_col), WS_REGEX_JAVA),
                 lambda x: F.length(x) > 0),
        lambda x: x.rlike(WORD_RE))
    return docs.select(F.col(id_col).alias("doc_id"), ws.alias("ws"))


def _doc_bigrams(words: DataFrame) -> DataFrame:
    """(doc_id, a, b) one row per adjacent word pair occurrence."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.struct(F.element_at("ws", i).alias("a"),
                           F.element_at("ws", F.lit(1) + i).alias("b")))
    return (words.filter(F.size("ws") >= 2)
            .select("doc_id", F.explode(pairs).alias("p"))
            .select("doc_id", "p.a", "p.b"))


def lm_counts(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", words: DataFrame = None):
    """(unigram counts (w, c), bigram counts (a, b, c)) — the
    vocabulary-bounded LM artifact; persist via plans/lineage for a
    train-once / score-at-ingest flow.  Pass `words` (a
    _word_arrays frame, ideally a persisted artifact at scale) to
    share the corpus tokenization with the scoring pass instead of
    re-deriving it."""
    if words is None:
        words = _word_arrays(docs, id_col, text_col)
    uni = (words.select(F.explode("ws").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    bi = (_doc_bigrams(words).groupBy("a", "b")
          .agg(F.count("*").alias("c")))
    return uni, bi


def lm_score(docs: DataFrame, uni: DataFrame, bi: DataFrame,
             id_col: str = "doc_id", text_col: str = "text",
             words: DataFrame = None) -> DataFrame:
    """(doc_id, n_bigrams, logp): per-doc bigram count and total
    add-one-smoothed log-probability (rounded LOGP_ROUND).

    Joins are LEFT with zero-coalesce so UNSEEN bigrams and unseen
    first-words score the smoothed floor ln(1 / (0 + V)) instead of
    silently dropping — the whole point of add-one smoothing, and
    what makes the pluggable reference-corpus mode (train on trusted
    text, score candidates) penalize out-of-distribution documents
    hardest rather than not at all.  Self-trained counts (the
    registered query) see every bigram, so there the left joins are
    value-identical to inner ones."""
    v = uni.agg(F.count("*").alias("_v"))
    if words is None:
        words = _word_arrays(docs, id_col, text_col)
    db = _doc_bigrams(words)
    scored = (db
              .join(bi.select(F.col("a"), F.col("b"),
                              F.col("c").alias("c_ab")),
                    ["a", "b"], "left")
              .join(uni.select(F.col("w").alias("a"),
                               F.col("c").alias("c_a")), ["a"],
                    "left")
              .crossJoin(F.broadcast(v)))
    lp = F.log(
        (F.coalesce(F.col("c_ab"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c_a"), F.lit(0)) + F.col("_v"))
        .cast("double"))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.sum(lp), LOGP_ROUND).alias("logp"))
            .orderBy("doc_id"))


def lm_score_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: same word spec, same counts, same smoothing,
    same rounding."""
    from geographiclib_go_spark.operators.sketch_hash import WS_REGEX
    return f"""
WITH warr AS MATERIALIZED (
  SELECT doc_id,
         list_filter(
           list_filter(string_split_regex(text, '{WS_REGEX}'),
                       x -> length(x) > 0),
           x -> regexp_matches(x, '{WORD_RE}')) AS ws
  FROM {table}
),
db AS MATERIALIZED (
  SELECT doc_id, pr.a AS a, pr.b AS b FROM (
    SELECT doc_id,
           unnest([struct_pack(a := ws[i], b := ws[i+1])
                   for i in range(1, len(ws))]) AS pr
    FROM warr WHERE len(ws) >= 2
  )
),
uni AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(ws) AS w FROM warr
  ) GROUP BY w
),
bi AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c
  FROM db GROUP BY a, b
),
v AS (SELECT CAST(count(*) AS BIGINT) AS _v FROM uni)
SELECT db.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(ln(CAST(COALESCE(bi.c, 0) + 1 AS DOUBLE)
                    / CAST(COALESCE(uni.c, 0) + v._v AS DOUBLE))),
             {LOGP_ROUND}) AS logp
FROM db
LEFT JOIN bi ON bi.a = db.a AND bi.b = db.b
LEFT JOIN uni ON uni.w = db.a
CROSS JOIN v
GROUP BY db.doc_id
ORDER BY db.doc_id
"""
