"""Training-corpus preparation operators: decontamination, repetition
filtering, windowed substring dedup, temperature domain mixing, and
BM25 retrieval.

These complete the LLM-data-pipeline family (dedup.py covers
exact/MinHash/SimHash/n-gram-Jaccard; text.py covers lang-ID/quality/
token stats): the operators a 100 TB pretraining pipeline runs AFTER
dedup — strip benchmark contamination, drop degenerate-repetition
docs, remove copied spans, rebalance domains, and retrieve by lexical
relevance.  Every operator is pure JVM-side pyspark.sql expressions
(split / transform / slice / higher-order lambdas — no Python UDF
anywhere), so the whole family stays inside whole-stage codegen and
each query's only exchanges are the aggregations stated in its
docstring.

Oracle discipline: each operator has a matching SQL builder in this
module sharing ALL constants (n-gram width, eval modulus, thresholds,
temperature scaling) so queries.py cannot drift from the DuckDB
replay.  Float discipline: the only non-integer arithmetic is
(a) FLOOR(SQRT(integer)) — sqrt is IEEE correctly-rounded, so the
floor is deterministic cross-engine; (b) the BM25 score, built from
exact-integer counts with an identical parenthesization on both
engines, so every double op is the same correctly-rounded operation
in the same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared constants — imported by queries.py AND baked into the SQL
# builders below.
DECON_NGRAM = 8          # contamination n-gram width (tokens)
DECON_EVAL_MOD = 7       # doc_id % MOD == 0 -> held-out eval doc
REP_TOP_DEN = 8          # flag if top_token_count * 8 > n_tokens
SUBSTR_WINDOW = 16       # substring-dedup window width (tokens)
MIX_BUDGET = 100_000     # documents to draw in the mixed corpus
MIX_W_SCALE = 1_000_000  # w = floor(sqrt(n_docs * SCALE))
BM25_TERMS = ("spark", "join", "stream")
BM25_K = 20


def _tokens(text_col: str = "text"):
    return F.split(F.trim(F.col(text_col)), " ")


def ngram_col(tok, n: int):
    """array<string> of the n-token shingles of `tok`, [] when the doc
    is shorter than n (guards Spark's descending-sequence surprise:
    sequence(1, k) with k < 1 counts DOWN instead of returning [])."""
    return F.when(
        F.size(tok) >= n,
        F.transform(F.sequence(F.lit(1), F.size(tok) - (n - 1)),
                    lambda i: F.array_join(F.slice(tok, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


# SQL fragment twins (DuckDB): 1-based inclusive list slice,
# end-exclusive range.
def _sql_grams_cte(n: int, table: str = "documents") -> str:
    return f"""
t AS (SELECT doc_id, source, string_split(TRIM(text), ' ') AS tok
      FROM {table}),
g AS (SELECT doc_id, source,
             array_to_string(tok[i:i+{n - 1}], ' ') AS gram
      FROM t CROSS JOIN
           UNNEST(range(1, GREATEST(LEN(tok) - {n - 2}, 1))) AS r(i))
"""


def eval_grams(docs: DataFrame,
               ngram: int = DECON_NGRAM,
               eval_mod: int = DECON_EVAL_MOD) -> DataFrame:
    """The decontamination ARTIFACT: distinct `ngram`-token windows of
    the held-out eval slice (doc_id % eval_mod == 0).  Built once per
    eval-suite fingerprint and persisted as a lineage snapshot — the
    probe side (batch query or ingest stream) reads the committed
    parquet and never re-reads eval text."""
    tok = _tokens()
    is_eval = (F.col("doc_id") % eval_mod) == 0
    return (docs.filter(is_eval)
            .select(F.explode(ngram_col(tok, ngram)).alias("gram"))
            .distinct())


def decontaminate(docs: DataFrame,
                  ngram: int = DECON_NGRAM,
                  eval_mod: int = DECON_EVAL_MOD,
                  eval_gram_df: DataFrame = None) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares at least one `ngram`-token contiguous window with any
    held-out eval document (doc_id % eval_mod == 0 plays the eval
    suite).  Returns per-source (n_train, n_dirty).

    100 TB shape: the eval suite is tiny relative to the corpus, so
    its distinct n-grams BROADCAST (pass the persisted snapshot as
    eval_gram_df — see eval_grams — so repeated ingest runs never
    recompute it); the train side is a map-only explode + broadcast
    LEFT SEMI probe, and only matching rows (the contamination mass,
    by construction rare) reach the doc_id distinct + per-source
    aggregate exchanges.  No corpus-side self-join anywhere.
    """
    if eval_gram_df is None:
        eval_gram_df = eval_grams(docs, ngram, eval_mod)
    tok = _tokens()
    is_eval = (F.col("doc_id") % eval_mod) == 0
    g = (docs.filter(~is_eval)
         .select("doc_id",
                 F.explode(ngram_col(tok, ngram)).alias("gram")))
    dirty = (g.join(F.broadcast(eval_gram_df), "gram", "left_semi")
             .select("doc_id").distinct()
             .withColumn("_dirty", F.lit(1)))
    train = docs.filter((F.col("doc_id") % eval_mod) != 0) \
        .select("doc_id", "source")
    return (train.join(dirty, "doc_id", "left")
            .groupBy("source")
            .agg(F.count("*").alias("n_train"),
                 F.sum(F.coalesce(F.col("_dirty"), F.lit(0)))
                 .cast("long").alias("n_dirty"))
            .orderBy("source"))


def decontaminate_oracle_sql(ngram: int = DECON_NGRAM,
                             eval_mod: int = DECON_EVAL_MOD) -> str:
    return f"""
WITH {_sql_grams_cte(ngram)},
e AS (SELECT DISTINCT gram FROM g WHERE doc_id % {eval_mod} = 0),
d AS (SELECT DISTINCT g.doc_id FROM g JOIN e USING (gram)
      WHERE g.doc_id % {eval_mod} <> 0)
SELECT t.source,
       COUNT(*) AS n_train,
       CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dirty
FROM t LEFT JOIN d ON t.doc_id = d.doc_id
WHERE t.doc_id % {eval_mod} <> 0
GROUP BY t.source
ORDER BY t.source
"""


def repetition_stats(docs: DataFrame,
                     top_den: int = REP_TOP_DEN) -> DataFrame:
    """Gopher-style repetition quality gate: per document, the top
    unigram count vs total tokens and the duplicate-bigram surplus
    (n_bigrams - distinct_bigrams); a doc is flagged when the single
    most frequent token is STRICTLY more than 1/top_den of the whole
    document — degenerate keyword-stuffed text (strict >, so an
    all-distinct top_den-token doc sitting exactly on the boundary
    stays clean).  Returns per-source
    (n_docs, n_flagged, sum_ntok, sum_dup2), all exact int64.

    100 TB shape: two aggregations keyed by (doc_id, token) then
    doc_id — unique-ish keys, no skew — then one tiny per-source
    rollup.  Everything between exchanges is codegen.
    """
    tok = _tokens()
    uni = (docs.select("doc_id", "source",
                       F.explode(tok).alias("w"))
           .groupBy("doc_id", "source", "w").count()
           .groupBy("doc_id", "source")
           .agg(F.max("count").alias("max_tok"),
                F.sum("count").alias("n_tok")))
    big = (docs.select("doc_id",
                       F.explode(ngram_col(tok, 2)).alias("b"))
           .groupBy("doc_id")
           .agg(F.count("*").alias("n2"),
                F.countDistinct("b").alias("u2")))
    per_doc = uni.join(big, "doc_id")
    flagged = (F.col("max_tok") * top_den > F.col("n_tok"))
    return (per_doc.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(flagged.cast("long")).alias("n_flagged"),
                 F.sum("n_tok").alias("sum_ntok"),
                 F.sum(F.col("n2") - F.col("u2")).alias("sum_dup2"))
            .orderBy("source"))


def repetition_oracle_sql(top_den: int = REP_TOP_DEN) -> str:
    return f"""
WITH t AS (SELECT doc_id, source, string_split(TRIM(text), ' ') AS tok
           FROM documents),
u AS (SELECT doc_id, source, UNNEST(tok) AS w FROM t),
pc AS (SELECT doc_id, source, w, COUNT(*) AS c
       FROM u GROUP BY doc_id, source, w),
m AS (SELECT doc_id, source, MAX(c) AS max_tok, SUM(c) AS n_tok
      FROM pc GROUP BY doc_id, source),
g2 AS (SELECT doc_id, array_to_string(tok[i:i+1], ' ') AS b
       FROM t CROSS JOIN
            UNNEST(range(1, GREATEST(LEN(tok), 2))) AS r(i)),
d2 AS (SELECT doc_id, COUNT(*) AS n2, COUNT(DISTINCT b) AS u2
       FROM g2 GROUP BY doc_id)
SELECT m.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN m.max_tok * {top_den} > m.n_tok
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(m.n_tok) AS BIGINT) AS sum_ntok,
       CAST(SUM(d2.n2 - d2.u2) AS BIGINT) AS sum_dup2
FROM m JOIN d2 USING (doc_id)
GROUP BY m.source
ORDER BY m.source
"""


def substring_dedup(docs: DataFrame,
                    window: int = SUBSTR_WINDOW) -> DataFrame:
    """Windowed substring dedup (the suffix-overlap complement of
    whole-doc MinHash): any document sharing a `window`-token
    contiguous span with a LOWER-doc_id document is removed — the
    keep-first policy that makes the decision deterministic and
    order-free.  Returns per-source (n_docs, n_removed).

    100 TB shape: one distinct over (window, doc_id) — map-side
    combiner absorbs the in-doc repeats — then a per-window MIN
    aggregation (mergeable), a probe of each (window, doc) against
    its window's keeper, and a doc_id distinct bounded by the docs
    that actually share spans.  Fan-out is posting-list-sized, never
    quadratic; a hot window costs its posting length, not its square.
    """
    tok = _tokens()
    wins = (docs.select("doc_id", "source",
                        F.explode(ngram_col(tok, window)).alias("win"))
            .select("doc_id", "source", "win").distinct())
    keeper = wins.groupBy("win").agg(F.min("doc_id").alias("keeper"))
    removed = (wins.join(keeper, "win")
               .filter(F.col("doc_id") > F.col("keeper"))
               .select("doc_id").distinct()
               .withColumn("_rm", F.lit(1)))
    return (docs.select("doc_id", "source")
            .join(removed, "doc_id", "left")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce(F.col("_rm"), F.lit(0)))
                 .cast("long").alias("n_removed"))
            .orderBy("source"))


def substring_dedup_oracle_sql(window: int = SUBSTR_WINDOW) -> str:
    return f"""
WITH {_sql_grams_cte(window)},
w AS (SELECT DISTINCT doc_id, gram AS win FROM g),
k AS (SELECT win, MIN(doc_id) AS keeper FROM w GROUP BY win),
rm AS (SELECT DISTINCT w.doc_id FROM w JOIN k USING (win)
       WHERE w.doc_id > k.keeper)
SELECT t.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rm.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed
FROM t LEFT JOIN rm ON t.doc_id = rm.doc_id
GROUP BY t.source
ORDER BY t.source
"""


def domain_mix(docs: DataFrame,
               budget: int = MIX_BUDGET,
               scale: int = MIX_W_SCALE,
               domain_col: str = "lang") -> DataFrame:
    """Temperature-based domain mixing (the sqrt = T=0.5 point of the
    count^alpha family): per domain, weight w = floor(sqrt(n_docs *
    scale)) and quota = (budget * w) div sum(w) — the number of
    documents the mixed corpus draws from that domain.  sqrt
    up-weights small domains relative to proportional sampling.

    Integer-exact cross-engine: n_docs * scale < 2^53 is exact in a
    double, IEEE sqrt is correctly rounded, floor pins it, and the
    quota is pure int64 arithmetic.  Scale shape: one partial-agg
    count per domain (domains are few), then a 1-row broadcast total.
    """
    counts = docs.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    w = F.floor(F.sqrt(F.col("n_docs") * F.lit(scale))).cast("long")
    counts = counts.withColumn("w", w)
    total = counts.agg(F.sum("w").alias("tw"))
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("quota",
                        F.expr(f"({budget} * w) div tw").cast("long"))
            .select(F.col(domain_col).alias("domain"),
                    "n_docs", "w", "quota")
            .orderBy("domain"))


def domain_mix_oracle_sql(budget: int = MIX_BUDGET,
                          scale: int = MIX_W_SCALE,
                          domain_col: str = "lang") -> str:
    return f"""
WITH c AS (SELECT {domain_col} AS domain, COUNT(*) AS n_docs
           FROM documents GROUP BY {domain_col}),
w AS (SELECT domain, n_docs,
             CAST(FLOOR(SQRT(n_docs * {scale})) AS BIGINT) AS w
      FROM c)
SELECT domain, n_docs, w,
       CAST(({budget} * w) // SUM(w) OVER () AS BIGINT) AS quota
FROM w
ORDER BY domain
"""


def bm25_topk(docs: DataFrame,
              terms: tuple = BM25_TERMS,
              k: int = BM25_K) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75) of the top-k documents
    for a fixed conjunctive term set, with the rational idf variant
    idf = (N - df + 0.5)/(df + 0.5) (the log-free odds ratio — ln is
    not correctly rounded cross-engine, the ratio is).  Per-term
    scores are separate columns summed in a FIXED left-to-right
    order, so every double op is the same correctly-rounded operation
    on both engines and the score is bit-identical to the oracle.

    100 TB shape: tf per term is a higher-order-function filter over
    the token array — map-only, no explode, no shuffle; the only
    exchanges are the 1-row corpus-stats aggregate (broadcast back)
    and the final TakeOrdered(k).
    """
    tok = _tokens()
    d = docs.select("doc_id", tok.alias("tok"))
    d = d.withColumn("dl", F.size("tok"))
    for t in terms:
        d = d.withColumn(
            f"tf_{t}",
            F.size(F.filter("tok", lambda x: x == F.lit(t))))
    stats = d.agg(
        F.count("*").alias("N"),
        F.sum("dl").alias("sdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in terms])
    d = d.crossJoin(F.broadcast(stats))
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        df = F.col(f"df_{t}").cast("double")
        n_ = F.col("N").cast("double")
        idf = (2.0 * (n_ - df) + 1.0) / (2.0 * df + 1.0)
        denom = tf + 0.3 + (0.9 * (F.col("dl").cast("double") * n_)) \
            / F.col("sdl").cast("double")
        term = F.when(F.col(f"tf_{t}") > 0,
                      idf * ((tf * 2.2) / denom)).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    return (d.select("doc_id", F.round(score, 6).alias("score_r"))
            .orderBy(F.col("score_r").desc(), "doc_id")
            .limit(k))


def bm25_oracle_sql(terms: tuple = BM25_TERMS, k: int = BM25_K) -> str:
    tf_cols = ",\n       ".join(
        f"LEN(list_filter(tok, x -> x = '{t}')) AS tf_{t}"
        for t in terms)
    df_cols = ",\n       ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in terms)
    score = " + ".join(
        f"""(CASE WHEN d.tf_{t} > 0 THEN
            ((2.0 * (CAST(s.N AS DOUBLE) - CAST(s.df_{t} AS DOUBLE))
              + 1.0) / (2.0 * CAST(s.df_{t} AS DOUBLE) + 1.0))
            * ((CAST(d.tf_{t} AS DOUBLE) * 2.2)
               / (CAST(d.tf_{t} AS DOUBLE) + 0.3
                  + (0.9 * (CAST(d.dl AS DOUBLE)
                            * CAST(s.N AS DOUBLE)))
                    / CAST(s.sdl AS DOUBLE)))
            ELSE 0.0 END)"""
        for t in terms)
    return f"""
WITH t AS (SELECT doc_id, string_split(TRIM(text), ' ') AS tok
           FROM documents),
d AS (SELECT doc_id, LEN(tok) AS dl,
       {tf_cols}
      FROM t),
s AS (SELECT COUNT(*) AS N, SUM(dl) AS sdl,
       {df_cols}
      FROM d)
SELECT d.doc_id, ROUND({score}, 6) AS score_r
FROM d CROSS JOIN s
ORDER BY score_r DESC, d.doc_id
LIMIT {k}
"""


# --------------------------------------------------------------------------
# Regex scrubbing (PII-shaped redaction).  Real corpora scrub
# emails/phones/keys before training; the synthetic corpus has no
# digits, so the shipped pattern targets a vocabulary bigram ("key
# <word>") to keep the gate non-trivial — the plumbing (count, global
# replace, length accounting) is exactly the PII pass, and both the
# pattern and replacement are shared constants so queries.py and the
# DuckDB twin cannot drift.  Pattern stays inside the Java-regex /
# RE2 common subset (char classes, +, literal space): identical
# non-overlapping leftmost-match semantics on both engines.
# --------------------------------------------------------------------------

SCRUB_PATTERN = "key [a-z]+"
SCRUB_REPL = "<REDACTED>"


def regex_scrub(docs: DataFrame) -> DataFrame:
    """Per-source redaction audit: n_docs, docs hit, total matches,
    and the exact char delta after global replacement.  Pure JVM
    regexp codegen, map-only until the tiny per-source aggregate —
    one scan at any scale."""
    hits = F.regexp_count(F.col("text"), F.lit(SCRUB_PATTERN))
    red = F.regexp_replace("text", SCRUB_PATTERN, SCRUB_REPL)
    base = docs.select(
        "source", hits.alias("n_hits"),
        (F.length("text") - F.length(red)).cast("long").alias("delta"))
    return (base.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0))
                 .cast("long").alias("n_hit_docs"),
                 F.sum("n_hits").cast("long").alias("n_matches"),
                 F.sum("delta").cast("long").alias("chars_delta"))
            .orderBy("source"))


def regex_scrub_oracle_sql() -> str:
    """DuckDB twin of regex_scrub — same pattern/replacement constants,
    LEN(regexp_extract_all) for the count, 'g' flag for the global
    replace Spark applies by default."""
    return f"""
        WITH s AS (
            SELECT source,
                   LEN(regexp_extract_all(text,
                       '{SCRUB_PATTERN}')) AS n_hits,
                   LENGTH(text) - LENGTH(regexp_replace(text,
                       '{SCRUB_PATTERN}', '{SCRUB_REPL}', 'g')) AS delta
            FROM documents)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit_docs,
               CAST(SUM(n_hits) AS BIGINT) AS n_matches,
               CAST(SUM(delta) AS BIGINT) AS chars_delta
        FROM s GROUP BY source ORDER BY source
    """
