"""Term-frequency cosine similarity via a shingle inverted-index
join (engine-added).

Token-level similar-document detection that complements the hashed
MinHash path (operators/dedup.py): documents are sparse unigram TF
vectors and similar pairs are found WITHOUT an all-pairs product —

- **index**: distinct token TRIGRAMS per document (3-token shingles,
  the exact — unhashed — analog of the MinHash shingle space), built
  with JVM array expressions (split -> filter -> transform), no
  Python.
- **candidates**: the inverted-index self-join restricted to RARE
  shingles (document frequency <= max_df).  Each shingle contributes
  at most df^2 <= max_df^2 candidate pairs, so join fan-out is
  bounded per key — the classic frequency-bounded posting-list
  trick.  Unigram candidates would be useless here AND at corpus
  scale (every unigram is common); shingles are where rarity lives.
  Pairs sharing only high-df shingles are not candidates; that
  recall contract is the same shape as LSH banding and is stated,
  tested, and replayed in the oracle.
- **verify**: the FULL integer dot product over the pair's shared
  unigrams plus per-document squared norms, with the cosine
  threshold applied as an exact integer inequality
  ``dot^2 * 10000 >= t2 * na2 * nb2`` (t2 = round(10000 * min_sim^2))
  — no square roots, no floats, bit-identical in DuckDB.

Every emitted value (dot, na2, nb2) is an exact int64.  Overflow
bounds for the inequality (int64 max ~9.22e18): the LHS
``dot^2 * 10000`` fits only while dot <= ~3.0e7, and the RHS
``t2 * na2 * nb2`` (t2 <= 10^4) fits only while na2 * nb2 <= ~9.2e14
— i.e. per-document squared norms up to ~3e7, which a single token
repeated ~5.5k times already reaches.  Non-ANSI Spark would wrap
silently past these, so past either bound promote BOTH engines to
DECIMAL(38,0) (or compare via doubles with an epsilon band).  The
fixture corpora stay orders of magnitude below the bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geographiclib_go_spark.operators.cms import WS_REGEX_JAVA


def _tok_arrays(docs: DataFrame, id_col: str,
                text_col: str) -> DataFrame:
    """(doc_id, l): the whitespace token array with empties removed —
    all higher-order JVM array expressions."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), WS_REGEX_JAVA),
                 lambda x: F.length(x) > 0).alias("l"))


def tf_vectors(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, tok, tf) sparse unigram TF posting table — JVM
    split/explode, one groupBy, whole-stage codegen (no Python)."""
    return (_tok_arrays(docs, id_col, text_col)
            .select("doc_id", F.explode("l").alias("tok"))
            .groupBy("doc_id", "tok")
            .agg(F.count("*").alias("tf")))


def shingle_index(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, tri) distinct 3-token shingles — the inverted index
    keys.  1-based sequence/element_at mirrors the DuckDB oracle's
    range/list indexing exactly."""
    arrs = _tok_arrays(docs, id_col, text_col).filter(F.size("l") >= 3)
    tri = F.transform(
        F.sequence(F.lit(1), F.size("l") - 2),
        lambda i: F.concat_ws(" ", F.element_at("l", i),
                              F.element_at("l", i + 1),
                              F.element_at("l", i + 2)))
    # distinctness of (doc_id, tri) is purely WITHIN a document —
    # dedup the trigram array map-side (array_distinct) instead of a
    # full shuffle-distinct over every trigram occurrence: the index
    # build becomes exchange-free (measured 11 s -> ~7 s on the sf0.1
    # one-shot; at 100 TB it removes the largest exchange in the
    # pipeline, the raw trigram-occurrence table).
    return arrs.select("doc_id",
                       F.explode(F.array_distinct(tri)).alias("tri"))


def tf_cosine_pairs(docs: DataFrame, min_sim: float = 0.88,
                    max_df: int = 10, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Similar-document pairs (id_a < id_b, dot, na2, nb2) with
    unigram cosine >= min_sim among pairs sharing at least one rare
    trigram shingle."""
    t2 = int(round(10000 * min_sim * min_sim))
    sh = shingle_index(docs, id_col, text_col).cache()
    rare = (sh.groupBy("tri").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df))
    posting = sh.join(rare.select("tri"), "tri")
    # candidate pairs WITHOUT a posting self-join: group the rare
    # postings per shingle (bounded — the df <= max_df filter already
    # ran, so no list ever exceeds max_df ids) and emit each group's
    # ordered pairs with JVM array expressions.  Same output as the
    # a-join-b-on-tri formulation, one fewer shuffle of the posting
    # table and no join build; fan-out stays bounded by max_df^2 per
    # shingle.
    ids = F.array_sort(F.collect_list("doc_id"))
    pair_structs = F.flatten(F.transform(
        F.col("ids"),
        lambda a, i: F.transform(
            F.slice(F.col("ids"), i + 2,
                    F.size(F.col("ids"))),
            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")))))
    cand = (posting.groupBy("tri").agg(ids.alias("ids"))
            .select(F.explode(pair_structs).alias("p"))
            .select(F.col("p.id_a"), F.col("p.id_b"))
            .distinct()
            .cache())
    # Prune the RAW documents to CANDIDATE ids before building TF
    # vectors (VERDICT r3 item 4): candidates are a vanishing fraction
    # of the corpus at scale, so the token explode + TF groupBy — the
    # heaviest non-shingle work — runs only over candidate docs, and
    # the dot join and norm aggregation never see non-candidate
    # tokens.  Pruning by doc id keeps every token of a retained doc,
    # so norms computed from the pruned table are exact.
    cand_ids = (cand.select(F.col("id_a").alias(id_col))
                .union(cand.select(F.col("id_b").alias(id_col)))
                .distinct())
    tvc = tf_vectors(docs.join(cand_ids, id_col, "semi"),
                     id_col, text_col).cache()
    norms = tvc.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    # full dot product over shared unigrams (ALL tokens, not shingles)
    dots = (cand
            .join(tvc.select(F.col("doc_id").alias("id_a"),
                             "tok", F.col("tf").alias("tf_a")),
                  "id_a")
            .join(tvc.select(F.col("doc_id").alias("id_b"),
                             "tok", F.col("tf").alias("tf_b")),
                  ["id_b", "tok"])
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot")))
    return (dots
            .join(norms.select(F.col("doc_id").alias("id_a"),
                               F.col("n2").alias("na2")), "id_a")
            .join(norms.select(F.col("doc_id").alias("id_b"),
                               F.col("n2").alias("nb2")), "id_b")
            .filter(F.col("dot") * F.col("dot") * 10000
                    >= F.lit(t2) * F.col("na2") * F.col("nb2"))
            .select("id_a", "id_b", "dot", "na2", "nb2"))


def tf_cosine_oracle_sql(min_sim: float = 0.88, max_df: int = 10,
                         table: str = "documents") -> str:
    """DuckDB replay: same token arrays, same trigram index, same
    rare-shingle candidate join, same integer verify inequality."""
    t2 = int(round(10000 * min_sim * min_sim))
    from geographiclib_go_spark.operators.sketch_hash import WS_REGEX
    return f"""
WITH arrs AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '{WS_REGEX}'),
                     x -> length(x) > 0) AS l
  FROM {table}
),
tris AS (
  SELECT DISTINCT doc_id,
         unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                 for i in range(1, len(l) - 1)]) AS tri
  FROM arrs WHERE len(l) >= 3
),
rare AS (SELECT tri FROM tris GROUP BY tri HAVING count(*) <= {max_df}),
posting AS (SELECT tris.* FROM tris JOIN rare USING (tri)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM posting a JOIN posting b
    ON a.tri = b.tri AND a.doc_id < b.doc_id
),
tv AS (
  SELECT doc_id, unnest(l) AS tok FROM arrs
),
tvc AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM tv GROUP BY doc_id, tok
),
norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
  FROM tvc GROUP BY doc_id
),
dots AS (
  SELECT c.id_a, c.id_b, CAST(SUM(ta.tf * tb.tf) AS BIGINT) AS dot
  FROM cand c
  JOIN tvc ta ON ta.doc_id = c.id_a
  JOIN tvc tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
  GROUP BY c.id_a, c.id_b
)
SELECT d.id_a, d.id_b, d.dot, na.n2 AS na2, nb.n2 AS nb2
FROM dots d
JOIN norms na ON na.doc_id = d.id_a
JOIN norms nb ON nb.doc_id = d.id_b
WHERE d.dot * d.dot * 10000 >= {t2} * na.n2 * nb.n2
ORDER BY d.id_a, d.id_b
"""
