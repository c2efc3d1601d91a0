"""Distributed BPE merge training (engine-added LLM-pipeline
operator).

Byte-pair-encoding tokenizer TRAINING over a document corpus — the
missing twin of the BPE-ish token *counter* (operators/text.py:100).
The classic trainer is a per-corpus sequential loop; the scalable
shape used here is the one a 100-TB corpus needs:

- **one corpus-wide pass** builds the word-frequency table
  (``word -> n``).  This is the ONLY stage whose shuffle volume
  scales with the corpus; its output is bounded by the vocabulary,
  not the corpus.
- **R merge rounds run over the vocabulary table only**: each round
  is (a) a pair-count aggregation — explode each word's adjacent
  symbol pairs weighted by the word's corpus frequency, one partial
  agg + tiny shuffle over vocab-sized data — and (b) a map-only
  merge application.  The corpus is never touched again.
- the winning pair per round is selected with a deterministic total
  order (count DESC, then pair lexicographic ASC) and shipped to the
  apply step as a **broadcast 1-row join** — no driver-side collect
  anywhere in the loop.
- per-round ``localCheckpoint`` cuts plan lineage (the same
  iterative-operator protocol as connected-components and k-means;
  without it the logical plan doubles per round because round r
  references round r-1 twice: once for pair counts, once for the
  rebuild).

Merge application is an exact left-to-right non-overlapping fold,
expressed identically in Spark (``aggregate`` HOF) and the DuckDB
oracle (``list_reduce``): symbols are accumulated into a
``SEP``-joined string with a leading SEP so "trailing symbol == a"
is the suffix test ``ends_with(acc, SEP || a)``; on a match the next
symbol b is appended WITHOUT a separator, fusing "a" into "ab".
Because the fused symbol "ab" can never equal "a" again (strictly
longer), the fold reproduces greedy non-overlapping BPE exactly —
e.g. pattern (a,a) over "a a a a" yields [aa, aa], over "a a a"
yields [aa, a].  Training words are restricted to ``^[A-Za-z0-9]+$``
so the separator character can never occur inside a symbol.

Interpreted-HOF cost is confined to the vocabulary table (the
documented HOF-vs-codegen tradeoff in BENCH/BASELINE.md is about
corpus-sized hot loops; a vocab-sized fold per round is noise).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geographiclib_go_spark.operators.cms import WS_REGEX_JAVA

SEP = "|"
WORD_RE = "^[A-Za-z0-9]+$"
_MAXLEN = 2147483647


def corpus_words(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, w): one row per alphanumeric word OCCURRENCE — the
    single word spec (whitespace split, empties dropped, WORD_RE
    filter) shared by the trainer, the batch tokenizer, and the
    streaming ingest gate, so the three can never drift."""
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), WS_REGEX_JAVA),
                           lambda x: F.length(x) > 0)).alias("w"))
        .filter(F.col("w").rlike(WORD_RE)))


def word_freq(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(w, n): corpus word-frequency table over alphanumeric
    whitespace tokens — the single corpus-sized stage."""
    return (corpus_words(docs, id_col, text_col)
            .groupBy("w").agg(F.count("*").alias("n")))


def _init_words(vf: DataFrame) -> DataFrame:
    """(w, syms: array<string>, n): split each word into 1-char
    symbols; the word itself rides along so the trained vocabulary
    can be joined back to a corpus (apply_bpe)."""
    return vf.select(
        F.col("w"),
        F.regexp_extract_all("w", F.lit("(.)"), 1).alias("syms"),
        F.col("n"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair counts weighted by word
    frequency."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(F.element_at("syms", i).alias("a"),
                           F.element_at("syms", F.lit(1) + i).alias("b")))
    return (words.filter(F.size("syms") >= 2)
            .select(F.explode(pairs).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt")))


def _apply_merge(words: DataFrame, best: DataFrame) -> DataFrame:
    """Rebuild every word's symbol array with the round's winning
    (a, b) fused left-to-right; `best` ships as a broadcast 1-row
    LEFT join on TRUE, so an EMPTY best (vocabulary exhausted before
    the requested rounds) leaves a/b NULL and the fold's
    NULL-condition `when` reproduces every word unchanged — rounds
    past exhaustion are identity, never a wipe (an earlier crossJoin
    formulation emptied the table, which was harmless for the merge
    list but would have persisted an EMPTY vocabulary snapshot for
    train_vocab/apply_bpe)."""
    folded = F.aggregate(
        F.slice("syms", 2, F.size("syms") - 1),
        F.concat(F.lit(SEP), F.element_at("syms", 1)),
        lambda acc, x: F.when(
            F.endswith(acc, F.concat(F.lit(SEP), F.col("a")))
            & (x == F.col("b")),
            F.concat(acc, x)).otherwise(F.concat(acc, F.lit(SEP), x)))
    return (words.join(F.broadcast(best.select("a", "b")),
                       F.lit(True), "left")
            .select(F.col("w"),
                    F.split(F.substring(folded, 2, _MAXLEN),
                            "\\" + SEP).alias("syms"),
                    F.col("n")))


def _train(docs: DataFrame, rounds: int, id_col: str,
           text_col: str):
    """(final words table, [1-row merge DataFrames]) after `rounds`
    merge rounds."""
    # The vocabulary table is corpus-INDEPENDENT in size (bounded by
    # distinct words), so compact it before the iterative loop: at
    # sandbox scale 1 partition; at 100 TB pick partitions ~ vocab/1M
    # rows.  Without this every round's tiny stages inherit the
    # corpus scan's shuffle width and the loop drowns in empty-task
    # scheduling (measured 36 s -> ~4 s at sf0.1, identical output).
    words = (_init_words(word_freq(docs, id_col, text_col))
             .coalesce(1).localCheckpoint(eager=True))
    merge_rows = []
    for r in range(1, rounds + 1):
        best = (_pair_counts(words)
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1))
        merge_rows.append(best.select(
            F.lit(r).cast("int").alias("round"), "a", "b",
            F.concat("a", "b").alias("merged"),
            F.col("cnt").cast("long").alias("cnt")))
        words = _apply_merge(words, best).localCheckpoint(eager=True)
    return words, merge_rows


def train_bpe(docs: DataFrame, rounds: int = 20,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Learned merge table (round, a, b, merged, cnt), one row per
    completed round (fewer than `rounds` rows only if the vocabulary
    runs out of adjacent pairs first)."""
    _, merge_rows = _train(docs, rounds, id_col, text_col)
    return functools.reduce(DataFrame.unionAll, merge_rows)


def train_vocab(docs: DataFrame, rounds: int = 20,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Trained tokenizer vocabulary (w, n_syms): each distinct
    corpus word with its token count AFTER `rounds` learned merges —
    the write-once artifact apply_bpe probes (train once at corpus
    build, apply at every ingest)."""
    words, _ = _train(docs, rounds, id_col, text_col)
    return words.select("w", F.size("syms").cast("long")
                        .alias("n_syms"))


def apply_bpe(docs: DataFrame, vocab: DataFrame,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with a trained vocabulary: per-doc
    (n_words, n_tokens, n_chars) over the same alphanumeric word
    spec the trainer used.  Map-only explode + ONE join against the
    vocab-sized table (broadcast or shuffle as the optimizer picks;
    every corpus word is present by construction when the vocab was
    trained on the same corpus) + one aggregate — the corpus-sized
    path never iterates.  Word spec shared via corpus_words."""
    dw = corpus_words(docs, id_col, text_col)
    return (dw.join(vocab.select("w", "n_syms"), "w")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_syms").alias("n_tokens"),
                 F.sum(F.length("w")).cast("long").alias("n_chars"))
            .orderBy("doc_id"))


def _rounds_cte_sql(rounds: int, table: str) -> str:
    """The shared WITH-prefix replaying `rounds` merge rounds: toks,
    w0, then (p_r, b_r, w_r) per round, every CTE MATERIALIZED —
    each round references the previous one twice, and inlined CTEs
    would double the plan per round.  The word column w rides
    through every w_r so the final vocabulary can join back to a
    corpus (bpe_apply_oracle_sql)."""
    from geographiclib_go_spark.operators.sketch_hash import WS_REGEX
    parts = [f"""
WITH toks AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split_regex(text, '{WS_REGEX}'),
                              x -> length(x) > 0)) AS w
    FROM {table}
  ) WHERE regexp_matches(w, '{WORD_RE}')
  GROUP BY w
),
w0 AS MATERIALIZED (
  SELECT w, regexp_extract_all(w, '(.)', 1) AS syms, n FROM toks
)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
p{r} AS MATERIALIZED (
  SELECT pr.a AS a, pr.b AS b, CAST(sum(n) AS BIGINT) AS cnt FROM (
    SELECT unnest([struct_pack(a := syms[i], b := syms[i+1])
                   for i in range(1, len(syms))]) AS pr, n
    FROM w{p} WHERE len(syms) >= 2
  ) GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
  SELECT a, b, a || b AS merged, cnt
  FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT w, string_split(substr(folded, 2), '{SEP}') AS syms, n
  FROM (
    SELECT w, list_reduce(
             list_concat(['{SEP}' || syms[1]], syms[2:]),
             (acc, x) -> CASE WHEN ends_with(acc, '{SEP}' || bb.a)
                               AND x = bb.b
                         THEN acc || x
                         ELSE acc || '{SEP}' || x END) AS folded, n
    FROM w{p} LEFT JOIN b{r} bb ON true
  )
)""")
    return "".join(parts)


def bpe_oracle_sql(rounds: int = 20, table: str = "documents") -> str:
    """DuckDB replay of train_bpe: same word-frequency table, same
    pair counting, same deterministic argmax, same list_reduce
    fold."""
    unions = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS round, a, b, merged, cnt "
        f"FROM b{r}" for r in range(1, rounds + 1))
    return (_rounds_cte_sql(rounds, table)
            + f"\n{unions}\nORDER BY round")


def bpe_apply_oracle_sql(rounds: int = 20,
                         table: str = "documents") -> str:
    """DuckDB replay of train_vocab + apply_bpe: the identical
    rounds, then the per-doc tokenization join against the final
    vocabulary."""
    from geographiclib_go_spark.operators.sketch_hash import WS_REGEX
    return _rounds_cte_sql(rounds, table) + f""",
vocab AS MATERIALIZED (
  SELECT w, CAST(len(syms) AS BIGINT) AS n_syms FROM w{rounds}
),
dw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(text, '{WS_REGEX}'),
                              x -> length(x) > 0)) AS w
    FROM {table}
  ) WHERE regexp_matches(w, '{WORD_RE}')
)
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(v.n_syms) AS BIGINT) AS n_tokens,
       CAST(sum(length(dw.w)) AS BIGINT) AS n_chars
FROM dw JOIN vocab v USING (w)
GROUP BY dw.doc_id
ORDER BY dw.doc_id
"""
