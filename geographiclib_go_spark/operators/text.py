"""Text-analysis operators for training-data pipelines (engine-added).

All hot-path scoring is JVM-side Catalyst expressions (split/replace/
length arithmetic — whole-stage codegen, no Python); only the rolling
document fingerprint needs a vectorized pandas UDF.  Each operator is
deliberately expressible in portable ANSI SQL so the DuckDB oracle can
verify it bit-for-bit at small scale (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# language -> marker words (checked as ' word '-padded substrings so
# both engines count identically with pure replace/length arithmetic)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "los"),
    "de": ("der", "und", "die"),
    "fr": ("le", "les", "des"),
}


def substr_count(col: Column, needle: str) -> Column:
    """Occurrences of needle via replace/length arithmetic — exact
    integer result, portable to any SQL dialect."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace tokens (split on single spaces; documents are
    space-normalized in the synthetic corpus)."""
    return F.size(F.split(F.trim(col), " "))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns: n_chars, n_tokens, avg token length,
    marker-word counts.  All codegen'd expressions."""
    c = F.col(text_col)
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    df = (df
          .withColumn("n_chars_calc", F.length(c))
          .withColumn("n_tokens", token_count(c))
          .withColumn("avg_token_len",
                      (F.length(F.replace(c, F.lit(" "), F.lit("")))
                       / token_count(c))))
    for lang, words in LANG_MARKERS.items():
        expr = None
        for w in words:
            cnt = substr_count(padded, f" {w} ")
            expr = cnt if expr is None else (expr + cnt)
        df = df.withColumn(f"hits_{lang}", expr)
    return df


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hits, 'unk' when
    all zero.  Ties resolve in the fixed order en > es > de > fr —
    mirrored exactly in the SQL oracle."""
    df = with_text_stats(df, text_col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    guess = F.when(best == 0, F.lit("unk"))
    for l in langs:
        guess = guess.when(F.col(f"hits_{l}") == best, F.lit(l))
    return df.withColumn("lang_guess", guess)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + token shape.
    Integer/rational arithmetic only -> oracle-exact."""
    df = with_text_stats(df, text_col)
    n = F.col("n_tokens")
    ln = F.col("n_chars_calc")
    score = (
        F.when((ln >= 20) & (ln <= 2000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when((n >= 5) & (n <= 500), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((F.col("avg_token_len") >= 2)
                 & (F.col("avg_token_len") <= 12),
                 F.lit(0.2)).otherwise(F.lit(0.0)))
    return df.withColumn("quality", score)


# BPE-ish pre-tokenizer classes (GPT-2-style splitting simplified to
# a regex-engine-portable form: letter runs, single digits, single
# non-alnum marks).  Kept to character classes so Java regex (Spark,
# whole-stage codegen) and RE2 (DuckDB oracle) agree exactly.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"


def with_bpe_token_stats(df: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Sub-word-style token counts via the BPE-ish pre-tokenizer
    regex — all JVM-side regexp_extract_all/size expressions (no
    Python), mirrored exactly in the SQL oracle."""
    c = F.col(text_col)
    return (df
            .withColumn("n_bpe_tokens",
                        F.size(F.expr(
                            f"regexp_extract_all({text_col}, "
                            f"'{BPE_TOKEN_RE}', 0)")).cast("long"))
            .withColumn("n_alpha_runs",
                        F.size(F.expr(
                            f"regexp_extract_all({text_col}, "
                            f"'[A-Za-z]+', 0)")).cast("long"))
            .withColumn("n_digits",
                        F.size(F.expr(
                            f"regexp_extract_all({text_col}, "
                            f"'[0-9]', 0)")).cast("long"))
            .withColumn("n_marks",
                        (F.col("n_bpe_tokens") - F.col("n_alpha_runs")
                         - F.col("n_digits")).cast("long")))


def fingerprint_udf(window: int = 16):
    """Rolling polynomial document fingerprint (Rabin-Karp style):
    min of the 62-bit wide polynomial hash over `window`-char windows
    — a deterministic document sketch for fuzzy dedup.  Batch-
    vectorized on the concatenated code-point stream
    (sketch_hash.fingerprint_batch — no per-document or per-byte
    Python), and SQL-mirrorable so the DuckDB oracle recomputes every
    fingerprint (sketch_hash.fingerprint_oracle_sql)."""

    @pandas_udf(T.LongType())
    def doc_fingerprint(text: pd.Series) -> pd.Series:
        from geographiclib_go_spark.operators import sketch_hash as sk
        return pd.Series(sk.fingerprint_batch(text.tolist(), window))

    return doc_fingerprint
