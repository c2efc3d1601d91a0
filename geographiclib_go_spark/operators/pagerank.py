"""Integer-exact PageRank over a deterministic link graph — the
authority signal a crawl-quality pipeline computes before weighting
training data by source trust (the classic 'rank the crawl' step).

The graph is synthesized from the documents table itself: every doc
links to exactly OUT_DEG others via affine hash maps
dst_k = (doc_id * A_k + B_k) mod N over the contiguous id space, so
both engines derive the identical edge multiset from the same scan
(self-loops and parallel edges are kept — they are well-defined for
PageRank and keeping them avoids a dedup exchange).

What makes an ITERATIVE algorithm hash-oracle-able is the same trick
as operators/kmeans.py: integer quantization.  Ranks live as BIGINTs
scaled by PR_SCALE; each iteration is
    r' = PR_SCALE*15 DIV 100  +  (85 * sum_in(r DIV OUT_DEG)) DIV 100
— every operation is exact int64 arithmetic both engines reproduce,
where float ranks would diverge by summation order.  Iterations are
unrolled (PR_ITERS is a constant shared with the SQL builder), so the
whole computation is ONE Catalyst plan.

100 TB shape: per iteration, ONE partial-aggregated shuffle keyed on
dst (in-edge contributions) plus an equi-join of ranks to edges — at
scale the edge table is the big side and stays put; ranks are the
small per-node frame.  No driver-side graph state, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Affine edge maps ((src % PR_SRC_MASK) * A + B) % N — three
# out-edges per doc.  The mask bounds the multiply: with src folded
# into [0, 2^31) the largest product is (2^31-1) * 1103515245 + B
# < 2^62, so the arithmetic can never overflow int64 regardless of
# doc_id magnitude — Spark (ANSI off) would wrap silently where
# DuckDB raises, and the two engines would diverge exactly at the
# scale this operator claims to serve.  For doc_id < 2^31 the mask
# is the identity, so fixture-scale results are unchanged.
PR_EDGE_CONSTS = ((1103515245, 12345),
                  (69069, 362437),
                  (1664525, 1013904223))
PR_SRC_MASK = 1 << 31
OUT_DEG = len(PR_EDGE_CONSTS)
PR_SCALE = 1_000_000      # initial rank per node
PR_D_NUM, PR_D_DEN = 85, 100   # damping 0.85 as an exact rational
PR_ITERS = 3
PR_TOPK = 20

_BASE = PR_SCALE * (PR_D_DEN - PR_D_NUM) // PR_D_DEN  # teleport mass


def _edges(docs: DataFrame) -> DataFrame:
    """(src, dst): the deterministic link multiset.  N comes from a
    1-row aggregate broadcast back (no driver collect)."""
    n1 = docs.agg(F.count("*").alias("_n"))
    ids = docs.select(F.col("doc_id").cast("long").alias("src")) \
              .crossJoin(F.broadcast(n1))
    dsts = F.array(*[
        ((F.col("src") % F.lit(PR_SRC_MASK)) * F.lit(a) + F.lit(b))
        % F.col("_n")
        for a, b in PR_EDGE_CONSTS])
    return ids.select("src", F.explode(dsts).alias("dst"))


def pagerank(docs: DataFrame,
             iters: int = PR_ITERS,
             topk: int = PR_TOPK,
             snapshot=None) -> DataFrame:
    """(doc_id, n_in, pr): top-k docs by integer PageRank after
    `iters` unrolled rounds, ties to the lower doc_id; n_in (the
    in-degree) rides along as a structural witness.

    The edge multiset feeds every unrolled round AND the in-degree
    witness, so it is materialized ONCE — the materialize-the-graph
    step every distributed PageRank does.  Pass ``snapshot`` (a
    DataFrame -> DataFrame callable, e.g. a plans/lineage.run_stage
    wrapper) to persist it as a write-once artifact that reruns
    probe instead of recompute; without one the edges are eagerly
    localCheckpoint-ed — lineage-truncated, and the blocks are
    released by the ContextCleaner when the plan goes out of scope
    (a bare cache() would leak for the session lifetime across
    repeated invocations)."""
    edges = _edges(docs)
    edges = (snapshot(edges) if snapshot is not None
             else edges.localCheckpoint(eager=True))
    ranks = docs.select(F.col("doc_id").cast("long").alias("id"),
                        F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (edges.join(ranks, edges.src == ranks.id)
                   .select("dst", F.expr(f"r DIV {OUT_DEG}").alias("c"))
                   .groupBy("dst")
                   .agg(F.sum("c").alias("s")))
        ranks = (docs.select(F.col("doc_id").cast("long").alias("id"))
                 .join(contrib, F.col("id") == F.col("dst"), "left")
                 .select("id",
                         (F.lit(_BASE)
                          + F.expr(f"{PR_D_NUM} * coalesce(s, 0)"
                                   f" DIV {PR_D_DEN}"))
                         .cast("long").alias("r")))
    indeg = (edges.groupBy("dst").agg(F.count("*").alias("n_in")))
    return (ranks.join(indeg, ranks.id == indeg.dst, "left")
            .select(F.col("id").alias("doc_id"),
                    F.coalesce("n_in", F.lit(0)).cast("long")
                    .alias("n_in"),
                    F.col("r").alias("pr"))
            .orderBy(F.col("pr").desc(), "doc_id")
            .limit(topk))


def pagerank_oracle_sql(iters: int = PR_ITERS,
                        topk: int = PR_TOPK) -> str:
    """DuckDB twin: the same unrolled iterations as CTEs, constants
    baked from this module."""
    edge_selects = "\n          UNION ALL ".join(
        f"SELECT doc_id AS src, "
        f"((doc_id % {PR_SRC_MASK}) * {a} + {b}) % n.n AS dst "
        f"FROM ids, n"
        for a, b in PR_EDGE_CONSTS)
    ctes = [
        "n AS (SELECT COUNT(*) AS n FROM documents)",
        "ids AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents)",
        f"e AS ({edge_selects})",
        f"r0 AS (SELECT doc_id AS id, CAST({PR_SCALE} AS BIGINT) AS r "
        "FROM ids)",
    ]
    for i in range(iters):
        ctes.append(
            f"c{i + 1} AS (SELECT dst, SUM(r // {OUT_DEG}) AS s "
            f"FROM e JOIN r{i} ON e.src = r{i}.id GROUP BY dst)")
        ctes.append(
            f"r{i + 1} AS (SELECT doc_id AS id, "
            f"CAST({_BASE} + ({PR_D_NUM} * COALESCE(s, 0)) "
            f"// {PR_D_DEN} AS BIGINT) AS r "
            f"FROM ids LEFT JOIN c{i + 1} ON doc_id = c{i + 1}.dst)")
    ctes.append("indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS "
                "n_in FROM e GROUP BY dst)")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT r{iters}.id AS doc_id,
               COALESCE(indeg.n_in, 0) AS n_in,
               r{iters}.r AS pr
        FROM r{iters} LEFT JOIN indeg ON r{iters}.id = indeg.dst
        ORDER BY pr DESC, doc_id ASC
        LIMIT {topk}
    """
