"""Distributed connected components for duplicate-cluster resolution
(engine-added; no reference analog).

The dedup operators (minhash LSH, SimHash / phash Hamming band
joins, embedding LSH) emit near-duplicate PAIRS.  A real
training-data pipeline needs the transitive closure of those pairs —
duplicate CLUSTERS with one canonical survivor each — so "A~B, B~C"
keeps one of {A,B,C}, not two.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), the
standard shuffle-friendly CC construction:

- large-star: every node points its LARGER neighbors at the minimum
  of its closed neighborhood;
- small-star: every node points its smaller-or-equal neighbors (and
  itself) at that minimum.

Both rounds are one groupBy + one equi-join each (two shuffles per
iteration, all map-side combinable), and the pair converges in
O(log^2 n) rounds to a forest of stars rooted at each component's
minimum id — no driver-side graph state, no per-row Python, and the
per-round working set is the (shrinking) edge list, so the plan is
the one you would run at 10^12 edges.  Convergence is detected by an
order-independent edge-multiset checksum (count + sum of xxhash64),
and each round is localCheckpoint()ed: iterative DataFrame plans
otherwise accrete lineage until Catalyst analysis itself becomes the
bottleneck (the classic iterative-Spark failure mode).

Verification: the DuckDB oracle recomputes components from the SAME
pair set by recursive-CTE min-label closure (queries.py
image_dup_components), and pytest cross-checks random graphs against
a driver-side union-find (tests/test_components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view (u, v) of an (id_a, id_b) pair list: both
    orientations, self-loops dropped."""
    fwd = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    rev = edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    return fwd.union(rev).filter(F.col("u") != F.col("v"))


def _large_star(sym: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) + {u}).

    One groupBy(u) for the neighborhood minimum, one equi-join to
    re-emit edges — both partial-aggregable shuffles on the node id.
    """
    mins = (sym.groupBy("u").agg(F.min("v").alias("_mn"))
            .select("u", F.least(F.col("u"), F.col("_mn")).alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("id_a"), F.col("m").alias("id_b"))
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge (hi, lo); each hi node attaches itself and
    all its small neighbors to the minimum of its small neighborhood.
    """
    oriented = (edges.select(
        F.greatest(F.col("id_a"), F.col("id_b")).alias("u"),
        F.least(F.col("id_a"), F.col("id_b")).alias("v"))
        .filter(F.col("u") != F.col("v")))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    attach_nbrs = (oriented.join(mins, "u")
                   .filter(F.col("v") != F.col("m"))
                   .select(F.col("v").alias("id_a"),
                           F.col("m").alias("id_b")))
    attach_self = mins.select(F.col("u").alias("id_a"),
                              F.col("m").alias("id_b"))
    return attach_nbrs.union(attach_self).distinct()


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    """Order-independent fingerprint of a distinct edge list:
    (row count, bit_xor of per-edge 64-bit hashes) — XOR commutes,
    never overflows (ANSI-safe), and the edge list is distinct so
    multiset-vs-set is moot.  One tiny aggregate per round — the
    convergence test never collects edges."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("id_a", "id_b")), F.lit(0))
        .alias("s")).collect()[0]
    return int(row["n"]), int(row["s"])


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 20,
                         with_stats: bool = False):
    """(id, component_id) for every node appearing in `pairs`, where
    component_id is the minimum node id of its connected component.

    Nodes never mentioned in a pair are singletons by definition and
    are not emitted (callers left-join and coalesce(component_id, id)
    if they want total coverage — see image_dup_components).

    max_iter bounds the alternation; large/small-star converges in
    O(log^2 n) rounds so 20 covers any physically storable graph.  A
    graph that somehow fails to converge raises rather than returning
    a partial labeling.
    """
    edges = (pairs.select(F.col(id_a).cast("long").alias("id_a"),
                          F.col(id_b).cast("long").alias("id_b"))
             .filter(F.col("id_a") != F.col("id_b"))
             .distinct()
             .localCheckpoint(eager=True))
    prev = _edge_checksum(edges)
    rounds = 0
    for rounds in range(1, max_iter + 1):
        stepped = _small_star(_large_star(_symmetrize(edges)))
        # truncate lineage every round: without this the logical plan
        # doubles per iteration and Catalyst analysis time explodes
        stepped = stepped.localCheckpoint(eager=True)
        cur = _edge_checksum(stepped)
        edges.unpersist()
        edges = stepped
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large/small-star rounds")
    # fixed point = star forest: every non-root points at its
    # component minimum; roots label themselves
    members = edges.select(F.col("id_a").alias("id"),
                           F.col("id_b").alias("component_id"))
    roots = (edges.select(F.col("id_b").alias("id"))
             .distinct()
             .join(members.select("id"), "id", "left_anti")
             .withColumn("component_id", F.col("id")))
    out = members.union(roots)
    return (out, rounds) if with_stats else out
