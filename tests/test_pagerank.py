"""Integer-exact PageRank (operators/pagerank.py) vs a pure-python
replay — the third implementation alongside the Spark plan and the
DuckDB oracle CTE chain."""

from geographiclib_go_spark.operators import pagerank as pr


def _python_pagerank(n, iters):
    edges = [(u, (u * a + b) % n)
             for u in range(n) for a, b in pr.PR_EDGE_CONSTS]
    base = pr.PR_SCALE * (pr.PR_D_DEN - pr.PR_D_NUM) // pr.PR_D_DEN
    r = {u: pr.PR_SCALE for u in range(n)}
    for _ in range(iters):
        s = {u: 0 for u in range(n)}
        for u, v in edges:
            s[v] += r[u] // pr.OUT_DEG
        r = {u: base + pr.PR_D_NUM * s[u] // pr.PR_D_DEN
             for u in range(n)}
    indeg = {u: 0 for u in range(n)}
    for _, v in edges:
        indeg[v] += 1
    return r, indeg


def test_pagerank_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    want_r, want_in = _python_pagerank(n, pr.PR_ITERS)
    rows = pr.pagerank(docs).collect()
    assert len(rows) == pr.PR_TOPK
    # the Spark rows must be the python top-k under the same ordering
    order = sorted(range(n), key=lambda u: (-want_r[u], u))
    for got, u in zip(rows, order[:pr.PR_TOPK]):
        assert int(got["doc_id"]) == u
        assert int(got["pr"]) == want_r[u]
        assert int(got["n_in"]) == want_in[u]


def test_pagerank_mass_is_conserved_up_to_floor_loss(spark, sf_dir):
    """Total rank stays within N * (floor losses per node per round)
    of the theoretical stationary total — a structural check the
    top-k projection can't see."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    r, _ = _python_pagerank(n, pr.PR_ITERS)
    total = sum(r.values())
    # each round each node floors twice (DIV OUT_DEG, DIV D_DEN):
    # bounded loss < n * (OUT_DEG + D_DEN) per round
    slack = pr.PR_ITERS * n * (pr.OUT_DEG + pr.PR_D_DEN)
    assert abs(total - n * pr.PR_SCALE) <= slack
