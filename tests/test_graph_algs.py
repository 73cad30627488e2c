"""PageRank + bounded BFS over the triple table."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.graph_algs import k_hop, pagerank

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]  # c is dangling


def _edges(spark):
    return spark.createDataFrame(EDGES, "subj string, obj string")


def _reference_pagerank(edges, iters=5, d=0.85):
    """Independent driver-side power iteration (same recurrence)."""
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _t in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / out[s]
        dm = sum(r for v, r in rank.items() if v not in out)
        rank = {v: (1 - d) / n + d * (contrib[v] + dm / n) for v in nodes}
    return rank


def test_pagerank_matches_reference_iteration(spark):
    got = {r["node"]: r["rank"] for r in pagerank(_edges(spark), iterations=5).collect()}
    want = _reference_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    # rank mass is conserved (dangling redistribution)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_k_hop_levels(spark):
    chain = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n2", "n3"), ("n1", "n0")],
        "subj string, obj string",
    )
    got = {r["node"]: r["hop"] for r in k_hop(chain, "n0", k=2).collect()}
    assert got == {"n0": 0, "n1": 1, "n2": 2}
    got3 = {r["node"]: r["hop"] for r in k_hop(chain, "n0", k=3).collect()}
    assert got3["n3"] == 3


def test_k_hop_start_df(spark):
    e = _edges(spark)
    start = e.agg(F.min("subj").alias("start"))
    got = {r["node"]: r["hop"] for r in k_hop(e, start, k=1).collect()}
    assert got == {"a": 0, "b": 1, "c": 1}
