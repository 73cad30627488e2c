"""simrank: bounded-round integer-ppm SimRank vs a brute-force replica."""

from __future__ import annotations

from collections import defaultdict

import pytest

from kgspark.graph_algs import simrank


def _brute(edges, rounds, c_ppm=800_000):
    """Exact replica of the documented semantics: identity seed, ppm
    truncating division, support = same-depth common ancestors."""
    inn = defaultdict(set)
    for s, d in edges:
        if s != d:
            inn[d].add(s)
    nodes = {n for e in edges for n in e}

    def s0(i, j):
        return 1_000_000 if i == j else 0

    prev = s0
    for _ in range(rounds):
        cur_scores = {}
        for a in nodes:
            for b in nodes:
                if a >= b or not inn[a] or not inn[b]:
                    continue
                tot = sum(prev(i, j) for i in inn[a] for j in inn[b])
                v = (c_ppm * tot) // (len(inn[a]) * len(inn[b]) * 1_000_000)
                if v > 0:
                    cur_scores[(a, b)] = v
        snap = dict(cur_scores)

        def cur(i, j, _s=snap):
            if i == j:
                return 1_000_000
            k = (i, j) if i < j else (j, i)
            return _s.get(k, 0)

        prev = cur
    return snap


@pytest.fixture(scope="module")
def edges():
    # three-layer graph: u's -> v's -> w's, plus u -> w shortcuts, so
    # round 2 strictly extends round 1 (w-pairs gain from similar v's)
    rows = []
    for d in range(60):
        rows.append((f"u{d % 7}", f"v{d % 4}"))
        rows.append((f"v{d % 4}", f"w{(d // 4) % 3}"))
        rows.append((f"u{d % 7}", f"w{(d // 3) % 3}"))
    return sorted(set(rows))


def test_simrank_matches_brute_force(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["a"], r["b"]): r["s_ppm"]
           for r in simrank(df, rounds=2).collect()}
    assert got == _brute(edges, rounds=2)
    assert got  # non-degenerate fixture


def test_simrank_round1_is_common_neighbor_formula(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["a"], r["b"]): r["s_ppm"]
           for r in simrank(df, rounds=1).collect()}
    assert got == _brute(edges, rounds=1)
    # round 2 differs from round 1 somewhere (the fixture's point)
    got2 = {(r["a"], r["b"]): r["s_ppm"]
            for r in simrank(df, rounds=2).collect()}
    assert got2 != got


def test_simrank_guards(spark):
    # x cites a, b, c: the co-cited pairs (a,b), (a,c), (b,c) share the
    # hub ancestor x (group size 3)
    df = spark.createDataFrame(
        [("x", "a"), ("x", "b"), ("x", "c")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="rounds"):
        simrank(df, rounds=0)
    # hub ancestor dropped from pair generation when over the cap
    assert simrank(df, rounds=1, max_group=2).count() == 0
    assert simrank(df, rounds=1, max_group=3).count() == 3


def test_simrank_self_loops_ignored_empty_ok(spark):
    df = spark.createDataFrame([("a", "a")], "src string, dst string")
    assert simrank(df, rounds=2).count() == 0


def test_pathsim_brute_force(spark):
    from collections import defaultdict

    from kgspark.graph_algs import pathsim

    rows = [("a", "y1", 2), ("a", "y2", 1), ("b", "y1", 1), ("b", "y3", 3),
            ("c", "y2", 2), ("c", "y1", 1), ("d", "y4", 5)]
    df = spark.createDataFrame(rows, "x string, y string, c long")
    got = {(r["a"], r["b"]): (r["m_ab"], r["pathsim_ppm"])
           for r in pathsim(df).collect()}
    vec = defaultdict(dict)
    for xx, yy, cc in rows:
        vec[xx][yy] = cc

    def m(p, q):
        return sum(vec[p].get(k, 0) * vec[q].get(k, 0) for k in vec[p])

    expect = {}
    for p in vec:
        for q in vec:
            if p < q and m(p, q) > 0:
                expect[(p, q)] = (
                    m(p, q), (2_000_000 * m(p, q)) // (m(p, p) + m(q, q)))
    assert got == expect
    assert ("a", "d") not in got  # no shared y


def test_pathsim_hub_cap_and_self_sim(spark):
    from kgspark.graph_algs import pathsim

    rows = [(f"x{i}", "hub", 1) for i in range(5)] + [
        ("x0", "y", 1), ("x1", "y", 1)]
    df = spark.createDataFrame(rows, "x string, y string, c long")
    got = {(r["a"], r["b"]): r["pathsim_ppm"]
           for r in pathsim(df, max_group=4).collect()}
    # hub key dropped: only the y-pair survives; m_aa counts ALL paths
    # (2 each: hub+y), so s = 2*1/(2+2)
    assert got == {("x0", "x1"): 500000}


def test_compose_relation_matrix_product(spark):
    from kgspark.graph_algs import compose_relation, pathsim

    pb = spark.createDataFrame(
        [("p1", "b1", 1), ("p2", "b1", 1), ("p3", "b2", 1)],
        "x string, y string, c long",
    )
    bt = spark.createDataFrame(
        [("b1", "t1", 2), ("b2", "t1", 1)], "x string, y string, c long"
    )
    comp = {(r["x"], r["y"]): r["c"]
            for r in compose_relation(pb, bt).collect()}
    assert comp == {("p1", "t1"): 2, ("p2", "t1"): 2, ("p3", "t1"): 1}
    sim = {(r["a"], r["b"]): r["pathsim_ppm"]
           for r in pathsim(compose_relation(pb, bt)).collect()}
    # p1~p2: m_ab=4, m_aa=m_bb=4 -> 1.0; p1~p3: m=2, (4+1) -> 0.8
    assert sim == {("p1", "p2"): 1000000, ("p1", "p3"): 800000,
                   ("p2", "p3"): 800000}


def test_quotient_graph(spark):
    from kgspark.graph_algs import quotient_graph

    edges = spark.createDataFrame(
        [("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("b1", "a1"),
         ("a1", "zz")],  # zz unlabeled -> dropped
        "src string, dst string",
    )
    labels = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")],
        "node string, cls string",
    )
    got = {(r["cls_src"], r["cls_dst"]): (r["n_edges"], r["n_src"],
                                          r["n_dst"])
           for r in quotient_graph(edges, labels).collect()}
    assert got == {("A", "B"): (3, 2, 2), ("B", "A"): (1, 1, 1)}


def test_temporal_reach_respects_time(spark):
    from kgspark.graph_algs import temporal_reach

    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 3),   # too late: 3 < 5
         ("a", "d", 1), ("d", "c", 2),   # valid: 1 <= 2
         ("c", "e", 2)],                  # c@2 -> e@2 (non-strict ok)
        "src string, dst string, ts long",
    )
    seeds = spark.createDataFrame([("a",)], "n string")
    got = {(r["start"], r["node"]): (r["earliest_ts"], r["hops"])
           for r in temporal_reach(edges, seeds, max_hops=4).collect()}
    assert got[("a", "b")] == (5, 1)
    assert got[("a", "d")] == (1, 1)
    assert got[("a", "c")] == (2, 2)     # via d, NOT via b
    assert got[("a", "e")] == (2, 3)     # c@2 then e@2
    # strict mode kills the c@2 -> e@2 continuation
    got_s = {(r["start"], r["node"])
             for r in temporal_reach(edges, seeds, max_hops=4,
                                     strict=True).collect()}
    assert ("a", "e") not in got_s and ("a", "c") in got_s


def test_temporal_reach_earliest_beats_fewest_hops(spark):
    from kgspark.graph_algs import temporal_reach

    # direct edge arrives at 9; 2-hop path arrives at 4
    edges = spark.createDataFrame(
        [("a", "z", 9), ("a", "m", 1), ("m", "z", 4)],
        "src string, dst string, ts long",
    )
    seeds = spark.createDataFrame([("a",)], "n string")
    got = {r["node"]: (r["earliest_ts"], r["hops"])
           for r in temporal_reach(edges, seeds, max_hops=3).collect()}
    assert got["z"] == (4, 2)
    # hop bound 1 -> only direct arrivals
    got1 = {r["node"]: r["earliest_ts"]
            for r in temporal_reach(edges, seeds, max_hops=1).collect()}
    assert got1 == {"z": 9, "m": 1}


def test_temporal_reach_cycle_terminates(spark):
    from kgspark.graph_algs import temporal_reach

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 2), ("a", "b", 3)],
        "src string, dst string, ts long",
    )
    seeds = spark.createDataFrame([("a",)], "n string")
    got = {(r["node"]): (r["earliest_ts"], r["hops"])
           for r in temporal_reach(edges, seeds, max_hops=6).collect()}
    assert got["b"] == (1, 1) and got["a"] == (2, 2)


def test_infer_types_plurality_and_rounds(spark):
    from kgspark.graph_algs import infer_types

    edges = spark.createDataFrame(
        [("u1", "v"), ("u2", "v"), ("u3", "v"),   # v: 2x A vs 1x B -> A
         ("v", "w"),                               # w typed in round 2
         ("u9", "z")],                             # z's only nbr untyped u9
        "src string, dst string",
    )
    seeds = spark.createDataFrame(
        [("u1", "A"), ("u2", "A"), ("u3", "B")], "node string, type string"
    )
    got = {r["node"]: (r["type"], r["round"])
           for r in infer_types(edges, seeds, rounds=3).collect()}
    assert got["u1"] == ("A", 0) and got["u3"] == ("B", 0)  # seeds fixed
    assert got["v"] == ("A", 1)
    assert got["w"] == ("A", 2)
    assert "z" not in got and "u9" not in got  # unreachable stay absent


def test_infer_types_tie_breaks_to_min_type(spark):
    from kgspark.graph_algs import infer_types

    edges = spark.createDataFrame(
        [("a", "v"), ("b", "v")], "src string, dst string"
    )
    seeds = spark.createDataFrame(
        [("a", "B"), ("b", "A")], "node string, type string"
    )
    got = {r["node"]: r["type"]
           for r in infer_types(edges, seeds, rounds=1).collect()}
    assert got["v"] == "A"  # 1-1 tie -> lexicographically smaller
    import pytest as _p
    with _p.raises(ValueError, match="rounds"):
        infer_types(edges, seeds, rounds=0)


def _brute_betweenness(edge_list, sources, max_depth):
    """Replica of the documented ppm semantics: BFS sigma, per-term
    truncating-div dependency, sources excluded."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edge_list:
        if u != v:
            adj[u].add(v)
    bc = defaultdict(int)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(1, max_depth + 1):
            nxt = defaultdict(int)
            for v in levels[-1]:
                for w in adj[v]:
                    if w not in dist or dist[w] == d:
                        nxt[w] += sigma[v]
            new = [w for w in nxt if w not in dist]
            if not new:
                break
            for w in new:
                dist[w] = d
                sigma[w] = nxt[w]
            levels.append(sorted(new))
        delta = defaultdict(int)
        for d in range(len(levels) - 2, -1, -1):
            for v in levels[d]:
                tot = 0
                for w in adj[v]:
                    if dist.get(w) == d + 1:
                        tot += (sigma[v] * (1_000_000 + delta[w])) // sigma[w]
                delta[v] = tot
            if d > 0:
                for v in levels[d]:
                    bc[v] += delta[v]
    return {k: v for k, v in bc.items() if v}


def test_betweenness_matches_brute(spark):
    from kgspark.graph_algs import betweenness

    edge_list = [
        ("s1", "a"), ("s1", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
        ("s2", "c"), ("s2", "a"), ("d", "e"), ("b", "d"),
    ]
    e = spark.createDataFrame(edge_list, "src string, dst string")
    seeds = spark.createDataFrame([("s1",), ("s2",)], "n string")
    got = {r["node"]: r["bc_ppm"]
           for r in betweenness(e, seeds, max_depth=4).collect()}
    exp = _brute_betweenness(edge_list, ["s1", "s2"], 4)
    assert got == exp
    # b bridges s1 to both c and d: it dominates
    assert got["b"] == max(got.values())


def test_betweenness_chain_and_bounds(spark):
    from kgspark.graph_algs import betweenness

    # chain s -> a -> b -> c: delta(a)=(1+delta(b)), classic 2,1 pattern
    e = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("b", "c")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s",)], "n string")
    got = {r["node"]: r["bc_ppm"]
           for r in betweenness(e, seeds, max_depth=4).collect()}
    assert got == {"a": 2_000_000, "b": 1_000_000}
    # depth bound cuts the cone
    got1 = {r["node"]: r["bc_ppm"]
            for r in betweenness(e, seeds, max_depth=2).collect()}
    assert got1 == {"a": 1_000_000}
    import pytest as _p
    with _p.raises(ValueError, match="max_depth"):
        betweenness(e, seeds, max_depth=0)
