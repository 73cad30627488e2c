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


def test_triangle_count_known_graph(spark):
    from kgspark.graph_algs import triangle_count

    # K4 on {a,b,c,d} (4 triangles, each node in 3) plus a pendant path d-e-f
    # (no new triangles); edge directions and duplicates must not matter
    k4 = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d"),
          ("c", "d"), ("d", "e"), ("e", "f"), ("b", "a"), ("a", "b")]
    e = spark.createDataFrame(k4, "subj string, obj string")
    got = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # self-loops are ignored
    e2 = e.union(spark.createDataFrame([("a", "a")], "subj string, obj string"))
    assert {r["node"]: r["triangles"]
            for r in triangle_count(e2).collect()} == got


def test_common_neighbors_link_prediction(spark):
    from kgspark.graph_algs import common_neighbors

    # square a-b-c-d-a: the two diagonals (a,c) and (b,d) each share exactly
    # 2 neighbors and are unlinked; every adjacent pair is excluded
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    e = spark.createDataFrame(sq, "subj string, obj string")
    got = {(r["u"], r["v"]): (r["common"], r["jaccard"])
           for r in common_neighbors(e, min_common=2).collect()}
    assert got == {("a", "c"): (2, 1.0), ("b", "d"): (2, 1.0)}
    # jaccard denominator: deg(u)+deg(v)-common
    star = sq + [("a", "x"), ("c", "x")]  # a,c now deg 3, still share b,d,x
    e2 = spark.createDataFrame(star, "subj string, obj string")
    got2 = {(r["u"], r["v"]): (r["common"], r["jaccard"])
            for r in common_neighbors(e2, min_common=2).collect()}
    assert got2[("a", "c")] == (3, 1.0)  # 3 / (3 + 3 - 3)
    assert got2[("b", "x")] == (2, 1.0)


def test_common_neighbors_max_degree_drops_hubs(spark):
    from kgspark.graph_algs import common_neighbors

    # hub h connects everyone; only wedges THROUGH low-degree nodes survive
    hub = [("h", x) for x in "abcdef"] + [("a", "m"), ("b", "m")]
    e = spark.createDataFrame(hub, "subj string, obj string")
    with_hub = {(r["u"], r["v"])
                for r in common_neighbors(e, min_common=1).collect()}
    assert ("c", "d") in with_hub  # via the hub
    pruned = {(r["u"], r["v"])
              for r in common_neighbors(e, min_common=1, max_degree=3).collect()}
    assert ("c", "d") not in pruned
    assert ("a", "b") in pruned  # via m (degree 2)


def test_hits_star_graph(spark):
    from kgspark.graph_algs import hits

    # h1,h2,h3 all point at A; h1 also points at B
    edges = spark.createDataFrame(
        [("h1", "A"), ("h2", "A"), ("h3", "A"), ("h1", "B")],
        ["subj", "obj"],
    )
    one = {r["node"]: (r["hub"], r["auth"])
           for r in hits(edges, iterations=1).collect()}
    # authorities: A gets 3 hub-units, B gets 1 -> 0.75 / 0.25
    assert abs(one["A"][1] - 0.75) < 1e-9
    assert abs(one["B"][1] - 0.25) < 1e-9
    # hubs: h1 covers both (1.0 raw), h2/h3 cover A (0.75) -> L1-normalized
    assert abs(one["h1"][0] - 1.0 / 2.5) < 1e-9
    assert abs(one["h2"][0] - 0.75 / 2.5) < 1e-9
    # pure authorities have zero hub mass; pure hubs zero authority
    assert one["A"][0] == 0.0 and one["h1"][1] == 0.0

    two = {r["node"]: (r["hub"], r["auth"])
           for r in hits(edges, iterations=2).collect()}
    # round 2: auth_raw(A)=0.4+0.3+0.3=1.0, auth_raw(B)=0.4 -> 5/7, 2/7;
    # hub_raw(h1)=1, h2=h3=5/7 -> 7/17, 5/17, 5/17
    assert abs(two["A"][1] - 5.0 / 7.0) < 1e-9
    assert abs(two["B"][1] - 2.0 / 7.0) < 1e-9
    assert abs(two["h1"][0] - 7.0 / 17.0) < 1e-9
    assert abs(two["h2"][0] - 5.0 / 17.0) < 1e-9
    assert abs(sum(v[0] for v in two.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in two.values()) - 1.0) < 1e-9


def test_label_propagation_two_communities(spark):
    from kgspark.graph_algs import label_propagation

    # triangle {a,b,c} bridged (c-x) to triangle {x,y,z}; synchronous LPA
    # with min-label ties is exactly hand-simulable
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"),
         ("c", "x"), ("x", "y"), ("x", "z"), ("y", "z")],
        ["subj", "obj"],
    )
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, iterations=2).collect()}
    # round 1: a->b b->a c->a x->c y->x z->x; round 2 as asserted
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "c", "z": "c"}


def test_label_propagation_ignores_direction_dupes_loops(spark):
    from kgspark.graph_algs import label_propagation

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")],
        ["subj", "obj"],
    )
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, iterations=1).collect()}
    # one undirected edge: each adopts the other's label; self-loop dropped
    assert got == {"a": "b", "b": "a"}


def _reference_trustrank(edges, seeds, iters=3, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, _t in edges:
        out[s] = out.get(s, 0) + 1
    t = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    rank = dict(t)
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, v in edges:
            contrib[v] += rank[s] / out[s]
        dm = sum(r for v, r in rank.items() if v not in out)
        rank = {v: (1 - d) * t[v] + d * (contrib[v] + dm * t[v])
                for v in nodes}
    return rank


def test_trustrank_matches_reference_iteration(spark):
    from kgspark.graph_algs import trustrank

    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["rank"]
           for r in trustrank(_edges(spark), seeds, iterations=3).collect()}
    want = _reference_trustrank(EDGES, {"a"})
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    # mass conserved: teleport + dangling both return to the seed set
    assert abs(sum(got.values()) - 1.0) < 1e-12
    # un-seeded spam-farm style node keeps less mass than under pagerank's
    # uniform teleport: d gets NO teleport at all here
    assert got["d"] == 0.0


def test_trustrank_seed_outside_graph_raises(spark):
    import pytest as _pytest

    from kgspark.graph_algs import trustrank

    seeds = spark.createDataFrame([("zz",)], ["node"])
    with _pytest.raises(ValueError):
        trustrank(_edges(spark), seeds)


def test_k_core_peels_pendants(spark):
    from kgspark.graph_algs import k_core

    # triangle {a,b,c} + pendant chain c-d-e; 2-core = the triangle
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        ["subj", "obj"],
    )
    got = {r["node"]: r["degree"]
           for r in k_core(edges, k=2, rounds=3).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    # one round only removes e; d survives with its pre-peel degree 2
    one = {r["node"]: r["degree"]
           for r in k_core(edges, k=2, rounds=1).collect()}
    assert one == {"a": 2, "b": 2, "c": 3, "d": 2}


def test_k_core_empty_when_k_too_large(spark):
    from kgspark.graph_algs import k_core

    edges = spark.createDataFrame([("a", "b")], ["subj", "obj"])
    assert k_core(edges, k=2, rounds=2).count() == 0


def test_graph_report_reciprocity(spark):
    from kgspark.graph_algs import graph_report

    edges = spark.createDataFrame(
        [("a", "likes", "b"), ("b", "likes", "a"),   # reciprocal pair
         ("a", "likes", "c"),                        # one-way
         ("a", "owns", "c"), ("c", "owns", "a"),     # reciprocal, other pred
         ("a", "owns", "c")],                        # duplicate collapses
        ["subj", "pred", "obj"],
    )
    got = {r["pred"]: (r["n_edges"], r["n_src"], r["n_dst"], r["n_reciprocal"])
           for r in graph_report(edges).collect()}
    assert got == {"likes": (3, 2, 3, 2), "owns": (2, 2, 2, 2)}


def test_graph_report_no_reciprocal_edges(spark):
    from kgspark.graph_algs import graph_report

    edges = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")], ["subj", "pred", "obj"]
    )
    got = graph_report(edges).collect()[0]
    assert (got["n_edges"], got["n_reciprocal"]) == (2, 0)


def test_metapath_census_counts_paths_and_pairs(spark):
    from kgspark.graph_algs import metapath_census

    edges = spark.createDataFrame(
        [
            ("a", "p", "m"), ("b", "p", "m"),          # two p-edges into m
            ("m", "q", "x"), ("m", "q", "y"),          # two q-edges out of m
            ("a", "r", "z"),                            # r composes with nothing
            ("z", "q", "a"), ("a", "p", "m"),          # dup edge ignored
        ],
        "subj string, pred string, obj string",
    )
    out = {(r["p1"], r["p2"]): (r["n_paths"], r["n_pairs"])
           for r in metapath_census(edges).collect()}
    # p->q paths: {a,b} x {x,y} through m = 4 paths, 4 distinct pairs
    assert out[("p", "q")] == (4, 4)
    # q->p: z->a->m via (q, p) = 1 ; q->r: z->a->z = 1
    assert out[("q", "p")] == (1, 1)
    assert out[("q", "r")] == (1, 1)
    assert ("r", "q") not in out or out[("r", "q")][0] >= 1  # a->z->a
    # r->q exists: a-r->z, z-q->a -> 1 path
    assert out[("r", "q")] == (1, 1)


def test_metapath_census_distinct_pairs_vs_paths(spark):
    from kgspark.graph_algs import metapath_census

    # two parallel paths between the SAME endpoints: n_paths 2, n_pairs 1
    edges = spark.createDataFrame(
        [("a", "p", "m1"), ("a", "p", "m2"),
         ("m1", "q", "c"), ("m2", "q", "c")],
        "subj string, pred string, obj string",
    )
    out = {(r["p1"], r["p2"]): (r["n_paths"], r["n_pairs"])
           for r in metapath_census(edges).collect()}
    assert out == {("p", "q"): (2, 1)}


def test_modularity_two_triangles_bridge(spark):
    # two triangles joined by one bridge edge: the textbook partition
    # {a,b,c} / {d,e,f} has Q = 70/196 = 5/14 (Newman & Girvan 2004)
    from kgspark.graph_algs import modularity

    tri = [("a", "b"), ("a", "c"), ("b", "c"),
           ("d", "e"), ("d", "f"), ("e", "f"), ("c", "d")]
    e = spark.createDataFrame(tri, "subj string, obj string")
    labs = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "L"),
         ("d", "R"), ("e", "R"), ("f", "R")],
        "node string, label string",
    )
    rows = {r["label"]: r for r in modularity(e, labs).collect()}
    assert set(rows) == {"L", "R"}
    for lab in ("L", "R"):
        r = rows[lab]
        assert r["n_nodes"] == 3
        assert r["intra2"] == 6          # 3 intra edges x 2
        assert r["deg_sum"] == 7         # 2+2+3
        assert int(r["q_num"]) == 6 * 14 - 49  # = 35; Q = (35+35)/14^2
    # duplicate/reversed/self edges do not change the canonical edge set
    e2 = spark.createDataFrame(
        tri + [("b", "a"), ("a", "a"), ("c", "d")],
        "subj string, obj string",
    )
    rows2 = {r["label"]: int(r["q_num"]) for r in modularity(e2, labs).collect()}
    assert rows2 == {"L": 35, "R": 35}


def test_modularity_zero_intra_community(spark):
    # a label whose members share no internal edge gets intra2=0 and a
    # negative contribution (the left-join + fill path)
    from kgspark.graph_algs import modularity

    e = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "subj string, obj string")
    labs = spark.createDataFrame(
        [("a", "X"), ("c", "X"), ("b", "Y"), ("d", "Y")],
        "node string, label string",
    )
    rows = {r["label"]: r for r in modularity(e, labs).collect()}
    # 2m = 4; each label: deg_sum 2, intra2 0 -> q_num = -4
    assert {k: int(v["q_num"]) for k, v in rows.items()} == {"X": -4, "Y": -4}
    assert all(v["intra2"] == 0 for v in rows.values())


def test_random_walks_deterministic_and_edge_valid(spark):
    from hashlib import md5 as _md5

    from kgspark.graph_algs import random_walks

    tri = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    e = spark.createDataFrame(tri, "subj string, obj string")
    rows = random_walks(e, length=3, num_walks=2).collect()
    # 4 nodes x 2 walks x 4 positions (step 0..3)
    assert len(rows) == 4 * 2 * 4
    edge_set = {frozenset(p) for p in tri}
    walks = {}
    for r in rows:
        walks.setdefault((r["start"], r["walk_no"]), {})[r["step"]] = r["node"]
    nbrs = {"a": ["b", "c"], "b": ["a", "c"], "c": ["a", "b", "d"], "d": ["c"]}
    for (start, wn), path in walks.items():
        assert path[0] == start
        for k in range(1, 4):
            # consecutive positions are graph edges
            assert frozenset((path[k - 1], path[k])) in edge_set
            # and exactly the hash-prescribed neighbor
            h = int(_md5(f"{start}:{wn}:{k}".encode()).hexdigest()[:6], 16)
            cand = nbrs[path[k - 1]]
            assert path[k] == cand[h % len(cand)]
    # replayable: a second invocation yields the identical corpus
    again = random_walks(e, length=3, num_walks=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_random_walks_validates_params(spark):
    import pytest as _pytest

    from kgspark.graph_algs import random_walks

    e = spark.createDataFrame([("a", "b")], "subj string, obj string")
    with _pytest.raises(ValueError):
        random_walks(e, length=0)
    with _pytest.raises(ValueError):
        random_walks(e, num_walks=0)


def test_adamic_adar_square_and_hub_discount(spark):
    import math

    from kgspark.graph_algs import adamic_adar

    # square a-b-c-d-a: diagonals (a,c)/(b,d) share 2 neighbors, each of
    # degree 2 -> aa = 2 * 1/ln(2); micro-units = 2 * round(1e6/ln 2)
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    e = spark.createDataFrame(sq, "subj string, obj string")
    got = {(r["u"], r["v"]): (r["common"], r["aa_micro"])
           for r in adamic_adar(e, min_common=2).collect()}
    unit2 = round(1000000.0 / math.log(2))
    assert got == {("a", "c"): (2, 2 * unit2), ("b", "d"): (2, 2 * unit2)}

    # hub discount: add hub h adjacent to all of a..d. (a,c) now share
    # b, d (degree 3 each: the square plus h) and h itself (degree 4);
    # higher-degree shared neighbors contribute strictly less
    hub = sq + [("h", x) for x in "abcd"]
    e2 = spark.createDataFrame(hub, "subj string, obj string")
    got2 = {(r["u"], r["v"]): (r["common"], r["aa_micro"])
            for r in adamic_adar(e2, min_common=2).collect()}
    unit3 = round(1000000.0 / math.log(3))
    unit4 = round(1000000.0 / math.log(4))
    assert got2[("a", "c")] == (3, 2 * unit3 + unit4)
    assert unit4 < unit3 < unit2


def test_adamic_adar_max_degree_prunes_hub_wedges(spark):
    from kgspark.graph_algs import adamic_adar

    hub = [("h", x) for x in "abcdef"] + [("a", "m"), ("b", "m")]
    e = spark.createDataFrame(hub, "subj string, obj string")
    full = {(r["u"], r["v"]) for r in adamic_adar(e, min_common=1).collect()}
    assert ("c", "d") in full  # via the hub
    pruned = {(r["u"], r["v"])
              for r in adamic_adar(e, min_common=1, max_degree=3).collect()}
    assert ("c", "d") not in pruned
    assert ("a", "b") in pruned  # via m (degree 2)


def test_clustering_coefficient_known_graph(spark):
    from kgspark.graph_algs import clustering_coefficient

    # K4 on {a,b,c,d} plus pendant path d-e-f: a/b/c close every wedge
    # (coef 1.0), d has 3 of 6 wedges closed (0.5), e has an open wedge
    # (0.0), f has no wedge (deg<2 -> 0 by convention)
    k4 = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d"),
          ("c", "d"), ("d", "e"), ("e", "f"), ("b", "a")]
    e = spark.createDataFrame(k4, "subj string, obj string")
    got = {r["node"]: (r["deg"], r["n_tri"], r["coef_micro"])
           for r in clustering_coefficient(e).collect()}
    assert got == {
        "a": (3, 3, 1000000), "b": (3, 3, 1000000), "c": (3, 3, 1000000),
        "d": (4, 3, 500000), "e": (2, 0, 0), "f": (1, 0, 0),
    }


def test_relation_profile_functionality_census(spark):
    from kgspark.graph_api import relation_profile

    t = spark.createDataFrame(
        [("a", "type", "T"), ("b", "type", "T"),
         ("a", "id", "x1"), ("b", "id", "x2"),
         ("a", "likes", "b"), ("a", "likes", "c")],
        "subj string, pred string, obj string",
    )
    got = {r["pred"]: r.asDict() for r in relation_profile(t).collect()}
    assert got["type"] == {"pred": "type", "n_edges": 2, "n_subj": 2,
                           "n_obj": 1, "max_out": 1, "max_in": 2,
                           "functional": True, "inverse_functional": False}
    assert got["id"]["functional"] and got["id"]["inverse_functional"]
    assert got["likes"] == {"pred": "likes", "n_edges": 2, "n_subj": 1,
                            "n_obj": 2, "max_out": 2, "max_in": 1,
                            "functional": False, "inverse_functional": True}


def test_wl_refine_structural_classes(spark):
    from kgspark.graph_algs import wl_refine

    # directed 4-cycle: every node has one in + one out of the same pred ->
    # a single structural class at every depth
    cyc = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("d", "p", "a")]
    e = spark.createDataFrame(cyc, "subj string, pred string, obj string")
    out = wl_refine(e, rounds=2).collect()
    assert {r["class_size"] for r in out} == {4}
    assert len({r["wl_color"] for r in out}) == 1

    # directed path a->b->c: source / middle / sink are three roles
    path = [("a", "p", "b"), ("b", "p", "c")]
    e2 = spark.createDataFrame(path, "subj string, pred string, obj string")
    got = {r["node"]: r["wl_color"] for r in wl_refine(e2, rounds=2).collect()}
    assert len(set(got.values())) == 3

    # predicate types matter: star with two edge types splits the leaves
    star = [("h", "p", "x"), ("h", "p", "y"), ("h", "q", "z")]
    e3 = spark.createDataFrame(star, "subj string, pred string, obj string")
    got3 = {r["node"]: r["wl_color"] for r in wl_refine(e3, rounds=1).collect()}
    assert got3["x"] == got3["y"] != got3["z"]


def test_k_truss_peels_tail_edges(spark):
    from kgspark.graph_algs import k_truss

    # K4 on {a,b,c,d}: every edge in 2 triangles -> survives 4-truss.
    # Pendant triangle {d,e,f}: edges have support 1 -> peeled at k=4.
    # Bridge edge f-g: support 0 -> peeled immediately.
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    extra = [("d", "e"), ("d", "f"), ("e", "f"), ("f", "g")]
    edges = spark.createDataFrame(k4 + extra, "subj string, obj string")
    out = {(r["a"], r["b"]): r["support"]
           for r in k_truss(edges, k=4, rounds=2).collect()}
    assert set(out) == set(k4)
    assert all(s == 2 for s in out.values())
    # k=3 keeps the pendant triangle too
    out3 = {(r["a"], r["b"]): r["support"]
            for r in k_truss(edges, k=3, rounds=2).collect()}
    assert set(out3) == set(k4) | {("d", "e"), ("d", "f"), ("e", "f")}
    assert ("f", "g") not in out3
    import pytest as _pytest
    with _pytest.raises(ValueError):
        k_truss(edges, k=2)


def test_personalized_pagerank_locality(spark):
    from kgspark.graph_algs import personalized_pagerank

    # two disjoint stars: seed a -> a1, a2; seed b -> b1. PPR mass from a
    # must never reach b's component and vice versa.
    edges = spark.createDataFrame(
        [("a", "a1"), ("a", "a2"), ("b", "b1"), ("a1", "a")],
        "subj string, obj string",
    )
    seeds = spark.createDataFrame([("a",), ("b",)], "seed string")
    out = personalized_pagerank(edges, seeds, iterations=2, damping=0.85)
    got = {(r["seed"], r["node"]): r["rank"] for r in out.collect()}
    a_nodes = {n for (s, n) in got if s == "a"}
    b_nodes = {n for (s, n) in got if s == "b"}
    assert a_nodes <= {"a", "a1", "a2"} and "b1" not in a_nodes
    assert b_nodes <= {"b", "b1"}
    # round 1: a keeps (1-d)=0.15 teleport, spreads d/2 to each child
    assert abs(got[("a", "a1")] - 0.85 / 2 * (0.85 / 2 + 0.15)
               / (0.85 / 2 + 0.15)) < 1  # sanity: present and positive
    assert got[("a", "a")] > got[("a", "a2")]  # a1 returns mass to a
    # b1 is dangling: its mass returns to seed b, so b stays heavy
    assert got[("b", "b")] > got[("b", "b1")]
    # seeds not in the graph are dropped
    ghost = spark.createDataFrame([("zzz",)], "seed string")
    assert personalized_pagerank(edges, ghost.union(seeds.limit(0)),
                                 iterations=1).count() == 0


def test_bounded_closure_depths_and_cycle(spark):
    from kgspark.graph_algs import bounded_closure

    # chain a->b->c->d->e plus shortcut a->c plus a 2-cycle x<->y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c"),
         ("x", "y"), ("y", "x")],
        "subj string, obj string",
    )
    got = {(r["anc"], r["desc"]): r["min_depth"]
           for r in bounded_closure(edges, depth=3).collect()}
    assert got[("a", "b")] == 1
    assert got[("a", "c")] == 1        # shortcut beats the 2-hop path
    assert got[("a", "d")] == 2        # via the shortcut
    assert got[("a", "e")] == 3
    assert ("b", "e") in got and got[("b", "e")] == 3
    # depth cap: a->...-> nothing past 3 hops from chain start at depth 2
    assert ("a", "a") not in got       # self pairs excluded (cycle safe)
    assert got[("x", "y")] == 1 and got[("y", "x")] == 1
    got2 = {(r["anc"], r["desc"]): r["min_depth"]
            for r in bounded_closure(edges, depth=2).collect()}
    assert ("a", "e") not in got2


def test_inverse_predicates_symmetry_and_inverse(spark):
    from kgspark.graph_algs import inverse_predicates

    t = spark.createDataFrame(
        [
            ("a", "parentOf", "b"), ("b", "childOf", "a"),   # inverses
            ("c", "parentOf", "d"), ("d", "childOf", "c"),
            ("x", "marriedTo", "y"), ("y", "marriedTo", "x"),  # symmetric
            ("p", "knows", "q"),                              # one-way
        ],
        "subj string, pred string, obj string",
    )
    got = {(r["pred_p"], r["pred_q"]): r
           for r in inverse_predicates(t).collect()}
    po = got[("parentOf", "childOf")]
    assert (po["n_p"], po["n_q"], po["n_inverse"]) == (2, 2, 2)
    assert po["inv_ppm"] == 1000000
    assert got[("childOf", "parentOf")]["inv_ppm"] == 1000000
    mm = got[("marriedTo", "marriedTo")]
    assert mm["n_inverse"] == 2 and mm["inv_ppm"] == 1000000
    assert not any("knows" in k for k in got)


def test_degree_assortativity_matches_bruteforce(spark):
    from collections import Counter

    from kgspark.graph_algs import degree_assortativity

    # mixed graph: a hub-leaf star bridged to a triangle — degree ranks
    # vary on both endpoints, so the Spearman census is non-degenerate
    edges = [("h", "l1"), ("h", "l2"), ("h", "l3"),
             ("h", "t1"), ("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    df = spark.createDataFrame(edges, "subj string, obj string")
    r = degree_assortativity(df).collect()[0]

    # brute-force replica of the operator's exact semantics (canonical
    # edges, degree counts, row_number ranks tied by edge_id)
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    sig = [(f"{a}|{b}", deg[a], deg[b]) for a, b in und]
    ra = {e: i + 1 for i, (e, da, _) in enumerate(
        sorted(sig, key=lambda s: (s[1], s[0])))}
    rb = {e: i + 1 for i, (e, _, db) in enumerate(
        sorted(sig, key=lambda s: (s[2], s[0])))}
    n = len(sig)
    sum_d2 = sum((ra[e] - rb[e]) ** 2 for e, _, _ in sig)
    # Spark `div` (and DuckDB `//`) truncate toward ZERO on negatives;
    # Python's // floors — replicate the engines, not Python
    num = ((n ** 3 - n) - 6 * sum_d2) * 1000000
    den = n ** 3 - n
    rho = -((-num) // den) if num < 0 else num // den
    assert (r["n"], r["sum_d2"], r["rho_ppm"]) == (n, sum_d2, rho)
    # a clique of equal degrees degenerates to +1 under the documented
    # tie policy (both rank orders collapse to edge_id order)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    r2 = degree_assortativity(
        spark.createDataFrame(k4, "subj string, obj string")
    ).collect()[0]
    assert r2["rho_ppm"] == 1000000


def test_skipgram_pairs_window_and_counts(spark):
    from kgspark.graph_algs import skipgram_pairs

    # one walk: n0 n1 n2 n3 (steps 0..3)
    walks = spark.createDataFrame(
        [("n0", 0, s, f"n{s}") for s in range(4)],
        "start string, walk_no long, step long, node string",
    )
    got = {(r["center"], r["context"]): r["n"]
           for r in skipgram_pairs(walks, window=2).collect()}
    # distance 1 and 2 pairs exist, distance 3 does not
    assert got[("n0", "n1")] == 1 and got[("n0", "n2")] == 1
    assert ("n0", "n3") not in got
    assert got[("n1", "n0")] == 1        # symmetric (ordered pairs)
    # window 1 drops the distance-2 pairs
    got1 = {(r["center"], r["context"]) for r in
            skipgram_pairs(walks, window=1).collect()}
    assert ("n0", "n2") not in got1 and ("n1", "n2") in got1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        skipgram_pairs(walks, window=0)


def test_paths_between_simple_paths_and_bound(spark):
    from kgspark.graph_api import paths_between

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("c", "r", "d"),
         ("a", "x", "c"),            # alternate shorter route
         ("b", "back", "a")],        # cycle edge: visited guard territory
        "subj string, pred string, obj string",
    )
    st = spark.createDataFrame([("a",)], "n string")
    en = spark.createDataFrame([("d",)], "n string")
    got = {(r.hops, r.path) for r in paths_between(t, st, en, max_hops=3).collect()}
    assert got == {
        (2, "a -x-> c -r-> d"),
        (3, "a -p-> b -q-> c -r-> d"),
    }
    # hop bound cuts the 3-edge path
    got2 = {r.path for r in paths_between(t, st, en, max_hops=2).collect()}
    assert got2 == {"a -x-> c -r-> d"}
    # cycle a->b->a is never walked (start is in visited); no path inflation
    en_a = spark.createDataFrame([("a",)], "n string")
    assert paths_between(t, st, en_a, max_hops=3).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_hops"):
        paths_between(t, st, en, max_hops=0)


def test_type_violations_flags_minority_and_untyped_combos(spark):
    from kgspark.graph_algs import type_violations

    t = spark.createDataFrame(
        [("a1", "is_a", "T"), ("a2", "is_a", "T"), ("a3", "is_a", "B"),
         ("a4", "is_a", "B"), ("a4", "is_a", "T"),
         ("b1", "is_a", "U"), ("b2", "is_a", "U"),
         ("a1", "has", "b1"), ("a2", "has", "b2"), ("a3", "has", "b1"),
         ("a4", "has", "b2"),        # multi-typed: one combo matches
         ("u1", "has", "b1")],       # untyped subject
        "subj string, pred string, obj string",
    )
    # 'has' combos: (T,U)x3 (a1,a2,a4), (B,U)x2 (a3,a4), (unknown,U)x1
    # -> signature (T,U) at 3/6 = 500000 ppm, violations a3 and u1 only
    got = {
        (r.subj, r.pred, r.obj): (r.subj_types, r.obj_types,
                                  r.exp_subj_type, r.exp_obj_type,
                                  r.sig_share_ppm)
        for r in type_violations(t).collect()
    }
    assert got == {
        ("a3", "has", "b1"): ("B", "U", "T", "U", 500000),
        ("u1", "has", "b1"): ("unknown", "U", "T", "U", 500000),
    }
    # raising the dominance bar drops the predicate entirely
    assert type_violations(t, min_share_ppm=600000).count() == 0


def test_type_violations_signature_tie_breaks_lexicographically(spark):
    from kgspark.graph_algs import type_violations

    t = spark.createDataFrame(
        [("m1", "is_a", "X"), ("m2", "is_a", "Y"), ("b1", "is_a", "U"),
         ("m1", "mix", "b1"), ("m2", "mix", "b1")],
        "subj string, pred string, obj string",
    )
    got = {(r.subj, r.exp_subj_type) for r in type_violations(t).collect()}
    assert got == {("m2", "X")}


def test_katz_centrality_hand_computed(spark):
    from kgspark.graph_algs import katz_centrality

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
        "src string, dst string",
    )
    got = {r.node: r.katz_ppm
           for r in katz_centrality(e, rounds=2).collect()}
    # paths_1: b=1 c=2 d=1; paths_2: c=1 (a-b-c), d=2 (a-c-d, b-c-d)
    assert got == {
        "a": 0,
        "b": 500_000,
        "c": 2 * 500_000 + 250_000,
        "d": 500_000 + 2 * 250_000,
    }


def test_katz_centrality_counts_walks_not_reach(spark):
    from kgspark.graph_algs import katz_centrality

    # diamond: two distinct length-2 walks a->d double-count
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    got = {r.node: r.katz_ppm
           for r in katz_centrality(e, rounds=3).collect()}
    assert got["d"] == 2 * 500_000 + 2 * 250_000  # paths_1=2, paths_2=2
    assert got["a"] == 0


def test_topo_levels_dag_and_cycle(spark):
    from kgspark.graph_algs import topo_levels

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),        # DAG: a=0 b=1 c=2
         ("p", "q"), ("q", "p"),                    # 2-cycle
         ("q", "z")],                               # downstream of cycle
        "src string, dst string",
    )
    got = {r.node: r.level for r in topo_levels(e).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "p": -1, "q": -1, "z": -1}


def test_topo_levels_longest_path_semantics(spark):
    from kgspark.graph_algs import topo_levels

    # c has in-edges from levels 0 AND 1 -> peels only at round 2
    e = spark.createDataFrame(
        [("a", "c"), ("a", "b"), ("b", "c"), ("c", "d")],
        "src string, dst string",
    )
    got = {r.node: r.level for r in topo_levels(e).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_topo_levels_round_budget_flags_deep_tail(spark):
    from kgspark.graph_algs import topo_levels

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "src string, dst string",
    )
    got = {r.node: r.level
           for r in topo_levels(e, max_rounds=2).collect()}
    assert got == {"a": 0, "b": 1, "c": -1, "d": -1}


def _kruskal(edges):
    """Pure-python golden MSF: Kruskal with union-find, same
    (w, src, dst) total order as boruvka_mst."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    seen = {}
    for a, b, w in edges:
        a, b = min(a, b), max(a, b)
        k = (a, b)
        if k not in seen or w < seen[k]:
            seen[k] = w
    for (a, b), w in sorted(seen.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def test_boruvka_mst_matches_kruskal(spark):
    from kgspark.graph_algs import boruvka_mst

    # deterministic pseudo-random-ish graph w/ distinct weights, two
    # disconnected pieces, parallel edges and a self loop
    edges = []
    for i in range(30):
        edges.append((f"n{i}", f"n{(i * 7 + 3) % 30}", 100 + i))
        edges.append((f"n{i}", f"n{(i + 1) % 30}", 200 + i))
    edges += [("m0", "m1", 5), ("m1", "m2", 4), ("m0", "m2", 3),
              ("m0", "m1", 9),            # parallel, heavier
              ("n3", "n3", 1)]            # self loop
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = sorted((r.src, r.dst, r.w)
                 for r in boruvka_mst(df).collect())
    want = _kruskal(edges)
    assert got == want
    # forest property: |edges| = |nodes| - |components| (30-node piece
    # is connected; m-triangle is one comp)
    assert len(got) == (30 - 1) + (3 - 1)


def test_boruvka_mst_empty_and_singleton(spark):
    from kgspark.graph_algs import boruvka_mst

    only_self = spark.createDataFrame(
        [("x", "x", 1)], "src string, dst string, w long"
    )
    assert boruvka_mst(only_self).count() == 0


def test_single_linkage_equals_mst_cut(spark):
    from kgspark.graph_algs import single_linkage

    # chain a-b-c-d with rising weights + far pair x-y
    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 2), ("c", "d", 10), ("x", "y", 3)],
        "src string, dst string, w long",
    )
    got = {r.node: r.cluster
           for r in single_linkage(e, threshold=3).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d",
                   "x": "x", "y": "x"}
    # threshold below everything: all singletons
    solo = {r.node: r.cluster
            for r in single_linkage(e, threshold=0).collect()}
    assert all(k == v for k, v in solo.items()) and len(solo) == 6


def test_pagerank_weighted_vs_unweighted(spark):
    from kgspark.graph_algs import pagerank

    # hub a splits mass 9:1 between b and c when weighted
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0),
         ("c", "a", 1.0)],
        "subj string, obj string, weight double",
    )
    w = {r.node: r.rank
         for r in pagerank(e, iterations=8,
                           weight_col="weight").collect()}
    u = {r.node: r.rank for r in pagerank(e, iterations=8).collect()}
    assert w["b"] > w["c"]                   # weighted: b gets 9x share
    assert abs(u["b"] - u["c"]) < 1e-12      # unweighted: symmetric
    assert abs(sum(w.values()) - 1.0) < 1e-9  # mass conserved
    # parallel edges sum: duplicating (a,c,1.0) 8x ~ weight 9 total
    e2 = e.union(spark.createDataFrame(
        [("a", "c", 1.0)] * 8, "subj string, obj string, weight double"
    ))
    w2 = {r.node: r.rank
          for r in pagerank(e2, iterations=8,
                            weight_col="weight").collect()}
    assert abs(w2["b"] - w2["c"]) < 1e-12


def test_node2vec_walks_match_python_replica(spark):
    import hashlib

    from kgspark.graph_algs import node2vec_walks

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e"),
             ("e", "a"), ("b", "d")]
    t = spark.createDataFrame(
        [(s, "r", o) for s, o in edges], "subj string, pred string, obj string"
    )
    p_, q_ = 2.0, 0.5
    got = {(r.start, r.walk_no, r.step): r.node
           for r in node2vec_walks(t, length=3, num_walks=2,
                                   p=p_, q=q_).collect()}

    adj = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    nbrs = {v: sorted(ns) for v, ns in adj.items()}

    def hex6(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    w_ret, w_nbr, w_out = round(1000 / p_), 1000, round(1000 / q_)
    want = {}
    for start in nbrs:
        for wn in range(2):
            want[(start, wn, 0)] = start
            cur = nbrs[start][hex6(f"{start}:{wn}:1") % len(nbrs[start])]
            prev = start
            want[(start, wn, 1)] = cur
            for k in (2, 3):
                cands = nbrs[cur]
                wts = [w_ret if x == prev
                       else (w_nbr if x in adj[prev] else w_out)
                       for x in cands]
                tot = sum(wts)
                r = hex6(f"{start}:{wn}:{k}") % tot
                acc = 0
                for x, wt in zip(cands, wts):
                    acc += wt
                    if r < acc:
                        nxt = x
                        break
                want[(start, wn, k)] = nxt
                prev, cur = cur, nxt
    assert got == want
    # bias sanity: immediate backtracking is rarer than under uniform
    back = sum(1 for (s, wn, k), v in want.items()
               if k >= 2 and v == want[(s, wn, k - 2)])
    assert back < len([1 for key in want if key[2] >= 2])


def test_louvain_move_replica_and_cliques(spark):
    from kgspark.graph_algs import louvain_move

    # two 4-cliques joined by a single bridge
    cl1 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d")]
    cl2 = [("w", "x"), ("w", "y"), ("w", "z"), ("x", "y"), ("x", "z"),
           ("y", "z")]
    edges = cl1 + cl2 + [("d", "w")]
    t = spark.createDataFrame(
        [(s, "r", o) for s, o in edges], "subj string, pred string, obj string"
    )
    got = {r.node: r.community
           for r in louvain_move(t, rounds=2).collect()}

    # python replica of the synchronous integer-gain update
    adj = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    kv = {v: len(ns) for v, ns in adj.items()}
    m2 = sum(kv.values())
    comm = {v: v for v in adj}
    for _ in range(2):
        sig = {}
        for v, c in comm.items():
            sig[c] = sig.get(c, 0) + kv[v]
        nxt = {}
        for v in adj:
            cands = {}
            for n in adj[v]:
                cands[comm[n]] = cands.get(comm[n], 0) + 1
            cands.setdefault(comm[v], 0)
            best = None
            for c, kvc in cands.items():
                score = m2 * kvc - kv[v] * (
                    sig[c] - (kv[v] if c == comm[v] else 0))
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            nxt[v] = best[1]
        comm = nxt
    assert got == comm
    # the two cliques end in different communities, intra-clique agrees
    c1 = {got[v] for v in "abcd"}
    c2 = {got[v] for v in "wxyz"}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_config_model_preserves_degrees(spark):
    import hashlib

    from kgspark.graph_algs import config_model_edges

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e"),
             ("e", "a")]
    t = spark.createDataFrame(
        [(s, "r", o) for s, o in edges], "subj string, pred string, obj string"
    )
    got = config_model_edges(t).collect()
    # degree sequence preserved: stub multiset == original degree ends
    from collections import Counter
    deg = Counter()
    for s, o in edges:
        deg[s] += 1
        deg[o] += 1
    ends = Counter()
    for r in got:
        ends[r.a] += 1
        ends[r.b] += 1
    assert ends == deg
    # python replica of the hash stub shuffle
    stubs = []
    for v, d in deg.items():
        for i in range(d):
            h = hashlib.md5(f"{v}:{i}".encode()).hexdigest()
            stubs.append((f"{h}|{i}|{v}", v))
    stubs.sort()
    want = {}
    for j in range(len(stubs) // 2):
        want[j] = (stubs[2 * j][1], stubs[2 * j + 1][1])
    assert {r.edge_id: (r.a, r.b) for r in got} == want


def test_pseudo_diameter_path_graph(spark):
    from kgspark.graph_algs import pseudo_diameter

    # path a-b-c-d-e plus a branch c-x: true diameter 4 (a..e)
    edges = [("b", "a"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "x")]
    t = spark.createDataFrame(
        [(s, "r", o) for s, o in edges], "subj string, pred string, obj string"
    )
    r = pseudo_diameter(t, rounds=6).collect()[0]
    assert r.seed == "a"
    assert r.far1 == "e" and r.ecc1 == 4
    assert r.diameter_lb == 4 and r.far2 == "a"
    # bounded rounds clip the sweep: with rounds=2 from 'a' only b,c,x
    r2 = pseudo_diameter(t, rounds=2).collect()[0]
    assert r2.ecc1 == 2 and r2.diameter_lb == 2


def test_butterfly_pairs_hand_case(spark):
    from kgspark.graph_algs import butterfly_pairs

    # u1,u2,u3 all connect to {v1,v2}: n_common(v1,v2)=3 -> C(3,2)=3
    # u1,u2 also connect to v3: (v1,v3) and (v2,v3) each share {u1,u2}
    edges = spark.createDataFrame(
        [(1, "v1"), (1, "v2"), (1, "v3"),
         (2, "v1"), (2, "v2"), (2, "v3"),
         (3, "v1"), (3, "v2"),
         (4, "v9")],                      # degree-1 u: no wedge
        "u long, v string",
    )
    got = {(r.v_a, r.v_b): (r.n_common, r.n_bf)
           for r in butterfly_pairs(edges).collect()}
    assert got == {("v1", "v2"): (3, 3), ("v1", "v3"): (2, 1),
                   ("v2", "v3"): (2, 1)}


def test_butterfly_degree_cap_and_dedup(spark):
    from kgspark.graph_algs import butterfly_pairs

    # duplicate edges collapse; hub u above the cap is dropped
    edges = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"),
         (9, "a"), (9, "b"), (9, "c")],
        "u long, v string",
    )
    got = {(r.v_a, r.v_b): r.n_common
           for r in butterfly_pairs(edges, max_u_degree=2).collect()}
    # u=9 (degree 3 > cap) contributes nothing; (a,b) shared by u1,u2
    assert got == {("a", "b"): (2)}
    # without the cap, u=9 joins (a,b); (a,c)/(b,c) stay below the
    # n_common >= 2 butterfly floor
    full = {(r.v_a, r.v_b): r.n_common
            for r in butterfly_pairs(edges, max_u_degree=10).collect()}
    assert full == {("a", "b"): 3}


def test_community_conductance_hand_case(spark):
    from kgspark.graph_algs import community_conductance

    # two triangles bridged by one edge: m = 7
    # C1 = {1,2,3}: internal 3, cut 1, vol 7, phi = 1e6 div min(7,7) = 142857
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "subj long, obj long",
    )
    assign = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        "node long, label long",
    )
    out = {r.comm: r for r in
           community_conductance(edges, assign).collect()}
    for c in (10, 20):
        assert (out[c].n_nodes, out[c].internal_edges,
                out[c].cut_edges, out[c].vol) == (3, 3, 1, 7)
        assert out[c].phi_ppm == 142857
    # one community spanning everything -> denominator 0 -> sentinel
    whole = assign.selectExpr("node", "99 AS label")
    w = community_conductance(edges, whole).collect()[0]
    assert (w.cut_edges, w.phi_ppm) == (0, -1)


def test_community_conductance_canonicalizes_edges(spark):
    from kgspark.graph_algs import community_conductance

    # (1,2) and (2,1) plus a self-loop collapse to ONE edge; node 3 is
    # an edgeless community -> vol 0 -> sentinel
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1)], "subj long, obj long"
    )
    assign = spark.createDataFrame(
        [(1, 7), (2, 8), (3, 9)], "node long, label long"
    )
    out = {r.comm: r for r in
           community_conductance(edges, assign).collect()}
    assert out[7].cut_edges == 1 and out[7].vol == 1
    # min(vol, 2m - vol) = min(1, 1) = 1 -> phi = 1e6
    assert out[7].phi_ppm == 1_000_000
    assert out[9].n_nodes == 1 and out[9].vol == 0
    assert out[9].phi_ppm == -1


def test_edge_embeddedness_and_local_bridges(spark):
    from kgspark.graph_algs import edge_embeddedness

    # two triangles bridged by (3,4): bridge edge has 0 common nbrs
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "subj long, obj long",
    )
    out = {(r.a, r.b): (r.n_common, r.is_bridge)
           for r in edge_embeddedness(edges).collect()}
    assert out[(3, 4)] == (0, 1)
    for ab in [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]:
        assert out[ab] == (1, 0)
    # direction/dupe/self-loop insensitivity
    noisy = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 1), (2, 3), (1, 1)], "subj long, obj long"
    )
    got = {(r.a, r.b): r.n_common
           for r in edge_embeddedness(noisy).collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_edge_embeddedness_center_cap(spark):
    from kgspark.graph_algs import edge_embeddedness

    # hub h is the only common neighbor of (a, b); capping centers at
    # degree 2 removes h -> the edge reads as a bridge
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "h"), ("b", "h"), ("c", "h")],
        "subj string, obj string",
    )
    exact = {(r.a, r.b): r.n_common
             for r in edge_embeddedness(edges).collect()}
    assert exact[("a", "b")] == 1
    capped = {(r.a, r.b): r.is_bridge
              for r in edge_embeddedness(
                  edges, max_center_degree=2).collect()}
    assert capped[("a", "b")] == 1


def test_powerlaw_fit_hand_case(spark):
    import math

    from kgspark.graph_algs import powerlaw_fit

    # star: hub h with 5 leaves -> degrees h=5, leaves=1
    edges = spark.createDataFrame(
        [("h", f"l{i}") for i in range(5)], "subj string, obj string"
    )
    out = powerlaw_fit(edges, dmin=2).collect()[0]
    # only the hub is in the tail: sum = round(ln(5/1.5)*1e6)
    s = round(math.log(5 / 1.5) * 1e6)
    assert (out.dmin, out.n_tail, out.sum_ln_ppm) == (2, 1, s)
    assert out.alpha_ppm == 1_000_000 + (1 * 10**12) // s
    # dmin above every degree -> sentinel
    none = powerlaw_fit(edges, dmin=10).collect()[0]
    assert (none.n_tail, none.alpha_ppm) == (0, -1)


def test_powerlaw_undirected_dedup(spark):
    from kgspark.graph_algs import powerlaw_fit

    # (a,b) and (b,a) are one edge; self-loop dropped -> degrees 1,1
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a")], "subj string, obj string"
    )
    out = powerlaw_fit(edges, dmin=1).collect()[0]
    # d=1, dmin=1: ln(1/0.5) = ln 2 per node, 2 nodes
    import math
    assert out.n_tail == 2
    assert out.sum_ln_ppm == 2 * round(math.log(2.0) * 1e6)


def test_rich_club_hand_case(spark):
    from kgspark.graph_algs import rich_club

    # K4 core {a,b,c,d} + pendant leaves on a and b:
    # degrees: a=4, b=4, c=3, d=3, leaves=1
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("a", "x"), ("b", "y")],
        "subj string, obj string",
    )
    out = {r.k: (r.n_nodes, r.n_edges, r.phi_ppm)
           for r in rich_club(edges, ks=(1, 2, 3)).collect()}
    # k=1: nodes with d>1 = {a,b,c,d}; edges among them = K4 = 6 ->
    # phi = 12/12 = 1
    assert out[1] == (4, 6, 1_000_000)
    # k=2: same core
    assert out[2] == (4, 6, 1_000_000)
    # k=3: {a,b} with the single (a,b) edge -> phi = 2/2 = 1
    assert out[3] == (2, 1, 1_000_000)
    # a k with a single qualifying node -> sentinel
    one = {r.k: r.phi_ppm
           for r in rich_club(edges, ks=(1, 2, 3, 4)).collect()}
    assert 4 not in one  # no node with degree > 4 -> no row


def test_rich_club_sparse_core(spark):
    from kgspark.graph_algs import rich_club

    # path a-b-c-d: degrees b=c=2, a=d=1; k=1 core {b,c}, 1 edge
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "subj string, obj string"
    )
    out = {r.k: (r.n_nodes, r.n_edges, r.phi_ppm)
           for r in rich_club(edges, ks=(1,)).collect()}
    assert out[1] == (2, 1, 1_000_000)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        rich_club(edges, ks=())


def test_luby_mis_independent_and_maximal(spark):
    from kgspark.graph_algs import luby_mis

    # ring of 12 + two hubs wired into it
    ring = [(f"n{i}", f"n{(i + 1) % 12}") for i in range(12)]
    hubs = [("h0", f"n{i}") for i in range(0, 12, 3)]
    hubs += [("h1", f"n{i}") for i in range(1, 12, 4)]
    edges = spark.createDataFrame(ring + hubs, "src string, dst string")
    rows = luby_mis(edges, rounds=8).collect()
    by_node = {r.node: r.state for r in rows}
    # every node decided exactly once
    assert len(rows) == len(by_node) == 14
    assert set(by_node.values()) <= {"mis", "covered"}
    mis = {n for n, s in by_node.items() if s == "mis"}
    und = {(a, b) for a, b in ring + hubs} | {
        (b, a) for a, b in ring + hubs
    }
    # independence: no edge inside the MIS
    assert not any((a, b) in und for a in mis for b in mis)
    # maximality: every covered node touches the MIS
    for n, s in by_node.items():
        if s == "covered":
            assert any((n, m) in und for m in mis)
    # determinism: second run is identical
    again = {r.node: (r.state, r.rnd)
             for r in luby_mis(edges, rounds=8).collect()}
    assert again == {r.node: (r.state, r.rnd) for r in rows}


def test_luby_mis_bounded_rounds_unresolved(spark):
    from kgspark.graph_algs import luby_mis

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(30)],
        "src string, dst string",
    )
    rows = luby_mis(edges, rounds=1).collect()
    states = {r.state for r in rows}
    # one round cannot finish a 31-path: leftovers must be reported
    assert "unresolved" in states and "mis" in states
    assert all(r.rnd == -1 for r in rows if r.state == "unresolved")


def test_eigenvector_centrality_star(spark):
    from kgspark.graph_algs import eigenvector_centrality

    # star: hub h with 5 leaves + a detached edge (x, y)
    edges = spark.createDataFrame(
        [("h", f"l{i}") for i in range(5)] + [("x", "y")],
        "src string, dst string",
    )
    # odd round count: the bipartite star has just pushed hub mass out,
    # so leaves sit at 1/5 of the hub and the detached pair at 1/25
    out3 = {r.node: r.eigen_ppm
            for r in eigenvector_centrality(edges, rounds=3).collect()}
    assert out3["h"] == 1_000_000
    assert all(out3[f"l{i}"] == 200_000 for i in range(5))
    assert out3["x"] == out3["y"] == 40_000
    # even round count: the star oscillates back (classic bipartite
    # power-iteration behavior) — hub and leaves both at the max norm
    out4 = {r.node: r.eigen_ppm
            for r in eigenvector_centrality(edges, rounds=4).collect()}
    assert out4["h"] == 1_000_000
    assert all(out4[f"l{i}"] == 1_000_000 for i in range(5))
    assert out4["x"] == out4["y"] == 40_000


def test_graphlet_census_vs_bruteforce(spark):
    from itertools import combinations

    from kgspark.graph_algs import graphlet_census

    # small irregular graph: square + chord + pendant + triangle tail
    raw = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
           ("d", "e"), ("e", "f"), ("f", "d"), ("f", "g")]
    edges = spark.createDataFrame(raw, "src string, dst string")
    out = {r.metric: r.value for r in graphlet_census(edges).collect()}

    und = {frozenset(e) for e in raw}
    nodes = sorted({x for e in raw for x in e})
    adj = {n: {m for m in nodes if frozenset((n, m)) in und} for n in nodes}
    deg = {n: len(adj[n]) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    claws = sum(d * (d - 1) * (d - 2) // 6 for d in deg.values())
    tri = sum(
        1 for x, y, z in combinations(nodes, 3)
        if y in adj[x] and z in adj[y] and z in adj[x]
    )
    # brute-force P4 paths: unordered 3-edge simple paths
    p3 = 0
    for q in nodes:
        for r in adj[q]:
            for s in adj[r]:
                if s == q:
                    continue
                for t in adj[s]:
                    if t not in (q, r):
                        p3 += 1
    p3 //= 2  # each path walked from both ends
    c4 = sum(
        1 for quad in combinations(nodes, 4)
        for (w, x, y, z) in [quad]
        for perm in [
            [(w, x), (x, y), (y, z), (z, w)],
            [(w, x), (x, z), (z, y), (y, w)],
            [(w, y), (y, x), (x, z), (z, w)],
        ]
        if all(frozenset(e) in und for e in perm)
    )
    assert out["n_nodes"] == len(nodes)
    assert out["n_edges"] == len(und)
    assert out["wedges"] == wedges
    assert out["claws"] == claws
    assert out["triangles"] == tri
    assert out["p3"] == p3
    assert out["c4"] == c4


def test_salsa_hand_case(spark):
    from kgspark.graph_algs import salsa

    # h1 -> {A, B}, h2 -> {A}: the classic SALSA example where A's
    # authority is degree-weighted, not raw-count-weighted
    edges = spark.createDataFrame(
        [("h1", "A"), ("h1", "B"), ("h2", "A")], "src string, dst string"
    )
    one = {(r.node, r.side): r.score_ppm
           for r in salsa(edges, rounds=1).collect()}
    # a(A) = h1/2 + h2/1 = 500000 + 1000000; a(B) = 500000
    assert one[("A", "auth")] == 1_500_000
    assert one[("B", "auth")] == 500_000
    # h(h1) = a(A)/2 + a(B)/1 = 750000 + 500000; h(h2) = a(A)/2
    assert one[("h1", "hub")] == 1_250_000
    assert one[("h2", "hub")] == 750_000
    # mass is conserved exactly when degrees divide evenly
    assert one[("h1", "hub")] + one[("h2", "hub")] == 2_000_000
    # floor-division determinism: a second run is identical
    again = {(r.node, r.side): r.score_ppm
             for r in salsa(edges, rounds=1).collect()}
    assert again == one
    # three rounds stay exact integers and keep both sides populated
    three = salsa(edges, rounds=3).collect()
    assert {r.side for r in three} == {"hub", "auth"}
    assert all(r.score_ppm >= 0 for r in three)


def test_attribute_assortativity_known_values(spark):
    from kgspark.graph_algs import attribute_assortativity

    def run(edge_rows, label_rows):
        e = spark.createDataFrame(edge_rows, "src string, dst string")
        lab = spark.createDataFrame(label_rows, "node string, label string")
        return attribute_assortativity(e, lab).collect()[0]

    # perfectly assortative: two monochrome cliques-ish edge sets
    r = run(
        [("a1", "a2"), ("a2", "a1"), ("b1", "b2"), ("b2", "b1")],
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")],
    )
    # E = diag(2,2)/4, A=B=(.5,.5): r = (4*4 - 8)/(16 - 8) = 1
    assert (r.m, r.trace_cnt, r.r_ppm) == (4, 4, 1_000_000)
    # perfectly DISassortative bipartite
    r2 = run(
        [("a1", "b1"), ("a2", "b2"), ("b1", "a2"), ("b2", "a1")],
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")],
    )
    # trace 0, A=B=(.5,.5): r = (0 - 8)/(16 - 8) = -1
    assert r2.r_ppm == -1_000_000
    # single label -> denominator 0 -> sentinel
    r3 = run(
        [("x", "y"), ("y", "x")], [("x", "S"), ("y", "S")]
    )
    assert r3.r_ppm == -2_000_000
    # mixed hand case: label-pair counts (A,A)=2 (A,B)=1 (B,A)=1;
    # out sums A=3 B=1, in sums A=3 B=1 -> sum_ab = 9+1 = 10;
    # num = 4*2-10 = -2, den = 16-10 = 6 -> truncation toward zero
    r4 = run(
        [("a1", "a2"), ("a2", "a1"), ("a1", "b1"), ("b1", "a1")],
        [("a1", "A"), ("a2", "A"), ("b1", "B")],
    )
    assert (r4.trace_cnt, r4.sum_ab) == (2, 10)
    assert r4.r_ppm == -333_333  # -2e6/6 truncated toward zero


def test_bowtie_census_hand_case(spark):
    from kgspark.graph_algs import bowtie_census

    edges = spark.createDataFrame(
        # core 3-cycle, an IN chain, an OUT chain, an in-tendril,
        # and a disconnected pair
        [("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
         ("i1", "i0"), ("i0", "c0"),
         ("c1", "o0"), ("o0", "o1"),
         ("i0", "x0"),            # reached from IN only -> other
         ("p0", "q0")],
        "src string, dst string",
    )
    out = {r.node: r.cls for r in bowtie_census(edges).collect()}
    assert {n for n, c in out.items() if c == "core"} == {"c0", "c1", "c2"}
    assert {n for n, c in out.items() if c == "in"} == {"i0", "i1"}
    assert {n for n, c in out.items() if c == "out"} == {"o0", "o1"}
    assert {n for n, c in out.items() if c == "other"} == {"x0", "p0", "q0"}
    # a node both reaching and reached by the core would be core —
    # closing the tendril into the core proves the invariant
    closed = edges.union(spark.createDataFrame(
        [("c2", "i1"), ("x0", "c0")], "src string, dst string"))
    out2 = {r.node: r.cls for r in bowtie_census(closed).collect()}
    for n in ("i0", "i1", "x0"):
        assert out2[n] == "core"


def test_clique4_census_known_counts(spark):
    from kgspark.graph_algs import clique4_census

    # K5 on a..e plus a pendant: C(5,3)=10 triangles, C(5,4)=5 K4s;
    # diamonds (non-induced) = C(5,2) edges * C(3,2) shared-nbr pairs
    from itertools import combinations
    k5 = [(x, y) for x, y in combinations("abcde", 2)]
    e = spark.createDataFrame(
        k5 + [("a", "z")], "src string, dst string")
    out = {r.metric: r.value for r in clique4_census(e).collect()}
    assert out["triangles"] == 10
    assert out["k4"] == 5
    assert out["diamonds"] == 10 * 3  # 10 edges, codeg 3 -> C(3,2)=3
    # a single square (no chord): no triangles, no cliques, no diamonds
    sq = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string")
    out2 = {r.metric: r.value for r in clique4_census(sq).collect()}
    assert out2 == {"triangles": 0, "k4": 0, "diamonds": 0}
    # one diamond exactly: square + one chord
    dia = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        "src string, dst string")
    out3 = {r.metric: r.value for r in clique4_census(dia).collect()}
    assert out3 == {"triangles": 2, "k4": 0, "diamonds": 1}
