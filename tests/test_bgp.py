"""bgp_match: conjunctive triple-pattern queries over the triples table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark.graph_api import bgp_match


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("alice", "knows", "bob"),
        ("alice", "knows", "carol"),
        ("bob", "knows", "carol"),
        ("carol", "knows", "alice"),
        ("alice", "works_at", "acme"),
        ("bob", "works_at", "acme"),
        ("carol", "works_at", "globex"),
        ("acme", "located_in", "berlin"),
        ("globex", "located_in", "paris"),
        ("dave", "knows", "dave"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_single_pattern_binds_vars(triples):
    out = bgp_match(triples, [("?x", "works_at", "acme")])
    assert out.columns == ["x"]
    assert {r["x"] for r in out.collect()} == {"alice", "bob"}


def test_path_join_two_patterns(triples):
    # colleagues in the same company as someone alice knows
    out = bgp_match(
        triples,
        [("alice", "knows", "?p"), ("?p", "works_at", "?c")],
    )
    got = {(r["c"], r["p"]) for r in out.collect()}
    assert got == {("acme", "bob"), ("globex", "carol")}
    assert out.columns == ["c", "p"]  # sorted variable order


def test_star_and_cycle(triples):
    # mutual-knows pairs (cycle of length 2 through the join graph)
    out = bgp_match(
        triples, [("?a", "knows", "?b"), ("?b", "knows", "?a")]
    )
    got = {(r["a"], r["b"]) for r in out.collect()}
    assert got == {("alice", "carol"), ("carol", "alice"), ("dave", "dave")}


def test_repeated_var_in_one_pattern(triples):
    out = bgp_match(triples, [("?x", "knows", "?x")])
    assert [r["x"] for r in out.collect()] == ["dave"]


def test_three_hop_chain(triples):
    out = bgp_match(
        triples,
        [
            ("?p", "knows", "?q"),
            ("?q", "works_at", "?co"),
            ("?co", "located_in", "?city"),
        ],
    )
    rows = {(r["city"], r["co"], r["p"], r["q"]) for r in out.collect()}
    assert ("berlin", "acme", "alice", "bob") in rows
    assert ("paris", "globex", "bob", "carol") in rows
    # every binding is fully grounded
    assert all(all(v is not None for v in t) for t in rows)


def test_existence_guard(triples):
    # guard true -> bindings pass through; guard false -> empty
    hit = bgp_match(
        triples,
        [("?x", "works_at", "acme"), ("acme", "located_in", "berlin")],
    )
    assert {r["x"] for r in hit.collect()} == {"alice", "bob"}
    miss = bgp_match(
        triples,
        [("?x", "works_at", "acme"), ("acme", "located_in", "paris")],
    )
    assert miss.count() == 0


def test_all_guards_verdict(triples):
    yes = bgp_match(triples, [("acme", "located_in", "berlin")])
    assert [r["exists"] for r in yes.collect()] == [True]
    no = bgp_match(triples, [("acme", "located_in", "paris")])
    assert no.count() == 0


def test_disconnected_raises(triples):
    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(
            triples, [("?x", "knows", "?y"), ("?a", "works_at", "?b")]
        )
    # forced product still works when explicitly requested
    out = bgp_match(
        triples,
        [("?x", "works_at", "acme"), ("?c", "located_in", "paris")],
        allow_product=True,
    )
    assert out.count() == 2  # {alice,bob} x {globex}


def test_empty_patterns_raises(triples):
    with pytest.raises(ValueError, match="at least one"):
        bgp_match(triples, [])


def test_bag_semantics(triples):
    dup = triples.union(triples)
    bag = bgp_match(dup, [("?x", "works_at", "acme")], distinct=False)
    assert bag.count() == 4  # 2 bindings x 2 copies, no dedup
    s = bgp_match(dup, [("?x", "works_at", "acme")])
    assert s.count() == 2


def test_no_cartesian_in_connected_plan(triples):
    out = bgp_match(
        triples,
        [("?p", "knows", "?q"), ("?q", "works_at", "?co")],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bgp_optional_left_join_and_unbound_empty(spark):
    from kgspark.graph_api import bgp_match

    t = spark.createDataFrame(
        [("a", "knows", "b"), ("a", "knows", "c"),
         ("b", "age", "30"), ("b", "age", "31")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.y, r.age)
        for r in bgp_match(
            t, [("a", "knows", "?y")],
            optional_patterns=[("?y", "age", "?age")],
        ).collect()
    }
    # b matches twice (SPARQL row multiplication), c is unbound -> ''
    assert got == {("b", "30"), ("b", "31"), ("c", "")}


def test_bgp_optional_disconnected_raises(spark):
    import pytest as _pytest
    from kgspark.graph_api import bgp_match

    t = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    with _pytest.raises(ValueError, match="optional"):
        bgp_match(t, [("?s", "p", "?o")],
                  optional_patterns=[("?q", "z", "?r")])


def test_bgp_optional_chains_through_prior_optional(spark):
    from kgspark.graph_api import bgp_match

    t = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "lives", "rome"), ("rome", "in", "it"),
         ("a", "knows", "c")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.y, r.city, r.country)
        for r in bgp_match(
            t, [("a", "knows", "?y")],
            optional_patterns=[("?y", "lives", "?city"),
                               ("?city", "in", "?country")],
        ).collect()
    }
    assert got == {("b", "rome", "it"), ("c", "", "")}
