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


@pytest.fixture(scope="module")
def hier(spark):
    rows = [
        ("a", "is_a", "T1"), ("b", "is_a", "T1"), ("T1", "is_a", "T0"),
        ("T0", "is_a", "root"),
        ("a", "has", "B1"), ("b", "has", "B2"),
        ("B1", "belongs_to", "a"),
        ("a", "related_to", "B1"), ("B1", "related_to", "a"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_path_plus_bounded_closure(hier):
    out = bgp_match(hier, [("?x", "is_a+", "root")], max_path_hops=4)
    assert {r["x"] for r in out.collect()} == {"a", "b", "T1", "T0"}
    # hop bound respected: at 1 hop only T0 reaches root
    out1 = bgp_match(hier, [("?x", "is_a+", "root")], max_path_hops=1)
    assert {r["x"] for r in out1.collect()} == {"T0"}


def test_path_mn_bounds(hier):
    out = bgp_match(hier, [("?x", "is_a{2,3}", "?y")])
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {
        ("a", "T0"), ("b", "T0"), ("T1", "root"),
        ("a", "root"), ("b", "root"),
    }


def test_path_cycle_terminates(hier):
    # related_to is a 2-cycle: bounded hops terminate, pairs dedupe
    out = bgp_match(hier, [("?x", "related_to+", "?y")], max_path_hops=5)
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("a", "B1"), ("B1", "a"), ("a", "a"), ("B1", "B1")}


def test_inverse_pred(hier):
    out = bgp_match(hier, [("?b", "^has", "?p")])
    assert {(r["b"], r["p"]) for r in out.collect()} == {
        ("B1", "a"), ("B2", "b")
    }


def test_alternation_pred(hier):
    out = bgp_match(hier, [("?s", "has|belongs_to", "?o")])
    assert {(r["s"], r["o"]) for r in out.collect()} == {
        ("a", "B1"), ("b", "B2"), ("B1", "a")
    }


def test_inverse_path_combo(hier):
    # ^is_a+ : descendants of root within 4 hops
    out = bgp_match(hier, [("root", "^is_a+", "?d")], max_path_hops=4)
    assert {r["d"] for r in out.collect()} == {"a", "b", "T1", "T0"}


def test_bad_path_bounds_raise(hier):
    with pytest.raises(ValueError, match="bounds"):
        bgp_match(hier, [("?x", "is_a{3,2}", "?y")])
    # {0,n} is legal since zero-length paths landed: identity ∪ 1..n hops
    out = bgp_match(hier, [("a", "is_a{0,2}", "?y")])
    assert {r["y"] for r in out.collect()} == {"a", "T1", "T0"}


def test_filters(hier):
    out = bgp_match(
        hier, [("?x", "is_a", "?y")],
        filters=[("?y", "strstarts", "T"), ("?x", "!=", "b")],
    )
    assert {(r["x"], r["y"]) for r in out.collect()} == {
        ("a", "T1"), ("T1", "T0")
    }
    out2 = bgp_match(
        hier, [("?x", "has", "?b")], filters=[("?b", "contains", "2")]
    )
    assert {(r["x"], r["b"]) for r in out2.collect()} == {("b", "B2")}


def test_filter_var_vs_var_and_unbound_raises(hier):
    out = bgp_match(
        hier, [("?x", "is_a", "?y")], filters=[("?x", "<", "?y")]
    )
    # ASCII lexicographic: uppercase sorts before lowercase, so 'a' > 'T1'
    assert {(r["x"], r["y"]) for r in out.collect()} == {("T0", "root")}
    with pytest.raises(ValueError, match="unbound"):
        bgp_match(hier, [("?x", "is_a", "?y")],
                  filters=[("?z", "=", "a")])
    with pytest.raises(ValueError, match="unknown filter op"):
        bgp_match(hier, [("?x", "is_a", "?y")],
                  filters=[("?x", "~~", "a")])


def test_union_aligns_unbound_as_empty(hier):
    from kgspark.graph_api import bgp_union

    out = bgp_union(
        hier,
        [
            {"patterns": [("?p", "is_a", "?t"), ("?p", "has", "?b")]},
            {"patterns": [("?b", "belongs_to", "?p")]},
        ],
    )
    assert out.columns == ["b", "p", "t"]
    got = {(r["b"], r["p"], r["t"]) for r in out.collect()}
    assert got == {("B1", "a", "T1"), ("B2", "b", "T1"), ("B1", "a", "")}


def test_union_distinct_across_branches(hier):
    from kgspark.graph_api import bgp_union

    # identical branches collapse under set semantics
    br = {"patterns": [("?x", "has", "?y")]}
    out = bgp_union(hier, [br, br])
    assert out.count() == 2
    bag = bgp_union(hier, [br, br], distinct=False)
    assert bag.count() == 4


def test_union_branch_filters_and_optional(hier):
    from kgspark.graph_api import bgp_union

    out = bgp_union(
        hier,
        [
            {"patterns": [("?x", "has", "?y")],
             "filters": [("?y", "=", "B1")]},
            {"patterns": [("?x", "is_a", "T1")],
             "optional_patterns": [("?x", "has", "?y")]},
        ],
    )
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("a", "B1"), ("b", "B2")}


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


def test_bgp_aggregate_bag_semantics(spark):
    from kgspark.graph_api import bgp_aggregate

    t = spark.createDataFrame(
        [("a", "has", "b1"), ("a", "has", "b2"), ("c", "has", "b1"),
         ("a", "is_a", "T"), ("c", "is_a", "T")],
        "subj string, pred string, obj string",
    )
    out = {r["t"]: (r["n"], r["n_brands"], r["min_b"])
           for r in bgp_aggregate(
               t, [("?p", "is_a", "?t"), ("?p", "has", "?b")],
               group_by=["?t"],
               aggs=[("count", None, "n"),
                     ("count_distinct", "?b", "n_brands"),
                     ("min", "?b", "min_b")],
           ).collect()}
    # bag: a contributes 2 solutions, c contributes 1
    assert out == {"T": (3, 2, "b1")}


def test_bgp_aggregate_validation(spark):
    from kgspark.graph_api import bgp_aggregate

    t = spark.createDataFrame([("a", "p", "b")],
                              "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="group_by"):
        bgp_aggregate(t, [("?x", "p", "?y")], ["x"],
                      [("count", None, "n")])
    with pytest.raises(ValueError, match="unknown agg"):
        bgp_aggregate(t, [("?x", "p", "?y")], ["?x"],
                      [("avg", "?y", "a")])
    with pytest.raises(ValueError, match="needs a"):
        bgp_aggregate(t, [("?x", "p", "?y")], ["?x"],
                      [("min", None, "m")])


def test_bgp_construct_rewrites_and_dedups(spark):
    from kgspark.graph_api import bgp_construct

    t = spark.createDataFrame(
        [("a", "is_a", "T"), ("a", "has", "b1"), ("a", "has", "b2"),
         ("c", "is_a", "T"), ("c", "has", "b1")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in bgp_construct(
            t,
            [("?x", "is_a", "?t"), ("?x", "has", "?b")],
            [("?b", "brand_of_type", "?t"), ("?x", "branded", "true")],
        ).collect()
    }
    # b1 pairs with T twice (a and c) -> constructed set dedups it
    assert got == {
        ("b1", "brand_of_type", "T"), ("b2", "brand_of_type", "T"),
        ("a", "branded", "true"), ("c", "branded", "true"),
    }


def test_bgp_construct_skips_unbound_optional_and_validates(spark):
    from kgspark.graph_api import bgp_construct

    t = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("a", "alt", "z")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in bgp_construct(
            t,
            [("?s", "p", "?o")],
            [("?s", "seen_alt", "?a")],
            optional_patterns=[("?s", "alt", "?a")],
        ).collect()
    }
    # b has no alt binding -> its template instantiation is skipped
    assert got == {("a", "seen_alt", "z")}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not.*bound|bound"):
        bgp_construct(t, [("?s", "p", "?o")], [("?s", "q", "?zz")])
    with _pytest.raises(ValueError, match="template"):
        bgp_construct(t, [("?s", "p", "?o")], [])


def test_bgp_minus_removes_compatible_bindings(spark):
    from kgspark.graph_api import bgp_minus

    t = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("c", "p", "z"),
         ("a", "flag", "1"), ("c", "flag", "1")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.s, r.o)
        for r in bgp_minus(
            t, [("?s", "p", "?o")], [("?s", "flag", "1")]
        ).collect()
    }
    # a and c carry the flag -> removed; b survives
    assert got == {("b", "y")}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="share no variable"):
        bgp_minus(t, [("?s", "p", "?o")], [("?x", "flag", "1")])


def test_bgp_negated_property_set(spark):
    from kgspark.graph_api import bgp_match

    t = spark.createDataFrame(
        [("a", "is_a", "T"), ("a", "has", "b"), ("a", "rel", "c"),
         ("b", "is_a", "U")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.x, r.y)
        for r in bgp_match(t, [("?x", "!is_a|rel", "?y")]).collect()
    }
    assert got == {("a", "b")}
    # inverse composes: ^!is_a walks the non-is_a edges backwards
    got2 = {
        (r.x, r.y)
        for r in bgp_match(t, [("?x", "^!is_a", "?y")]).collect()
    }
    assert got2 == {("b", "a"), ("c", "a")}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="negated"):
        bgp_match(t, [("?x", "!is_a+", "?y")])


# ---------------------------------------------------------------------------
# VALUES + BIND
# ---------------------------------------------------------------------------

def test_bgp_values_restricts_and_extends(spark):
    from kgspark.graph_api import bgp_match

    t = spark.createDataFrame(
        [("a", "is_a", "cat"), ("b", "is_a", "dog"), ("c", "is_a", "fox"),
         ("a", "likes", "b")],
        "subj string, pred string, obj string",
    )
    # shared var: VALUES restricts ?t to two types
    got = {(r.x, r.t) for r in bgp_match(
        t, [("?x", "is_a", "?t")],
        values=(["?t"], [["cat"], ["dog"]]),
    ).collect()}
    assert got == {("a", "cat"), ("b", "dog")}

    # no shared var: broadcast literal multiplies solutions
    got2 = {(r.x, r.w) for r in bgp_match(
        t, [("?x", "likes", "b")],
        values=(["?w"], [["u"], ["v"]]),
    ).collect()}
    assert got2 == {("a", "u"), ("a", "v")}

    # two-column VALUES rows join as tuples
    got3 = {(r.x, r.t) for r in bgp_match(
        t, [("?x", "is_a", "?t")],
        values=(["?x", "?t"], [["a", "cat"], ["b", "fox"]]),
    ).collect()}
    assert got3 == {("a", "cat")}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="values"):
        bgp_match(t, [("?x", "is_a", "?t")], values=(["?t"], [[None]]))
    with _pytest.raises(ValueError, match="variable"):
        bgp_match(t, [("?x", "is_a", "?t")], values=(["t"], [["cat"]]))


def test_bgp_bind_and_filter_on_bound(spark):
    from kgspark.graph_api import bgp_match

    t = spark.createDataFrame(
        [("a", "is_a", "cat"), ("b", "is_a", "dog")],
        "subj string, pred string, obj string",
    )
    got = {(r.x, r.t, r.key) for r in bgp_match(
        t, [("?x", "is_a", "?t")],
        binds=[("?key", "concat(t, ':', x)")],
    ).collect()}
    assert got == {("a", "cat", "cat:a"), ("b", "dog", "dog:b")}

    # later filters see the bind var; chained binds see earlier ones
    got2 = {r.u for r in bgp_match(
        t, [("?x", "is_a", "?t")],
        binds=[("?key", "concat(t, ':', x)"), ("?u", "upper(key)")],
        filters=[("?key", "strstarts", "cat")],
    ).collect()}
    assert got2 == {"CAT:A"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="already bound"):
        bgp_match(t, [("?x", "is_a", "?t")], binds=[("?x", "t")])


def test_order_limit_offset_total_order(triples):
    # knows-edges ordered by ?b desc; tiebreak appends ?a asc, so the
    # page cut is a total order: sorted desc by (b), then asc by (a)
    out = bgp_match(
        triples, [("?a", "knows", "?b")],
        order_by=[("?b", False)], limit_n=3,
    )
    rows = [(r["a"], r["b"]) for r in out.collect()]
    allrows = sorted(
        {(r["a"], r["b"])
         for r in bgp_match(triples, [("?a", "knows", "?b")]).collect()},
        key=lambda t: (tuple(-ord(c) for c in t[1]), t[0]),
    )
    assert rows == allrows[:3]
    # offset pages past the head deterministically
    out2 = bgp_match(
        triples, [("?a", "knows", "?b")],
        order_by=[("?b", False)], limit_n=2, offset_n=3,
    )
    assert [(r["a"], r["b"]) for r in out2.collect()] == allrows[3:5]


def test_order_limit_validation(triples):
    with pytest.raises(ValueError, match="OFFSET without ORDER BY"):
        bgp_match(triples, [("?a", "knows", "?b")], offset_n=2)
    with pytest.raises(ValueError, match="unbound"):
        bgp_match(triples, [("?a", "knows", "?b")],
                  order_by=[("?zzz", True)])
    with pytest.raises(ValueError, match="not a .variable"):
        bgp_match(triples, [("?a", "knows", "?b")],
                  order_by=[("a", True)])


# ---------------------------------------------------------------------------
# FILTER EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------

def test_bgp_filter_exists_and_not_exists(spark):
    from kgspark.graph_api import bgp_filter_exists

    t = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("c", "p", "z"),
         ("a", "tag", "t1"), ("b", "tag", "t0"),
         ("a", "flag", "1"), ("c", "flag", "1")],
        "subj string, pred string, obj string",
    )
    # EXISTS tag: a, b qualify; NOT EXISTS flag: b, (c has flag) -> b only
    got = {(r.s, r.o) for r in bgp_filter_exists(
        t, [("?s", "p", "?o")],
        [{"patterns": [("?s", "tag", "?t")]},
         {"patterns": [("?s", "flag", "1")], "negate": True}],
    ).collect()}
    assert got == {("b", "y")}

    # filters inside the branch apply BEFORE the semi-join: only a's
    # tag survives ?t != t0
    got2 = {r.s for r in bgp_filter_exists(
        t, [("?s", "p", "?o")],
        [{"patterns": [("?s", "tag", "?t")],
          "filters": [("?t", "!=", "t0")]}],
    ).collect()}
    assert got2 == {"a"}


def test_bgp_filter_exists_uncorrelated_guard(spark):
    from kgspark.graph_api import bgp_filter_exists

    t = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("g", "on", "1")],
        "subj string, pred string, obj string",
    )
    # guard holds -> EXISTS keeps everything, NOT EXISTS drops everything
    keep = bgp_filter_exists(
        t, [("?s", "p", "?o")], [{"patterns": [("g", "on", "1")]}])
    assert keep.count() == 2
    drop = bgp_filter_exists(
        t, [("?s", "p", "?o")],
        [{"patterns": [("g", "on", "1")], "negate": True}])
    assert drop.count() == 0
    # guard fails -> roles swap
    none_ = bgp_filter_exists(
        t, [("?s", "p", "?o")], [{"patterns": [("g", "off", "1")]}])
    assert none_.count() == 0
    all_ = bgp_filter_exists(
        t, [("?s", "p", "?o")],
        [{"patterns": [("g", "off", "1")], "negate": True}])
    assert all_.count() == 2


def test_bgp_ask(spark):
    from kgspark.graph_api import bgp_ask

    t = spark.createDataFrame(
        [("a", "p", "x"), ("x", "q", "z"), ("b", "p", "b")],
        "subj string, pred string, obj string",
    )
    assert bgp_ask(t, [("?s", "p", "?o"), ("?o", "q", "?z")]).first().ask
    assert not bgp_ask(t, [("?s", "r", "?o")]).first().ask
    # self-loop constraint via repeated variable
    assert bgp_ask(t, [("?s", "p", "?s")]).first().ask
    # filters apply before the verdict
    assert not bgp_ask(t, [("?s", "p", "?o")],
                       filters=[("?s", "=", "zzz")]).first().ask
    # always exactly one row, even on empty input
    assert bgp_ask(t.limit(0), [("?s", "p", "?o")]).count() == 1


def test_bgp_filter_exists_semi_never_multiplies(spark):
    from kgspark.graph_api import bgp_filter_exists

    # two matching tag rows for 'a' must NOT duplicate a's solution
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "tag", "t1"), ("a", "tag", "t2")],
        "subj string, pred string, obj string",
    )
    out = bgp_filter_exists(
        t, [("?s", "p", "?o")], [{"patterns": [("?s", "tag", "?t")]}],
        distinct=False,
    )
    assert out.count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


# ---------------------------------------------------------------------------
# zero-length property paths and GROUP_CONCAT
# ---------------------------------------------------------------------------

def test_path_star_seeded_includes_identity(spark):
    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("x", "q", "y")],
        "subj string, pred string, obj string",
    )
    got = {r.n for r in bgp_match(t, [("a", "p*", "?n")]).collect()}
    assert got == {"a", "b", "c"}
    # ? = zero-or-one
    got1 = {r.n for r in bgp_match(t, [("a", "p?", "?n")]).collect()}
    assert got1 == {"a", "b"}
    # {0,0} = identity only
    got0 = {r.n for r in bgp_match(t, [("a", "p{0,0}", "?n")]).collect()}
    assert got0 == {"a"}


def test_path_star_unseeded_identity_is_graph_nodes(spark):
    t = spark.createDataFrame(
        [("a", "p", "b"), ("x", "q", "y")],
        "subj string, pred string, obj string",
    )
    got = {(r.s, r.n) for r in bgp_match(t, [("?s", "p*", "?n")]).collect()}
    # identity covers ALL graph terms (x, y too), 1-hop only via p
    assert got == {("a", "a"), ("b", "b"), ("x", "x"), ("y", "y"),
                   ("a", "b")}


def test_bgp_group_concat(spark):
    from kgspark.graph_api import bgp_aggregate

    t = spark.createDataFrame(
        [("a", "has", "z"), ("a", "has", "m"), ("a", "has", "z"),
         ("b", "has", "k")],
        "subj string, pred string, obj string",
    )
    got = {r.x: (r.bag, r.set_)
           for r in bgp_aggregate(
               t, [("?x", "has", "?v")], group_by=["?x"],
               aggs=[("group_concat", "?v", "bag"),
                     ("group_concat_distinct", "?v", "set_")],
           ).collect()}
    assert got == {"a": ("m;z;z", "m;z"), "b": ("k", "k")}


def test_sequence_path(hier):
    # ^has/is_a : brand -> item -> its type
    out = bgp_match(hier, [("?b", "^has/is_a", "?t")])
    assert {(r["b"], r["t"]) for r in out.collect()} == {
        ("B1", "T1"), ("B2", "T1")
    }
    # sequence with a closure segment: item -> type -> ... -> root
    out2 = bgp_match(hier, [("?x", "is_a/is_a+", "root")],
                     max_path_hops=4)
    assert {r["x"] for r in out2.collect()} == {"a", "b", "T1"}
    # zero-length segment composes: is_a/is_a{0,1} includes 1-hop-only
    out3 = bgp_match(hier, [("a", "is_a/is_a{0,1}", "?y")])
    assert {r["y"] for r in out3.collect()} == {"T1", "T0"}


def test_sequence_path_validation(hier):
    with pytest.raises(ValueError, match="sequence"):
        bgp_match(hier, [("?x", "is_a/?v", "?y")])


def test_bgp_aggregate_having(spark):
    from kgspark.graph_api import bgp_aggregate

    t = spark.createDataFrame(
        [("a", "has", "x"), ("a", "has", "y"), ("a", "has", "z"),
         ("b", "has", "x"), ("c", "has", "x"), ("c", "has", "y")],
        "subj string, pred string, obj string",
    )
    got = {r.s: r.n for r in bgp_aggregate(
        t, [("?s", "has", "?v")], group_by=["?s"],
        aggs=[("count", None, "n")],
        having=[("n", ">=", 2)],
    ).collect()}
    assert got == {"a": 3, "c": 2}
    with pytest.raises(ValueError, match="unknown alias"):
        bgp_aggregate(t, [("?s", "has", "?v")], group_by=["?s"],
                      aggs=[("count", None, "n")],
                      having=[("zzz", ">=", 2)])


def test_bgp_aggregate_avg_ppm_and_sample(spark):
    from kgspark.graph_api import bgp_aggregate

    t = spark.createDataFrame(
        [("a", "score", "10"), ("a", "score", "15"),
         ("b", "score", "7")],
        "subj string, pred string, obj string",
    )
    got = {r.s: (r.avg, r.pick) for r in bgp_aggregate(
        t, [("?s", "score", "?v")], group_by=["?s"],
        aggs=[("avg_ppm", "?v", "avg"), ("sample", "?v", "pick")],
    ).collect()}
    # (10+15)*1e6 div 2 = 12_500_000; sample = min = '10'
    assert got == {"a": (12_500_000, "10"), "b": (7_000_000, "7")}


def test_filter_regex_and_in(spark):
    t = spark.createDataFrame(
        [("a1", "p", "x"), ("b2", "p", "y"), ("a9", "p", "z"),
         ("c3", "p", "w")],
        "subj string, pred string, obj string",
    )
    got = {r.s for r in bgp_match(
        t, [("?s", "p", "?o")],
        filters=[("?s", "regex", "^a[0-9]$")],
    ).collect()}
    assert got == {"a1", "a9"}
    got2 = {r.s for r in bgp_match(
        t, [("?s", "p", "?o")],
        filters=[("?s", "in", ["b2", "c3", "zz"])],
    ).collect()}
    assert got2 == {"b2", "c3"}
    with pytest.raises(ValueError, match="non-empty constant list"):
        bgp_match(t, [("?s", "p", "?o")], filters=[("?s", "in", [])])


def test_bgp_cardinality_chain_estimates(spark):
    from kgspark.graph_api import bgp_cardinality

    # p1: 6 edges, 3 distinct subj, 2 distinct obj
    # p2: 4 edges, 2 distinct subj, 4 distinct obj
    rows = (
        [(f"s{i % 3}", "p1", f"o{i % 2}") for i in range(6)]
        + [(f"o{i % 2}", "p2", f"z{i}") for i in range(4)]
    )
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {r.step: (r.pred, r.n_pred, r.est_rows)
           for r in bgp_cardinality(
               t, [("?a", "p1", "?b"), ("?b", "p2", "?c")]).collect()}
    assert out[1] == ("p1", 6, 6)
    # est2 = 6 * 4 // max(ndv_obj(p1)=2, ndv_subj(p2)=2) = 12
    assert out[2] == ("p2", 4, 12)
    # constant subject divides by ndv_s
    cst = {r.step: r.est_rows
           for r in bgp_cardinality(
               t, [("s0", "p1", "?b"), ("?b", "p2", "?c")]).collect()}
    assert cst[1] == 6 // 3
    assert cst[2] == (6 // 3) * 4 // 2
    # unknown predicate -> zero all the way down
    z = bgp_cardinality(t, [("?a", "nope", "?b")]).collect()
    assert z[0].n_pred == 0 and z[0].est_rows == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bgp_cardinality(t, [("?a", "?p", "?b")])
    with _pytest.raises(ValueError):
        bgp_cardinality(t, [("?a", "p1", "?a")])
    with _pytest.raises(ValueError):
        bgp_cardinality(t, [])


def test_bgp_cardinality_ndv_min_containment(spark):
    from kgspark.graph_api import bgp_cardinality

    # after joining on ?b, ndv(?b) becomes min(2, 4); a third pattern
    # re-joining on ?b must use that reduced ndv
    rows = (
        [("a", "p1", f"b{i % 2}") for i in range(4)]       # ndv_o = 2
        + [(f"b{i}", "p2", "x") for i in range(4)]          # ndv_s = 4
        + [(f"b{i % 2}", "p3", f"y{i}") for i in range(8)]  # ndv_s = 2
    )
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {r.step: r.est_rows for r in bgp_cardinality(
        t, [("?q", "p1", "?b"), ("?b", "p2", "?r"),
            ("?b", "p3", "?s")]).collect()}
    # e1 = 4; e2 = 4*4 // max(2,4) = 4; seen[b] = min(2,4) = 2
    # e3 = 4*8 // max(2,2) = 16
    assert out == {1: 4, 2: 4, 3: 16}
