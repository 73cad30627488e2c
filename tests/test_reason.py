"""kgspark.reason: RDFS (rho-df) + OWL-Horst rule materialization.

Hand-crafted micro-ontologies with known entailment sets, exercising:
schema transitive closure depth > 1, rule firing order (rdfs7 feeding
rdfs2/3 feeding rdfs9), dedup priority (asserted beats derived), the
bounded transitive-property closure, and the non-convergence guard.
"""

from __future__ import annotations

import pytest

from kgspark.reason import owl_property_rules, rdfs_materialize, schema_closure


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _s(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _asmap(df):
    return {(r.subj, r.pred, r.obj): r.rule for r in df.collect()}


def test_schema_closure_depth_and_guard(spark):
    schema = _s(spark, [("a", "subClassOf", "b"), ("b", "subClassOf", "c"),
                        ("c", "subClassOf", "d")])
    got = {(r.s, r.o) for r in schema_closure(schema, "subClassOf").collect()}
    assert got == {("a", "b"), ("b", "c"), ("c", "d"),
                   ("a", "c"), ("b", "d"), ("a", "d")}
    # chain of length 5 cannot close in max_depth=1 rounds -> raises
    with pytest.raises(RuntimeError, match="not closed"):
        schema_closure(
            _s(spark, [(f"n{i}", "subClassOf", f"n{i+1}") for i in range(5)]),
            "subClassOf", max_depth=1,
        )


def test_rdfs_materialize_full_fixpoint(spark):
    # employs subPropertyOf worksFor subPropertyOf affiliatedWith;
    # worksFor: domain person, range org; org subClassOf agent
    triples = _t(spark, [
        ("alice", "employs_inv", "x"),        # untouched by schema
        ("acme", "employs", "alice"),
    ])
    schema = _s(spark, [
        ("employs", "subPropertyOf", "worksFor_inv"),
        ("worksFor_inv", "subPropertyOf", "affiliated"),
        ("employs", "domain", "org"),
        ("affiliated", "range", "person"),
        ("org", "subClassOf", "agent"),
        ("agent", "subClassOf", "thing"),
    ])
    got = _asmap(rdfs_materialize(triples, schema, type_pred="type"))
    assert got[("acme", "employs", "alice")] == "asserted"
    # rdfs7 through the CLOSED subPropertyOf: both 1-hop and 2-hop preds
    assert got[("acme", "worksFor_inv", "alice")] == "rdfs7"
    assert got[("acme", "affiliated", "alice")] == "rdfs7"
    # rdfs2 on the asserted pred
    assert got[("acme", "type", "org")] == "rdfs2"
    # rdfs3 must see the rdfs7-DERIVED 'affiliated' triple
    assert got[("alice", "type", "person")] == "rdfs3"
    # rdfs9 must see the rdfs2-derived type and the closed subClassOf
    assert got[("acme", "type", "agent")] == "rdfs9"
    assert got[("acme", "type", "thing")] == "rdfs9"
    # nothing else
    assert len(got) == 8


def test_rdfs_asserted_wins_dedup(spark):
    triples = _t(spark, [("a", "p", "b"), ("a", "q", "b")])
    schema = _s(spark, [("p", "subPropertyOf", "q")])
    got = _asmap(rdfs_materialize(triples, schema))
    assert got == {("a", "p", "b"): "asserted", ("a", "q", "b"): "asserted"}


def test_owl_inverse_symmetric_transitive(spark):
    triples = _t(spark, [
        ("a", "partOf", "b"), ("b", "partOf", "c"), ("c", "partOf", "d"),
        ("x", "marriedTo", "y"),
        ("p", "hasPart", "q"),
    ])
    schema = _s(spark, [
        ("partOf", "transitive", "true"),
        ("marriedTo", "symmetric", "true"),
        ("hasPart", "inverseOf", "partOf_by"),
    ])
    got = _asmap(owl_property_rules(triples, schema, trans_depth=4))
    assert got[("y", "marriedTo", "x")] == "sym"
    assert got[("q", "partOf_by", "p")] == "inv"
    # transitive closure of the 3-edge chain: 2-hop and 3-hop pairs
    assert got[("a", "partOf", "c")] == "trans"
    assert got[("b", "partOf", "d")] == "trans"
    assert got[("a", "partOf", "d")] == "trans"
    assert got[("a", "partOf", "b")] == "asserted"
    assert len(got) == 5 + 1 + 1 + 3


def test_owl_inverse_applies_both_directions(spark):
    triples = _t(spark, [("s", "childOf", "o"), ("o2", "parentOf", "s2")])
    schema = _s(spark, [("parentOf", "inverseOf", "childOf")])
    got = _asmap(owl_property_rules(triples, schema))
    assert got[("o", "parentOf", "s")] == "inv"
    assert got[("s2", "childOf", "o2")] == "inv"


def test_owl_trans_depth_bound(spark):
    # 5-edge chain with trans_depth=2: only 2-hop pairs materialize
    triples = _t(
        spark, [(f"n{i}", "next", f"n{i+1}") for i in range(5)]
    )
    schema = _s(spark, [("next", "transitive", "true")])
    got = _asmap(owl_property_rules(triples, schema, trans_depth=2))
    trans = {k for k, v in got.items() if v == "trans"}
    assert trans == {(f"n{i}", "next", f"n{i+2}") for i in range(4)}
