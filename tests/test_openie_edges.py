"""Unit tests: rule extractor (E2) and edge generator (E5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.edges import HIERARCHY_WEIGHTS, concept_edges
from kgspark.openie import extract_concepts


def test_extract_concepts_patterns():
    text = (
        "Acme Corp is a company. Acme Corp has Globex. "
        "Spark is related to Hadoop. Spark can process data. Spark is fast."
    )
    by_name = {c["name"]: c for c in extract_concepts(text)}
    assert by_name["Acme Corp"]["parents"] == ["company"]
    assert by_name["Acme Corp"]["children"] == ["Globex"]
    assert by_name["Spark"]["related"] == ["Hadoop"]
    assert by_name["Spark"]["actions"] == ["process data"]
    assert by_name["Spark"]["properties"] == ["fast"]
    assert by_name["Acme Corp"]["type"] == "company"
    assert by_name["Spark"]["type"] == "concept"


def test_extract_concepts_rejects_non_entities():
    # lowercase subject and empty text contribute nothing
    assert extract_concepts("the cat is a mammal.") == []
    assert extract_concepts("") == []
    assert extract_concepts(None) == []


def test_extract_deterministic_under_sentence_order():
    s1 = "A is a x. B has A. A is related to B."
    s2 = "A is related to B. A is a x. B has A."
    c1 = extract_concepts(s1)
    c2 = extract_concepts(s2)
    assert {c["name"]: (sorted(c["parents"]), sorted(c["children"]), sorted(c["related"]))
            for c in c1} == {
        c["name"]: (sorted(c["parents"]), sorted(c["children"]), sorted(c["related"]))
        for c in c2
    }


def test_concept_edges_fwd_rev(spark):
    concepts = spark.createDataFrame(
        [("A", ["t1"], ["B"], ["C"], None, "s", 0.8)],
        "name string, parents array<string>, children array<string>, "
        "related array<string>, ts timestamp, source string, confidence double",
    )
    rows = {
        (r["subj"], r["pred"], r["obj"]): r["weight"]
        for r in concept_edges(concepts).collect()
    }
    # 3 relations x (fwd + rev) = 6 edges
    assert set(rows) == {
        ("A", "is_a", "t1"), ("t1", "has_instance", "A"),
        ("A", "has", "B"), ("B", "belongs_to", "A"),
        ("A", "related_to", "C"), ("C", "related_to", "A"),
    }
    # weight = hierarchy_weight(fwd rel) * confidence, both directions
    assert abs(rows[("A", "is_a", "t1")] - 1.0 * 0.8) < 1e-9
    assert abs(rows[("t1", "has_instance", "A")] - 1.0 * 0.8) < 1e-9
    assert abs(rows[("A", "has", "B")] - 0.9 * 0.8) < 1e-9
    assert abs(rows[("A", "related_to", "C")] - 0.6 * 0.8) < 1e-9


def test_edge_count_property(spark):
    # edge count == 2 x sum(|targets|) (SURVEY.md §5.2.5)
    concepts = spark.createDataFrame(
        [
            ("A", ["p1", "p2"], ["c1"], [], None, "s", 1.0),
            ("B", [], [], ["r1", "r2", "r3"], None, "s", 1.0),
        ],
        "name string, parents array<string>, children array<string>, "
        "related array<string>, ts timestamp, source string, confidence double",
    )
    assert concept_edges(concepts).count() == 2 * (2 + 1 + 3)


def test_hierarchy_weights_table():
    assert HIERARCHY_WEIGHTS["is_a"] == 1.0
    assert HIERARCHY_WEIGHTS["mentioned_in"] == 0.3


def test_sentence_polarity_cues_and_precedence(spark):
    from kgspark.openie import sentence_polarity

    df = spark.createDataFrame(
        [(1, "Acme owns Beta."),
         (2, "Acme is not a member of Beta."),
         (3, "Acme reportedly acquired Gamma."),
         (4, "Acme may not own Zeta."),        # negation beats hedge
         (5, "Nothing notes notable knots."),  # substrings never match
         (6, "They CANNOT leave.")],           # case-insensitive
        "doc_id long, sentence string",
    )
    got = {r.doc_id: (r.polarity, r.confidence_ppm)
           for r in sentence_polarity(df).collect()}
    assert got[1] == ("asserted", 1_000_000)
    assert got[2] == ("negated", 100_000)
    assert got[3] == ("hedged", 500_000)
    assert got[4] == ("negated", 100_000)
    assert got[5] == ("asserted", 1_000_000)
    assert got[6] == ("negated", 100_000)
