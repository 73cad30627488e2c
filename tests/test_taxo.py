"""taxo: bounded ancestor closure + Wu-Palmer similarity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark.taxo import ancestor_closure, taxonomy_similarity


@pytest.fixture(scope="module")
def isa(spark):
    #        root
    #       /    \
    #     animal  machine
    #     /   \       \
    #   dog   cat     car
    #    |
    #  puppy        (+ DAG: robot_dog under both dog and machine)
    rows = [
        ("animal", "root"), ("machine", "root"),
        ("dog", "animal"), ("cat", "animal"), ("car", "machine"),
        ("puppy", "dog"),
        ("robot_dog", "dog"), ("robot_dog", "machine"),
    ]
    return spark.createDataFrame(rows, "child string, parent string")


def test_closure_hops_are_max_path(isa):
    anc = ancestor_closure(isa, max_depth=8)
    got = {(r["node"], r["anc"]): r["hops"] for r in anc.collect()}
    assert got[("puppy", "root")] == 3
    assert got[("puppy", "puppy")] == 0
    assert got[("dog", "animal")] == 1
    # DAG: robot_dog reaches root via dog->animal (3 hops) and via
    # machine (2 hops); max convention keeps 3
    assert got[("robot_dog", "root")] == 3
    # non-ancestors absent
    assert ("cat", "dog") not in got


def test_closure_bound_respected(isa):
    anc = ancestor_closure(isa, max_depth=1)
    got = {(r["node"], r["anc"]) for r in anc.collect()}
    assert ("puppy", "dog") in got and ("puppy", "animal") not in got
    with pytest.raises(ValueError, match="max_depth"):
        ancestor_closure(isa, max_depth=0)


def test_closure_tolerates_cycles(spark):
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "r")], "child string, parent string"
    )
    anc = ancestor_closure(cyc, max_depth=5)
    got = {(r["node"], r["anc"]): r["hops"] for r in anc.collect()}
    assert got[("a", "a")] == 0 and got[("b", "b")] == 0
    assert got[("b", "r")] >= 2  # b -> a -> r


def test_wu_palmer_textbook_values(spark, isa):
    pairs = spark.createDataFrame(
        [("dog", "cat"), ("puppy", "cat"), ("dog", "car"),
         ("puppy", "dog"), ("dog", "dog")],
        "a string, b string",
    )
    out = {
        (r["a"], r["b"]): (r["lcs"], r["lcs_depth"], r["depth_a"],
                           r["depth_b"], r["wu_palmer_ppm"])
        for r in taxonomy_similarity(isa, pairs, "root").collect()
    }
    # dog(2) ~ cat(2), lcs=animal(1): 2*1/(2+2) = 0.5
    assert out[("dog", "cat")] == ("animal", 1, 2, 2, 500000)
    # puppy(3) ~ cat(2), lcs=animal(1): 2/5
    assert out[("puppy", "cat")] == ("animal", 1, 3, 2, 400000)
    # dog(2) ~ car(2), lcs=root(0): 0
    assert out[("dog", "car")] == ("root", 0, 2, 2, 0)
    # puppy(3) ~ dog(2), lcs=dog(2): 4/5
    assert out[("puppy", "dog")] == ("dog", 2, 3, 2, 800000)
    # identity: 2d/2d = 1
    assert out[("dog", "dog")] == ("dog", 2, 2, 2, 1000000)


def test_wu_palmer_dag_max_depth_lcs(spark, isa):
    # robot_dog: depth = max(3 via animal, 2 via machine) = 3
    # robot_dog ~ car: common ancestors {machine(1), root(0)} -> machine
    pairs = spark.createDataFrame(
        [("robot_dog", "car"), ("robot_dog", "puppy")], "a string, b string"
    )
    out = {
        (r["a"], r["b"]): (r["lcs"], r["lcs_depth"], r["depth_a"],
                           r["depth_b"], r["wu_palmer_ppm"])
        for r in taxonomy_similarity(isa, pairs, "root").collect()
    }
    assert out[("robot_dog", "car")] == ("machine", 1, 3, 2, 400000)
    # robot_dog ~ puppy share dog(2): 2*2/(3+3) = 666666 (truncated)
    assert out[("robot_dog", "puppy")] == ("dog", 2, 3, 3, 666666)


def test_wu_palmer_root_pair_and_unreachable(spark, isa):
    pairs = spark.createDataFrame(
        [("root", "root"), ("dog", "orphan")], "a string, b string"
    )
    rows = taxonomy_similarity(isa, pairs, "root").collect()
    got = {(r["a"], r["b"]): r["wu_palmer_ppm"] for r in rows}
    assert got == {("root", "root"): 1000000}  # orphan pair dropped
