"""allen_relations: interval-algebra classification of same-subject facts."""

from __future__ import annotations

import pytest

from kgspark.temporal import allen_relations


@pytest.fixture(scope="module")
def intervals(spark):
    # one subject, six facts covering all seven canonical relations
    rows = [
        # (subj, pred, obj, valid_from, valid_to)
        ("e", "p1", "a", 0, 10),
        ("e", "p2", "b", 20, 30),     # p1/a precedes p2/b
        ("e", "p3", "c", 10, 20),     # p1/a meets p3/c
        ("e", "p4", "d", 5, 15),      # p1/a overlaps p4/d
        ("e", "p5", "f", 0, 5),       # p1/a: f starts-before-ends? see below
        ("e", "p6", "g", 0, 10),      # p1/a equals p6/g
        ("e", "p7", "h", 2, 8),       # p1/a contains p7/h
        ("e", "p8", "i", 3, 10),      # p1/a finished_by p8/i
        ("x", "p1", "z", 0, None),    # other subject, open interval
        ("x", "p2", "y", 0, 7),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, valid_from long, "
              "valid_to long"
    )


def test_all_seven_relations(intervals):
    out = {
        (r["a_pred"], r["b_pred"]): r["relation"]
        for r in allen_relations(intervals).collect()
        if "p1" in (r["a_pred"], r["b_pred"]) and r["subj"] == "e"
    }
    # ordering: (vf, vt, pred, obj); p1/a = (0,10,'p1','a')
    assert out[("p1", "p2")] == "precedes"
    assert out[("p1", "p3")] == "meets"
    assert out[("p1", "p4")] == "overlaps"
    # f=(0,5) sorts before a=(0,10): f starts a
    assert out[("p5", "p1")] == "starts"
    assert out[("p1", "p6")] == "equals"
    assert out[("p1", "p7")] == "contains"
    assert out[("p1", "p8")] == "finished_by"


def test_open_interval_is_infinity(intervals):
    got = {
        (r["a_pred"], r["b_pred"]): r["relation"]
        for r in allen_relations(intervals).collect()
        if r["subj"] == "x"
    }
    # y=(0,7) sorts before z=(0,inf): y starts z
    assert got == {("p2", "p1"): "starts"}


def test_no_cross_subject_and_no_self_pairs(intervals):
    rows = allen_relations(intervals).collect()
    assert all(r["subj"] in ("e", "x") for r in rows)
    assert all(
        (r["a_pred"], r["a_obj"]) != (r["b_pred"], r["b_obj"]) for r in rows
    )
    # each unordered pair exactly once: subject e has 8 facts -> C(8,2)
    e_rows = [r for r in rows if r["subj"] == "e"]
    assert len(e_rows) == 28
    assert len({tuple(sorted([(r["a_pred"], r["a_obj"]),
                              (r["b_pred"], r["b_obj"])])) for r in e_rows
                }) == 28
