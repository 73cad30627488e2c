"""SymSpell deletion-neighborhood fuzzy matching: exact recall/precision."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from kgspark.fuzzy import delete_variants, fuzzy_pairs


def test_delete_variants_d1(spark):
    [row] = spark.range(1).select(
        delete_variants(F.lit("abc"), 1).alias("v")
    ).collect()
    assert sorted(row["v"]) == ["ab", "abc", "ac", "bc"]


def test_delete_variants_d2_and_guard(spark):
    [row] = spark.range(1).select(
        delete_variants(F.lit("abc"), 2).alias("v")
    ).collect()
    assert sorted(row["v"]) == ["a", "ab", "abc", "ac", "b", "bc", "c"]
    with pytest.raises(ValueError, match="max_deletes"):
        delete_variants(F.lit("x"), 3)


def _brute(words, d):
    out = set()

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(
                    m[j] + 1, m[j - 1] + 1, prev + (ca != cb))
        return m[-1]

    for a, b in itertools.combinations(sorted(set(words)), 2):
        dd = lev(a, b)
        if dd <= d:
            out.add((a, b, dd))
    return out


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_pairs_exact_vs_bruteforce(spark, d):
    words = [
        "spark", "spork", "spark", "spar", "sharks", "shark", "park",
        "dark", "darks", "a", "b", "ab", "ba", "join", "jion", "joins",
        "table", "tables", "tbale", "cable",
    ]
    df = spark.createDataFrame([(w,) for w in words], "token string")
    got = {(r["a"], r["b"], r["dist"])
           for r in fuzzy_pairs(df, max_dist=d).collect()}
    assert got == _brute(words, d)


def test_fuzzy_pairs_drops_null_and_empty(spark):
    df = spark.createDataFrame(
        [("cat",), ("",), (None,), ("cart",)], "token string"
    )
    got = {(r["a"], r["b"]) for r in fuzzy_pairs(df, max_dist=1).collect()}
    assert got == {("cart", "cat")} or got == {("cat", "cart")}
    # normalized order: a < b
    assert all(a < b for a, b in got)


def test_fuzzy_pairs_no_cartesian(spark):
    df = spark.createDataFrame([(f"w{i}",) for i in range(50)], "token string")
    out = fuzzy_pairs(df, max_dist=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
