"""PMI co-occurrence edges (kgspark.cooc)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from kgspark.cooc import pmi_edges


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_pmi_values_and_thresholds(spark):
    # a+b together twice, a alone once, c everywhere; N=4
    df = _df(spark, ["a b", "a b c", "a c", "c d"])
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
           for r in pmi_edges(df, min_df=2, min_pair=2).collect()}
    # df: a=3 b=2 c=3 (d df=1 pruned); pairs >= 2: (a,b)=2, (a,c)=2
    assert set(got) == {("a", "b"), ("a", "c")}
    n, pmi = got[("a", "b")]
    assert n == 2 and abs(pmi - math.log(2 * 4 / (3 * 2))) < 1e-12
    n, pmi = got[("a", "c")]
    assert n == 2 and abs(pmi - math.log(2 * 4 / (3 * 3))) < 1e-12


def test_repeats_in_doc_count_once(spark):
    df = _df(spark, ["x x x y", "y x"])
    got = pmi_edges(df, min_df=2, min_pair=2).collect()
    assert [(r["w1"], r["w2"], r["n_pair"])
            for r in got] == [("x", "y", 2)]
    # df_x = df_y = n_pair = N = 2 -> pmi = ln(2*2/(2*2)) = 0
    assert abs(got[0]["pmi"]) < 1e-12


def test_max_df_ratio_drops_stopword_like_terms(spark):
    df = _df(spark, ["the a b", "the a b", "the a b", "the z"])
    got = {(r["w1"], r["w2"])
           for r in pmi_edges(df, min_df=2, min_pair=2,
                              max_df_ratio=0.8).collect()}
    # 'the' (df=4 = N) is capped out; (a,b) survives
    assert got == {("a", "b")}


def test_empty_and_null_inputs(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = pmi_edges(df)
    assert out.count() == 0
    assert out.columns == ["w1", "w2", "n_pair", "pmi"]
    assert pmi_edges(_df(spark, [None, "solo"]), min_df=1,
                     min_pair=1).count() == 0
