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


def _g2(k11, c1, c2, n):
    import math

    def xlx(x):
        return x * math.log(x) if x > 0 else 0.0

    k12, k21 = c1 - k11, c2 - k11
    k22 = n - c1 - c2 + k11
    return 2.0 * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22) + xlx(n)
        - xlx(k11 + k12) - xlx(k11 + k21)
        - xlx(k12 + k22) - xlx(k21 + k22)
    )


def test_llr_collocations_match_hand_g2(spark):
    from kgspark.cooc import llr_collocations

    # "strong coffee" 4x, plus filler bigrams; bigram event space:
    # doc: "strong coffee" x4 and "weak tea" x4 interleaved with "x y"
    text = " ".join(["strong coffee"] * 4 + ["weak tea"] * 4 + ["x y"] * 4)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {(r["w1"], r["w2"]): (r["n_pair"], r["llr_micro"])
           for r in llr_collocations(docs, min_count=3).collect()}
    # bigrams include the joining pairs (coffee->strong etc.), so compute
    # marginals directly from the token stream
    toks = text.split()
    bigrams = list(zip(toks, toks[1:]))
    n = len(bigrams)
    k11 = bigrams.count(("strong", "coffee"))
    c1 = sum(1 for a, _ in bigrams if a == "strong")
    c2 = sum(1 for _, b in bigrams if b == "coffee")
    want = round(_g2(k11, c1, c2, n) * 1e6)
    got_n, got_llr = out[("strong", "coffee")]
    assert got_n == k11 == 4
    assert abs(got_llr - want) <= 1  # fp64 assoc-order slack vs math.log
    # a pair below min_count is absent
    assert ("x", "y") in out and out[("x", "y")][0] == 4
    assert all(np >= 3 for np, _ in out.values())


def test_llr_collocations_empty_and_validation(spark):
    import pytest as _pytest

    from kgspark.cooc import llr_collocations

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "one")], "doc_id long, text string"
    )
    assert llr_collocations(docs).count() == 0
    with _pytest.raises(ValueError):
        llr_collocations(docs, min_count=0)
