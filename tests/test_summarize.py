"""Token-overlap centrality summarizer (kgspark.summarize)."""

from __future__ import annotations

from pyspark.sql import Row

from kgspark.summarize import centrality_summary, sentence_table


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_sentence_table_positions_and_cleanup(spark):
    df = _df(spark, ["one two. three four! five?  ", None, ""])
    got = sorted((r["doc"], r["sid"], r["sentence"])
                 for r in sentence_table(df).collect())
    assert got == [(0, 0, "one two"), (0, 1, "three four"), (0, 2, "five")]


def test_centrality_picks_most_connected_sentence(spark):
    # s1 shares 'spark' with s0 and 'fast' with s2 -> score 2; s0/s2 score 1
    df = _df(spark, ["spark joins. spark is fast. fast scans win."])
    got = [(r["sid"], r["score"], r["sentence"])
           for r in centrality_summary(df, k=1).collect()]
    assert got == [(1, 2, "spark is fast")]


def test_tie_breaks_by_position_and_zero_overlap_kept(spark):
    df = _df(spark, ["alpha beta. gamma delta. epsilon zeta."])
    got = [(r["sid"], r["score"])
           for r in centrality_summary(df, k=2).collect()]
    # no overlaps anywhere: positions 0 and 1 win on the tie-break
    assert got == [(0, 0), (1, 0)]


def test_single_sentence_and_duplicate_tokens(spark):
    # duplicate tokens inside a sentence count once (distinct-token overlap)
    df = _df(spark, ["go go go stop. stop now."])
    got = {r["sid"]: r["score"] for r in centrality_summary(df, k=2).collect()}
    assert got == {0: 1, 1: 1}
