"""Per-document keyword extraction (kgspark.keywords)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from kgspark.keywords import doc_keywords


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_rank_tf_then_rarity_then_token(spark):
    # doc0: 'rare' tf=2 beats everything; 'the' (df=3) loses to 'cat'
    # (df=1) on the rarity tie-break at tf=1
    df = _df(spark, ["rare rare the cat", "the dog", "the bird"])
    got = [(r["token"], r["tf"], r["dfreq"])
           for r in doc_keywords(df, k=2).collect() if r["doc_id"] == 0]
    assert got == [("rare", 2, 1), ("cat", 1, 1)]


def test_tfidf_value_and_no_token_docs(spark):
    df = _df(spark, ["a a b", "b", None, ""])
    rows = {(r["doc_id"], r["token"]): r["tfidf"]
            for r in doc_keywords(df, k=5).collect()}
    # N=4 (all input rows); a: tf=2 df=1; b in doc0: tf=1 df=2
    assert abs(rows[(0, "a")] - 2 * math.log(4 / 1)) < 1e-12
    assert abs(rows[(0, "b")] - 1 * math.log(4 / 2)) < 1e-12
    assert not any(d in (2, 3) for d, _ in rows)


def test_k_limits_per_document(spark):
    df = _df(spark, ["one two three four five"])
    assert doc_keywords(df, k=3).count() == 3
