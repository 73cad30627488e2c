"""TF-IDF n-gram generalization (ref TfidfVectorizer ngram_range=(1,4),
knowledge_graph_builder.py:270-276)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.topics import all_ngrams_of, ngrams_of, tfidf_scores


def _toks(spark, text):
    return spark.createDataFrame([(text,)], "t string").select(
        F.filter(F.split("t", " "), lambda x: x != "").alias("toks")
    )


def test_ngrams_of_orders_and_sizes(spark):
    row = _toks(spark, "a b c d").select(
        ngrams_of(F.col("toks"), 1).alias("u"),
        ngrams_of(F.col("toks"), 2).alias("b2"),
        ngrams_of(F.col("toks"), 3).alias("b3"),
        ngrams_of(F.col("toks"), 4).alias("b4"),
        ngrams_of(F.col("toks"), 5).alias("b5"),
    ).collect()[0]
    assert row["u"] == ["a", "b", "c", "d"]
    assert row["b2"] == ["a b", "b c", "c d"]
    assert row["b3"] == ["a b c", "b c d"]
    assert row["b4"] == ["a b c d"]
    assert row["b5"] == []


def test_all_ngrams_range(spark):
    row = _toks(spark, "x y z").select(
        all_ngrams_of(F.col("toks"), (1, 4)).alias("g")
    ).collect()[0]
    assert row["g"] == ["x", "y", "z", "x y", "y z", "x y z"]


def test_tfidf_emits_3_and_4_grams(spark):
    # "alpha beta gamma delta" repeats in 2 docs -> the 4-gram clears min_df=2
    docs = spark.createDataFrame(
        [("d0", "alpha beta gamma delta one"),
         ("d1", "alpha beta gamma delta two"),
         ("d2", "unrelated filler words here")],
        "chunk_uid string, chunk_text string",
    )
    terms = {r["term"] for r in
             tfidf_scores(docs, min_df=2, ngram_range=(1, 4)).collect()}
    assert "alpha beta gamma" in terms
    assert "alpha beta gamma delta" in terms
    # default (1,2) stays bigram-bounded
    terms2 = {r["term"] for r in tfidf_scores(docs, min_df=2).collect()}
    assert not any(t.count(" ") >= 2 for t in terms2)
