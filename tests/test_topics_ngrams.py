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


def test_build_topics_golden_fixture(spark):
    """Correctness anchor for the ML (KMeans) topic path, which is
    permanently rows-only at the driver gate (not SQL-expressible): on a
    cleanly separable 3-vocabulary corpus, build_topics(k=3, seed=42) must
    recover exactly the three vocabularies with this pinned term ranking.
    Compared as a SET of per-topic term lists so a KMeans label permutation
    (partitioning-dependent) can't flake the test."""
    from pyspark.sql import functions as F

    from kgspark.chunk import chunk_documents
    from kgspark.embed import embed_udf
    from kgspark.topics import build_topics

    vocab = {
        "astro": "telescope galaxy nebula orbit photon quasar cosmic stellar",
        "cook": "recipe saucepan simmer garlic butter flour oven whisk",
        "law": "statute plaintiff verdict appeal tribunal clause counsel filing",
    }
    rows, i = [], 0
    for words in vocab.values():
        ws = words.split()
        for d in range(10):
            rows.append((i, " ".join(ws[(d + j) % len(ws)] for j in range(30))))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs, id_col="doc_id", text_col="text", max_length=500)
    chunks = chunks.withColumn(
        "chunk_uid", F.concat_ws("#", "doc_id", "chunk_id")
    ).withColumn("embedding", embed_udf()(F.col("chunk_text")))
    out = build_topics(chunks, k=3, seed=42)

    GOLDEN = {
        "butter|flour|saucepan|garlic|simmer|butter flour|oven|recipe|saucepan simmer|simmer garlic|garlic butter|flour oven|recipe saucepan|whisk|oven whisk|whisk recipe",
        "clause|plaintiff|tribunal|appeal|verdict|appeal tribunal|counsel|plaintiff verdict|tribunal clause|verdict appeal|statute|filing|clause counsel|statute plaintiff|counsel filing|filing statute",
        "photon|quasar|galaxy|nebula|orbit|galaxy nebula|nebula orbit|orbit photon|photon quasar|telescope|cosmic|quasar cosmic|telescope galaxy|stellar|cosmic stellar|stellar telescope",
    }
    got = {"|".join(r["terms"]) for r in out.collect()}
    assert got == GOLDEN
    names = {r["topic_name"] for r in out.collect()}
    assert "Topic (photon, quasar, galaxy)" in names
