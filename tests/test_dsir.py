"""DSIR hashed-ngram importance weights (kgspark.dsir)."""

from pyspark.sql import functions as F

from kgspark.dsir import dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )


def test_dsir_target_like_docs_score_higher(spark):
    rows = (
        [(i, "alpha beta gamma alpha beta", True) for i in range(10)]
        + [(100 + i, "delta epsilon zeta delta zeta", False) for i in range(10)]
        # raw doc that LOOKS like the target slice
        + [(200, "alpha beta gamma alpha", False)]
        # raw doc that looks like raw
        + [(201, "delta epsilon zeta", False)]
    )
    out = {r.doc_id: r for r in dsir_weights(_docs(spark, rows)).collect()}
    assert out[200].score_unats > out[201].score_unats
    assert out[200].score_unats > 0 > out[201].score_unats
    assert out[0].is_target and not out[200].is_target


def test_dsir_gram_count_and_empty_docs(spark):
    rows = [
        (1, "a b c", True),       # 3 unigrams + 2 bigrams
        (2, "solo", False),       # 1 unigram, no bigram
        (3, "", False),
        (4, None, False),
    ]
    out = {r.doc_id: r for r in dsir_weights(_docs(spark, rows)).collect()}
    assert out[1].n_grams == 5
    assert out[2].n_grams == 1
    assert out[3].n_grams == 0 and out[3].score_unats == 0
    assert out[4].n_grams == 0 and out[4].score_unats == 0
    assert len(out) == 4  # every doc scored, incl. empties


def test_dsir_determinism_across_partitionings(spark):
    rows = [
        (i, " ".join(f"w{(i * j) % 13}" for j in range(1, 8)), i % 3 == 0)
        for i in range(60)
    ]
    docs = _docs(spark, rows)
    a = dsir_weights(docs.repartition(1), n_buckets=64).collect()
    b = dsir_weights(docs.repartition(17), n_buckets=64).collect()
    key = lambda r: (r.doc_id,)
    assert sorted([tuple(r) for r in a]) == sorted([tuple(r) for r in b])


def test_dsir_all_target_or_all_raw_stays_finite(spark):
    rows = [(i, "x y z", True) for i in range(5)]
    out = dsir_weights(_docs(spark, rows)).collect()
    assert all(r.score_unats is not None for r in out)
