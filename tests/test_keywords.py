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


def test_rake_phrases_hand_case(spark):
    from kgspark.keywords import rake_phrases

    # runs: [red cat], [red cat dog], [dog]
    # red/cat: freq 2, deg 5 -> 2500000; dog: freq 2, deg 4 -> 2000000
    docs = spark.createDataFrame(
        [(1, "red cat and red cat dog and dog")],
        "doc_id long, text string",
    )
    out = [(r.phrase, r.n_words, r.score_ppm)
           for r in rake_phrases(docs, k=3).collect()]
    assert out == [("red cat dog", 3, 7_000_000),
                   ("red cat", 2, 5_000_000),
                   ("dog", 1, 2_000_000)]


def test_rake_truncating_div_and_distinct(spark):
    from kgspark.keywords import rake_phrases

    # runs: [cat dog], [cat], [cat] -> cat: freq 3, deg 4 ->
    # 4000000 div 3 = 1333333 (truncated); the two [cat] runs
    # collapse to ONE distinct phrase row
    docs = spark.createDataFrame(
        [(1, "cat dog of cat of cat")], "doc_id long, text string"
    )
    out = [(r.phrase, r.score_ppm) for r in rake_phrases(docs).collect()]
    assert out == [("cat dog", 3_333_333), ("cat", 1_333_333)]


def test_rake_delimiters_and_max_words(spark):
    from kgspark.keywords import rake_phrases

    docs = spark.createDataFrame(
        [(1, "alpha x9 beta gamma delta epsilon zeta"),  # non-letter delim
         (2, "the of and")],                              # all stopwords
        "doc_id long, text string",
    )
    out = rake_phrases(docs, k=5, max_words=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.phrase)
    # the 5-word run beta..zeta is dropped by max_words=4
    assert by_doc == {1: ["alpha"]}
    # per-doc partitioned stats: same corpus words, independent docs
    two = spark.createDataFrame(
        [(1, "red cat"), (2, "red dog")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.phrase): r.score_ppm
           for r in rake_phrases(two, k=1).collect()}
    assert got == {(1, "red cat"): 4_000_000, (2, "red dog"): 4_000_000}


def test_yake_keywords_feature_math(spark):
    import math

    from kgspark.keywords import yake_keywords

    text = "Spark engine shuffles data the Spark optimizer plans joins"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r.term: r for r in yake_keywords(df, k=10).collect()}
    # every alpha token extracted, case-folded
    assert "spark" in out and out["spark"].tf == 2
    # python mirror of the pinned formula for 'spark'
    # occurrences at pos 0 (cap, no left nbr, right='engine') and
    # pos 5 (cap, left='the', right='optimizer')
    tf, cap, min_pos = 2.0, 2.0, 0.0
    dl, dr = 1.0, 2.0       # left: {'the'}; right: {'engine','optimizer'}
    n_with, n_sent = 1.0, 1.0
    max_tf = 2.0
    wcase = cap / (1.0 + math.log(1.0 + tf))
    wpos = math.log(math.log(3.0 + min_pos))
    tfn = tf / max_tf
    wrel = 1.0 + (dl + dr) / tf
    disp = n_with / n_sent
    s = (wrel * wpos) / (wcase + tfn / wrel + disp / wrel)
    assert out["spark"].score_micro == round(s * 1_000_000)
    # ranks are 1..n dense and ordered by (score, term)
    ranked = sorted(out.values(), key=lambda r: r.rank)
    assert [r.rank for r in ranked] == list(range(1, len(ranked) + 1))
    assert all(
        (a.score_micro, a.term) < (b.score_micro, b.term)
        for a, b in zip(ranked, ranked[1:])
    )
    # k bound respected
    assert len(yake_keywords(df, k=3).collect()) == 3
    # null / empty text yields no rows, not an error
    empty = spark.createDataFrame(
        [(2, None), (3, "")], "doc_id long, text string")
    assert yake_keywords(empty).count() == 0
