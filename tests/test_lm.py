"""Bigram-LM perplexity filter (kgspark.lm) — the CCNet-style quality
bucket signal, trained on the corpus itself (beyond-reference, SURVEY §8).
"""

from __future__ import annotations

import math

from pyspark.sql import Row

from kgspark.lm import bigram_pairs, score_bigram_lm, train_bigram_lm


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_bigram_pairs_adjacent_lowercased(spark):
    df = _docs(spark, ["The cat  sat", "x", None, ""])
    got = sorted((r["doc_id"], r["w1"], r["w2"])
                 for r in bigram_pairs(df).collect())
    assert got == [(0, "cat", "sat"), (0, "the", "cat")]


def test_train_counts(spark):
    uni, bi = train_bigram_lm(_docs(spark, ["a b a b", "a b"]))
    u = {r["w1"]: r["c1"] for r in uni.collect()}
    assert u == {"a": 3, "b": 3}
    b = {(r["w1"], r["w2"]): (r["c12"], r["c1"]) for r in bi.collect()}
    assert b == {("a", "b"): (3, 3), ("b", "a"): (1, 3)}


def test_score_hand_computed(spark):
    corpus = _docs(spark, ["a b a b", "a b"])
    uni, bi = train_bigram_lm(corpus)
    out = {r["doc_id"]: r for r in
           score_bigram_lm(_docs(spark, ["a b", "c c", "a"]),
                           uni, bi).collect()}
    # V=2, k=1. p(b|a) = (3+1)/(3+2) = 0.8
    assert out[0]["n_bigrams"] == 1
    assert abs(out[0]["bits"] - (-math.log2(0.8))) < 1e-9
    # unseen everything: p = (0+1)/(0+2) = 0.5 -> exactly 1 bit
    assert out[1]["n_bigrams"] == 1
    assert abs(out[1]["bits"] - 1.0) < 1e-9
    # <2 tokens: zero bigrams, NULL bits
    assert out[2]["n_bigrams"] == 0 and out[2]["bits"] is None


def test_fluent_scores_below_shuffled(spark):
    fluent = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on dog sat rug cat the and the on sat"
    corpus = _docs(spark, [fluent, "the cat sat on the rug",
                           "the dog sat on the mat"])
    uni, bi = train_bigram_lm(corpus)
    out = {r["doc_id"]: r["bits"] for r in
           score_bigram_lm(_docs(spark, [fluent, shuffled]),
                           uni, bi).collect()}
    assert out[0] < out[1]


def test_min_count_pruning_keeps_denominators(spark):
    corpus = _docs(spark, ["a b a b a c"])
    uni, bi = train_bigram_lm(corpus, min_count=2)
    b = {(r["w1"], r["w2"]) for r in bi.collect()}
    assert b == {("a", "b"), ("b", "a")}  # (a,c) x1 pruned
    # pruned bigram scores via smoothing with the EXACT unigram denominator
    out = score_bigram_lm(_docs(spark, ["a c"]), uni, bi).collect()[0]
    # V=3, k=1: p(c|a) = (0+1)/(3+3)
    assert abs(out["bits"] - (-math.log2(1.0 / 6.0))) < 1e-9


def test_lm_buckets_ntile_semantics(spark):
    # 7 scored docs -> sizes 3,2,2; NULL bits sorts to the tail
    rows = [Row(doc_id=i, n_bigrams=5, bits=float(i)) for i in range(6)]
    rows.append(Row(doc_id=6, n_bigrams=0, bits=None))
    from kgspark.lm import lm_buckets

    out = {r["doc_id"]: r["bucket"]
           for r in lm_buckets(spark.createDataFrame(rows), n=3).collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3}


def test_lm_buckets_fewer_rows_than_buckets(spark):
    from kgspark.lm import lm_buckets

    df = spark.createDataFrame([Row(doc_id=0, n_bigrams=1, bits=2.0),
                                Row(doc_id=1, n_bigrams=1, bits=1.0)])
    out = {r["doc_id"]: r["bucket"] for r in lm_buckets(df, n=5).collect()}
    assert out == {1: 1, 0: 2}
    empty = lm_buckets(df.limit(0), n=3)
    assert empty.count() == 0 and "bucket" in empty.columns


def test_trigram_backoff_tiers(spark):
    import math

    from kgspark.lm import score_trigram_lm, train_trigram_lm

    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    tri, bi, uni, totals = train_trigram_lm(train)
    # seen trigram 'a b c' twice out of c12('a b')=2 -> p=1
    score = spark.createDataFrame(
        [(10, "a b c"),          # 1 trigram, seen: p = 2/2 = 1 -> 0 unats
         (11, "b c d"),          # seen once / c12(b c)=2 -> p=.5
         (12, "x b c"),          # unseen tri; bigram (b c) seen -> backoff
         (13, "x y zzz"),        # full backoff to add-1 unigram (zzz unseen)
         (14, "a b")],           # too short -> 0 trigrams
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           score_trigram_lm(score, tri, bi, uni, totals).collect()}
    assert got[10]["sum_unats"] == 0 and got[10]["n_trigrams"] == 1
    assert got[11]["sum_unats"] == round(-math.log(0.5) * 1e6)
    # backoff tier: 0.4 * c23/c2; c23('b c')=2, c2 = c('b')=2 -> 0.4
    assert got[12]["sum_unats"] == round(-math.log(0.4 * 1.0) * 1e6)
    # full backoff: 0.16 * (0+1)/(N+V); N=8 tokens, V=5 types
    exp = 0.4 * 0.4 * (1.0 / (8 + 5))
    assert got[13]["sum_unats"] == round(-math.log(exp) * 1e6)
    assert got[14]["n_trigrams"] == 0 and got[14]["sum_unats"] == 0


def test_kneser_ney_matches_python_replica(spark):
    import math

    from kgspark.lm import score_kn_lm, train_kn_lm

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "san francisco san francisco san francisco"),
        (3, "unseen tokens only here"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    left, bi, cont = train_kn_lm(df)
    out = {r.doc_id: r for r in score_kn_lm(df, left, bi, cont).collect()}

    # python replica
    toks = {i: t.lower().split() for i, t in docs}
    pairs = [(w1, w2) for t in toks.values() for w1, w2 in zip(t, t[1:])]
    from collections import Counter
    c12 = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    n1p = Counter(w1 for w1, _ in set(pairs))
    ncont = Counter(w2 for _, w2 in set(pairs))
    T = float(len(c12))
    V = float(len(ncont))
    D = 0.5
    for i, t in toks.items():
        ps = list(zip(t, t[1:]))
        if not ps:
            assert out[i].n_bigrams == 0 and out[i].bits is None
            continue
        s = 0.0
        for w1, w2 in ps:
            pc = (ncont.get(w2, 0) + 1.0) / (T + V)
            if w1 in c1:
                p = (max(c12.get((w1, w2), 0) - D, 0.0)
                     + D * n1p[w1] * pc) / c1[w1]
            else:
                p = pc
            s += math.log(p)
        bits = -s / len(ps) / math.log(2.0)
        assert out[i].n_bigrams == len(ps)
        assert abs(out[i].bits - bits) < 1e-9, (i, out[i].bits, bits)
    # KN property: seen-corpus scores are finite and positive
    assert all(out[i].bits > 0 for i in (0, 1, 2, 3))
