"""BM25 retrieval (kgspark.search)."""

import pytest
from pyspark.sql import functions as F

from kgspark.search import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_tf_and_length(spark):
    docs = _docs(
        spark,
        [
            (1, "hash hash hash join"),          # high tf, short
            (2, "hash join " + "pad " * 50),      # low tf, long
            (3, "hash"),                          # one term only
            (4, "nothing relevant here"),         # no hit
        ],
    )
    out = bm25_topk(docs, ["hash", "join"], top_k=10).collect()
    ids = [r.doc_id for r in out]
    assert 4 not in ids
    # doc 1 beats doc 2: more tf, shorter
    assert ids.index(1) < ids.index(2)
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_hit_terms == 2
    assert by_id[3].n_hit_terms == 1
    assert all(r.score_unats > 0 for r in out)


def test_bm25_topk_limit_and_ties(spark):
    rows = [(i, "join") for i in range(30)]
    out = bm25_topk(_docs(spark, rows), ["join"], top_k=5).collect()
    # identical docs -> identical scores -> tie broken on doc_id asc
    assert [r.doc_id for r in out] == [0, 1, 2, 3, 4]
    assert len({r.score_unats for r in out}) == 1


def test_bm25_case_fold_and_dedup_terms(spark):
    docs = _docs(spark, [(1, "Hash JOIN hash")])
    out = bm25_topk(docs, ["HASH", "hash", "Join"]).collect()
    assert len(out) == 1 and out[0].n_hit_terms == 2


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(1, "x")]), [])


def test_bm25_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "join join"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["join"]).collect()
    assert [r.doc_id for r in out] == [1]


def test_bm25_determinism_across_partitionings(spark):
    rows = [(i, ("hash " * (i % 5 + 1)) + ("join " * (i % 3))) for i in range(60)]
    docs = _docs(spark, rows)
    a = bm25_topk(docs.repartition(1), ["hash", "join"], top_k=15).collect()
    b = bm25_topk(docs.repartition(17), ["hash", "join"], top_k=15).collect()
    assert [(r.doc_id, r.score_unats) for r in a] == [
        (r.doc_id, r.score_unats) for r in b
    ]


def test_rrf_fuse_combines_lists(spark):
    from kgspark.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (3, 8.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (1, 0.7)], "doc_id long, score double"
    )
    out = rrf_fuse([a, b], k=60, top_k=10).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 1: rank 1 + rank 3; doc 3: rank 3 + rank 1 -> tie on score,
    # broken by id asc
    assert by_id[1].rrf_nanos == by_id[3].rrf_nanos
    assert [r.doc_id for r in out][:2] == [1, 3]
    assert by_id[1].n_lists == 2 and by_id[2].n_lists == 1
    expected = round(1e9 / 61) + round(1e9 / 63)
    assert by_id[1].rrf_nanos == expected


def test_rrf_single_list_and_empty_raises(spark):
    import pytest as _pytest

    from kgspark.search import rrf_fuse

    a = spark.createDataFrame([(5, 1.0)], "doc_id long, score double")
    out = rrf_fuse([a]).collect()
    assert out[0].doc_id == 5 and out[0].rrf_nanos == round(1e9 / 61)
    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_tie_scores_rank_by_id(spark):
    from kgspark.search import rrf_fuse

    a = spark.createDataFrame(
        [(9, 1.0), (2, 1.0), (5, 1.0)], "doc_id long, score double"
    )
    out = rrf_fuse([a], top_k=3).collect()
    # equal scores -> rank order 2, 5, 9
    assert [r.doc_id for r in out] == [2, 5, 9]


def test_phrase_search_adjacency_and_overlap(spark):
    from kgspark.search import phrase_search

    df = spark.createDataFrame(
        [
            (1, "the Quick brown fox the quick brown wolf"),
            (2, "quick the brown fox"),          # terms present, not adjacent
            (3, "ends with quick brown"),        # match at tail
            (4, "quick"),                        # phrase longer than doc
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["first_pos"])
           for r in phrase_search(df, ["quick", "brown"]).collect()}
    assert got == {1: (2, 2), 3: (1, 3)}
    # overlapping matches count each anchor: "a a a" has 2 hits of "a a"
    df2 = spark.createDataFrame([(9, "a a a")], "doc_id long, text string")
    got2 = phrase_search(df2, ["a", "a"]).collect()[0]
    assert (got2["n_hits"], got2["first_pos"]) == (2, 1)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        phrase_search(df, ["two words"])
    with _pytest.raises(ValueError):
        phrase_search(df, [])


def test_ql_topk_ranking_and_smoothing(spark):
    from kgspark.search import ql_topk
    import math

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry cherry"),
         (3, "durian durian durian")],
        "doc_id long, text string",
    )
    out = ql_topk(docs, ["apple", "banana"], mu=10.0, top_k=3).collect()
    ids = [r.doc_id for r in out]
    # doc 1 has both terms, doc 2 one, doc 3 none — but doc 3 STILL
    # scores (smoothing mass), ranked last
    assert ids[0] == 1 and set(ids) == {1, 2, 3}
    hits = {r.doc_id: r.n_hit_terms for r in out}
    assert hits == {1: 2, 2: 1, 3: 0}
    # exact micro-nat check for doc 3, term 'apple': cf=3, |C|=9, dl=3
    # contribution = round(ln((0 + 10*(3/9)) / (3+10)) * 1e6)
    c_apple = round(math.log((10.0 * (3.0 / 9.0)) / 13.0) * 1e6)
    c_banana = round(math.log((10.0 * (1.0 / 9.0)) / 13.0) * 1e6)
    d3 = [r for r in out if r.doc_id == 3][0]
    assert d3.score_unats == c_apple + c_banana
    # corpus-absent terms are dropped, not -inf
    out2 = ql_topk(docs, ["apple", "zzz_unseen"], mu=10.0).collect()
    assert [r.doc_id for r in out2][0] in (1, 2)
    assert all(r.score_unats < 0 for r in out2)


def test_prf_expand_terms_weights_and_exclusion(spark):
    from kgspark.search import prf_expand_terms

    docs = _docs(
        spark,
        [
            (1, "hash alpha alpha beta"),   # feedback (hits 'hash')
            (2, "hash alpha gamma"),        # feedback
            (3, "nothing relevant"),        # never retrieved
        ],
    )
    out = prf_expand_terms(docs, ["hash"], fb_k=2, n_expand=10).collect()
    by_t = {r.term: r for r in out}
    # the query term itself is excluded
    assert "hash" not in by_t
    # alpha: tf_fb=3 (2 in doc1 + 1 in doc2), df_fb=2 -> w=6
    assert (by_t["alpha"].tf_fb, by_t["alpha"].df_fb,
            by_t["alpha"].w) == (3, 2, 6)
    assert (by_t["beta"].tf_fb, by_t["beta"].df_fb) == (1, 1)
    # doc 3 never contributes (not in the feedback set)
    assert "nothing" not in by_t and "relevant" not in by_t
    # ranking: w desc, term asc
    assert [r.term for r in out][0] == "alpha"


def test_prf_expand_tie_and_limit(spark):
    from kgspark.search import prf_expand_terms

    docs = _docs(spark, [(1, "hash zeta apple")])
    out = prf_expand_terms(docs, ["hash"], fb_k=1, n_expand=1).collect()
    # zeta and apple tie at w=1 -> term asc wins -> apple
    assert [r.term for r in out] == ["apple"]


def test_bm25_prf_two_pass_recovers_expansion_docs(spark):
    from kgspark.search import bm25_prf_topk

    docs = _docs(
        spark,
        [
            (1, "hash expansion expansion"),    # feedback doc
            (2, "expansion expansion expansion"),  # only reachable via PRF
            (3, "unrelated words entirely"),
        ],
    )
    out = bm25_prf_topk(docs, ["hash"], fb_k=1, n_expand=1,
                        top_k=10).collect()
    ids = {r.doc_id for r in out}
    # pass 1 sees only doc 1; 'expansion' is harvested, pass 2 pulls doc 2
    assert ids == {1, 2}
    # doc 1 matches both 'hash' and 'expansion'
    hits = {r.doc_id: r.n_hit_terms for r in out}
    assert hits[1] == 2 and hits[2] == 1


def test_bm25_prf_no_expansion_terms_degenerates_to_bm25(spark):
    from kgspark.search import bm25_prf_topk

    docs = _docs(spark, [(1, "hash hash"), (2, "other stuff")])
    # feedback doc contains ONLY query terms -> expansion set is empty
    out = bm25_prf_topk(docs, ["hash"], fb_k=1, n_expand=5).collect()
    assert [r.doc_id for r in out] == [1]
    base = bm25_topk(docs, ["hash"]).collect()
    assert [(r.doc_id, r.score_unats) for r in out] == [
        (r.doc_id, r.score_unats) for r in base
    ]


def test_best_window_argmax_and_tiebreak(spark):
    from kgspark.search import best_window

    docs = spark.createDataFrame(
        [(1, "x cat x x x x x x x x cat dog cat y"),
         (2, "cat a b c d e f g h i j k l m cat"),  # spread out
         (3, "no match here")],
        "doc_id long, text string",
    )
    got = {r.id: r for r in best_window(
        docs, ["cat", "dog"], width=4).collect()}
    # doc 1: window [10..13] = 'cat dog cat y' holds 3 hits
    assert got[1].start_pos == 10 and got[1].n_hits == 3
    assert got[1].snippet == "cat dog cat y"
    # doc 2: each 4-window holds 1 hit; tie -> earliest match anchor
    assert got[2].start_pos == 0 and got[2].n_hits == 1
    # zero-match docs emit nothing
    assert 3 not in got
    # width larger than the doc clips the snippet
    wide = best_window(docs, ["dog"], width=50).collect()[0]
    assert wide.snippet.startswith("dog")
