"""BPE token induction (kgspark.bpe) vs a reference in-memory trainer."""

from collections import Counter

from kgspark.bpe import bpe_train, pair_stats, word_counts


def _ref_bpe(word_cnt: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich et al. 2016): pair counts weighted by word
    frequency, ties (left asc, right asc), greedy left-to-right merge."""
    syms = {w: list(w) for w in word_cnt}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += word_cnt[w]
        if not pairs:
            break
        (a, b), wt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, wt))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_matches_reference_trainer(spark):
    corpus = ["low low low low low lower lower newest newest newest "
              "newest newest newest widest widest widest"]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    wc = {r.word: r.cnt for r in word_counts(docs).collect()}
    got = [tuple(r) for r in bpe_train(docs, 6).orderBy("rank").collect()]
    want = _ref_bpe(wc, 6)
    assert got == want
    # classic example: 'es' then 'est' are the first merges
    assert (got[0][1], got[0][2]) == ("e", "s")
    assert (got[1][1], got[1][2]) == ("es", "t")


def test_bpe_matches_reference_on_random_corpus(spark):
    import random

    rng = random.Random(7)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(200)]
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    wc = {r.word: r.cnt for r in word_counts(docs).collect()}
    got = [tuple(r) for r in bpe_train(docs, 8).orderBy("rank").collect()]
    assert got == _ref_bpe(wc, 8)


def test_pair_stats_multiplicity_and_weighting(spark):
    docs = spark.createDataFrame([("aaa aaa ab",)], "text string")
    out = {(r.left, r.right): r.weight for r in
           pair_stats(word_counts(docs)).collect()}
    assert out[("a", "a")] == 4  # two (a,a) per 'aaa', twice
    assert out[("a", "b")] == 1


def test_bpe_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([("a b c",)], "text string")
    got = bpe_train(docs, 5).collect()
    assert got == []  # single-char words: nothing to merge


def test_bpe_apply_reproduces_trainer_state(spark):
    from kgspark.bpe import bpe_apply_census, bpe_segment_words, bpe_train, fold_merge

    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=4)
    mlist = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    # invariant: re-applying trained merges to the training vocab yields
    # the same segmentation the trainer's fold produced
    words = {r["word"]: r["syms"] for r in bpe_segment_words(
        spark.createDataFrame(
            [(w,) for w in ["low", "lower", "lowest", "new", "newer",
                            "newest"]], "word string"),
        merges).collect()}
    for w, syms in words.items():
        expect = list(w)
        for left, right in mlist:
            expect = fold_merge(expect, left, right)
        assert syms == expect, w
    # census: weighted by corpus word counts
    census = {r["subword"]: r["n"]
              for r in bpe_apply_census(docs, mlist).collect()}
    total_syms = sum(census.values())
    # 'low' appears 3x -> its symbols carry weight 3
    assert total_syms > 0
    low_syms = words["low"]
    for s in set(low_syms):
        assert census[s] >= 3 * low_syms.count(s)


def test_fold_merge_greedy_left_to_right():
    from kgspark.bpe import fold_merge

    # freshly merged symbol does not chain within the same pass
    assert fold_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert fold_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert fold_merge(["aa", "a", "a"], "aa", "a") == ["aaa", "a"]
    assert fold_merge(list("xy"), "a", "b") == ["x", "y"]
