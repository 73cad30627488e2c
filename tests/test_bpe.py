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
