"""Dedup operator tests: exact, minhash-LSH, simhash, ngram-jaccard,
embedding near-dup."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.dedup import (
    embedding_near_dup,
    exact_duplicates,
    minhash_dedup,
    ngram_jaccard_pairs,
    sign_bucket,
    simhash_dedup,
    word_shingles,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank now"),    # near dup of 0
    (3, "completely different text about database systems and query planners"),
    (4, "short text"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    out = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in exact_duplicates(_docs(spark)).collect()}
    assert out[0] == (0, 2)
    assert out[1] == (0, 2)
    assert out[2][1] == 1
    assert out[3][1] == 1


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "t string")
    rows = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert sorted(rows[0]["s"]) == ["a b c", "b c d"]
    assert rows[1]["s"] == ["x y"]  # shorter than n -> whole text


def test_minhash_dedup_finds_near_dups(spark):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in minhash_dedup(_docs(spark), jaccard_threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p or 4 in p for p in pairs)


def test_simhash_groups_exact_dups(spark):
    out = {r["doc_id"]: (r["simhash"], r["group_size"])
           for r in simhash_dedup(_docs(spark)).collect()}
    assert out[0][0] == out[1][0]
    assert out[0][1] >= 2
    assert 0 <= out[3][0] < 2 ** 16


def test_ngram_jaccard_pairs(spark):
    pairs = {(r["a"], r["b"]) for r in
             ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_embedding_near_dup(spark):
    rows = [
        (0, [1.0, 0.5, -0.2, 0.1]),
        (1, [1.0, 0.5, -0.2, 0.1]),     # identical
        (2, [0.99, 0.51, -0.19, 0.11]),  # near
        (3, [-1.0, 0.5, 0.2, -0.1]),     # far (rejected by cosine verify)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["a"], r["b"]): r["cos"]
             for r in embedding_near_dup(emb, threshold=0.95).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_sign_bucket_range(spark):
    emb = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8)], "vec_id long, embedding array<float>"
    )
    got = [r["b"] for r in
           emb.select(sign_bucket(F.col("embedding"), 8).alias("b")).collect()]
    assert got == [255, 0]


def test_simhash64_hamming_pairs(spark):
    from kgspark.dedup import simhash64_table, simhash_hamming_pairs

    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_hamming_pairs(_docs(spark), max_hamming=3).collect()}
    # identical texts -> identical 64-bit sketch -> hamming 0
    assert pairs[(0, 1)] == 0
    # the unrelated doc never pairs with the dup cluster at hamming <= 3
    assert not any(3 in p for p in pairs)
    # bands are 16-bit values
    sk = simhash64_table(_docs(spark)).collect()
    for r in sk:
        for b in range(4):
            assert 0 <= r[f"b{b}"] < 2 ** 16


def test_simhash64_multiprobe_recall(spark):
    """Pigeonhole: any pair at hamming <= 3 shares >= 1 of the 4 bands, so
    the banded candidate join has exact recall — cross-check the blocked
    result against brute-force popcount on the sketches."""
    from kgspark.dedup import simhash64_table, simhash_hamming_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i % 3} end") for i in range(12)],
        "doc_id long, text string",
    )
    sk = {r["id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
          for r in simhash64_table(docs).collect()}
    brute = set()
    for a in sk:
        for b in sk:
            if a < b:
                h = sum(bin(x ^ y).count("1") for x, y in zip(sk[a], sk[b]))
                if h <= 3:
                    brute.add((a, b))
    blocked = {(r["a"], r["b"])
               for r in simhash_hamming_pairs(docs, max_hamming=3).collect()}
    assert blocked == brute


def test_reliable_checkpoint_path(spark, tmp_path):
    """With a checkpoint dir configured, materialize() routes through
    reliable checkpoint() (filesystem blocks) and results are unchanged."""
    baseline = {(r["a"], r["b"]) for r in
                ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    ckpt = str(tmp_path / "ckpt")
    sc = spark.sparkContext
    sc.setCheckpointDir(ckpt)
    try:
        got = {(r["a"], r["b"]) for r in
               ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
        assert got == baseline
        import os
        rdd_dirs = [p for p, _, files in os.walk(ckpt) if files]
        assert rdd_dirs, "reliable checkpoint wrote no blocks"
    finally:
        # unset so later tests go back to localCheckpoint
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_banded_pairs_track_similarity_not_bucket_hotness(spark):
    """The r2-verdict scale fix: on a fixture engineered so the old few-bit
    sign_bucket blocking is maximally skewed (every vector shares the first
    6 sign bits -> ONE hot bucket -> all n(n-1)/2 candidate pairs), banded
    multi-table LSH must (a) still surface every planted near-dup pair and
    (b) generate candidates at a small fraction of the all-pairs volume —
    candidate count tracks near-dup density, not n^2/buckets."""
    import hashlib

    from kgspark.dedup import banded_pairs
    from kgspark.session import materialize
    from pyspark.sql import functions as F

    def vec(seed: int) -> list[float]:
        # first 6 coords constant-positive (the hot legacy bucket);
        # the rest deterministic pseudo-random signs
        out = [1.0] * 6
        for j in range(6, 64):
            h = hashlib.md5(f"{seed}:{j}".encode()).digest()[0]
            out.append(1.0 if h % 2 else -1.0)
        return out

    n = 200
    rows = [(i, vec(i)) for i in range(n)]
    # plant 10 exact near-dup clones (ids 1000+i duplicate ids 0..9)
    rows += [(1000 + i, vec(i)) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    t = materialize(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("e"))
    )
    cand = banded_pairs(t, "id", "e", bands=8, band_bits=8)
    pairs = {(r["a"], r["b"]) for r in cand.collect()}
    for i in range(10):
        assert (i, 1000 + i) in pairs  # every planted dup is a candidate
    all_pairs = (n + 10) * (n + 9) // 2  # what the hot bucket would emit
    assert len(pairs) < 0.2 * all_pairs, (
        f"banded candidates {len(pairs)} not << all-pairs {all_pairs}"
    )


def test_containment_pairs_asymmetric(spark):
    from kgspark.dedup import containment_pairs

    article = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lambda mu nu xi omicron pi rho sigma tau upsilon")
    snippet = "delta epsilon zeta eta theta iota"          # inside article
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, article), (2, snippet), (3, other)], "doc_id long, text string"
    )
    out = {(r["a"], r["b"]): r["containment"]
           for r in containment_pairs(df, threshold=0.8).collect()}
    assert (2, 1) in out and out[(2, 1)] == 1.0  # snippet fully contained
    assert (1, 2) not in out                     # direction matters
    assert not any(3 in p for p in out)          # unrelated never paired


def test_containment_pairs_exact_vs_bruteforce(spark):
    import itertools
    import random

    from kgspark.dedup import containment_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        k = rng.randint(4, 25)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    # plant snippets of longer docs
    for i in range(5):
        toks = docs[i][1].split()
        docs.append((100 + i, " ".join(toks[2 : 2 + max(4, len(toks) // 2)])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["a"], r["b"]) for r in
           containment_pairs(df, n=3, threshold=0.7).collect()}

    def grams(text, n=3):
        t = text.split()
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    want = set()
    for (ia, ta), (ib, tb) in itertools.permutations(docs, 2):
        ga, gb = grams(ta), grams(tb)
        if len(ga & gb) / len(ga) >= 0.7:
            want.add((ia, ib))
    assert got == want  # exact recall AND precision


def test_containment_handles_empty_and_null(spark):
    from kgspark.dedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = containment_pairs(df, threshold=0.5).collect()
    # null/empty texts never crash; both shingle to [""] so they may pair
    # with each other but never with a real document
    assert all({r["a"], r["b"]} == {2, 3} for r in out)


def _brute_winnow(text, k, w):
    import hashlib
    import re
    t = re.sub("[^A-Za-z0-9]", "", text).lower()
    grams = [t[i:i + k] for i in range(len(t) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest()[:12] for g in grams]
    sel = set()
    for t0 in range(len(hs) - w + 1):
        win = hs[t0:t0 + w]
        m = min(win)
        # rightmost occurrence of the min
        j = max(i for i, h in enumerate(win) if h == m)
        sel.add((t0 + j + 1, m))  # 1-based pos
    return sel


def test_winnow_fingerprints_match_bruteforce(spark):
    from kgspark.dedup import winnow_fingerprints

    docs = [
        (1, "The quick brown fox jumps over the lazy dog!"),
        (2, "aaaaaaaaaa"),                    # all-tie windows -> rightmost
        (3, "xy"),                            # shorter than k -> nothing
        (4, None),                            # null text -> nothing
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert got[1] == _brute_winnow(docs[0][1], 5, 4)
    assert got[2] == _brute_winnow(docs[1][1], 5, 4)
    assert 3 not in got and 4 not in got


def test_winnow_matches_shared_substring_and_maxdf(spark):
    from kgspark.dedup import winnow_fingerprints, winnow_matches

    shared = "this exact sentence is copied between the two documents"
    docs = [
        (1, "intro text. " + shared + " outro one."),
        (2, "different start. " + shared + " different end."),
        (3, "completely unrelated content about graphs and spark plans"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=5, w=4)
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in winnow_matches(fps).collect()}
    assert got.get((1, 2), 0) > 0
    assert (1, 3) not in got and (2, 3) not in got
    # a fingerprint shared by all docs is dropped at max_doc_freq=1
    assert winnow_matches(fps, max_doc_freq=0).count() == 0


def test_lsh_recall_report_perfect_on_identical_docs(spark):
    from kgspark.dedup import lsh_recall_report

    # identical pairs (J=1) MUST be candidates in every band -> recall 1e6
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "one two three four five six seven"),
        (4, "one two three four five six seven"),
        (5, "totally unrelated words appear here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = lsh_recall_report(df, num_hashes=8, bands=4,
                            threshold_permille=500).collect()[0]
    assert row["n_docs"] == 5
    assert row["n_true"] == 2            # (1,2) and (3,4)
    assert row["n_hit"] == 2
    assert row["recall_ppm"] == 1000000
    assert 0 < row["precision_ppm"] <= 1000000
    # no true pairs at an impossible threshold -> -1 sentinel
    row2 = lsh_recall_report(
        df.where("doc_id >= 5"), num_hashes=8, bands=4
    ).collect()[0]
    assert row2["n_true"] == 0 and row2["recall_ppm"] == -1


def test_jaccard_threshold_curve_monotone(spark):
    from kgspark.dedup import jaccard_threshold_curve

    docs = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),            # J=1 with 1
        (3, "a b c d x y"),            # partial overlap with 1/2
        (4, "p q r s t u"),            # disjoint
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["t_pml"]: (r["n_pairs"], r["n_docs_hit"])
           for r in jaccard_threshold_curve(
               df, permilles=(100, 500, 1000)).collect()}
    # identical pair survives every threshold
    assert got[1000] == (1, 2)
    # lower thresholds only add pairs (monotone non-increasing in t)
    assert got[100][0] >= got[500][0] >= got[1000][0]
    assert got[100][0] >= 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        jaccard_threshold_curve(df, permilles=(0,))


def test_incremental_near_dups_batch_vs_corpus(spark):
    from kgspark.dedup import incremental_near_dups

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "unrelated corpus content entirely here"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta"),  # dup of 1
            (101, "fresh new never seen words only"),
        ],
        "doc_id long, text string",
    )
    got = {(r["batch_id"], r["corpus_id"]): (r["i1000"], r["u"])
           for r in incremental_near_dups(corpus, batch,
                                          num_hashes=8, bands=4).collect()}
    assert set(got) == {(100, 1)}
    i1000, u = got[(100, 1)]
    assert i1000 == 1000 * u  # exact dup: J = 1
    # batch never pairs with itself (100 vs 101 absent by construction)


def _zipf_docs(spark):
    """Skewed token-set fixture for the PPJoin+ group-positional filter:
    80 docs drawing 16-28 distinct tokens from a Zipf-ish 120-token pool
    (hot head tokens -> many near-miss pairs sharing several mid-rank
    prefix elements), plus 8 planted near-dups above the 0.5 threshold."""
    import random

    rng = random.Random(42)
    pool = [f"t{k}" for k in range(120)]
    weights = [1.0 / (k + 1) ** 0.7 for k in range(120)]
    docs = []
    for i in range(80):
        size = rng.randint(16, 28)
        toks = set()
        while len(toks) < size:
            toks.add(rng.choices(pool, weights)[0])
        docs.append((i, " ".join(sorted(toks))))
    for j in range(8):
        base = docs[j][1].split()
        for s in range(3):
            base[s] = f"swap{j}_{s}"
        docs.append((100 + j, " ".join(base)))
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_ngram_suffix_filter_prunes_candidates(spark):
    """The group positional (PPJoin+-style) filter must (a) emit strictly
    fewer exact-verification candidates than the per-element positional
    filter on a skewed near-miss-heavy fixture, and (b) change nothing
    about the verified output."""
    from kgspark.dedup import _ngram_candidates

    df = _zipf_docs(spark)
    _, cand_off = _ngram_candidates(
        df, "text", "doc_id", 1, 0.5, suffix_filter=False
    )
    _, cand_on = _ngram_candidates(
        df, "text", "doc_id", 1, 0.5, suffix_filter=True
    )
    n_off, n_on = cand_off.count(), cand_on.count()
    assert n_on < n_off, (n_on, n_off)
    # the cut is material on this fixture (measured ~40%), not epsilon
    assert n_on <= 0.8 * n_off, (n_on, n_off)

    out_off = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            df, threshold=0.5, n=1, suffix_filter=False
        ).collect()
    )
    out_on = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            df, threshold=0.5, n=1, suffix_filter=True
        ).collect()
    )
    assert out_on == out_off
    # the 8 planted near-dups are all found (recall safety, not just parity)
    found = {(a, b) for a, b, _ in out_on}
    for j in range(8):
        assert (j, 100 + j) in found


def test_containment_adaptive_prefix_parity_and_pruning(spark):
    """AdaptJoin extended prefix must not change results (recall safety)
    while demanding >= prefix_ext+1 prefix matches per candidate."""
    from kgspark.dedup import containment_pairs

    docs = _zipf_docs(spark)
    base = {(r["a"], r["b"], r["n_common"], r["n_a"])
            for r in containment_pairs(docs, n=1, threshold=0.7,
                                       prefix_ext=0).collect()}
    ext = {(r["a"], r["b"], r["n_common"], r["n_a"])
           for r in containment_pairs(docs, n=1, threshold=0.7,
                                      prefix_ext=2).collect()}
    assert ext == base
    # the planted near-dups are contained in their originals
    assert any(a == 100 + j and b == j for a, b, _, _ in ext
               for j in range(8))


def test_canonical_docs_picks_best_and_annotates_all(spark):
    from kgspark.dedup import canonical_docs

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 5), (9, 1)], "doc_id long, q long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = {
        r.doc_id: (r.family, r.family_size, r.keep, r.kept_id)
        for r in canonical_docs(docs, pairs, "q").collect()
    }
    fam = got[1][0]
    assert got[1] == (fam, 3, 0, 2)
    assert got[2] == (fam, 3, 1, 2)
    assert got[3] == (fam, 3, 0, 2)
    assert got[9] == (9, 1, 1, 9)           # singleton keeps itself
    # quality tie -> lower id wins
    docs2 = spark.createDataFrame([(4, 7), (5, 7)], "doc_id long, q long")
    pairs2 = spark.createDataFrame([(4, 5)], "a long, b long")
    got2 = {r.doc_id: (r.keep, r.kept_id)
            for r in canonical_docs(docs2, pairs2, "q").collect()}
    assert got2 == {4: (1, 4), 5: (0, 4)}
