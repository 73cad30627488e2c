"""Unigram-LM tokenizer trainer (kgspark/unigram.py) vs the in-memory
reference — the equality gate the round-5 verdict item 5 asks for."""

from __future__ import annotations

import pytest

from kgspark.unigram import (
    _viterbi_pieces,
    unigram_reference,
    unigram_train,
)


def test_viterbi_pins():
    # single chars only: every char is its own piece
    scores = {"a": -10, "b": -20, "c": -30}
    assert _viterbi_pieces("abc", scores, 4) == ["a", "b", "c"]
    # a multi-char piece wins when its score beats the char sum
    scores = {"a": -10, "b": -10, "ab": -15}
    assert _viterbi_pieces("ab", scores, 4) == ["ab"]
    # EXACT tie (ab = a+b): the smallest-l pin keeps single chars
    scores = {"a": -10, "b": -10, "ab": -20}
    assert _viterbi_pieces("ab", scores, 4) == ["a", "b"]
    assert _viterbi_pieces("", scores, 4) == []


def test_unigram_train_equals_reference(spark):
    texts = [
        "the banana band banded the bandana",
        "a banana and a bandana band together",
        "the band banned the banner over the bandstand",
        "banners and bandanas abound in the banner band",
        "an abandoned bandstand under a banana tree",
        None,
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.piece, r.cnt)
        for r in unigram_train(
            df, vocab_size=40, rounds=3, seed_k=60
        ).collect()
    }
    want = set(
        unigram_reference(texts, vocab_size=40, rounds=3, seed_k=60).items()
    )
    assert got == want and len(got) > 10
    # multi-char pieces actually survive training
    assert any(len(p) >= 2 for p, _ in got)
    # all single chars of the corpus are retained
    chars = {c for t in texts if t for w in t.lower().split() for c in w}
    assert chars <= {p for p, _ in got}


def test_unigram_truncation_and_vocab_cap(spark):
    # words longer than max_word_len collapse; vocab_size caps pieces
    texts = ["abcdefghijklmnopqrst abcdefghijklmnopquvwx", "zz zz zz"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = unigram_train(
        df, vocab_size=12, rounds=2, max_word_len=8, seed_k=20
    )
    rows = {r.piece: r.cnt for r in out.collect()}
    want = unigram_reference(
        texts, vocab_size=12, rounds=2, max_word_len=8, seed_k=20
    )
    assert rows == want
    # nothing longer than max_piece_len
    assert max(len(p) for p in rows) <= 4


def test_unigram_segment_census_equals_reference(spark):
    """The apply-side census = one more E-pass under the final scores;
    usage must equal the reference's replayed segmentation."""
    import re

    from kgspark.unigram import (
        _mstep,
        _viterbi_pieces,
        unigram_segment_census,
    )

    texts = [
        "the banana band banded the bandana",
        "a banana and a bandana band together",
        "banners and bandanas abound in the banner band",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.piece, r.uses)
        for r in unigram_segment_census(
            df, vocab_size=40, rounds=2, seed_k=60
        ).collect()
    }

    # reference: rerun the reference trainer, then one more E-pass
    import math

    wc = {}
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wc[w[:12]] = wc.get(w[:12], 0) + 1
    cand = {}
    for w, c in wc.items():
        for pl in range(1, 5):
            for i in range(len(w) - pl + 1):
                p = w[i : i + pl]
                cand[p] = cand.get(p, 0) + c
    singles = {p for p in cand if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:60]
    counts = {p: cand[p] for p in singles}
    counts.update(dict(multi))
    total = sum(counts.values())
    scores = {
        p: int(math.floor(1e6 * math.log(c / total) + 0.5))
        for p, c in counts.items()
    }
    for _ in range(2):
        usage = {}
        for w, c in wc.items():
            for p in _viterbi_pieces(w, scores, 4):
                usage[p] = usage.get(p, 0) + c
        counts, scores = _mstep(usage, singles, 40)
    final_usage = {}
    for w, c in wc.items():
        for p in _viterbi_pieces(w, scores, 4):
            final_usage[p] = final_usage.get(p, 0) + c
    assert got == set(final_usage.items())
