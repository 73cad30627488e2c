"""Unigram-LM (SentencePiece-style) tokenizer trainer — the second
first-class tokenizer family next to BPE (kgspark/bpe.py), per Kudo 2018
("Subword regularization: improving neural network translation models
with multiple subword candidates") with the hard-EM (Viterbi) variant of
the E-step so every quantity stays a deterministic exact value.

The reference has no tokenizer layer (knowledgeGraph.py is extraction
only); this exists for the training-data-pipeline surface: a 100 TB
corpus wants its tokenizer trained IN the engine, not by exporting text.

Pinned algorithm (shared verbatim by this module, the in-memory
reference in tests, and the DuckDB oracle):

  1. words: whitespace tokens, lowercased (kgspark.bpe.word_counts),
     TRUNCATED to ``max_word_len`` chars and re-aggregated — the one
     corpus-sized shuffle; everything after runs on the vocab-sized
     word table.
  2. seed: candidate pieces = every substring of length 1..L of every
     word, weighted by word count (all start positions count, overlaps
     included). Vocab_0 = ALL single characters ∪ the top ``seed_k``
     multi-char candidates by (count desc, piece asc).
  3. scores: s(p) = floor(1e6·ln(c(p)/T) + 0.5) as BIGINT micro-nats,
     T = Σ c over the vocab — the floor(x+0.5) pin avoids round()
     tie-mode differences; identical integer scores ⇒ identical
     Viterbi decisions in every engine.
  4. Each round (hard EM):
     E: per word, Viterbi best segmentation: dp[0]=0, dp[i] = max over
        l=1..min(L,i) with word[i-l+1..i] ∈ vocab of dp[i-l]+s(piece);
        ties broken toward the SMALLEST l (ascending-l scan, strict >).
        Single chars are always in the vocab, so dp is total.
     M (driver-side, bounded — the bpe_train_batched posture): piece
        usage = Σ word_cnt × times-used; keep ALL single chars plus the
        top (vocab_size − n_singles) multi-char pieces by
        (usage desc, piece asc) among usage > 0; Laplace add-1 counts
        (so unused singles keep a finite score); recompute T and s.
  5. Output: the final (piece, cnt, n_chars) inventory — exact
     integers only (scores are internal).

Scale shape: one corpus shuffle for word counts; per round, one
Arrow-batched pandas-UDF pass over the DISTINCT-WORD table (the
standard word-table trick — corpus size never re-enters) plus one
vocab-sized usage aggregation; the M-step collects ≤ vocab_size +
|alphabet| rows to the driver (the same bounded-collect class as the
PQ codebook updates). Python is the right boundary here: Viterbi DP is
per-row sequential (the link_damerau precedent), batched via Arrow.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def _viterbi_pieces(word: str, scores: dict, max_piece_len: int) -> list:
    """Best segmentation of one word under integer piece scores —
    ascending-l scan with strict > so the smallest piece length wins
    ties (the cross-engine pin)."""
    n = len(word)
    dp = [0] + [None] * n
    bl = [0] * (n + 1)
    for i in range(1, n + 1):
        best = None
        best_l = 0
        for l in range(1, min(max_piece_len, i) + 1):
            s = scores.get(word[i - l : i])
            if s is None or dp[i - l] is None:
                continue
            cand = dp[i - l] + s
            if best is None or cand > best:
                best, best_l = cand, l
        dp[i], bl[i] = best, best_l
    pieces = []
    pos = n
    while pos > 0:
        l = bl[pos]
        pieces.append(word[pos - l : pos])
        pos -= l
    pieces.reverse()
    return pieces


def _mstep(usage: dict, singles: set, vocab_size: int):
    """Driver M-step: kept vocab with Laplace counts and micro-nat
    scores. Returns (counts: dict, scores: dict)."""
    n_multi = max(vocab_size - len(singles), 0)
    multi = sorted(
        ((p, u) for p, u in usage.items() if len(p) >= 2 and u > 0),
        key=lambda t: (-t[1], t[0]),
    )[:n_multi]
    counts = {p: usage.get(p, 0) + 1 for p in singles}
    counts.update({p: u + 1 for p, u in multi})
    total = sum(counts.values())
    scores = {
        p: int(math.floor(1e6 * math.log(c / total) + 0.5))
        for p, c in counts.items()
    }
    return counts, scores


def _train(
    docs: DataFrame,
    vocab_size: int,
    rounds: int,
    max_piece_len: int,
    max_word_len: int,
    seed_k: int,
    text_col: str,
):
    """Shared trainer core: returns (words_df, counts, scores) after
    `rounds` hard-EM rounds — words_df is the materialized truncated
    word table, counts/scores the final vocab state."""
    from kgspark.bpe import word_counts
    from kgspark.session import materialize

    spark = docs.sparkSession
    words = materialize(
        word_counts(docs, text_col)
        .select(
            F.substring("word", 1, max_word_len).alias("word"), "cnt"
        )
        .groupBy("word")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )

    # -- seed: substring candidates, weighted by word count ------------
    length = F.length("word")

    def _subs_of_len(piece_len: int):
        # closure factory — HOF lambdas must not capture the loop var
        n_start = length - piece_len + 1
        return F.when(
            n_start >= 1,
            F.transform(
                F.sequence(F.lit(1), n_start.cast("int")),
                lambda i: F.col("word").substr(i, F.lit(piece_len)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    sub_arrays = [
        _subs_of_len(piece_len)
        for piece_len in range(1, max_piece_len + 1)
    ]
    all_subs = sub_arrays[0]
    for arr in sub_arrays[1:]:
        all_subs = F.concat(all_subs, arr)
    cand = (
        words.select(F.explode(all_subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
    cand = materialize(cand)
    singles_rows = cand.where(F.length("piece") == 1).collect()
    multi_rows = (
        cand.where(F.length("piece") >= 2)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(seed_k)
        .collect()
    )
    singles = {r.piece for r in singles_rows}
    counts = {r.piece: r.c for r in singles_rows}
    counts.update({r.piece: r.c for r in multi_rows})
    total = sum(counts.values())
    scores = {
        p: int(math.floor(1e6 * math.log(c / total) + 0.5))
        for p, c in counts.items()
    }

    # -- hard-EM rounds -----------------------------------------------
    for _ in range(rounds):
        score_map = dict(scores)
        mpl = max_piece_len

        @F.pandas_udf(ArrayType(StringType()))
        def segment(ws: pd.Series) -> pd.Series:
            return pd.Series(
                [_viterbi_pieces(w, score_map, mpl) for w in ws]
            )

        usage_rows = (
            words.select(F.explode(segment("word")).alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("u"))
            .collect()
        )
        usage = {r.piece: r.u for r in usage_rows}
        counts, scores = _mstep(usage, singles, vocab_size)

    return words, counts, scores


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 120,
    rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    seed_k: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Train the unigram-LM piece inventory over a document corpus.

    Returns (piece, cnt, n_chars): the final vocab with its Laplace
    counts after ``rounds`` hard-EM rounds — exact integers, engine-
    independent (the scores that drove the DP are integer micro-nats).
    """
    spark = docs.sparkSession
    _, counts, _ = _train(
        docs, vocab_size, rounds, max_piece_len, max_word_len,
        seed_k, text_col,
    )
    out = sorted(counts.items())
    return spark.createDataFrame(
        [(p, int(c), len(p)) for p, c in out],
        "piece string, cnt long, n_chars int",
    )


def unigram_segment_census(
    docs: DataFrame,
    vocab_size: int = 120,
    rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    seed_k: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Apply-side census (the bpe_apply_census sibling): train the
    piece inventory, then segment the whole word table ONCE MORE under
    the FINAL scores and report each piece's corpus usage — the
    token-frequency table a tokenizer consumer actually ships. Returns
    (piece, uses, n_chars) with uses = Σ word_cnt × times-used; only
    pieces the final segmentation actually uses appear (uses > 0 by
    construction). Same bounded shapes as training plus one extra
    Arrow-batched E-pass."""
    words, _, scores = _train(
        docs, vocab_size, rounds, max_piece_len, max_word_len,
        seed_k, text_col,
    )
    score_map = dict(scores)
    mpl = max_piece_len

    @F.pandas_udf(ArrayType(StringType()))
    def segment(ws: pd.Series) -> pd.Series:
        return pd.Series(
            [_viterbi_pieces(w, score_map, mpl) for w in ws]
        )

    return (
        words.select(F.explode(segment("word")).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("uses"))
        .select("piece", "uses",
                F.length("piece").cast("int").alias("n_chars"))
    )


def unigram_reference(
    texts: list,
    vocab_size: int = 120,
    rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    seed_k: int = 200,
) -> dict:
    """Pure-Python in-memory trainer — the equality reference for
    pytest (same pins, no Spark). Returns {piece: cnt}."""
    import re

    wc: dict = {}
    for t in texts:
        if t is None:
            continue
        for w in re.split(r"\s+", t.lower()):
            if w:
                w = w[:max_word_len]
                wc[w] = wc.get(w, 0) + 1
    cand: dict = {}
    for w, c in wc.items():
        for piece_len in range(1, max_piece_len + 1):
            for i in range(len(w) - piece_len + 1):
                p = w[i : i + piece_len]
                cand[p] = cand.get(p, 0) + c
    singles = {p for p in cand if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:seed_k]
    counts = {p: cand[p] for p in singles}
    counts.update(dict(multi))
    total = sum(counts.values())
    scores = {
        p: int(math.floor(1e6 * math.log(c / total) + 0.5))
        for p, c in counts.items()
    }
    for _ in range(rounds):
        usage: dict = {}
        for w, c in wc.items():
            for p in _viterbi_pieces(w, scores, max_piece_len):
                usage[p] = usage.get(p, 0) + c
        counts, scores = _mstep(usage, singles, vocab_size)
    return counts
