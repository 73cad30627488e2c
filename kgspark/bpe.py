"""Byte-pair-encoding token induction over the corpus — the vocabulary
side of training a tokenizer on 100 TB of text.

The insight that makes BPE training distributable: after ONE corpus-sized
shuffle (word counts), every training round runs over the WORD TABLE
(|vocab| rows, each carrying its corpus frequency), never the corpus.
Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", public) train exactly this way — pair counts are weighted
by word frequency. At web scale the vocab table is ~1e8 rows vs 1e14
tokens: each merge round is a narrow map (fold over a ≤word-length symbol
array) plus one map-side-combined aggregation, and the argmax is a 1-row
TakeOrdered. No per-row Python anywhere — the greedy merge application is
an `aggregate` (fold) higher-order function, JVM-side.

Determinism contract: pair scores are exact integer weights (sums of
corpus counts); argmax ties break on (left asc, right asc); the greedy
merge is left-to-right (fold order), so the merge table is
bit-reproducible across partitionings and engines. `pair_stats` (round-1
statistics) has a line-for-line DuckDB oracle; the iterative trainer is
anchored by a golden pytest on the classic Sennrich example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import ws_tokens

__all__ = ["word_counts", "pair_stats", "bpe_train", "bpe_train_batched",
           "fold_merge", "bpe_segment_words", "bpe_apply_census"]


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized shuffle."""
    return (
        docs.select(F.explode(ws_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _adjacent_pairs(syms_col):
    """explode-ready array of (left, right) structs for adjacent symbols."""
    return F.when(
        F.size(syms_col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms_col) - 1),
            lambda i: F.struct(
                F.element_at(syms_col, i).alias("left"),
                F.element_at(syms_col, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.expr("cast(array() as array<struct<left:string,right:string>>)"))


def pair_stats(words: DataFrame) -> DataFrame:
    """Adjacent character-pair weights over a (word, cnt) table: the
    round-1 BPE statistics. Multiplicity inside a word counts ("aaa"
    contributes (a,a) twice), weighted by corpus frequency. Returns
    (left, right, weight)."""
    syms = words.select(
        F.split(F.col("word"), "").alias("s"), F.col("cnt")
    )
    return (
        syms.select(F.explode(_adjacent_pairs(F.col("s"))).alias("p"), "cnt")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").cast("long").alias("weight"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges; returns (rank, left, right, weight).

    Driver loop of n_merges bounded rounds — each round aggregates the
    vocab-sized symbol table (a deliberate, documented driver loop over
    DISTRIBUTED rounds, like topics.silhouette_sweep): count pairs,
    take the heaviest (ties: left asc, right asc), fold the merge into
    every word's symbol array. Stops early when no pair remains.
    """
    spark = docs.sparkSession
    syms = materialize(
        word_counts(docs, text_col).select(
            F.split(F.col("word"), "").alias("s"), F.col("cnt")
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            syms.select(
                F.explode(_adjacent_pairs(F.col("s"))).alias("p"), "cnt"
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("cnt").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, weight = top[0].left, top[0].right, top[0].weight
        merges.append((rank, left, right, int(weight)))
        merged = F.lit(left + right)
        # greedy left-to-right merge: fold symbols, replacing an
        # (acc-tail == left, current == right) adjacency by the merged
        # symbol; a freshly merged symbol only re-merges if a LATER rank
        # learns it, matching reference BPE semantics
        syms = materialize(
            syms.select(
                F.aggregate(
                    F.col("s"),
                    F.expr("cast(array() as array<string>)"),
                    lambda acc, cur: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(left))
                        & (cur == F.lit(right)),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(merged),
                        ),
                    ).otherwise(F.concat(acc, F.array(cur))),
                ).alias("s"),
                F.col("cnt"),
            )
        )
    return spark.createDataFrame(
        merges, "rank long, left string, right string, weight long"
    )


def select_disjoint_pairs(
    candidates: list, batch_m: int
) -> list:
    """Greedy scan of (left, right, weight) candidates in rank order,
    keeping up to `batch_m` MUTUALLY DISJOINT pairs: a pair is taken only
    if its left, right, AND merged string (left+right) are all unseen
    among previously-taken pairs' lefts/rights/merged strings. Disjointness
    is what makes a batch exactly order-independent: no taken pair can
    consume, produce, or string-collide with a symbol another taken pair
    touches, so applying the batch in ONE fold pass equals applying its
    pairs one-at-a-time in rank order, and each pair's recorded weight is
    its true pre-round weight (merges fuse symbols — they never create or
    destroy an adjacency of two symbols they don't touch).

    Driver-side helper over an already-bounded candidate slice; shared
    with the in-memory test replica so both implement identical policy."""
    used: set = set()
    chosen = []
    for left, right, weight in candidates:
        if left in used or right in used or (left + right) in used:
            continue
        chosen.append((left, right, int(weight)))
        used.update((left, right, left + right))
        if len(chosen) >= batch_m:
            break
    return chosen


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int,
    batch_m: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges taking up to `batch_m` mutually
    disjoint pairs per distributed round — the bounded-jobs trainer for
    real tokenizer sizes (50k merges in ~ceil(50k/M) rounds instead of
    50k sequential jobs; the r3-verdict scale fix for bpe_train).

    DOCUMENTED DEVIATION from single-pair BPE: within a round, the 2nd..
    M-th pairs are chosen from the same pre-round counts, so a pair whose
    count would only be overtaken after an earlier same-round merge can be
    ranked differently than strict Sennrich order. The batch is restricted
    to DISJOINT pairs (see select_disjoint_pairs), which keeps every
    recorded weight exact and the batch application order-independent —
    the result is a valid BPE merge table trained under batched-greedy
    semantics, and with batch_m=1 the output is bit-identical to
    bpe_train. Selection scans the top (8*batch_m + 256) candidates per
    round; heavier-conflicting tails wait for the next round (the bound
    only binds when that many top pairs mutually conflict).

    Per round: ONE pair-count aggregation over the vocab-sized symbol
    table + one fold application (a single when-chain HOF — at most one
    branch can match any adjacency, by disjointness). Returns
    (rank, left, right, weight) in global selection order.
    """
    spark = docs.sparkSession
    syms = materialize(
        word_counts(docs, text_col).select(
            F.split(F.col("word"), "").alias("s"), F.col("cnt")
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    empty_arr = "cast(array() as array<string>)"
    while len(merges) < n_merges:
        want = min(batch_m, n_merges - len(merges))
        cand = (
            syms.select(
                F.explode(_adjacent_pairs(F.col("s"))).alias("p"), "cnt"
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("cnt").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("left"), F.asc("right"))
            .limit(8 * batch_m + 256)
            .collect()
        )
        batch = select_disjoint_pairs(
            [(r["left"], r["right"], r["weight"]) for r in cand], want
        )
        if not batch:
            break
        base = len(merges)
        merges.extend(
            (base + i, l, r, w) for i, (l, r, w) in enumerate(batch)
        )

        # closure FACTORY, not a default arg: pyspark binds extra lambda
        # params to HOF index columns (see module gotchas / CLAUDE.md)
        def make_step(pairs):
            def step(acc, cur):
                out = F.concat(acc, F.array(cur))
                branch = None
                for left, right, _w in pairs:
                    c = (
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(left))
                        & (cur == F.lit(right))
                    )
                    rep = F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(left + right)),
                    )
                    branch = (
                        F.when(c, rep) if branch is None
                        else branch.when(c, rep)
                    )
                return branch.otherwise(out)

            return step

        syms = materialize(
            syms.select(
                F.aggregate(
                    F.col("s"), F.expr(empty_arr), make_step(tuple(batch))
                ).alias("s"),
                F.col("cnt"),
            )
        )
    return spark.createDataFrame(
        merges, "rank long, left string, right string, weight long"
    )


def fold_merge(syms: list, left: str, right: str) -> list:
    """Greedy left-to-right application of ONE merge to a symbol list —
    the exact fold bpe_train uses ((acc-tail == left, cur == right) →
    replace tail with left+right; a freshly merged symbol only re-merges
    if a later-scanned adjacency matches it). Shared by the pandas apply
    path and the tests so Spark, Python, and the SQL oracle all agree."""
    acc: list = []
    for cur in syms:
        if acc and acc[-1] == left and cur == right:
            acc[-1] = left + right
        else:
            acc.append(cur)
    return acc


def bpe_segment_words(words: DataFrame, merges) -> DataFrame:
    """(word, syms): segment each distinct word by applying `merges` (an
    ordered [(left, right), ...] list, or a bpe_train output DataFrame
    read in rank order) — each merge is one fold_merge pass, the same
    semantics the trainer used, so re-applying a trained table to its
    training vocabulary reproduces the trainer's final symbol state.

    Scale shape: segmentation runs over the DISTINCT-WORD table (1e8
    rows at web scale, not 1e14 tokens) in an Arrow-batched mapInPandas
    — the classic tokenizer-apply layout; the corpus only ever joins the
    segmented vocab back by word. The merge list is a driver-side
    constant captured in the closure (tokenizer merge tables are a few
    e4 entries — broadcast-sized by construction)."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    merges = list(merges)

    def seg(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for w in pdf["word"]:
                syms = list(w)
                for left, right in merges:
                    syms = fold_merge(syms, left, right)
                out.append(syms)
            yield pd.DataFrame({"word": pdf["word"], "syms": out})

    return words.select("word").distinct().mapInPandas(
        seg, "word string, syms array<string>"
    )


def bpe_apply_census(
    docs: DataFrame, merges, text_col: str = "text"
) -> DataFrame:
    """(subword, n): corpus subword-usage census after applying `merges`
    — the fast sanity readout of a tokenizer against a corpus (fertility,
    dead merges, coverage). One corpus shuffle (word counts), vocab-sized
    segmentation, one weighted groupBy."""
    wc = materialize(word_counts(docs, text_col))
    seg = bpe_segment_words(wc, merges)
    return (
        wc.join(seg, "word")
        .select(F.explode("syms").alias("subword"), "cnt")
        .groupBy("subword")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
