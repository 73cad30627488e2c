"""Corpus n-gram language model: train bigram counts, score documents by
cross-entropy (bits per bigram) — the CCNet-style LM quality filter.

CCNet (public literature: Wenzek et al., "CCNet: Extracting high quality
monolingual datasets from web crawl data", 2020) buckets web documents by
language-model perplexity: boilerplate/gibberish scores high, fluent prose
low. The reference repo has no corpus-level quality notion (it ingests
single uploaded documents, /root/reference/knowledgeGraph.py:85-97); this
module is part of the beyond-reference training-data surface (SURVEY.md
§8), replacing CCNet's external KenLM with a model trained ON the corpus
being scored — no model artifact to ship, fully distributed.

Design for 100 TB:

- Training is two groupBy aggregations over exploded tokens/bigram pairs —
  pure map + partial-agg shuffles; count tables are bounded by distinct
  vocabulary, not corpus size.
- Scoring is two hash joins on the corpus-sized pair stream: (w1, w2)
  against the bigram table, w1 against the unigram table (the smoothing
  denominator must exist even when the bigram is unseen). Stop-bigrams
  ("of the") skew both keys; AQE skew-join splits them. With a pruned
  model (min_count) both count tables often broadcast outright.
- Vocabulary size V rides along as a crossJoin of a 1-row aggregate
  (broadcast nested loop over one row — never a driver collect).
- All probability math is fp64 natural-log expressions inside codegen;
  no Python in any hot path.

Add-k smoothing: p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V). Unseen
bigrams/unigrams (scoring a corpus the model wasn't trained on) fall back
to c=0 via left joins — the smoothed mass keeps log p finite.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import ws_tokens

__all__ = ["bigram_pairs", "train_bigram_lm", "score_bigram_lm",
           "lm_buckets", "train_trigram_lm", "score_trigram_lm",
           "train_kn_lm", "score_kn_lm"]


def _token_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Materialized (id, token-array) table — the one tokenize pass.

    Materialized BEFORE any slice/zip/explode references it: the regex
    split over every document is the most expensive map stage here, and
    CollapseProject would otherwise inline the tokenize subtree into each
    reference and run it multiple times per row (the HOF re-evaluation
    trap, see CLAUDE.md).
    """
    return materialize(
        df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("t"))
    )


def _pairs_of(toks: DataFrame, id_col: str) -> DataFrame:
    n = F.size("t")
    z = F.arrays_zip(
        F.slice("t", F.lit(1), n - 1).alias("w1"),
        F.slice("t", F.lit(2), n - 1).alias("w2"),
    )
    return (
        toks.where(n >= 2)
        .select(F.col(id_col), F.explode(z).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_pairs(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2): adjacent lowercased whitespace-token pairs per doc."""
    return _pairs_of(_token_table(df, text_col, id_col), id_col)


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_count: int = 1) -> tuple[DataFrame, DataFrame]:
    """Count tables (unigrams: (w1, c1), bigrams: (w1, w2, c12, c1)).

    The bigram table carries the denominator count c1 so the seen-bigram
    path of scoring needs no extra lookup. Both counts derive from ONE
    materialized token table — the corpus is tokenized once, not once per
    n-gram order. `min_count` prunes rare BIGRAMS only (smoothing covers
    them at score time); unigram counts stay exact or the conditional
    denominators would drift.
    """
    toks = _token_table(df, text_col, id_col)
    uni = (
        toks.select(F.explode("t").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        _pairs_of(toks, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    if min_count > 1:
        bi = bi.where(F.col("c12") >= min_count)
    return uni, bi.join(uni, "w1")


def score_bigram_lm(df: DataFrame, unigrams: DataFrame, model: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    k: float = 1.0) -> DataFrame:
    """(id, n_bigrams, bits): average bits per bigram under the model.

    bits = -Σ log2 p(w2|w1) / n_bigrams, with add-k smoothing over the
    model's vocabulary. Lower is more fluent; CCNet keeps the head/middle
    buckets. Docs with <2 tokens score NULL bits with n_bigrams = 0.

    `model` is train_bigram_lm()'s second table. Scoring a held-out corpus
    works: unseen bigrams take c12=0, unseen left-words take c1=0 — both
    stay finite under smoothing.
    """
    vocab = unigrams.agg(F.count(F.lit(1)).cast("double").alias("__v"))
    pairs = bigram_pairs(df, text_col, id_col)
    scored = (
        pairs.join(model, ["w1", "w2"], "left")
        .join(unigrams.select("w1", F.col("c1").alias("__c1")), "w1", "left")
        .crossJoin(vocab)
        .select(
            F.col(id_col),
            (
                F.log(
                    (F.coalesce("c12", F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("c1"), F.col("__c1"), F.lit(0))
                       + F.lit(k) * F.col("__v"))
                )
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum("__lp") / F.count(F.lit(1)) / math.log(2.0)).alias("bits"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("bits").cast("double").alias("bits"),
        )
    )


def lm_buckets(scores: DataFrame, n: int = 3,
               id_col: str = "doc_id") -> DataFrame:
    """CCNet's head/middle/tail split: equal-count buckets by LM score.

    Input is score_bigram_lm() output; returns it + `bucket` (1 = head =
    most fluent ... n = tail, exact SQL NTILE semantics: the first
    total%n buckets get one extra row). Unscoreable docs (NULL bits) sort
    as +inf and land in the tail bucket — the conservative call for a
    quality filter. The order is total (bits, then id) so assignment is
    deterministic and replayable.

    A bare `Window.orderBy` ntile would funnel the whole corpus through
    ONE task (the global-window scale-killer, see kgtrain.ranked_entities)
    — instead: range-partition on the sort key, rank within each sorted
    range, add the cumulative counts of earlier ranges (one #partitions-
    row collect), then map the global rank to its NTILE bucket with plain
    arithmetic. Every corpus-sized stage is parallel.
    """
    from pyspark.sql import Window

    spark = scores.sparkSession
    key = F.coalesce("bits", F.lit(float("inf")))
    parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = materialize(
        scores.repartitionByRange(parts, key.asc(), F.col(id_col).asc())
        .withColumn("__pid", F.spark_partition_id())
    )
    sizes = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, total = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = total
        total += sizes[pid]
    if total == 0:
        return scores.withColumn("bucket", F.lit(None).cast("int"))
    off = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(key.asc(), F.col(id_col).asc())
    rank = (F.row_number().over(w) - 1 + F.col("__off")).alias("__rank")
    q, r = divmod(total, n)
    big = r * (q + 1)  # rows living in the size-(q+1) head buckets
    ranked = ranged.join(F.broadcast(off), "__pid").select(
        *scores.columns, rank
    )
    if q == 0:
        bucket = (F.col("__rank") + 1).cast("int")  # fewer rows than buckets
    else:
        # integer `div`, not float /: fp64 truncation can misbucket at
        # billion-row ranks
        bucket = (
            F.when(F.col("__rank") < big,
                   F.expr(f"__rank div {q + 1}"))
            .otherwise(F.expr(f"{r} + (__rank - {big}) div {q}"))
            + 1
        ).cast("int")
    return ranked.withColumn("bucket", bucket).drop("__rank")


def _triples_of(toks: DataFrame, id_col: str) -> DataFrame:
    n = F.size("t")
    z = F.arrays_zip(
        F.slice("t", F.lit(1), n - 2).alias("w1"),
        F.slice("t", F.lit(2), n - 2).alias("w2"),
        F.slice("t", F.lit(3), n - 2).alias("w3"),
    )
    return (
        toks.where(n >= 3)
        .select(F.col(id_col), F.explode(z).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"), F.col("p.w3").alias("w3"))
    )


def train_trigram_lm(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Stupid-backoff trigram model (Brants et al., EMNLP 2007 — the
    web-scale LM recipe: no discounting to estimate, counts only):
    returns (tri, bi, uni, totals) count tables —
    tri(w1,w2,w3,c123,c12), bi(w2,w3,c23,c2), uni(w3,c3),
    totals(__n,__v). ONE materialized token table feeds every order."""
    toks = _token_table(df, text_col, id_col)
    uni = (
        toks.select(F.explode("t").alias("w3"))
        .groupBy("w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    uni = materialize(uni)
    bi12 = (
        _pairs_of(toks, id_col)
        .groupBy(F.col("w1"), F.col("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi12 = materialize(bi12)
    tri = (
        _triples_of(toks, id_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c123"))
        .join(
            bi12.select(F.col("w1"), F.col("w2"), F.col("c").alias("c12")),
            ["w1", "w2"],
        )
    )
    bi = bi12.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"),
        F.col("c").alias("c23"),
    ).join(
        uni.select(F.col("w3").alias("w2"), F.col("c3").alias("c2")),
        "w2",
    )
    totals = uni.agg(
        F.sum("c3").cast("double").alias("__n"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    return tri, bi, uni, totals


def score_trigram_lm(df: DataFrame, tri: DataFrame, bi: DataFrame,
                     uni: DataFrame, totals: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, n_trigrams, sum_unats): stupid-backoff trigram score with
    every per-trigram −ln p quantized to INTEGER micro-nats BEFORE the
    per-document sum (the kgspark.nb posture — exact longs under any
    partitioning; bits/char etc. derive downstream):

        p = c123/c12                      if the trigram was seen
          | 0.4 · c23/c2                  else if the bigram was seen
          | 0.16 · (c3+1)/(N+V)           else (add-1 unigram)

    Docs with <3 tokens emit n_trigrams = 0, sum_unats = 0.
    Shape: three left hash joins on the trigram stream (the count tables
    prune/broadcast like the bigram scorer); skewed stop-ngrams split
    under AQE."""
    stream = _triples_of(_token_table(df, text_col, id_col), id_col)
    j = (
        stream.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi, ["w2", "w3"], "left")
        .join(uni, "w3", "left")
        .crossJoin(F.broadcast(totals))
    )
    p = (
        F.when(
            F.col("c123").isNotNull(),
            F.col("c123").cast("double") / F.col("c12").cast("double"),
        )
        .when(
            F.col("c23").isNotNull(),
            F.lit(0.4)
            * (F.col("c23").cast("double") / F.col("c2").cast("double")),
        )
        .otherwise(
            F.lit(0.4) * F.lit(0.4)
            * (
                (F.coalesce(F.col("c3"), F.lit(0)).cast("double")
                 + F.lit(1.0))
                / (F.col("__n") + F.col("__v"))
            )
        )
    )
    unats = F.round(-F.log(p) * 1000000.0, 0).cast("long")
    scored = (
        j.select(F.col(id_col), unats.alias("__u"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.sum("__u").cast("long").alias("sum_unats"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trigrams", F.lit(0)).cast("long")
            .alias("n_trigrams"),
            F.coalesce("sum_unats", F.lit(0)).cast("long")
            .alias("sum_unats"),
        )
    )


def train_kn_lm(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id"
                ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Interpolated Kneser-Ney count tables (Kneser & Ney, ICASSP 1995;
    Chen & Goodman 1999 eq. 18) — the smoothing family CCNet's KenLM
    filter actually uses, vs train_bigram_lm's add-k. Three tables from
    ONE tokenize pass:

      left (w1, c1, n1p)  — left-context total sum(c12) and the number
                            of DISTINCT continuations N1+(w1, ·)
      bi   (w1, w2, c12)  — bigram counts
      cont (w2, ncont)    — continuation counts N1+(·, w2): how many
                            distinct LEFT contexts w2 completes; the KN
                            insight is that the backoff mass uses type
                            counts, not token counts ("San Francisco"
                            makes "Francisco" frequent but near-useless
                            as a novel continuation).
    """
    toks = _token_table(df, text_col, id_col)
    bi = materialize(
        _pairs_of(toks, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    left = bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    return left, bi, cont


def score_kn_lm(df: DataFrame, left: DataFrame, bi: DataFrame,
                cont: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", discount: float = 0.5) -> DataFrame:
    """(id, n_bigrams, bits) under interpolated Kneser-Ney:

      p(w2|w1) = (max(c12 − D, 0) + D · N1+(w1,·) · Pcont(w2)) / c1
      Pcont(w2) = (N1+(·,w2) + 1) / (T + V)   (add-1 over bigram types,
                  so held-out words stay finite)

    Unseen left contexts fall back to Pcont alone. D defaults to 0.5 —
    exactly representable in fp64, so the whole score is one
    deterministic expression tree (the lm.py posture; bits = −Σ ln p /
    n / ln 2). Totals T (bigram types) and V (distinct continuations)
    ride a 1-row broadcast."""
    totals = cont.agg(
        F.sum("ncont").cast("double").alias("__t"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    pairs = bigram_pairs(df, text_col, id_col)
    d = F.lit(discount)
    pcont = (F.coalesce("ncont", F.lit(0)).cast("double") + F.lit(1.0)) / (
        F.col("__t") + F.col("__v")
    )
    p = F.when(
        F.col("c1").isNull(), pcont
    ).otherwise(
        (
            F.greatest(
                F.coalesce("c12", F.lit(0)).cast("double") - d, F.lit(0.0)
            )
            + d * F.col("n1p").cast("double") * pcont
        )
        / F.col("c1").cast("double")
    )
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(left, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), F.log(p).alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum("__lp") / F.count(F.lit(1)) / math.log(2.0)).alias("bits"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("bits").cast("double").alias("bits"),
        )
    )
