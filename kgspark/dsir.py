"""DSIR-style importance weights: score every document by how much more
likely its hashed n-gram profile is under a target distribution than under
the raw-corpus distribution (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" — public paper; hashed bag-of-ngrams
generative models, add-1 smoothing over the hash buckets).

This is the canonical pretraining-data selection step: fit cheap bucket
models on a small high-quality target slice vs the raw crawl, weight every
raw document by the log-likelihood ratio, keep the top mass. The reference
pipeline has no data-selection surface at all (it ingests single uploads,
/root/reference/knowledgeGraph.py:85-97); this belongs to the
beyond-reference curation tier (SURVEY.md §8) alongside `kgspark.lm`
(perplexity buckets) and `kgspark.nb` (supervised NB filtering).

Shape, and why it scales:
  - Features are unigrams + bigrams hashed into B buckets (md5-hex6 mod
    B) — model state is 2 numbers × B buckets regardless of corpus size,
    built by ONE conditional-sum groupBy over the gram stream (map-side
    partial agg) and broadcast back.
  - Scoring joins the gram stream to the B-row bucket table (broadcast
    hash join, no shuffle) and sums per doc — one key shuffle total.
  - No vocabulary materialization, no per-row Python: everything is
    column expressions over a materialized token table (HOF
    re-evaluation trap avoided; see topics.ngrams_of).

Determinism contract: the per-bucket log-likelihood ratio is quantized to
INTEGER micro-nats before any per-document summation (same posture as
kgspark.nb/lm/search), so scores are exact long arithmetic — identical
across partitionings, retries, and engines (the DuckDB oracle reproduces
them bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.kgtrain import _hex6_to_int
from kgspark.session import materialize
from kgspark.textstats import ws_tokens
from kgspark.topics import ngrams_of

__all__ = ["dsir_weights"]

_QUANT = 1e6


def dsir_weights(
    docs: DataFrame,
    target_col: str = "is_target",
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance weight per document: Σ_grams [ln p̂_target(bucket) −
    ln p̂_raw(bucket)] in integer micro-nats.

    `target_col` is a caller-prepared boolean: True rows define the
    target distribution, False rows the raw distribution; every row is
    scored. Features are whitespace unigrams + bigrams (multiplicity
    kept, as in the paper's bag-of-ngrams model); p̂(b) = (count_b + 1) /
    (total + B). Returns (id, is_target, n_grams, score_unats); docs
    with no grams score 0 with n_grams = 0.
    """
    toks = materialize(
        docs.select(
            F.col(id_col),
            F.col(target_col).alias("__tgt"),
            F.coalesce(
                ws_tokens(F.col(text_col)),
                F.expr("cast(array() as array<string>)"),
            ).alias("__t"),
        )
    )
    # materialized: three consumers (bucket counts, totals, scoring join)
    # would otherwise each replay the explode + md5 hex-decode over the
    # whole corpus — the bucketed stream is 3 small columns per gram,
    # far cheaper to store than to recompute
    grams = materialize(
        toks.select(
            F.col(id_col),
            "__tgt",
            F.explode(
                F.concat(F.col("__t"), ngrams_of(F.col("__t"), 2))
            ).alias("g"),
        ).select(
            F.col(id_col),
            "__tgt",
            (_hex6_to_int(F.md5(F.col("g"))) % F.lit(n_buckets))
            .cast("long")
            .alias("b"),
        )
    )

    buckets = grams.groupBy("b").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).cast("long").alias("cr"),
    )
    totals = grams.agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).cast("long").alias("tt"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).cast("long").alias("tr"),
    )
    lr = buckets.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            (
                F.log(
                    (F.col("ct") + F.lit(1)).cast("double")
                    / (F.col("tt") + F.lit(n_buckets)).cast("double")
                )
                - F.log(
                    (F.col("cr") + F.lit(1)).cast("double")
                    / (F.col("tr") + F.lit(n_buckets)).cast("double")
                )
            )
            * F.lit(_QUANT),
            0,
        )
        .cast("long")
        .alias("lr_unats"),
    )

    sums = (
        grams.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("lr_unats").cast("long").alias("score_unats"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
    )
    return (
        toks.select(F.col(id_col), F.col("__tgt").alias("is_target"))
        .join(sums, id_col, "left")
        .select(
            F.col(id_col),
            "is_target",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("score_unats", F.lit(0)).cast("long")
            .alias("score_unats"),
        )
    )
