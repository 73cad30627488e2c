"""Benchmark decontamination: n-gram overlap between corpus and eval set.

The standard guard (13-token gram overlap, the GPT-3/Pile convention)
against training on evaluation data. `flag_contaminated` annotates every
corpus document with how many of its distinct token n-grams appear anywhere
in the benchmark set — annotate-don't-drop, same auditability contract as
`kgspark.curate`.

Scale posture: the corpus side is one materialized tokenize pass + a
map-side distinct-gram explode (the token table is materialized FIRST —
feeding a raw split() into the n-gram HOF makes Catalyst re-evaluate the
tokenize subtree per slice, the projection-collapse trap documented in
kgspark.topics.ngrams_of). The benchmark-gram join carries NO broadcast
hint: AQE broadcasts it at runtime while the gram set is small
(dimension-sized next to a 10^9-doc corpus) and falls back to a shuffle
hash join when a large eval suite outgrows broadcast range — a hard
F.broadcast() would bypass the threshold and OOM instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import ws_tokens
from kgspark.topics import ngrams_of


def _distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int):
    toks = materialize(
        df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks"))
    )
    return toks.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_of(F.col("__toks"), n))).alias("g"),
    )


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hit_grams, contaminated) for every corpus row: the number of
    the document's distinct n-grams that occur in the benchmark set, and
    whether that is > 0. Documents shorter than n tokens have no grams and
    are never flagged."""
    bench = (
        _distinct_grams(benchmark, id_col, text_col, n)
        .select(F.md5("g").alias("h"))
        .distinct()
    )
    grams = _distinct_grams(corpus, id_col, text_col, n).select(
        F.col(id_col), F.md5("g").alias("h")
    )
    hits = (
        grams.join(bench, "h")  # no hint: AQE picks broadcast vs shuffle
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_hit_grams"),
            (F.coalesce(F.col("__n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
