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


def source_overlap(
    df: DataFrame,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source contamination matrix: for every unordered source pair,
    how many distinct token n-grams they share, plus each side's distinct-
    gram total — the corpus-level audit behind questions like "how much of
    the web crawl is already in the wiki dump?" (containment either way =
    n_shared / n_a or / n_b). Complements `flag_contaminated`, which
    answers the per-document version against one benchmark set.

    Scale: one map-side tokenize+explode, one distinct on (source, gram)
    — after which each gram carries at most |sources| rows, so the gram-
    keyed self-join emits at most C(|sources|, 2) pairs per gram: total
    candidate volume is linear in distinct grams, never corpus x corpus.
    All joins/aggs key on the md5 gram or the dimension-sized source pair.
    """
    grams = (
        _distinct_grams(df, source_col, text_col, n)
        .select(F.col(source_col).alias("src"), F.md5("g").alias("h"))
        .distinct()
    )
    sizes = grams.groupBy("src").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("src").alias("src_a"),
                                     F.col("n_grams").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("src").alias("src_b"),
                                     F.col("n_grams").alias("n_b"))),
            "src_b",
        )
        .select("src_a", "src_b",
                F.col("n_shared").cast("long").alias("n_shared"),
                F.col("n_a").cast("long").alias("n_a"),
                F.col("n_b").cast("long").alias("n_b"))
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
