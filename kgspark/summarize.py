"""Extractive summarization: token-overlap centrality sentence selection.

A TextRank-style (Mihalcea & Tarau 2004) extractive summarizer reduced to
its deterministic first iteration: a sentence's centrality in the
within-document similarity graph is its summed token overlap with every
other sentence, and the top-k sentences by (centrality desc, position
asc) form the summary. One power-iteration of uniform-prior TextRank is
exactly degree centrality, and the single round keeps the operator
SQL-expressible for the contract oracle while preserving the signal that
matters for corpus curation (summary/teaser columns for training data,
lead-bias-free snippet selection).

Design for 100 TB:
  - sentence split + cleanup are map-only column expressions (the regex
    subset is Java∩RE2∩DuckDB — no lookbehind, cf. kgspark/chunk.py's
    sentencizer note);
  - the overlap graph is NEVER built as a pairwise matrix: sentences join
    through the (doc, token) key, so cost is quadratic only in the number
    of sentences sharing one token within ONE document — bounded by
    document length, independent of corpus size;
  - ranking windows partition by document: no global single-task stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import ws_tokens

__all__ = ["sentence_table", "centrality_summary"]

SENT_SPLIT = r"[.!?]+\s+"


def sentence_table(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc, sid, sentence): position-indexed sentences, terminators and
    surrounding space stripped, empties dropped (sid keeps the original
    split position so downstream ordering is stable)."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.posexplode(F.split(F.col(text_col), SENT_SPLIT))
            .alias("sid", "raw"),
        )
        .select(
            "doc", "sid",
            F.regexp_replace(F.trim("raw"), "[.!?]+$", "").alias("sentence"),
        )
        .where(F.col("sentence") != "")
    )


def centrality_summary(df: DataFrame, k: int = 2, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc, sid, score, sentence): the k most central sentences per doc.

    score = sum over the doc's other sentences of the distinct-token
    overlap |tokens(s) ∩ tokens(s')| — degree centrality in the
    token-overlap sentence graph. Ties and isolated sentences (score 0)
    rank by position, so single-sentence documents still yield their one
    sentence."""
    from pyspark.sql import Window

    sents = materialize(sentence_table(df, text_col, id_col))
    toks = sents.select(
        "doc", "sid",
        F.explode(F.array_distinct(ws_tokens(F.col("sentence")))).alias("w"),
    )
    left = toks.select("doc", F.col("sid").alias("s1"), "w")
    right = toks.select("doc", F.col("sid").alias("s2"), "w")
    overlap = (
        left.join(right, ["doc", "w"])
        .where(F.col("s1") != F.col("s2"))
        .groupBy("doc", F.col("s1").alias("sid"))
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("score").desc(), F.col("sid").asc()
    )
    return (
        sents.join(overlap, ["doc", "sid"], "left")
        .withColumn("score", F.coalesce("score", F.lit(0)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("doc").alias(id_col),
            F.col("sid").cast("long").alias("sid"),
            F.col("score").cast("long").alias("score"),
            "sentence",
        )
    )
