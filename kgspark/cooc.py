"""Term/entity co-occurrence statistics: PMI-weighted association edges.

Pointwise mutual information over document-level co-occurrence (Church &
Hanks 1990) is the classic statistical edge-weighting step for KG
construction from a web corpus — it scores how much more often two terms
share a document than chance predicts, separating real associations from
frequency artifacts. The reference's graph weights come from its LLM
extraction hierarchy (/root/reference/knowledge_graph_builder.py edge
weights); PMI is the corpus-statistical complement over raw text.

    pmi(a, b) = ln( n_ab * N / (df_a * df_b) )

with N = corpus size, df_x = document frequency, n_ab = co-document count.

Design for 100 TB:
  - tokens are array_distinct'ed per document BEFORE the explode, so a
    term repeated 1000x in one page contributes one row;
  - the vocabulary (df >= min_df) is dimension-sized and broadcast — the
    corpus-sized token table never shuffles for the filter;
  - the within-document pair join is quadratic ONLY in per-document
    qualifying vocabulary, which min_df caps in practice; super-common
    terms can additionally be dropped with max_df_ratio (a stopword-like
    cap: terms in more than that fraction of docs carry no association
    signal and dominate the pair count);
  - everything downstream is one groupBy on the (w1, w2) pair key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import ws_tokens

__all__ = ["pmi_edges"]


def pmi_edges(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              min_df: int = 2, min_pair: int = 2,
              max_df_ratio: float | None = None) -> DataFrame:
    """(w1, w2, n_pair, pmi): document-level PMI association edges.

    w1 < w2 lexicographically (each unordered pair once); n_pair is the
    number of documents containing both terms; pmi in nats, fp64. Only
    terms with df >= min_df (and, if max_df_ratio is set, df <= ratio*N)
    and pairs with n_pair >= min_pair are emitted. N counts ALL input
    rows, including docs with no qualifying tokens — the standard
    corpus-size denominator.
    """
    # N rides as a broadcast 1-row aggregate (the lm.py vocab pattern) —
    # no eager driver count, no extra corpus scan, the whole operator
    # stays lazy until the caller acts on it
    n_df = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    toks = materialize(
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(ws_tokens(F.col(text_col))))
            .alias("w"),
        )
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("dfreq")).where(
        F.col("dfreq") >= min_df
    )
    if max_df_ratio is not None:
        vocab = (
            vocab.crossJoin(F.broadcast(n_df))
            .where(F.col("dfreq")
                   <= F.floor(F.lit(max_df_ratio) * F.col("__n")))
            .drop("__n")
        )
    t = toks.join(F.broadcast(materialize(vocab)), "w")
    left = t.select("doc", F.col("w").alias("w1"), F.col("dfreq").alias("df1"))
    right = t.select("doc", F.col("w").alias("w2"),
                     F.col("dfreq").alias("df2"))
    pairs = (
        left.join(right, "doc")
        .where(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pair)
    )
    pmi = F.log(
        F.col("n_pair").cast("double") * F.col("__n")
        / (F.col("df1") * F.col("df2")).cast("double")
    )
    return pairs.crossJoin(F.broadcast(n_df)).select(
        "w1", "w2", F.col("n_pair").cast("long").alias("n_pair"),
        pmi.alias("pmi"),
    )
