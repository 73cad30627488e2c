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

__all__ = ["llr_collocations", "pmi_edges"]


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


def _xlx(c):
    """x*ln(x) with xlx(0) = 0 — the entropy term of Dunning's G^2."""
    d = c.cast("double")
    return F.when(c > 0, d * F.log(d)).otherwise(F.lit(0.0))


def llr_collocations(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     min_count: int = 3) -> DataFrame:
    """Adjacent-bigram collocations scored by Dunning's log-likelihood
    ratio (Dunning 1993) — the standard collocation test that, unlike
    PMI, does not blow up on rare pairs. Returns (w1, w2, n_pair,
    llr_micro) for bigrams seen >= min_count times; llr_micro is the
    G^2 statistic in integer micro-units.

    Contingency table over the BIGRAM event space (N = total bigrams):
    k11 = count(w1 w2), c1 = count(w1 *), c2 = count(* w2),
    k12 = c1-k11, k21 = c2-k11, k22 = N-c1-c2+k11, and
    G^2 = 2*(sum xlx(k) + xlx(N) - xlx(row/col sums)), xlx(x)=x ln x.

    Determinism: every input to the fp64 expression is an exact integer
    (counts), ln(integer) is bit-stable across engines (verified), and
    the term order is fixed left-to-right — the DuckDB oracle mirrors
    the exact expression tree, then both sides quantize once at the end.

    Shape for 100 TB: one materialized tokenize pass, one bigram explode,
    three groupBys (pair / first-position / second-position marginals),
    two keyed joins of pair rows to vocabulary-sized marginal tables,
    N rides as a broadcast 1-row aggregate. min_count prunes the pair
    table BEFORE the marginal joins.
    """
    from kgspark.lm import bigram_pairs

    if min_count < 1:
        raise ValueError("llr_collocations: min_count must be >= 1")
    pairs = materialize(
        bigram_pairs(df, text_col=text_col, id_col=id_col)
        .select("w1", "w2")
    )
    n_df = pairs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    k11 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("k11"))
        .where(F.col("k11") >= min_count)
    )
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    t = (
        k11.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n_df))
    )
    k11c, c1c, c2c, nn = F.col("k11"), F.col("c1"), F.col("c2"), F.col("__n")
    k12 = c1c - k11c
    k21 = c2c - k11c
    k22 = nn - c1c - c2c + k11c
    llr = F.lit(2.0) * (
        _xlx(k11c) + _xlx(k12) + _xlx(k21) + _xlx(k22) + _xlx(nn)
        - _xlx(k11c + k12) - _xlx(k11c + k21)
        - _xlx(k12 + k22) - _xlx(k21 + k22)
    )
    return t.select(
        "w1", "w2",
        k11c.cast("long").alias("n_pair"),
        F.round(llr * 1000000.0, 0).cast("long").alias("llr_micro"),
    )
