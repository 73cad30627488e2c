"""Per-document keyword extraction: TF-IDF-ranked salient terms.

The per-document complement of kgspark/topics.py's corpus-level TF-IDF
(which feeds clustering): for each document, the k terms that are frequent
in it and rare in the corpus — the standard keyword/tag column of a
web-corpus pipeline (doc tagging, index terms, weak labels for
classifiers).

Ranking is by the integer-deterministic key (tf desc, dfreq asc, token
asc): monotone-equivalent in spirit to tf·idf (term frequency up, document
frequency down) but immune to the cross-engine fp64 rank-boundary flips
that ordering by a float score invites (two terms with tf·idf equal to a
few ulps can order differently per engine). The fp64
tfidf = tf · ln(N/df) column is still carried for consumers; it just never
decides the ranking.

Design for 100 TB: term frequencies are one (doc, token) groupBy; document
frequencies are one vocabulary-sized aggregation broadcast back; ranking
windows partition by document — no global single-task stage, no pairwise
anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import LANG_STOPWORDS, ws_tokens

__all__ = ["doc_keywords", "rake_phrases"]


def doc_keywords(df: DataFrame, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token, tf, dfreq, tfidf): top-k keywords per document.

    tf = in-document occurrence count, dfreq = number of documents
    containing the token, tfidf = tf * ln(N / dfreq) with N the total
    input row count (riding as a broadcast 1-row aggregate — no driver
    count). Rank: (tf desc, dfreq asc, token asc), top k per document.
    Documents with no tokens yield no rows."""
    from pyspark.sql import Window

    n_df = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(ws_tokens(F.col(text_col))).alias("token"),
    )
    tf = materialize(
        toks.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    w = Window.partitionBy("doc").orderBy(
        F.col("tf").desc(), F.col("dfreq").asc(), F.col("token").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .crossJoin(F.broadcast(n_df))
        .select(
            F.col("doc").alias(id_col),
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("dfreq").cast("long").alias("dfreq"),
            (F.col("tf").cast("double")
             * F.log(F.col("__n") / F.col("dfreq").cast("double")))
            .alias("tfidf"),
        )
    )


def textrank_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(token, rank): corpus-level TextRank (Mihalcea & Tarau 2004) — build
    the window-2 word co-occurrence graph (adjacent tokens, both
    directions, self-pairs dropped) and power-iterate PageRank over it.
    Centrality-ranked salient terms complement the TF-IDF ranking above:
    TF-IDF finds terms that discriminate documents, TextRank finds terms
    that organize the corpus (high-connectivity hubs of usage).

    The graph is VOCABULARY-sized, not corpus-sized: the edge build is one
    tokenize pass + one distinct, after which iteration cost is independent
    of document count — the same reduction that makes bpe.py's trainer
    scale. Reuses graph_algs.pagerank (dangling-mass correction included).
    """
    from kgspark.graph_algs import pagerank

    toks = materialize(
        df.select(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda t: t != "").alias("__toks")
        )
    )
    # sequence(1, 0) is DESCENDING in Spark — guard with when() (NULL
    # arrays explode to zero rows), the word_shingles_from pattern.
    k = F.size("__toks") - 1
    pairs = toks.select(
        F.explode(
            F.when(
                k >= 1,
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.struct(
                        F.element_at("__toks", i).alias("a"),
                        F.element_at("__toks", i + 1).alias("b"),
                    ),
                ),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    edges = (
        pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return pagerank(
        edges, iterations=iterations, damping=damping, src="a", dst="b"
    )


def rake_phrases(
    df: DataFrame,
    k: int = 3,
    max_words: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the phrase-level
    complement of doc_keywords (single terms) and textrank_terms
    (corpus word graph): candidate phrases are the maximal token runs
    between delimiters (stopwords + non-letter tokens); per document,
    word score = deg(w)/freq(w) where freq counts word occurrences in
    candidates and deg adds the length of each containing phrase
    (co-occurrence incl. self); phrase score = sum of its word scores.

    Determinism contract: word scores are quantized to truncated-ppm
    integers BEFORE the phrase sum ((deg * 1e6) div freq — Spark `div`
    and DuckDB `//` both truncate), so compared values are exact longs;
    ranking is (score_ppm desc, phrase asc), top `k` distinct phrases
    per doc. Candidates longer than `max_words` are dropped (the
    standard rake-nltk max_length guard — without it a low-stopword
    corpus degenerates to whole-document phrases).

    Scale shape: one token shuffle keyed on (doc, run) builds phrases,
    word stats are a per-doc groupBy, ranking windows partition by
    document — no corpus-global stage anywhere.
    """
    stop = sorted(set(stopwords if stopwords is not None
                      else LANG_STOPWORDS["en"]))
    w_ord = Window.partitionBy("__id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    toks = materialize(
        df.select(F.col(id_col).alias("__id"),
                  F.posexplode(ws_tokens(F.col(text_col))))
        .withColumnRenamed("col", "tok")
        .withColumn(
            "__delim",
            F.col("tok").isin(stop) | ~F.col("tok").rlike("^[a-z]+$"),
        )
        .withColumn("grp", F.sum(F.col("__delim").cast("int")).over(w_ord))
    )
    phr = materialize(
        toks.where(~F.col("__delim"))
        .groupBy("__id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
        .where(F.col("n_words") <= max_words)
    )
    occ = phr.select(
        "__id", "grp", "n_words",
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    wstats = occ.groupBy("__id", "w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("n_words").alias("deg"),
    ).select(
        "__id", "w",
        F.expr("(deg * 1000000L) div freq").alias("wscore_ppm"),
    )
    scored = (
        occ.join(wstats, ["__id", "w"])
        .groupBy("__id", "grp")
        .agg(F.sum("wscore_ppm").cast("long").alias("score_ppm"))
        .join(phr, ["__id", "grp"])
        .select("__id", "phrase", "n_words", "score_ppm")
        .distinct()
    )
    w_rank = Window.partitionBy("__id").orderBy(
        F.desc("score_ppm"), F.asc("phrase"))
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= k)
        .select(F.col("__id").alias(id_col), "phrase", "n_words",
                "score_ppm")
    )


def yake_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    sent_len: int = 10,
) -> DataFrame:
    """YAKE-style unsupervised keyword extraction (Campos et al. 2020)
    — the statistical-feature member of the keyword family: where
    doc_keywords ranks by corpus rarity (TF-IDF), textrank_terms by
    graph centrality and rake_phrases by degree/frequency, YAKE scores
    each term from ITS OWN document's statistics alone (casing,
    position, frequency, context diversity, dispersion), so it needs no
    corpus pass and famously favors early, cased, context-diverse
    terms. Lower score = better keyword, per the paper.

    Feature set (documented YAKE-lite pins, one deviation each chosen
    for cross-engine determinism):
      wcase = cap/(1 + ln(1+tf))      cased-occurrence weight
      wpos  = ln(ln(3 + min_pos))     first occurrence, not median
      tfn   = tf / max_tf(doc)        max-norm, not mean+sigma-norm
      wrel  = 1 + (dl + dr)/tf        distinct left/right neighbors
      disp  = sentences_with_t / n_sentences   (pseudo-sentences of
              `sent_len` tokens — the corpus has no reliable
              punctuation)
      S     = (wrel · wpos) / (wcase + tfn/wrel + disp/wrel)

    Exactness contract: every feature is fp64 with an IDENTICAL
    expression tree in the DuckDB oracle (the bm25/text_ql posture) and
    the score is rounded to integer micro-units ONCE at the end; the
    top-k rank orders by (score_micro asc, term asc) — the ROUNDED
    integer, never the raw double, so rank boundaries cannot flip on
    ulps (the doc_keywords ranking rule).

    Emits (id, term, tf, score_micro, rank), rank 1..k per doc.

    Scale shape: one posexplode + lag/lead window per doc partition,
    one (doc, term) groupBy, a doc-keyed max join, and a top-k window —
    no corpus-global state at all, embarrassingly doc-parallel.
    """
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            # single-space split (not ' +'): piece ARRAYS must be
            # byte-identical to DuckDB string_split so positions align
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("pos", "w"),
        )
        .where(F.col("w").rlike("^[A-Za-z]+$"))
    )
    win = Window.partitionBy("id").orderBy("pos")
    toks = materialize(
        toks.select(
            "id", "pos",
            F.lower("w").alias("t"),
            F.col("w").rlike("^[A-Z]").cast("int").alias("is_cap"),
            F.lower(F.lag("w", 1).over(win)).alias("ln_"),
            F.lower(F.lead("w", 1).over(win)).alias("rn_"),
            F.expr(f"pos div {sent_len}").alias("sent"),
        )
    )
    nsent = toks.groupBy("id").agg(
        (F.max("sent") + 1).cast("double").alias("n_sent")
    )
    per = toks.groupBy("id", "t").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.sum("is_cap").cast("double").alias("cap"),
        F.min("pos").cast("double").alias("min_pos"),
        F.countDistinct("ln_").cast("double").alias("dl"),
        F.countDistinct("rn_").cast("double").alias("dr"),
        F.countDistinct("sent").cast("double").alias("n_with"),
    )
    mx = per.groupBy("id").agg(F.max("tf").alias("max_tf"))
    feats = (
        per.join(mx, "id").join(nsent, "id")
        .withColumn("wcase", F.expr("cap / (1.0D + ln(1.0D + tf))"))
        .withColumn("wpos", F.expr("ln(ln(3.0D + min_pos))"))
        .withColumn("tfn", F.expr("tf / max_tf"))
        .withColumn("wrel", F.expr("1.0D + (dl + dr) / tf"))
        .withColumn("disp", F.expr("n_with / n_sent"))
        .withColumn(
            "score_micro",
            F.expr(
                "CAST(round((wrel * wpos) / "
                "(wcase + tfn / wrel + disp / wrel) * 1000000.0D, 0) "
                "AS LONG)"
            ),
        )
    )
    rw = Window.partitionBy("id").orderBy(
        F.asc("score_micro"), F.asc("t")
    )
    return (
        feats.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= k)
        .select(
            F.col("id"), F.col("t").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            "score_micro", F.col("rank").cast("int").alias("rank"),
        )
    )
