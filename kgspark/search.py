"""BM25 keyword retrieval over the corpus — inverted-index-shaped, in pure
DataFrame aggregations.

A curation pipeline needs targeted retrieval constantly (pull the docs that
mention a contaminated benchmark phrase, audit what matched a filter rule,
build seed sets for classifier training). The reference has only a
substring probe over node names (/root/reference/kg_query_engine.py:38-52,
`find_nodes_by_substring`); ranked full-text retrieval over the document
corpus is part of the beyond-reference curation surface (SURVEY.md §8).

Shape, and why it scales:
  - The token stream is FILTERED to the query terms before anything
    shuffles — shuffle volume is proportional to the matched postings
    (|query| × df), never to corpus token volume. At 10^12 docs a 5-term
    query moves only those five posting lists.
  - Per-term document frequency and the corpus stats (N, Σdl) are tiny
    aggregates broadcast back onto the postings.
  - Top-k is a TakeOrdered (per-partition heap + driver merge of k rows),
    not a global sort.

Determinism contract (cross-engine, cross-partitioning): the per-(doc,
term) BM25 contribution is quantized to INTEGER micro-units
(round(score·1e6) as long) BEFORE the per-document sum, so document
scores are exact long arithmetic — same posture as `kgspark.nb` /
`kgspark.lm`. Ranking breaks ties on doc_id ascending.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.session import materialize
from kgspark.textstats import ws_tokens

__all__ = ["bm25_topk", "rrf_fuse", "prf_expand_terms", "bm25_prf_topk"]

_QUANT = 1e6


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under Okapi BM25.

    Uses the Lucene-style non-negative idf ln(1 + (N - df + 0.5)/(df +
    0.5)). Returns (doc_id, score_unats, n_hit_terms) — only documents
    matching ≥1 query term appear; order = score desc, doc_id asc,
    LIMIT top_k. Document length is the whitespace-token count of the
    full text (query-relevant or not), computed before the posting
    filter so it is independent of the query.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    toks = materialize(
        docs.select(
            F.col(id_col),
            F.coalesce(
                ws_tokens(F.col(text_col)),
                F.expr("cast(array() as array<string>)"),
            ).alias("__t"),
        )
    )
    # dl rides the posting rows (constant per doc) so the corpus-sized
    # length table never joins back — the only shuffle keyed on doc is
    # the matched-postings groupBy below
    stream = toks.select(
        F.col(id_col),
        F.size("__t").alias("dl"),
        F.explode("__t").alias("token"),
    ).where(F.col("token").isin(list(terms)))

    corpus = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("__t")).cast("long").alias("sum_dl"),
    )
    tf = stream.groupBy(id_col, "dl", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_t = (
        stream.select(id_col, "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    n = F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (n - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / n
    tfd = F.col("tf").cast("double")
    w = (tfd * F.lit(k1 + 1.0)) / (
        tfd
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    contrib = (
        tf.join(F.broadcast(df_t), "token")
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col(id_col),
            F.round(idf * w * F.lit(_QUANT), 0).cast("long").alias("__c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("score_unats"),
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
    )
    return scored.orderBy(
        F.col("score_unats").desc(), F.col(id_col).asc()
    ).limit(top_k)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top_k: int = 20,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of candidate lists:
    rrf(d) = Σ_lists 1/(k + rank_list(d)) — the standard way to fuse a
    lexical (BM25) ranking with a dense/quality ranking without score
    calibration.

    Each input is a CANDIDATE LIST — (id, score), higher-is-better,
    already truncated to its own top-N (fusing full corpus-sized rankings
    would put a global row_number over every doc through one task; RRF is
    defined over top-k lists anyway). Ranks break ties on id ascending;
    each 1/(k+rank) contribution is quantized to integer nano-units
    before summation (the kgspark integer posture), so fused scores are
    exact long arithmetic. Returns (id, rrf_nanos, n_lists) ordered by
    (rrf desc, id asc), LIMIT top_k.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    parts = []
    for r in rankings:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        parts.append(
            r.select(id_col, score_col).select(
                F.col(id_col),
                F.round(
                    F.lit(1e9)
                    / (F.lit(k) + F.row_number().over(w)).cast("double"),
                    0,
                ).cast("long").alias("__c"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("rrf_nanos"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    return fused.orderBy(F.col("rrf_nanos").desc(), F.col(id_col).asc()).limit(
        top_k
    )


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase query (consecutive-token match) over the corpus:
    (doc_id, n_hits, first_pos) for documents containing `phrase` as
    adjacent whitespace tokens (lowercased — the same tokenization as
    bm25_topk, so the two compose into match-then-rank). first_pos is
    1-based. The workhorse of decontamination audits ("which documents
    contain this benchmark prompt verbatim?") where BM25's bag-of-words
    scoring is too loose.

    Shape: map-only until the final per-doc groupBy — the token array is
    materialized ONCE (the Catalyst HOF re-evaluation trap; CLAUDE.md),
    candidate anchors come from posexplode filtered to the FIRST phrase
    term (so downstream work is proportional to df(first term), not token
    volume), and the remaining terms verify via element_at on the same
    row. No joins, no position-list intersection shuffles.
    """
    terms = [t.lower() for t in phrase]
    if not terms or any(not t or " " in t for t in terms):
        raise ValueError("phrase_search: phrase must be non-empty tokens")
    toks = materialize(
        df.where(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("__id"),
            ws_tokens(F.col(text_col)).alias("__l"),
        )
    )
    anchors = toks.select(
        "__id",
        "__l",
        F.posexplode("__l").alias("__i", "__tok"),
    ).where(F.col("__tok") == terms[0])
    cond = F.lit(True)
    for k, t in enumerate(terms[1:], start=1):
        # try_element_at: an anchor too close to the array tail is a
        # non-match, not an ANSI out-of-bounds error
        cond = cond & (
            F.try_element_at("__l", F.col("__i") + F.lit(k + 1)) == t
        )
    hits = anchors.where(cond).select(
        "__id", (F.col("__i") + 1).alias("pos")
    )
    return hits.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("pos").cast("long").alias("first_pos"),
    )


def ql_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    mu: float = 2000.0,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k under the Dirichlet-smoothed query-likelihood model (Zhai &
    Lafferty 2001): score(d) = Σ_t ln((tf(t,d) + μ·P(t|C)) / (|d| + μ)),
    P(t|C) = cf(t)/|C| — the language-modeling counterpart to
    :func:`bm25_topk`, and the second leg a ranking-fusion pipeline
    (rrf_fuse) usually wants. Unlike BM25, UNMATCHED query terms still
    contribute (the smoothing mass depends on document length), so every
    document scores against every term — which is why the per-term stats
    ride a |terms|-row broadcast, never a join keyed on the corpus.

    Query terms absent from the corpus entirely (cf = 0) are dropped:
    their contribution is ln(0) = -inf for every document alike, which
    ranks nothing and poisons the arithmetic. Per-term contributions are
    quantized to integer micro-nats before summation (the bm25/nb/lm
    posture), so scores are exact longs. Returns (doc_id, score_unats,
    n_hit_terms), order = score desc then id asc, LIMIT top_k.

    Scale shape: one corpus pass for lengths + matched postings, a
    broadcast term-stats table crossed onto the doc-length table
    (map-side, |docs|·|terms| rows of integer math), one doc-keyed
    partial-agg groupBy, and a TakeOrderedAndProject head.
    """
    if not query_terms:
        raise ValueError("ql_topk: query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    toks = materialize(
        docs.select(
            F.col(id_col),
            F.coalesce(
                ws_tokens(F.col(text_col)),
                F.expr("cast(array() as array<string>)"),
            ).alias("__t"),
        )
    )
    dl = toks.select(F.col(id_col), F.size("__t").alias("dl"))
    stream = toks.select(
        F.col(id_col), F.explode("__t").alias("token")
    ).where(F.col("token").isin(list(terms)))
    tf = stream.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    cf = stream.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    c_len = toks.agg(F.sum(F.size("__t")).cast("long").alias("c_len"))
    term_stats = F.broadcast(cf.crossJoin(F.broadcast(c_len)))

    base = dl.crossJoin(term_stats).join(tf, [id_col, "token"], "left")
    contrib = F.round(
        F.log(
            (F.coalesce(F.col("tf"), F.lit(0)).cast("double")
             + F.lit(float(mu))
             * (F.col("cf").cast("double") / F.col("c_len").cast("double")))
            / (F.col("dl").cast("double") + F.lit(float(mu)))
        ) * F.lit(_QUANT), 0
    ).cast("long")
    scored = base.select(
        F.col(id_col), contrib.alias("__c"),
        F.col("tf").isNotNull().cast("long").alias("__hit"),
    ).groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("score_unats"),
        F.sum("__hit").cast("long").alias("n_hit_terms"),
    )
    return scored.orderBy(
        F.col("score_unats").desc(), F.col(id_col).asc()
    ).limit(top_k)


def best_window(
    docs: DataFrame,
    query_terms: Sequence[str],
    width: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Best snippet window per document: the `width`-token window holding
    the most query-term occurrences, ties broken to the EARLIEST start —
    the deterministic core of search-result snippet selection, run after
    bm25_topk/ql_topk pick the documents. Documents with zero matches
    emit nothing.

    Emits (id, start_pos, n_hits, snippet): start_pos is the 0-based
    token index of the best window anchored at a matching token (the
    optimal window can always be anchored there), snippet the
    ``width``-token slice joined with spaces.

    Scale shape: matched-position extraction is map-side; the window
    count is a per-doc self-join on MATCH positions only (query terms
    are a vanishing fraction of tokens, so candidates are tiny even for
    huge docs); argmax is a WindowGroupLimit row_number; the snippet
    slice joins back to the materialized token table by id.
    """
    if not query_terms:
        raise ValueError("best_window: query_terms must be non-empty")
    if width < 1:
        raise ValueError("best_window: width must be >= 1")
    terms = sorted({t.lower() for t in query_terms})

    toks = materialize(
        docs.select(
            F.col(id_col).alias("id"),
            F.coalesce(
                ws_tokens(F.col(text_col)),
                F.expr("cast(array() as array<string>)"),
            ).alias("__t"),
        )
    )
    pos = toks.select(
        "id", F.posexplode("__t").alias("p", "tok")
    ).where(F.col("tok").isin(list(terms))).select("id", "p")
    a = pos.select("id", F.col("p").alias("start"))
    b = pos.select("id", F.col("p").alias("hit"))
    counts = (
        a.join(b, "id")
        .where(
            (F.col("hit") >= F.col("start"))
            & (F.col("hit") < F.col("start") + width)
        )
        .groupBy("id", "start")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    wdw = Window.partitionBy("id").orderBy(
        F.col("n_hits").desc(), F.col("start").asc()
    )
    best = counts.withColumn(
        "__rn", F.row_number().over(wdw)
    ).where(F.col("__rn") == 1)
    return best.join(toks, "id").select(
        "id",
        F.col("start").cast("long").alias("start_pos"),
        "n_hits",
        F.array_join(
            F.slice(F.col("__t"), F.col("start") + 1, width), " "
        ).alias("snippet"),
    )


def prf_expand_terms(
    docs: DataFrame,
    query_terms: Sequence[str],
    fb_k: int = 5,
    n_expand: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, tf_fb, df_fb, w): pseudo-relevance-feedback expansion
    terms (Rocchio 1971 / RM1-lite): tokens of the BM25 top-`fb_k`
    feedback documents, original query terms excluded, ranked by the
    exact-integer weight w = tf_fb * df_fb (total occurrences in the
    feedback set x feedback docs containing) — frequency AND consensus,
    no fp anywhere. Top `n_expand` by (w desc, term asc)."""
    fb = bm25_topk(docs, query_terms, top_k=fb_k,
                   text_col=text_col, id_col=id_col).select(id_col)
    qset = sorted({t.lower() for t in query_terms})
    # fb is fb_k rows — broadcast so the corpus-sized doc table never
    # shuffles; only the fb_k matched docs' tokens materialize
    toks = (
        docs.join(F.broadcast(fb), id_col)
        .select(F.col(id_col),
                F.explode(ws_tokens(F.col(text_col))).alias("term"))
        .where(~F.col("term").isin(qset))
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf_fb"),
             F.countDistinct(id_col).alias("df_fb"))
        .select("term", "tf_fb", "df_fb",
                (F.col("tf_fb") * F.col("df_fb")).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(n_expand)
    )


def bm25_prf_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    fb_k: int = 5,
    n_expand: int = 5,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-pass PRF retrieval: BM25, harvest expansion terms from the
    top-`fb_k` feedback docs (prf_expand_terms), re-run BM25 with the
    expanded bag. The n_expand-term driver collect is a bounded
    dimension-sized lookup (the documented collect posture) — the term
    LIST is part of the second plan, exactly as a search engine
    rewrites the query."""
    exp = [r["term"] for r in prf_expand_terms(
        docs, query_terms, fb_k=fb_k, n_expand=n_expand,
        text_col=text_col, id_col=id_col).collect()]
    merged = sorted({t.lower() for t in query_terms} | set(exp))
    return bm25_topk(docs, merged, top_k=top_k,
                     text_col=text_col, id_col=id_col)
