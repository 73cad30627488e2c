"""Sentence chunker (E1) — greedy sentence packing into <=max_length chunks.

Behavioral spec from the reference `_split_into_chunks`
(ref /root/reference/knowledge_graph_builder.py:304-342): rule-based
sentencizer -> greedily pack sentences while sum(len(sent)) stays under
max_length -> chunks longer than max_length are re-split by whitespace words
(word packing counts len(word)+1). The reference uses the spaCy sentencizer;
at 10^12-doc scale a model download per executor is untenable, so we pin a
deterministic regex sentencizer (split after [.!?] + whitespace) — same
greedy packing arithmetic.

Spark surface: pandas UDF -> array<string>, then `posexplode` to
chunks(doc_id, chunk_id, chunk_text) — the chunk->doc map the reference keeps
as a dict (ref :244-250) is carried as a column instead (no join needed).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_into_chunks(text: str, max_length: int = 500) -> list[str]:
    """Greedy sentence packing; oversize chunks re-split by words."""
    if not isinstance(text, str) or not text.strip():
        return []
    sents = _SENT_SPLIT.split(text)
    chunks: list[str] = []
    current: list[str] = []
    cur_len = 0
    for sent in sents:
        if cur_len + len(sent) > max_length and current:
            chunks.append(" ".join(current))
            current = []
            cur_len = 0
        current.append(sent)
        cur_len += len(sent)
    if current:
        chunks.append(" ".join(current))

    final: list[str] = []
    for chunk in chunks:
        if len(chunk) > max_length:
            words = chunk.split()
            tmp: list[str] = []
            tmp_len = 0
            for w in words:
                if tmp_len + len(w) > max_length and tmp:
                    final.append(" ".join(tmp))
                    tmp = []
                    tmp_len = 0
                tmp.append(w)
                tmp_len += len(w) + 1
            if tmp:
                final.append(" ".join(tmp))
        else:
            final.append(chunk)
    return final


def chunks_udf(max_length: int = 500):
    """Arrow-vectorized chunker with a bound max_length."""

    @pandas_udf(ArrayType(StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: split_into_chunks(t, max_length))

    return _udf


def chunk_documents(
    docs: DataFrame, id_col: str = "url", text_col: str = "content",
    max_length: int = 500,
) -> DataFrame:
    """documents -> chunks(<id>, chunk_id, chunk_text). Lineage columns ride
    along on the row — idiomatic fix for the reference's chunk_sources dict."""
    carry = [c for c in docs.columns if c != text_col]
    return (
        docs.withColumn("_chunks", chunks_udf(max_length)(F.col(text_col)))
        .select(*carry, F.posexplode("_chunks").alias("chunk_id", "chunk_text"))
    )


def window_chunks(
    df: DataFrame,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token-window passage chunking with overlap — the RAG /
    retrieval-index layout (window `size` tokens, advance `stride`, so
    consecutive passages overlap by size − stride). Returns
    (doc_id, chunk_no, n_tokens, chunk_text): chunk_no is 0-based;
    the final window is the possibly-short tail; a doc shorter than
    `size` yields exactly one chunk. Empty/null docs yield nothing.

    Complements sentence_chunks (structure-aware, variable length):
    fixed windows are what embedding indexes actually want — uniform
    compute per passage and no pathological giant sentences.

    Shape: materialize the token array once (the HOF re-evaluation
    trap), then one sequence()+transform explode — map-only; chunk
    count per doc is ceil((n-size)/stride)+1, linear in corpus tokens.
    """
    if size < 1 or stride < 1 or stride > size:
        raise ValueError(
            "window_chunks: need 1 <= stride <= size"
        )
    from kgspark.session import materialize
    from kgspark.textstats import ws_tokens

    toks = materialize(
        df.where(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("__id"),
            ws_tokens(F.col(text_col)).alias("__t"),
        ).where(F.size("__t") > 0)
    )
    # number of windows: 1 + max(0, ceil((n - size) / stride)) — the
    # ceil is pure integer arithmetic (no fp ratio anywhere)
    n = F.size("__t")
    extra = F.when(
        n > size,
        F.expr(f"(size(__t) - {size} + {stride - 1}) div {stride}"),
    ).otherwise(F.lit(0))
    out = toks.select(
        "__id",
        "__t",
        F.explode(
            F.sequence(F.lit(0), extra)
        ).alias("chunk_no"),
    )
    piece = F.slice("__t", F.col("chunk_no") * stride + 1, size)
    return out.select(
        F.col("__id").alias(id_col),
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def topic_boundaries(
    docs: DataFrame,
    window: int = 20,
    min_depth: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst, CL 1997), restated in
    exact integers: cut each document into fixed `window`-token blocks,
    score every block gap by lexical cohesion = |shared DISTINCT lowercased
    tokens| between the two adjacent blocks, and flag gaps that are local
    cohesion minima with combined one-step depth
    (score[g-1]−score[g]) + (score[g+1]−score[g]) >= min_depth (each side
    clamped at 0; a missing neighbor contributes 0 — the 1-step depth
    approximation of Hearst's climb-to-peak, pinned for cross-engine
    determinism). -> (doc_id, gap_no, score, depth, is_boundary).

    The semantic chunker for pretraining pipelines: boundaries feed
    window_chunks so packing cuts at topic shifts instead of mid-topic.

    Scale shape: tokens materialize ONCE (the HOF re-evaluation trap);
    block token sets are a distinct on (doc, block, token); gap scores are
    ONE equi-join on (doc, token, block+1=block) + a count; depth is a
    lag/lead window partitioned BY DOCUMENT (rows per key = blocks per
    doc, never corpus-wide). Docs shorter than 2 blocks emit nothing.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    from kgspark.session import materialize
    from kgspark.textstats import ws_tokens

    toks = materialize(
        docs.select(
            F.col(id_col).alias("did"), ws_tokens(F.col(text_col)).alias("t")
        )
    )
    pos = toks.select(
        "did", F.posexplode("t").alias("pos", "tok")
    ).select("did", F.expr(f"pos div {window}").alias("blk"), "tok")
    blk_toks = materialize(pos.distinct())
    n_blk = blk_toks.groupBy("did").agg(
        (F.max("blk") + 1).alias("nb")
    )
    overlap = (
        blk_toks.alias("a")
        .join(
            blk_toks.select(
                F.col("did").alias("did"), (F.col("blk") - 1).alias("blk"),
                F.col("tok").alias("tok"),
            ).alias("b"),
            ["did", "blk", "tok"],
        )
        .groupBy("did", "blk")
        .agg(F.count(F.lit(1)).cast("long").alias("ov"))
    )
    gaps = (
        blk_toks.select("did", "blk").distinct()
        .join(n_blk, "did")
        .where(F.col("blk") < F.col("nb") - 1)
        .join(overlap, ["did", "blk"], "left")
        .select(
            "did", F.col("blk").alias("gap_no"),
            F.coalesce("ov", F.lit(0)).cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("did").orderBy("gap_no")
    depth = (
        F.greatest(
            F.coalesce(F.lag("score").over(w), F.col("score"))
            - F.col("score"), F.lit(0),
        )
        + F.greatest(
            F.coalesce(F.lead("score").over(w), F.col("score"))
            - F.col("score"), F.lit(0),
        )
    ).cast("long")
    return gaps.select(
        F.col("did").alias(id_col),
        F.col("gap_no").cast("long").alias("gap_no"), "score",
        depth.alias("depth"),
        (depth >= F.lit(min_depth)).cast("long").alias("is_boundary"),
    )
