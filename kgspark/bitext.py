"""Margin-based parallel-text (bitext) mining over embedding columns.

Reference scope: the reference engine has no cross-lingual mining surface
(its ANN layer is a per-process dict memo-cache, reference
knowledge_graph_builder.py:94-102); this operator belongs to the
beyond-reference training-data tier the contract mandates. Method follows
Artetxe & Schwenk 2019 ("Margin-based parallel corpus mining with
multilingual sentence embeddings", ACL): a candidate pair is scored by the
RATIO margin cos(x, y) / mean(kNN-cos(x), kNN-cos(y)), which suppresses
hub vectors that a raw cosine threshold cannot — a hub's high cosine to
everything inflates its own neighborhood average and cancels out.

100 TB posture: candidate generation is banded multi-table sign-LSH
(kgspark.dedup.banded_sign_values) equi-joined between the two language
shards, so candidate volume tracks genuine cross-lingual neighborhood
density, never |L| x |R|; the kNN neighborhood sums are rank<=k window
heads (WindowGroupLimit prunes before the aggregation shuffle); margin
scoring is exact-integer ppm arithmetic in JVM expressions (floor of a
ratio of integers — both engines compute the identical fp64 quotient).
No Python crossing anywhere in the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.dedup import banded_sign_values
from kgspark.embed import cosine_cols, l2_norm
from kgspark.session import materialize


def _banded(df: DataFrame, id_col: str, emb_col: str, out: str,
            bands: int, band_bits: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out),
        F.posexplode(
            banded_sign_values(F.col(emb_col), bands, band_bits)
        ).alias("band", "val"),
    )


def mine_bitext(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    emb_col: str = "embedding",
    bands: int = 8,
    band_bits: int = 8,
    k: int = 4,
    margin_ppm: int = 1_050_000,
) -> DataFrame:
    """Mine aligned (src, tgt) pairs between two embedding shards.

    Returns one row per `src` that found a mate: its best candidate by the
    Artetxe-Schwenk ratio margin, kept only when `margin_ppm` clears the
    threshold (1e6 = margin 1.0, i.e. no better than the neighborhood).

    Scoring, all deterministic integer/ppm arithmetic:
      cos_ppm    = round(round(cos, 6) * 1e6)   (only cos_ppm > 0 kept)
      margin_ppm = floor(2e6 * cos_ppm * cntL * cntR
                         / (sumL * cntR + sumR * cntL))
    where (sumL, cntL) aggregate src's top-k candidate cosines and
    (sumR, cntR) tgt's — the pair itself participates in both
    neighborhoods, matching the paper's kNN-inclusive convention.

    Output: (src, tgt, cos_ppm, margin_ppm).
    """
    lb = _banded(left, id_col, emb_col, "src", bands, band_bits)
    rb = _banded(right, id_col, emb_col, "tgt", bands, band_bits)
    cand = lb.join(rb, ["band", "val"]).select("src", "tgt").distinct()

    le = left.select(
        F.col(id_col).alias("src"),
        F.col(emb_col).alias("_le"),
        l2_norm(F.col(emb_col)).alias("_ln"),
    )
    re_ = right.select(
        F.col(id_col).alias("tgt"),
        F.col(emb_col).alias("_re"),
        l2_norm(F.col(emb_col)).alias("_rn"),
    )
    cos6 = F.round(
        cosine_cols(F.col("_le"), F.col("_re"), F.col("_ln"), F.col("_rn")),
        6,
    )
    scored = (
        cand.join(le, "src")
        .join(re_, "tgt")
        .select(
            "src",
            "tgt",
            F.round(cos6 * 1e6, 0).cast("long").alias("cos_ppm"),
        )
        .filter(F.col("cos_ppm") > 0)
    )
    # consumed three times (two neighborhood aggs + the scoring join):
    # materialize so the LSH join + cosine verify run once
    scored = materialize(scored)

    def neighborhood(key: str, other: str, s: str, c: str) -> DataFrame:
        w = Window.partitionBy(key).orderBy(
            F.col("cos_ppm").desc(), F.col(other).asc()
        )
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .groupBy(key)
            .agg(
                F.sum("cos_ppm").cast("long").alias(s),
                F.count(F.lit(1)).cast("long").alias(c),
            )
        )

    nl = neighborhood("src", "tgt", "sumL", "cntL")
    nr = neighborhood("tgt", "src", "sumR", "cntR")
    margin = F.floor(
        F.lit(2e6) * F.col("cos_ppm") * F.col("cntL") * F.col("cntR")
        / (F.col("sumL") * F.col("cntR") + F.col("sumR") * F.col("cntL"))
    ).cast("long")
    m = (
        scored.join(nl, "src")
        .join(nr, "tgt")
        .withColumn("margin_ppm", margin)
    )
    best = Window.partitionBy("src").orderBy(
        F.col("margin_ppm").desc(), F.col("tgt").asc()
    )
    return (
        m.withColumn("_rn", F.row_number().over(best))
        .filter((F.col("_rn") == 1) & (F.col("margin_ppm") >= margin_ppm))
        .select("src", "tgt", "cos_ppm", "margin_ppm")
    )


def chrf_pairs(
    df: DataFrame,
    id_col: str = "pair_id",
    ref_col: str = "ref",
    hyp_col: str = "hyp",
    n: int = 3,
    beta: int = 2,
) -> DataFrame:
    """chrF quality score per text pair (Popović 2015) — the standard
    character-n-gram F-score used to GATE mined bitext / paraphrase /
    distillation pairs before training (the scoring complement of
    mine_bitext, which only finds candidates). Single pinned gram order
    `n` (the paper averages n=1..6; one order keeps the score an exact
    rational — documented lite deviation) over space-stripped,
    case-preserved text, multiset (clipped) matches.

    The whole F_β collapses to one exact integer rational: with
    m = Σ_g min(cnt_ref, cnt_hyp), P = m/n_hyp, R = m/n_ref,

        chrF_β = (1+β²)·P·R / (β²·P + R) = (1+β²)·m / (β²·n_ref + n_hyp)

    so chrf_ppm = ((1+β²)·1e6·m) div (β²·n_ref + n_hyp) — no fp
    anywhere (β integral; β=2 weights recall, the chrF2 standard).
    Pairs where both sides are shorter than `n` report the -1 sentinel.

    Emits (id, matches, n_ref_grams, n_hyp_grams, chrf_ppm).

    Scale shape: stripped texts MATERIALIZED before the gram HOF (the
    CollapseProject re-evaluation trap), per-side (id, gram) counts,
    one (id, gram)-keyed join for clipped matches — work is linear in
    text length, pair-parallel.
    """
    from kgspark.session import materialize

    def strip(c):
        return F.regexp_replace(F.coalesce(F.col(c), F.lit("")), " ", "")

    t0 = materialize(
        df.select(
            F.col(id_col).alias("id"),
            strip(ref_col).alias("sa"),
            strip(hyp_col).alias("sb"),
        )
    )

    def grams(c):
        ln = F.length(c)
        return F.when(
            ln >= n,
            F.transform(
                F.sequence(F.lit(1), (ln - n + 1).cast("int")),
                lambda i: F.substring(F.col(c), i, n),
            ),
        ).otherwise(F.array().cast("array<string>"))

    ga = (
        t0.select("id", F.explode(grams("sa")).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    gb = (
        t0.select("id", F.explode(grams("sb")).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    na = ga.groupBy("id").agg(F.sum("ca").cast("long").alias("n_ref_grams"))
    nb = gb.groupBy("id").agg(F.sum("cb").cast("long").alias("n_hyp_grams"))
    m = (
        ga.join(gb, ["id", "g"])
        .groupBy("id")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("matches"))
    )
    b2 = beta * beta
    base = (
        t0.select("id")
        .join(na, "id", "left").join(nb, "id", "left").join(m, "id", "left")
        .select(
            "id",
            F.coalesce("matches", F.lit(0)).cast("long").alias("matches"),
            F.coalesce("n_ref_grams", F.lit(0)).cast("long")
            .alias("n_ref_grams"),
            F.coalesce("n_hyp_grams", F.lit(0)).cast("long")
            .alias("n_hyp_grams"),
        )
    )
    return base.select(
        "id", "matches", "n_ref_grams", "n_hyp_grams",
        F.when(
            F.expr(f"{b2} * n_ref_grams + n_hyp_grams") > 0,
            F.expr(
                f"({b2 + 1} * 1000000L * matches) div "
                f"({b2} * n_ref_grams + n_hyp_grams)"
            ),
        ).otherwise(F.lit(-1)).cast("long").alias("chrf_ppm"),
    )
