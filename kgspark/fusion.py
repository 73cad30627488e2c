"""Knowledge fusion — resolving conflicting facts from many web sources.

A crawl asserts the same (subj, pred) from thousands of pages that
disagree; the reference keeps last-write-wins node state only
(knowledge_graph_builder.py:714-741). These operators add the fusion
layer of a web-scale build (Dong et al., "From Data Fusion to Knowledge
Fusion", VLDB 2014): weighted source voting to pick one canonical object
per fact key, and per-triple provenance rollups (who said it, when,
how often) that downstream trust models consume.

Determinism: source weights are integer ppm; scores are exact integer
sums; ties break by ascending object. No floats anywhere.

Scale posture: `fuse_facts` is groupBy + one top-1 window (partial agg
collapses the per-page observation stream map-side before either
shuffle; the source-weight table is schema-sized and broadcasts).
`triple_provenance` is a single partial-aggregated groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast


def fuse_facts(obs: DataFrame, source_weights: DataFrame,
               subj_col: str = "subj", pred_col: str = "pred",
               obj_col: str = "obj", source_col: str = "source",
               weight_col: str = "weight_ppm") -> DataFrame:
    """Weighted majority vote per fact key: every observation contributes
    its source's weight_ppm to its object's score; the object with the
    highest total wins -> (subj, pred, obj, score_ppm, n_votes,
    n_candidates). Ties break by ascending object. Sources missing from
    the weight table vote with weight 0 (they still count in n_votes).

    n_candidates is how many distinct objects competed — the conflict
    signal a curation pass filters on (a fact every source agrees on has
    n_candidates=1).
    """
    w = broadcast(
        source_weights.select(
            F.col(source_col).alias("__src"),
            F.col(weight_col).cast("long").alias("__w"),
        )
    )
    scored = (
        obs.join(w, obs[source_col] == w["__src"], "left")
        .groupBy(
            F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
        )
        .agg(
            F.sum(F.coalesce(F.col("__w"), F.lit(0))).alias("score_ppm"),
            F.count(F.lit(1)).alias("n_votes"),
        )
    )
    key = Window.partitionBy("subj", "pred")
    ranked = scored.withColumn(
        "__rn",
        F.row_number().over(key.orderBy(F.desc("score_ppm"), F.asc("obj"))),
    ).withColumn("n_candidates", F.count(F.lit(1)).over(key))
    return (
        ranked.where(F.col("__rn") == 1)
        .select(
            "subj", "pred", "obj", "score_ppm",
            F.col("n_votes").cast("long").alias("n_votes"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )


def triple_provenance(obs: DataFrame, subj_col: str = "subj",
                      pred_col: str = "pred", obj_col: str = "obj",
                      source_col: str = "source",
                      ts_col: str = "ts") -> DataFrame:
    """Per-triple provenance rollup: (subj, pred, obj, n_obs, n_sources,
    first_seen, last_seen) — how often, from how many distinct sources,
    and over what capture window each assertion was observed. The
    staleness/support signals trust propagation (TrustRank seeds, fusion
    priors) reads.

    One partial-aggregated groupBy on the triple key; count_distinct on
    the source column is the only non-algebraic piece and Spark's 2-phase
    distinct-agg keeps it map-side partial too.
    """
    return (
        obs.groupBy(
            F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.countDistinct(F.col(source_col)).cast("long")
            .alias("n_sources"),
            F.min(F.col(ts_col)).alias("first_seen"),
            F.max(F.col(ts_col)).alias("last_seen"),
        )
    )
