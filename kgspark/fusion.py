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

from kgspark.session import materialize


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


def truth_discovery(obs: DataFrame, rounds: int = 3,
                    init_ppm: int = 500_000,
                    subj_col: str = "subj", pred_col: str = "pred",
                    obj_col: str = "obj",
                    source_col: str = "source") -> DataFrame:
    """Iterative truth discovery: alternate fact-confidence and
    source-trust estimates (TruthFinder-style mutual reinforcement, Yin
    et al. KDD 2007 — the simplified additive variant) instead of
    fuse_facts' STATIC weight table.

      conf(key, obj)  = sum of asserting sources' trust * 1e6 div
                        sum of ALL trust voting on that key
      trust(source)   = mean conf of the objects it asserted (int div)

    All-integer ppm arithmetic from a uniform init -> bit-deterministic,
    oracle-unrollable (the k-core/LPA pinned-rounds posture; TruthFinder
    iterates to convergence, we pin `rounds`). Returns one row per fact
    key: (subj, pred, obj, conf_ppm, n_candidates) — the winning object
    (ties: ascending object), its final confidence, and how many objects
    competed.

    Scale shape per round: one groupBy on the claim key (partial agg),
    one key-total groupBy reusing the same partitioning, one broadcast
    of the source-sized trust table back onto claims. The claim stream
    is never self-joined; rounds are bounded.
    """
    claims = obs.select(
        F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"), F.col(source_col).alias("source"),
    ).distinct()
    claims = materialize(claims)
    trust = claims.select("source").distinct().select(
        "source", F.lit(init_ppm).cast("long").alias("trust")
    )
    conf = None
    for _ in range(rounds):
        scored = claims.join(broadcast(trust), "source")
        obj_score = scored.groupBy("subj", "pred", "obj").agg(
            F.sum("trust").alias("score")
        )
        key_total = obj_score.groupBy("subj", "pred").agg(
            F.sum("score").alias("total")
        )
        conf = obj_score.join(key_total, ["subj", "pred"]).select(
            "subj", "pred", "obj",
            F.expr(
                "CASE WHEN total > 0 THEN score * 1000000 div total "
                "ELSE 0 END"
            ).cast("long").alias("conf_ppm"),
        )
        conf = materialize(conf)
        trust = (
            claims.join(conf, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(F.expr("sum(conf_ppm) div count(1)").cast("long")
                 .alias("trust"))
        )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.desc("conf_ppm"), F.asc("obj")
    )
    return (
        conf.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_candidates",
            F.count(F.lit(1)).over(Window.partitionBy("subj", "pred"))
            .cast("long"),
        )
        .where(F.col("__rn") == 1)
        .select("subj", "pred", "obj", "conf_ppm", "n_candidates")
    )


def copy_detection(obs: DataFrame, min_shared: int = 2,
                   max_sources_per_claim: int = 20,
                   subj_col: str = "subj", pred_col: str = "pred",
                   obj_col: str = "obj",
                   source_col: str = "source") -> DataFrame:
    """Pairwise source copy-detection: independent sources agree mostly
    on majority (likely-true) values, while a copier inherits its
    original's MINORITY (likely-false) values too — shared errors are
    the copying fingerprint (Dong, Berti-Equille & Srivastava, "Integrating
    Conflicting Data: The Role of Source Dependence", VLDB 2009 — the
    counting core of their Bayesian model, kept integer-exact).

    Per source pair sharing >= min_shared claims:
      (source_a, source_b, shared_total, shared_minority,
       copy_ppm = shared_minority * 1e6 div shared_total)
    where a claim is "minority" when its object is NOT the per-(subj,
    pred) plurality object (plurality by distinct-source votes, ties by
    ascending object). High copy_ppm pairs feed a downstream trust
    discount (a copier's votes shouldn't count as independent evidence
    in fuse_facts / truth_discovery).

    Scale posture: the only pair-producing join is claim-key-grouped and
    max-df-guarded — claims asserted by more than max_sources_per_claim
    sources are dropped from the PAIR join (the winnow_matches hot-key
    pattern; a claim the whole web repeats carries no copying signal).
    Everything else is partial-aggregated groupBys + one top-1 window.
    """
    claims = obs.select(
        F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"), F.col(source_col).alias("source"),
    ).distinct()
    claims = materialize(claims)
    votes = claims.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("__n")
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.desc("__n"), F.asc("obj")
    )
    flagged = votes.select(
        "subj", "pred", "obj", "__n",
        (F.row_number().over(w) == 1).alias("__is_maj"),
    ).where(F.col("__n") <= max_sources_per_claim)
    keyed = claims.join(flagged, ["subj", "pred", "obj"])
    keyed = materialize(keyed.select("subj", "pred", "obj", "source",
                                     "__is_maj"))
    a = keyed.select("subj", "pred", "obj", "__is_maj",
                     F.col("source").alias("source_a"))
    b = keyed.select("subj", "pred", "obj",
                     F.col("source").alias("source_b"))
    pairs = a.join(b, ["subj", "pred", "obj"]).where(
        F.col("source_a") < F.col("source_b")
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("shared_total"),
            F.sum(F.when(F.col("__is_maj"), 0).otherwise(1))
             .cast("long").alias("shared_minority"),
        )
        .where(F.col("shared_total") >= min_shared)
        .withColumn(
            "copy_ppm",
            F.expr("shared_minority * 1000000 div shared_total")
             .cast("long"),
        )
    )
