"""Temporal KG operators — validity intervals and point-in-time queries.

A crawl-fed KG sees each fact many times with a `warc_ts` capture
timestamp (BASELINE input_hint); the reference keeps only last-write-wins
node state (knowledge_graph_builder.py:714-741 upsert). These operators
add the bitemporal layer a longitudinal corpus needs: compact the
observation stream into validity intervals (SCD-2 / gaps-and-islands) and
answer "what did the graph say at time T" without replaying the stream.

Scale posture: both are single-shuffle window plans partitioned by
(subj, pred) — the natural key of the fact stream, so the shuffle is the
minimal one any per-fact history needs; no self-joins, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def triple_intervals(obs: DataFrame, subj_col: str = "subj",
                     pred_col: str = "pred", obj_col: str = "obj",
                     ts_col: str = "ts",
                     extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """Compact an observation stream (subj, pred, obj, ts) into SCD-2
    validity intervals: (subj, pred, obj, valid_from, valid_to, n_obs),
    one row per maximal run of consecutive observations with the same
    object. `valid_to` is the timestamp of the next differing
    observation (half-open interval), NULL for the current value.
    Re-observations of an unchanged object extend the run (n_obs counts
    them) rather than opening a new interval.

    Gaps-and-islands: lag-change flag → running sum → group — one
    window shuffle on (subj, pred), one aggregation on the same keys
    (no second shuffle; the island id is a function of the partition
    key).

    extra_keys: additional history-key columns (e.g. the asserting
    source) appended to the (subj, pred) partition key and carried in
    the output — per-source histories for conflict detection.
    """
    keys = [subj_col, pred_col, *extra_keys]
    w = Window.partitionBy(*keys).orderBy(ts_col)
    flagged = obs.withColumn(
        "__chg",
        F.when(
            F.lag(obj_col).over(w).isNull()
            | (F.lag(obj_col).over(w) != F.col(obj_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("__island", F.sum("__chg").over(w))
    runs = flagged.groupBy(*keys, "__island").agg(
        F.first(obj_col).alias("obj"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    return runs.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    ).select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        *extra_keys,
        "obj", "valid_from", "valid_to",
        F.col("n_obs").cast("long").alias("n_obs"),
    )


def asof_snapshot(obs: DataFrame, as_of, subj_col: str = "subj",
                  pred_col: str = "pred", obj_col: str = "obj",
                  ts_col: str = "ts") -> DataFrame:
    """Point-in-time graph state: the latest observation per (subj, pred)
    with ts <= as_of → (subj, pred, obj, as_of_ts). Ties on ts break by
    descending object for determinism. The filter runs before the window
    (predicate pushdown to the scan), so a far-past snapshot reads only
    its prefix of the stream.
    """
    w = Window.partitionBy(subj_col, pred_col).orderBy(
        F.desc(ts_col), F.desc(obj_col)
    )
    return (
        obs.where(F.col(ts_col) <= F.lit(as_of))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col(subj_col).alias("subj"),
            F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
            F.col(ts_col).alias("as_of_ts"),
        )
    )


def fact_churn(obs: DataFrame, subj_col: str = "subj",
               pred_col: str = "pred", obj_col: str = "obj",
               ts_col: str = "ts") -> DataFrame:
    """Per-predicate fact volatility census over the observation stream:
    (pred, n_keys, n_obs, n_intervals, n_changed_keys, max_intervals).
    A key's interval count is its number of value runs (the same
    lag-change flag triple_intervals islands on, summed instead of
    grouped); n_changed_keys counts keys whose value changed at least
    once. The census tells a recrawl scheduler which predicates are
    volatile (revisit often) vs append-only facts.

    One window shuffle on the fact key reused by the per-key groupBy,
    then a predicate-sized aggregation.
    """
    w = Window.partitionBy(subj_col, pred_col).orderBy(ts_col)
    chg = F.when(
        F.lag(obj_col).over(w).isNull()
        | (F.lag(obj_col).over(w) != F.col(obj_col)),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_key = (
        obs.withColumn("__chg", chg)
        .groupBy(subj_col, pred_col)
        .agg(F.sum("__chg").alias("__iv"), F.count(F.lit(1)).alias("__n"))
    )
    return per_key.groupBy(F.col(pred_col).alias("pred")).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__n").cast("long").alias("n_obs"),
        F.sum("__iv").cast("long").alias("n_intervals"),
        F.sum(F.when(F.col("__iv") > 1, 1).otherwise(0)).cast("long")
        .alias("n_changed_keys"),
        F.max("__iv").cast("long").alias("max_intervals"),
    )


def interval_conflicts(obs: DataFrame, subj_col: str = "subj",
                       pred_col: str = "pred", obj_col: str = "obj",
                       ts_col: str = "ts",
                       source_col: str = "source") -> DataFrame:
    """Cross-source temporal contradiction report for FUNCTIONAL facts:
    two sources asserting DIFFERENT objects for the same (subj, pred)
    over OVERLAPPING validity intervals. The multi-source complement of
    cardinality_violations (which is timeless) and fuse_facts (which
    votes without looking at time): a fusion pipeline routes exactly
    these rows to arbitration.

    Per-source SCD-2 histories via triple_intervals(extra_keys=source),
    then ONE self-join keyed on (subj, pred) with src_a < src_b,
    obj_a != obj_b and half-open interval overlap (NULL valid_to =
    still current = +infinity). Output: (subj, pred, src_a, obj_a,
    src_b, obj_b, overlap_from, overlap_to) where overlap_to is NULL
    when both intervals are open.

    Scale shape: the join key is the fact key, so fan-out per key =
    (#sources x runs)^2 for THAT key only — sources per fact are
    bounded in any real crawl (distinct hosts asserting the fact), and
    the interval build is the same single window shuffle
    triple_intervals does.
    """
    iv = triple_intervals(obs, subj_col, pred_col, obj_col, ts_col,
                          extra_keys=(source_col,))
    a, b = iv.alias("a"), iv.alias("b")
    sc = lambda side: F.col(f"{side}.{source_col}")  # noqa: E731
    overlap = (
        (F.col("b.valid_to").isNull()
         | (F.col("a.valid_from") < F.col("b.valid_to")))
        & (F.col("a.valid_to").isNull()
           | (F.col("b.valid_from") < F.col("a.valid_to")))
    )
    return (
        a.join(
            b,
            (F.col("a.subj") == F.col("b.subj"))
            & (F.col("a.pred") == F.col("b.pred"))
            & (sc("a") < sc("b"))
            & (F.col("a.obj") != F.col("b.obj"))
            & overlap,
        )
        .select(
            F.col("a.subj").alias("subj"),
            F.col("a.pred").alias("pred"),
            sc("a").alias("src_a"),
            F.col("a.obj").alias("obj_a"),
            sc("b").alias("src_b"),
            F.col("b.obj").alias("obj_b"),
            F.greatest("a.valid_from", "b.valid_from").alias("overlap_from"),
            F.when(
                F.col("a.valid_to").isNull(), F.col("b.valid_to")
            )
            .when(F.col("b.valid_to").isNull(), F.col("a.valid_to"))
            .otherwise(F.least("a.valid_to", "b.valid_to"))
            .alias("overlap_to"),
        )
    )


def allen_relations(intervals: DataFrame) -> DataFrame:
    """Allen interval-algebra relations (Allen, CACM 1983) between the
    fact intervals of the SAME subject.

    Input: SCD-2 rows (subj, pred, obj, valid_from, valid_to) — the
    :func:`triple_intervals` output; NULL valid_to (still-current)
    compares as +infinity. Every unordered pair of DISTINCT facts of one
    subject appears exactly once, oriented so interval ``a`` sorts before
    ``b`` on (valid_from, valid_to, pred, obj) — with that orientation the
    13 Allen relations collapse to the 7 canonical ones (the other 6 are
    the reversed pair): precedes, meets, overlaps, starts, contains,
    finished_by, equals.

    Returns (subj, a_pred, a_obj, b_pred, b_obj, relation).

    Plan: one self-join on the subject key with a strict struct-ordering
    predicate (each pair once, no mirror dedup pass); the relation is a
    CASE chain over the four endpoints — exact integer comparisons, no
    window, no second shuffle. Pair count is sum over subjects of
    n_facts^2 — per-entity fact counts bound it, exactly like the
    conflict-detection join above.
    """
    inf = F.lit(9223372036854775807)
    iv = intervals.select(
        "subj", "pred", "obj",
        F.col("valid_from").cast("long").alias("vf"),
        F.coalesce(F.col("valid_to").cast("long"), inf).alias("vt"),
    )

    def key(side: str):
        return F.struct(
            F.col(f"{side}.vf"), F.col(f"{side}.vt"),
            F.col(f"{side}.pred"), F.col(f"{side}.obj"),
        )

    pairs = iv.alias("a").join(
        iv.alias("b"),
        (F.col("a.subj") == F.col("b.subj"))
        & (
            (F.col("a.pred") != F.col("b.pred"))
            | (F.col("a.obj") != F.col("b.obj"))
        )
        & (key("a") < key("b")),
    )
    avf, avt = F.col("a.vf"), F.col("a.vt")
    bvf, bvt = F.col("b.vf"), F.col("b.vt")
    relation = (
        F.when(avt < bvf, F.lit("precedes"))
        .when(avt == bvf, F.lit("meets"))
        .when((avf == bvf) & (avt == bvt), F.lit("equals"))
        .when((avf == bvf) & (avt < bvt), F.lit("starts"))
        .when((avf < bvf) & (avt == bvt), F.lit("finished_by"))
        .when((avf < bvf) & (avt > bvt), F.lit("contains"))
        .otherwise(F.lit("overlaps"))
    )
    return pairs.select(
        F.col("a.subj").alias("subj"),
        F.col("a.pred").alias("a_pred"),
        F.col("a.obj").alias("a_obj"),
        F.col("b.pred").alias("b_pred"),
        F.col("b.obj").alias("b_obj"),
        relation.alias("relation"),
    )
