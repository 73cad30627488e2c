"""Skew handling: salted two-phase aggregation + hot-key detection.

Hot domains / head entities put one groupBy key on one reducer. AQE skew-join
splitting (on in kgspark.session) covers joins; for aggregations over
pathological keys the classic fix is salting:

  phase 1: group by (key, salt) — fans a hot key across S reducers
  phase 2: group by key — combines S partials (S rows per key, trivial)

Sums/counts/min/max are associative so the two-phase result is exactly the
single-phase result; the salt column derives from a per-row hash, never rand(),
so replays are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int = 16, from_cols: list[str] | None = None):
    """Deterministic salt in [0, salt_buckets): hash of `from_cols` (or all
    columns) — NOT rand(), so checkpoint replays regroup identically."""
    cols = [F.col(c) for c in (from_cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.hash(*cols), F.lit(salt_buckets)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    aggs: out_name -> (fn, col) with fn in {count, sum, min, max}.
    e.g. salted_agg(events, ["event_type"], {"n": ("count", "*"),
                                             "total": ("sum", "value")})
    """
    partial_exprs, final_exprs = [], []
    for out, (fn, col) in aggs.items():
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the hot side gets a deterministic row salt, the
    (small) dim side is replicated salt_buckets ways, and the join runs on
    (keys + salt) — a hot key fans across salt_buckets reducers instead of
    landing on one. Semantically identical to `skewed.join(dim, on, how)`
    for 1:1/N:1 dims; use when a handful of head keys dominate and AQE's
    skew split isn't available (e.g. the join feeds a co-partitioned
    downstream op AQE won't re-plan).

    Cost: dim is materialized salt_buckets x — keep it dimension-sized
    (the same constraint a broadcast join has).

    Only joins that never emit unmatched DIM rows are salt-safe: the dim side
    is replicated, so 'right'/'full' would emit each unmatched dim row
    salt_buckets times. Those types are rejected rather than silently
    diverging from the skewed.join(dim, on, how) contract."""
    safe = {"inner", "left", "leftouter", "leftsemi", "leftanti", "cross"}
    if how.lower().replace("_", "") not in safe:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe (replicated dim rows "
            "would duplicate unmatched outputs); use one of "
            "inner/left/left_semi/left_anti"
        )
    s = with_salt(skewed, salt_buckets, from_cols=skewed.columns)
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return s.join(d, [*on, "__salt"], how).drop("__salt")


def hot_keys(df: DataFrame, key: str, threshold_ratio: float = 4.0) -> DataFrame:
    """Keys whose row count exceeds threshold_ratio × the mean per-key count —
    the inputs you'd salt or AQE-split. (key, n, ratio)."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    mean = counts.agg(F.avg("n").alias("m"))
    return (
        counts.crossJoin(F.broadcast(mean))
        .withColumn("ratio", F.round(F.col("n") / F.col("m"), 6))
        .where(F.col("ratio") >= threshold_ratio)
        .select(key, "n", "ratio")
    )


def partition_report(
    edges: DataFrame,
    k: int = 32,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Layout advisor for a subject-hash-partitioned triple store: how
    balanced would `k` partitions be, and what fraction of edges cross
    partitions (each cross edge = one shuffled row in every
    subject-co-located join against the object side).

    The bucket function is md5-prefix mod k — engine-portable (unlike
    Spark's internal Murmur `hash()`), so the report is replicable by any
    downstream system deciding a physical layout. Per-partition row:
    (partition, n_nodes distinct subjects, n_edges, n_cut edges whose
    object lands elsewhere, cut_ppm). Balance reads off the n_edges
    spread; a heavy partition is the salting signal (see salted_join
    above), a high global cut ratio says subject-hash co-location buys
    little for this graph and a different key (domain, connected
    component) should be considered.

    One pass: map-side bucket columns, one aggregation on the partition
    key.
    """
    if k < 1:
        raise ValueError(f"partition_report: k >= 1, got {k}")

    def bucket(col):
        return (
            F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % k
        )

    e = edges.select(
        bucket(F.col(src)).alias("partition"),
        F.col(src).alias("_s"),
        (bucket(F.col(src)) != bucket(F.col(dst))).alias("_cut"),
    )
    return (
        e.groupBy("partition")
        .agg(
            F.countDistinct("_s").cast("long").alias("n_nodes"),
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.when(F.col("_cut"), 1).otherwise(0)).cast("long")
            .alias("n_cut"),
        )
        .select(
            "partition", "n_nodes", "n_edges", "n_cut",
            F.expr("(1000000 * n_cut) div n_edges").cast("long")
            .alias("cut_ppm"),
        )
    )
