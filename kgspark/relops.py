"""Temporal relational operators Spark's built-ins don't express directly:
as-of join and bucketized range join.

Both avoid the naive formulation (an inequality theta-join, which Spark
plans as a broadcast-nested-loop / cartesian product) and use shapes that
survive 100 TB:

  asof_join    union the two inputs, one shuffle on the key, and carry the
               most recent right-side values forward with
               last(ignorenulls) over an event-time window — the standard
               distributed merge-interleave as-of algorithm. Cost: one
               shuffle + one sort per key group, no pairwise work.
  range_join   equi-join on (key, time-bucket) with range predicates
               verified after candidate generation: each interval explodes
               to the buckets it covers, each probe row maps to exactly one
               bucket — candidates are local to a bucket, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """For every left row, attach the right row with the LARGEST right.ts
    <= left.ts within the same key (NULLs when no right row precedes it) —
    i.e. `ASOF LEFT JOIN` semantics.

    Ties (right.ts == left.ts) match, mirroring the inclusive <= of SQL
    ASOF joins. Right rows sort before left rows at equal timestamps so the
    window's last() sees them.

    The right side should be unique per (key, ts) — with several right rows
    at the identical key+timestamp the carried values are an arbitrary
    (though stable-per-run) pick among them, the same caveat SQL ASOF joins
    carry; pre-aggregate the right side when that can occur."""
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in key_cols and c != ts_col]
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols, F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    r = right.select(
        *key_cols, F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in key_cols and c != ts_col],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).select(*l.columns)  # align column order
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc(ts_col), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
          for c in right_cols],
    )
    return carried.where(F.col("__side") == 1).select(
        *lcols, *[f"{prefix}{c}" for c in right_cols]
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Join each left row to every interval [start, end) containing its
    timestamp (same key). Implemented as an equi-join on (key, epoch
    bucket): intervals explode to the integer buckets they span, probe rows
    hash to exactly one bucket — then the range predicate verifies exactly.
    Candidate volume is interval-length/bucket_secs per interval, never
    |left| x |intervals|. Size bucket_secs near the typical interval length
    (one bucket per interval) — too small multiplies interval copies, too
    large multiplies per-bucket candidates."""
    def ebucket(c):
        return F.floor(F.unix_timestamp(c) / F.lit(bucket_secs))

    iv = intervals.select(
        "*",
        F.explode(
            F.sequence(ebucket(F.col(start_col)), ebucket(F.col(end_col)))
        ).alias("__bucket"),
    )
    lb = left.withColumn("__bucket", ebucket(F.col(ts_col)))
    out = lb.join(iv, [*key_cols, "__bucket"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("__bucket")
