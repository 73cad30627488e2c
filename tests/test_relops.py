"""As-of join + bucketized range join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kgspark.relops import asof_join, range_join


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:05:00")),
         (1, 11, _ts("2024-01-01 10:20:00")),
         (1, 12, _ts("2024-01-01 09:00:00")),   # before any right row
         (2, 20, _ts("2024-01-01 10:00:00"))],  # key with no right rows
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0),
         (1, _ts("2024-01-01 10:10:00"), 7.0),
         (1, _ts("2024-01-01 10:20:00"), 9.0)],  # equal-ts tie: must match
        "user_id long, ts timestamp, v double",
    )
    got = {r["event_id"]: r["matched_v"]
           for r in asof_join(left, right, ["user_id"], "ts").collect()}
    assert got[10] == 5.0       # latest right at or before 10:05
    assert got[11] == 9.0       # inclusive tie at 10:20
    assert got[12] is None      # nothing precedes 09:00
    assert got[20] is None      # no right rows for key 2
    assert len(got) == 4        # left-join: every left row survives


def test_range_join_exact_and_multimatch(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:30:00")),
         (1, 2, _ts("2024-01-01 13:00:00")),    # outside every interval
         (2, 3, _ts("2024-01-01 10:30:00"))],   # wrong key
        "user_id long, event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "a"),
         (1, _ts("2024-01-01 10:15:00"), _ts("2024-01-01 10:45:00"), "b"),
         (1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00"), "c")],
        "user_id long, start timestamp, end timestamp, label string",
    )
    got = sorted(
        (r["event_id"], r["label"])
        for r in range_join(left, iv, ["user_id"], bucket_secs=900).collect()
    )
    # event 1 falls in BOTH overlapping intervals a and b; 2 and 3 in none
    assert got == [(1, "a"), (1, "b")]


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_join_plan_is_equi(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:30:00"))],
        "user_id long, event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "user_id long, start timestamp, end timestamp",
    )
    p = _plan(range_join(left, iv, ["user_id"]))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
