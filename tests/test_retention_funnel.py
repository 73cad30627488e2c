"""retention_matrix and funnel_counts (kgspark.relops)."""

from datetime import datetime

import pytest

from kgspark.relops import funnel_counts, retention_matrix


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_retention_cohorts_and_offsets(spark):
    rows = [
        # user 1: first event week of Jan 1 (Mon), active weeks 0 and 2
        (1, "view", datetime(2024, 1, 2, 10, 0)),
        (1, "view", datetime(2024, 1, 16, 10, 0)),
        # user 2: same cohort, only week 0
        (2, "view", datetime(2024, 1, 3, 9, 0)),
        # user 3: cohort of Jan 8, active weeks 0 and 1
        (3, "view", datetime(2024, 1, 9, 8, 0)),
        (3, "view", datetime(2024, 1, 15, 8, 0)),
        (3, "view", None),  # dropped
    ]
    out = {
        (r.cohort_week.date().isoformat(), r.week_offset): r.n_users
        for r in retention_matrix(_events(spark, rows)).collect()
    }
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 2)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert out[("2024-01-08", 1)] == 1
    assert ("2024-01-01", 1) not in out


def test_funnel_requires_order(spark):
    rows = [
        # user 1 completes all three in order
        (1, "signup", datetime(2024, 1, 1, 0, 0)),
        (1, "click", datetime(2024, 1, 2, 0, 0)),
        (1, "purchase", datetime(2024, 1, 3, 0, 0)),
        # user 2 purchases BEFORE clicking -> stalls at click
        (2, "signup", datetime(2024, 1, 1, 0, 0)),
        (2, "purchase", datetime(2024, 1, 2, 0, 0)),
        (2, "click", datetime(2024, 1, 3, 0, 0)),
        # user 3 never signs up -> not even stage 1
        (3, "click", datetime(2024, 1, 1, 0, 0)),
        (3, "purchase", datetime(2024, 1, 2, 0, 0)),
    ]
    out = {r.stage: (r.step, r.n_users) for r in
           funnel_counts(_events(spark, rows),
                         ["signup", "click", "purchase"]).collect()}
    assert out[1] == ("signup", 2)
    assert out[2] == ("click", 2)
    assert out[3] == ("purchase", 1)


def test_funnel_ties_count_and_empty_steps_raise(spark):
    rows = [
        # same-timestamp signup+click: ties allowed (>=)
        (1, "signup", datetime(2024, 2, 1, 12, 0)),
        (1, "click", datetime(2024, 2, 1, 12, 0)),
    ]
    out = {r.stage: r.n_users for r in
           funnel_counts(_events(spark, rows), ["signup", "click"]).collect()}
    assert out == {1: 1, 2: 1}
    with pytest.raises(ValueError):
        funnel_counts(_events(spark, rows), [])


def test_retention_empty_input(spark):
    df = _events(spark, []).limit(0)
    assert retention_matrix(df).count() == 0
