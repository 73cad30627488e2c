"""Shared Spark fixture: one session per test run (local[4] keeps pytest
snappy; scaling behavior is bench.py's job, not the unit suite's)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from kgspark.session import get_spark

    s = get_spark(
        app_name="kgspark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()
