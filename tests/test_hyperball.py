"""HyperBall neighborhood sketches (kgspark.graph_algs.hyperball)."""

import pytest
from pyspark.sql import functions as F

from kgspark.graph_algs import hyperball
from kgspark.sketch import hll_estimate, hll_registers


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "subj string, obj string")


def test_hyperball_registers_equal_exact_ball_sketch(spark):
    # chain a->b->c->d plus a->c: 2-hop ball of a = {a,b,c,d}
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    regs = hyperball(e, rounds=2, p=4)
    ball_a = regs.where(F.col("node") == "a").select("idx", "max_rho")
    # the same sketch built directly from the exact ball member set
    exact = hll_registers(
        spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "token string"),
        p=4,
    )
    assert sorted(map(tuple, ball_a.collect())) == sorted(
        map(tuple, exact.collect())
    )
    # sink node d: ball = {d} alone
    ball_d = regs.where(F.col("node") == "d").select("idx", "max_rho")
    exact_d = hll_registers(
        spark.createDataFrame([("d",)], "token string"), p=4
    )
    assert sorted(map(tuple, ball_d.collect())) == sorted(
        map(tuple, exact_d.collect())
    )


def test_hyperball_estimates_track_ball_sizes(spark):
    # star: hub -> 60 leaves; hub's 1-hop ball = 61, each leaf's = 1
    pairs = [("hub", f"leaf{i}") for i in range(60)]
    regs = hyperball(_edges(spark, pairs), rounds=1, p=6)
    est_hub = hll_estimate(
        regs.where(F.col("node") == "hub").select("idx", "max_rho"), p=6
    )
    est_leaf = hll_estimate(
        regs.where(F.col("node") == "leaf0").select("idx", "max_rho"), p=6
    )
    assert abs(est_hub - 61) / 61 < 0.5
    assert est_leaf < 5


def test_hyperball_rounds_grow_monotonically(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]
    r1 = hyperball(_edges(spark, chain), rounds=1, p=4)
    r3 = hyperball(_edges(spark, chain), rounds=3, p=4)
    n1 = r1.where("node = 'n0'").count()
    n3 = r3.where("node = 'n0'").count()
    assert n3 >= n1  # more ball members -> at least as many live registers


def test_hyperball_bad_p_and_determinism(spark):
    with pytest.raises(ValueError):
        hyperball(_edges(spark, [("a", "b")]), p=1)
    import random

    rng = random.Random(5)
    pairs = [
        (f"v{rng.randint(0, 30)}", f"v{rng.randint(0, 30)}") for _ in range(150)
    ]
    a = sorted(map(tuple, hyperball(_edges(spark, pairs).repartition(1)).collect()))
    b = sorted(map(tuple, hyperball(_edges(spark, pairs).repartition(13)).collect()))
    assert a == b
