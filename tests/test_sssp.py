"""Frontier Bellman-Ford SSSP (kgspark.graph_algs.sssp)."""

from kgspark.graph_algs import sssp


def _edges(spark, rows):
    return spark.createDataFrame(rows, "subj string, obj string, weight double")


def test_sssp_picks_cheaper_longer_path(spark):
    e = _edges(
        spark,
        [
            ("a", "b", 10.0),
            ("a", "c", 1.0),
            ("c", "d", 1.0),
            ("d", "b", 1.0),  # a->c->d->b = 3 beats a->b = 10
            ("b", "e", 1.0),
        ],
    )
    out = {r.node: r.dist for r in sssp(e, "a", rounds=4).collect()}
    assert out["b"] == 3.0
    assert out["d"] == 2.0
    assert out["e"] == 4.0
    assert out["a"] == 0.0


def test_sssp_bounded_rounds_limits_path_length(spark):
    chain = [(f"n{i}", f"n{i+1}", 1.0) for i in range(6)]
    out = {r.node: r.dist for r in sssp(_edges(spark, chain), "n0", rounds=3).collect()}
    assert out == {"n0": 0.0, "n1": 1.0, "n2": 2.0, "n3": 3.0}


def test_sssp_parallel_edges_take_min_weight(spark):
    e = _edges(spark, [("a", "b", 5.0), ("a", "b", 2.0)])
    out = {r.node: r.dist for r in sssp(e, "a", rounds=1).collect()}
    assert out["b"] == 2.0


def test_sssp_unreachable_absent_and_cycle_safe(spark):
    e = _edges(
        spark,
        [("a", "b", 1.0), ("b", "a", 1.0), ("x", "y", 1.0)],
    )
    out = {r.node: r.dist for r in sssp(e, "a", rounds=4).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"] == 0.0 and out["b"] == 1.0


def test_sssp_dataframe_start_and_determinism(spark):
    import random

    rng = random.Random(3)
    rows = [
        (f"v{rng.randint(0, 20)}", f"v{rng.randint(0, 20)}",
         float(rng.randint(1, 9)))
        for _ in range(120)
    ]
    e = _edges(spark, rows)
    start = e.selectExpr("min(subj) as s")
    a = sorted(map(tuple, sssp(e.repartition(1), start, rounds=4).collect()))
    b = sorted(map(tuple, sssp(e.repartition(11), start, rounds=4).collect()))
    assert a == b
