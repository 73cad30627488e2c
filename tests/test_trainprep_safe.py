"""leakage_safe_split (kgspark.trainprep)."""

from kgspark.trainprep import hash_split, leakage_safe_split


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicates_always_share_a_split(spark):
    # 40 distinct texts, each duplicated under 3 different ids
    rows = [(i * 3 + k, f"document body number {i}") for i in range(40)
            for k in range(3)]
    out = leakage_safe_split(_docs(spark, rows)).collect()
    by_text = {}
    for r in out:
        by_text.setdefault(r.text, set()).add(r.split)
    assert all(len(s) == 1 for s in by_text.values())
    # plain hash_split on ids DOES straddle for at least one dup set
    plain = hash_split(_docs(spark, rows)).collect()
    by_text2 = {}
    for r in plain:
        by_text2.setdefault(r.text, set()).add(r.split)
    assert any(len(s) > 1 for s in by_text2.values())


def test_cluster_col_key_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None, 7), (2, None, 7), (3, "x", 8)],
        "doc_id long, text string, cluster long",
    )
    out = {r.doc_id: r.split for r in
           leakage_safe_split(df, cluster_col="cluster").collect()}
    assert out[1] == out[2]  # same cluster -> same split
    # default path: both NULL texts key identically too
    out2 = {r.doc_id: r.split for r in leakage_safe_split(df).collect()}
    assert out2[1] == out2[2]


def test_split_proportions_roughly_hold(spark):
    rows = [(i, f"unique text {i}") for i in range(2000)]
    out = leakage_safe_split(_docs(spark, rows)).groupBy("split").count().collect()
    frac = {r.split: r["count"] / 2000 for r in out}
    assert 0.85 < frac["train"] < 0.95
    assert 0.02 < frac["val"] < 0.08
    assert 0.02 < frac["test"] < 0.08


def test_weighted_sample_favors_heavy_weights(spark):
    from kgspark.trainprep import weighted_sample

    # 500 light (w=1) + 100 heavy (w=50): heavy rows carry ~91% of total
    # weight and should dominate a 60-row sample
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 50) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, 60, "w").collect()
    assert len(out) == 60
    heavy = sum(1 for r in out if r.doc_id >= 1000)
    assert heavy > 40


def test_weighted_sample_determinism_and_filters(spark):
    from kgspark.trainprep import weighted_sample

    rows = [(i, i % 7) for i in range(200)]  # w=0 rows must drop
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = [tuple(r) for r in weighted_sample(df.repartition(1), 30, "w").collect()]
    b = [tuple(r) for r in weighted_sample(df.repartition(13), 30, "w").collect()]
    assert a == b
    assert all(r[1] > 0 for r in a)
    # null weights drop too
    df2 = spark.createDataFrame([(1, None), (2, 5)], "doc_id long, w long")
    out = weighted_sample(df2, 10, "w").collect()
    assert [r.doc_id for r in out] == [2]


def test_weighted_sample_n_exceeds_population(spark):
    from kgspark.trainprep import weighted_sample

    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_id long, w long")
    assert weighted_sample(df, 100, "w").count() == 2
