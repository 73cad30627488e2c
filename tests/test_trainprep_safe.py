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
