"""Density-clustering (DBSCAN-equivalent, SURVEY A4) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.density import dbscan_labels, dbscan_or_fallback, n_clusters

# Two tight clusters in opposite orthants + one isolated point. Banded
# sign-LSH candidates may include cross pairs on this 6-dim fixture (bands
# past the dimension are constant-0); the exact-cosine verify step rejects
# them, so the final labels depend only on the 0.9 threshold.
CLUSTER_A = [1.0, 1.0, 1.0, 1.0, 0.0, 0.1]
CLUSTER_B = [-1.0, -1.0, -1.0, -1.0, 0.3, 0.0]
NOISE = [1.0, -1.0, 1.0, -1.0, 5.0, -5.0]


def _emb(spark):
    rows = [
        (0, CLUSTER_A),
        (1, [v * 1.01 for v in CLUSTER_A]),
        (2, [v * 0.99 for v in CLUSTER_A]),
        (10, CLUSTER_B),
        (11, [v * 1.02 for v in CLUSTER_B]),
        (99, NOISE),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_dbscan_two_clusters_and_noise(spark):
    labels = {r["vec_id"]: (r["cluster"], r["is_core"])
              for r in dbscan_labels(_emb(spark), cos_threshold=0.9,
                                     min_samples=2).collect()}
    assert labels[0] == (0, True) and labels[1] == (0, True) and labels[2] == (0, True)
    assert labels[10] == (10, True) and labels[11] == (10, True)
    assert labels[99] == (None, False)  # noise
    lab_df = dbscan_labels(_emb(spark), cos_threshold=0.9, min_samples=2)
    assert n_clusters(lab_df) == 2


def test_dbscan_min_samples_core_border(spark):
    """min_samples=3: in a 2-point group neither point has 2 neighbors, so
    both become noise; the 3-point cluster stays (each member has 2)."""
    labels = {r["vec_id"]: (r["cluster"], r["is_core"])
              for r in dbscan_labels(_emb(spark), cos_threshold=0.9,
                                     min_samples=3).collect()}
    assert labels[0][1] and labels[1][1] and labels[2][1]
    assert labels[0][0] == labels[1][0] == labels[2][0] == 0
    assert labels[10] == (None, False) and labels[11] == (None, False)


def test_dbscan_or_fallback_selection(spark):
    """Mirrors ref knowledge_graph_builder.py:263-267: DBSCAN is kept only
    when it yields >= n_topics clusters, else hierarchical fallback."""
    chunks = _emb(spark).select(
        F.col("vec_id").alias("chunk_uid"), "embedding"
    )
    out, method = dbscan_or_fallback(chunks, n_topics=2, cos_threshold=0.9)
    assert method == "dbscan"
    assert out.where(F.col("cluster").isNotNull()).count() == 5

    out, method = dbscan_or_fallback(chunks, n_topics=4, cos_threshold=0.9)
    assert method == "bisecting"
    # fallback guarantees exactly n_topics cluster labels for every row
    assert out.select("cluster").distinct().count() == 4


def test_dbscan_min_samples_1_isolated_points_are_singletons(spark):
    """DBSCAN(min_samples=1) has no noise: the isolated point must be a
    singleton CORE cluster (sklearn semantics), not NULL-labeled."""
    labels = {r["vec_id"]: (r["cluster"], r["is_core"])
              for r in dbscan_labels(_emb(spark), cos_threshold=0.9,
                                     min_samples=1).collect()}
    assert labels[99] == (99, True)  # own cluster, core
    assert labels[0][0] == labels[1][0] == labels[2][0] == 0
    assert n_clusters(dbscan_labels(_emb(spark), cos_threshold=0.9,
                                    min_samples=1)) == 3
