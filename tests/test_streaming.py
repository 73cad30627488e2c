"""Incremental (Structured Streaming) KG construction tests."""

from __future__ import annotations

import os

from kgspark.streaming import start_incremental_kg
from kgspark.synth import pages_df


def _write_drop(spark, path, n, seed, start=0):
    df = pages_df(spark, n, seed=seed)
    df.coalesce(1).write.mode("append").parquet(path)


def test_incremental_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sink, exist_ok=True)

    # drop 1 -> drain
    _write_drop(spark, in_dir, 20, seed=3)
    start_incremental_kg(spark, in_dir, sink, ckpt)
    t1 = spark.read.parquet(os.path.join(sink, "triples.parquet"))
    n1 = t1.count()
    assert n1 > 0
    assert t1.select("subj", "pred", "obj").distinct().count() == n1  # deduped

    # drop 2 (same corpus again) -> NO new triples after merge-dedup
    _write_drop(spark, in_dir, 20, seed=3)
    start_incremental_kg(spark, in_dir, sink, ckpt)
    t2 = spark.read.parquet(os.path.join(sink, "triples.parquet"))
    assert t2.count() == n1

    # drop 3 (new corpus) -> strictly more triples, still globally deduped
    _write_drop(spark, in_dir, 20, seed=99)
    start_incremental_kg(spark, in_dir, sink, ckpt)
    t3 = spark.read.parquet(os.path.join(sink, "triples.parquet"))
    assert t3.count() > n1
    assert (
        t3.select("subj", "pred", "obj").distinct().count() == t3.count()
    )
