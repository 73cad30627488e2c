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


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """Streaming watermarked window agg drains a file-source stream of events
    and matches the equivalent batch aggregation (no late data in the drain,
    so results are exact)."""
    import os

    from pyspark.sql import functions as F

    from kgspark.streaming import windowed_event_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "ev")
    ev.coalesce(2).write.parquet(in_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total",
        )
    )
    # append mode emits only windows finalized by the watermark; every emitted
    # window must match the batch result exactly, and most windows finalize
    b = {(r["window_start"], r["event_type"]): (r["n"], round(r["total"], 4))
         for r in batch.collect()}
    g = [(r["window_start"], r["event_type"], r["n"], round(r["total"], 4))
         for r in got.collect()]
    assert len(g) > 0
    for ws, et, n, total in g:
        assert b[(ws, et)] == (n, total)


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Watermark state persists in the checkpoint: a second availableNow run
    whose input is older than the recovered watermark must drop it. (Within a
    single drain the watermark lags one micro-batch, so late-data semantics
    are only observable across restarts — see BENCH notes.)"""
    import datetime as dt

    from kgspark.streaming import windowed_event_counts

    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def drop(*specs):
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(minutes=m), 1, et, 1.0, None)
             for i, (m, et) in enumerate(specs)],
            schema,
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))

    def drain():
        q = (
            windowed_event_counts(
                spark.readStream.schema(schema).parquet(str(tmp_path / "in")),
                window="1 hour", watermark="2 hours",
            )
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .start()
        )
        q.awaitTermination()

    # run 1: events up to minute 500 -> watermark persists at ~06:20
    drop(*[(10 * i, "view") for i in range(1, 51)])
    drain()
    # run 2: one LATE event (00:30, far behind the recovered watermark) and
    # one fresh event that advances the stream
    drop((30, "late"), (520, "view"))
    drain()

    out = spark.read.parquet(str(tmp_path / "out"))
    types = {r["event_type"] for r in out.select("event_type").distinct().collect()}
    assert "late" not in types, "late event leaked past the recovered watermark"
    # hour-0 window emitted exactly once with the on-time count
    h0 = out.where("event_type = 'view' AND hour(window_start) = 0 "
                   "AND window_start = timestamp'2024-01-01 00:00:00'").collect()
    assert len(h0) == 1 and h0[0]["n"] == 5


def test_apply_in_pandas_with_state_running_totals(spark, tmp_path):
    """Custom stateful op: per-user running totals survive a checkpointed
    restart (state recovery) and converge to the batch aggregation."""
    from pyspark.sql import functions as F

    from kgspark.streaming import running_user_totals

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    half = ev.where("event_id % 2 = 0")
    rest = ev.where("event_id % 2 = 1")
    in_dir = str(tmp_path / "in")
    latest = str(tmp_path / "latest")

    def drain():
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(latest)

        q = (
            running_user_totals(
                spark.readStream.schema(ev.schema).parquet(in_dir)
            )
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    half.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    rest.coalesce(1).write.mode("append").parquet(in_dir)
    drain()  # second run recovers per-user state from the checkpoint

    # latest emitted row per user must equal the full batch aggregation
    from pyspark.sql import Window

    out = spark.read.parquet(latest)
    w = Window.partitionBy("user_id").orderBy(F.desc("n"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).where("rn = 1")
        .select("user_id", "n", "total")
    )
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    f = {r["user_id"]: (r["n"], round(r["total"], 4)) for r in final.collect()}
    b = {r["user_id"]: (r["n"], round(r["total"], 4)) for r in batch.collect()}
    assert f == b


def test_sink_anti_join_partition_prunes(spark, tmp_path):
    """The merge's existing-sink scan is partition-pruned by subj_bucket:
    only the batch's own buckets are read, so per-batch read volume tracks
    the batch, not the sink size."""
    from pyspark.sql import functions as F
    from kgspark.streaming import N_SINK_BUCKETS, _subj_bucket

    sink = str(tmp_path / "triples.parquet")
    big = spark.range(N_SINK_BUCKETS * 8).select(
        F.concat(F.lit("s"), "id").alias("subj"),
        F.lit("p").alias("pred"), F.lit("o").alias("obj"),
    ).withColumn("subj_bucket", _subj_bucket("subj"))
    big.write.partitionBy("subj_bucket").parquet(sink)

    pruned = spark.read.parquet(sink).where(F.col("subj_bucket").isin([0, 1]))
    files = [r[0] for r in
             pruned.select(F.input_file_name()).distinct().collect()]
    assert files and all(
        "subj_bucket=0/" in f or "subj_bucket=1/" in f for f in files
    ), files
    all_files = [r[0] for r in spark.read.parquet(sink)
                 .select(F.input_file_name()).distinct().collect()]
    assert len(files) < len(all_files) / 4


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Streaming exact dedup: repeated content keys inside the watermark
    horizon are dropped; state is keyed on md5(text), not the text."""
    from pyspark.sql import functions as F
    from kgspark.streaming import dedup_stream

    in_dir = tmp_path / "in"
    rows = [
        (0, "2024-01-01 10:00:00", "alpha beta"),
        (1, "2024-01-01 10:01:00", "alpha beta"),     # dup within horizon
        (2, "2024-01-01 10:02:00", "gamma delta"),
        (3, "2024-01-01 10:03:00", "alpha beta"),     # still within horizon
    ]
    spark.createDataFrame(rows, "doc_id long, ts string, text string").select(
        "doc_id", F.col("ts").cast("timestamp").alias("ts"), "text"
    ).coalesce(1).write.parquet(str(in_dir))

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .parquet(str(in_dir))
    )
    out = dedup_stream(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.sql("select * from dedup_out").collect()}
    assert got == {0, 2}
    cols = spark.sql("select * from dedup_out").columns
    assert "__content_key" not in cols


def test_stream_interval_join(spark, tmp_path):
    """Stream-stream interval join: clicks joined to same-user purchases in
    the preceding 30 minutes; out-of-window and cross-user pairs excluded."""
    from pyspark.sql import functions as F
    from kgspark.streaming import stream_interval_join

    lrows = [(1, 100, "2024-01-01 10:30:00"),
             (1, 101, "2024-01-01 12:00:00"),
             (2, 200, "2024-01-01 10:30:00")]
    rrows = [(1, 900, "2024-01-01 10:10:00"),   # within 30m of click 100
             (1, 901, "2024-01-01 09:00:00"),   # too old for either click
             (2, 902, "2024-01-01 10:29:00")]   # user 2, within window
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    spark.createDataFrame(lrows, "user_id long, click_id long, l_ts string") \
        .select("user_id", "click_id", F.col("l_ts").cast("timestamp").alias("l_ts")) \
        .coalesce(1).write.parquet(str(ldir))
    spark.createDataFrame(rrows, "user_id long, purchase_id long, r_ts string") \
        .select("user_id", "purchase_id", F.col("r_ts").cast("timestamp").alias("r_ts")) \
        .coalesce(1).write.parquet(str(rdir))

    ls = spark.readStream.schema("user_id long, click_id long, l_ts timestamp").parquet(str(ldir))
    rs = spark.readStream.schema("user_id long, purchase_id long, r_ts timestamp").parquet(str(rdir))
    out = stream_interval_join(ls, rs)
    q = (
        out.writeStream.format("memory").queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r["click_id"], r["purchase_id"])
           for r in spark.sql("select * from ssj").collect()}
    assert got == {(100, 900), (200, 902)}


def test_incremental_merges_into_legacy_unbucketed_sink(spark, tmp_path):
    """ADVICE r2 + r3 review: a sink written before subj-bucketing (no
    subj_bucket column) must not crash the first micro-batch — AND must be
    MIGRATED to the bucketed layout before the first bucketed append, never
    mixed with it: Spark's partition discovery over a mixed dir returns only
    the partitioned rows, silently dropping every legacy triple from reads
    and re-appending them as duplicates."""
    in_dir = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sink, exist_ok=True)

    # legacy-format sink: plain unpartitioned triples parquet
    _write_drop(spark, in_dir, 10, seed=3)
    start_incremental_kg(spark, in_dir, sink, str(tmp_path / "ckpt0"))
    tp = os.path.join(sink, "triples.parquet")
    legacy_rows = spark.read.parquet(tp).select("subj", "pred", "obj").collect()
    import shutil

    shutil.rmtree(tp)
    spark.createDataFrame(
        legacy_rows, "subj string, pred string, obj string"
    ).write.parquet(tp)  # no subj_bucket column, no partition dirs
    n_legacy = spark.read.parquet(tp).count()

    # same corpus again: the sink is migrated to the bucketed layout and the
    # anti-join dedups everything — TOTAL count unchanged (no silent dups)
    _write_drop(spark, in_dir, 10, seed=3)
    start_incremental_kg(spark, in_dir, sink, ckpt)
    merged = spark.read.parquet(tp)
    assert merged.count() == n_legacy
    assert "subj_bucket" in merged.columns  # fully migrated, single layout
    assert not [
        p for p in os.listdir(tp)
        if p.endswith(".parquet") and os.path.isfile(os.path.join(tp, p))
    ]  # no root-level legacy files left to be shadowed by partition dirs

    # a genuinely new corpus appends (bucketed); every legacy row still read
    _write_drop(spark, in_dir, 10, seed=42)
    start_incremental_kg(spark, in_dir, sink, ckpt)
    final = spark.read.parquet(tp)
    assert final.count() > n_legacy
    legacy_keys = {(r["subj"], r["pred"], r["obj"]) for r in legacy_rows}
    final_keys = {(r["subj"], r["pred"], r["obj"])
                  for r in final.select("subj", "pred", "obj").collect()}
    assert legacy_keys <= final_keys


def test_incremental_recovers_crashed_migration(spark, tmp_path):
    """A death between the migration's two renames leaves the sink stranded
    under .bak_migrate.*; the next micro-batch must restore it, not start a
    silent fresh sink."""
    in_dir = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    os.makedirs(sink, exist_ok=True)
    _write_drop(spark, in_dir, 10, seed=3)
    start_incremental_kg(spark, in_dir, sink, str(tmp_path / "ckpt0"))
    tp = os.path.join(sink, "triples.parquet")
    n0 = spark.read.parquet(tp).count()

    # simulate the crash window: primary renamed aside, promote never ran
    import shutil

    shutil.move(tp, os.path.join(sink, ".bak_migrate.triples.parquet"))
    os.makedirs(os.path.join(sink, ".tmp_migrate.triples.parquet"))

    _write_drop(spark, in_dir, 10, seed=42)
    start_incremental_kg(spark, in_dir, sink, str(tmp_path / "ckpt1"))
    got = spark.read.parquet(tp)
    assert got.count() > n0  # old rows restored AND new batch merged
    assert not os.path.exists(os.path.join(sink, ".bak_migrate.triples.parquet"))
    assert not os.path.exists(os.path.join(sink, ".tmp_migrate.triples.parquet"))


def test_session_window_stream_matches_batch_gaps(spark, tmp_path):
    """Streaming session_window sessionization drains a file source and
    reproduces hand-computed gap sessions; session_end = last event +
    gap (Spark's session-window semantics)."""
    from datetime import datetime as DT

    from kgspark.streaming import session_event_stats

    rows = [
        ("u1", DT(2024, 1, 1, 10, 0)),
        ("u1", DT(2024, 1, 1, 10, 10)),   # same session (gap 30m)
        ("u1", DT(2024, 1, 1, 11, 0)),    # 50m later -> new session
        ("u2", DT(2024, 1, 1, 10, 5)),
        # late sentinel far ahead so the watermark closes everything
        ("uz", DT(2024, 1, 2, 23, 0)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    in_dir = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        session_event_stats(stream, gap="30 minutes",
                            watermark="10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.session_start, r.n_events): r.session_end
           for r in spark.read.parquet(out_dir).collect()}
    # u1 session 1: 10:00-10:10 + 30m gap -> end 10:40, 2 events
    k1 = ("u1", DT(2024, 1, 1, 10, 0), 2)
    assert k1 in got and got[k1] == DT(2024, 1, 1, 10, 40)
    assert ("u1", DT(2024, 1, 1, 11, 0), 1) in got
    assert ("u2", DT(2024, 1, 1, 10, 5), 1) in got
