"""Structured Streaming surface: incremental KG construction.

The reference has no streaming operators — its closest analogue is the
recompute-the-world-per-upload loop (ref /root/reference/app.py:100-102;
SURVEY.md §2.7). This module is the designed-for seam: the same extraction
DAG, fed by a file-source stream of `pages` parquet, merged incrementally into
the triples store by `foreachBatch` — upload-triggered rebuilds become
micro-batch appends with dedup-on-merge instead of a full rebuild.

Scale posture: each micro-batch only touches its own new pages (extraction is
embarrassingly parallel); the merge dedups against the sink with a left-anti
join on (subj, pred, obj) — at Iceberg scale this becomes MERGE INTO on the
bucketed-by-subj triples table. Watermarks/windowed state are not needed:
triple emission is per-document, so there is no cross-event state to expire
(documented deviation: none — the reference defines no late-data semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.session import materialize

from kgspark.edges import concept_edges
from kgspark.io_tables import PAGES_SCHEMA
from kgspark.openie import extract_concepts_udf
from kgspark.pipeline import pages_to_documents


def pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of pages parquet drops (one file per crawl drop)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def batch_triples(pages: DataFrame) -> DataFrame:
    """One micro-batch of pages -> concept triples (same DAG as the batch
    pipeline, minus topics — topic models don't update per-micro-batch)."""
    docs = pages_to_documents(pages)
    concepts = docs.select(
        "ts", "source", "confidence",
        F.explode(extract_concepts_udf(F.col("content"))).alias("c"),
    ).select(
        "ts", "source", "confidence",
        F.col("c.name").alias("name"),
        F.col("c.parents").alias("parents"),
        F.col("c.children").alias("children"),
        F.col("c.related").alias("related"),
    )
    return concept_edges(concepts)


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time tumbling-window aggregation — the standard
    late-data-tolerant streaming shape: events later than `watermark` behind
    the max seen event time are dropped, window state is evicted once the
    watermark passes the window end (bounded state at any stream length).

    events_stream: streaming DF with (ts timestamp, event_type string,
    value double). Output: (window_start, window_end, event_type, n, total).
    """
    # watermarks demand TIMESTAMP (with timezone); parquet NTZ columns cast
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total",
        )
    )


def dedup_stream(
    docs_stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    text_col: str | None = "text",
) -> DataFrame:
    """Streaming exact dedup with bounded state: emit each document once per
    content key, dropping re-crawls that arrive within the watermark horizon.

    Uses `dropDuplicatesWithinWatermark` — state for a key is evicted once
    the watermark passes its event time, so state size is bounded by the
    stream's rate x watermark (an unbounded dropDuplicates would grow state
    forever at crawl scale). Keys default to md5(text) so the state store
    holds 32-char digests, never the documents themselves — same hash-keyed
    posture as the batch dedup family (kgspark.dedup.exact_duplicates)."""
    s = docs_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if key_cols is None:
        s = s.withColumn("__content_key", F.md5(F.col(text_col)))
        key_cols = ["__content_key"]
    return (
        s.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
        .drop("__content_key")
    )


def stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left event matched to
    right events of the same key within (left_ts - max_delay, left_ts].

    Both sides carry watermarks and the join condition time-bounds the match
    window, so Spark can evict buffered state once the watermark passes a
    row's interval — the REQUIRED shape for stream-stream joins (an
    unbounded-condition join would buffer both streams forever)."""
    l = left_stream.withColumn(left_ts, F.col(left_ts).cast("timestamp")) \
        .withWatermark(left_ts, watermark)
    r = right_stream.withColumn(right_ts, F.col(right_ts).cast("timestamp")) \
        .withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").drop(r[key])


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (event count, value total) maintained in arbitrary user state — the
    escape hatch for aggregations Spark's built-in windowed state can't
    express. State lives in the checkpoint: a restarted query resumes its
    counters exactly (tested across availableNow drains).

    Emits one updated (user_id, n, total) row per user per micro-batch."""
    import pandas as pd  # noqa: F811  (worker-side import)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


N_SINK_BUCKETS = 32  # subj-hash partitions of the triples sink


def _sink_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through Hadoop's FileSystem API, so HDFS/S3 sinks
    resolve correctly — driver-local os.path.exists only sees local disk."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def _migration_paths(spark: SparkSession, path: str):
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    parent, name = hpath.getParent(), hpath.getName()
    tmp = jvm.org.apache.hadoop.fs.Path(parent, ".tmp_migrate." + name)
    bak = jvm.org.apache.hadoop.fs.Path(parent, ".bak_migrate." + name)
    return fs, hpath, tmp, bak


def _recover_migration(spark: SparkSession, path: str) -> None:
    """Heal a crashed `_migrate_legacy_sink`: a death between the two swap
    renames strands the whole sink under .bak_migrate.* while the primary
    path is missing — without this restore the next micro-batch would see
    no sink and silently start a fresh empty one (catalog.py's
    _recover_stale plays the identical role for its .bak_delete.* swap).
    Runs once per merge; cost is one exists() probe."""
    fs, hpath, tmp, bak = _migration_paths(spark, path)
    if fs.exists(bak):
        if not fs.exists(hpath):
            if not fs.rename(bak, hpath):
                raise IOError(
                    f"migration crash-recovery restore of {path} failed; "
                    "original preserved under the backup path"
                )
        else:
            fs.delete(bak, True)
    if fs.exists(tmp):
        fs.delete(tmp, True)  # incomplete rewrite; the migration re-runs


def _migrate_legacy_sink(spark: SparkSession, path: str) -> None:
    """One-time rewrite of a pre-bucketing (unpartitioned) triples sink into
    the subj_bucket layout. MIXING the layouts is not an option: once a
    bucketed append lands next to root-level legacy files, Spark's partition
    discovery returns ONLY the partitioned rows — the legacy triples vanish
    from every read and get re-appended as duplicates. So the whole legacy
    sink is rewritten bucketed BEFORE the first bucketed append, via the
    same rename-aside swap the catalog uses; a crash between the renames
    leaves the original intact under the backup path and
    `_recover_migration` restores it on the next batch."""
    fs, hpath, tmp, bak = _migration_paths(spark, path)
    legacy = spark.read.parquet(path).withColumn(
        "subj_bucket", _subj_bucket("subj")
    )
    legacy.write.mode("overwrite").partitionBy("subj_bucket").parquet(
        tmp.toString()
    )
    if not fs.rename(hpath, bak):
        fs.delete(tmp, True)
        raise IOError(f"legacy-sink migration: rename {path} aside failed")
    if not fs.rename(tmp, hpath):
        if not fs.rename(bak, hpath):
            raise IOError(
                f"legacy-sink migration: promote AND rollback failed for "
                f"{path}; original preserved under {bak.toString()}"
            )
        fs.delete(tmp, True)
        raise IOError(f"legacy-sink migration: promote failed, rolled back")
    fs.delete(bak, True)


def _subj_bucket(col_name: str):
    return F.pmod(F.crc32(F.col(col_name).cast("string")), F.lit(N_SINK_BUCKETS)).cast("int")


def start_incremental_kg(
    spark: SparkSession,
    input_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream pages -> triples with dedup-on-merge into a parquet sink.

    The sink is hash-partitioned on subj (N_SINK_BUCKETS dirs); each
    micro-batch anti-joins only against the partitions its own subjects hash
    into, so per-batch read volume tracks the batch's key spread, not the
    total sink size. (With an Iceberg catalog this becomes MERGE INTO on a
    bucketed table; the pruning predicate plays the same role here.)

    available_now=True drains everything currently in input_dir then stops
    (test/batch-catchup mode); False runs continuously.
    """
    triples_path = os.path.join(sink_dir, "triples.parquet")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        _recover_migration(ss, triples_path)
        new = (
            batch_triples(batch_df)
            .dropDuplicates(["subj", "pred", "obj"])
            .withColumn("subj_bucket", _subj_bucket("subj"))
        )
        new = materialize(new)  # referenced by bucket-probe + anti-join + write
        if _sink_exists(ss, triples_path):
            existing = ss.read.parquet(triples_path)
            if "subj_bucket" not in existing.columns:
                # legacy unpartitioned sink (pre-bucketing format): migrate
                # it to the bucketed layout NOW — appending bucketed dirs
                # next to root-level files would make partition discovery
                # drop every legacy row (silent data loss + re-append dups)
                _migrate_legacy_sink(ss, triples_path)
                existing = ss.read.parquet(triples_path)
            buckets = [r[0] for r in new.select("subj_bucket").distinct().collect()]
            existing = existing.where(
                F.col("subj_bucket").isin(buckets)  # partition-pruned scan
            )
            new = new.join(
                existing.select("subj", "pred", "obj"),
                ["subj", "pred", "obj"],
                "left_anti",
            )
            # materialize BEFORE append so the anti-join isn't re-read while
            # its own output directory is being written
            new = materialize(new)
        new.write.mode("append").partitionBy("subj_bucket").parquet(triples_path)

    writer = (
        pages_stream(spark, input_dir)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def session_event_stats(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization via Spark's native session window (the
    dynamic-gap analogue of windowed_event_counts): per user, events
    closer than `gap` merge into one session; a session closes — and
    its row becomes emittable in append mode — once the watermark
    passes gap beyond its last event. This is the STREAMING twin of
    the batch lag/gap sessionizer (kgspark.relops sessionization):
    same session boundaries, but with bounded state and incremental
    emission instead of a full-table window pass.

    Output: (user_id, session_start, session_end, n_events). State per
    open session only — evicted at close, so state size tracks ACTIVE
    users x 1, not history.
    """
    s = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        s.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
