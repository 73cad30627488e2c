"""Table IO — format-abstracted readers/writers with explicit schemas.

The north star targets Iceberg in/out; this sandbox has no Iceberg runtime
jar, so the catalog seam is abstracted: `write_table`/`read_table` use Iceberg
(`df.writeTo(...)`) when a catalog is configured and fall back to parquet with
identical schemas otherwise. Checkpoint/resume (kgspark.checkpoint) sits on
the same seam.

Partitioning posture for the 100 TB layout:
  pages     partitioned by days(warc_ts), bucketed by url — crawl-time pruning
  documents partitioned by days(ts)
  triples   bucketed by subj — point lookups and subj-joins co-locate
  entities  bucketed by name
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-exported convenience)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

TRIPLES_SCHEMA = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("weight", DoubleType()),
        StructField("ts", TimestampType()),
        StructField("source", StringType()),
        StructField("confidence", DoubleType()),
        StructField("bidirectional", BooleanType()),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("node_id", StringType()),
        StructField("node_type", StringType()),
        StructField("concept_type", StringType()),
        StructField("properties", ArrayType(StringType())),
        StructField("actions", ArrayType(StringType())),
        StructField("importance", DoubleType()),
        StructField("size", DoubleType()),
        StructField("ts", TimestampType()),
        StructField("source", StringType()),
        StructField("confidence", DoubleType()),
        StructField("version", StringType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    return bool(spark.conf.get("spark.sql.catalog.kg", None))


def read_table(spark: SparkSession, base: str, name: str) -> DataFrame:
    """Read a named table: Iceberg identifier when a catalog exists, else
    `<base>/<name>.parquet`."""
    if iceberg_available(spark):
        return spark.read.table(f"kg.{base}.{name}")
    return spark.read.parquet(os.path.join(base, f"{name}.parquet"))


def write_table(df: DataFrame, base: str, name: str, mode: str = "overwrite",
                bucket_by: tuple[int, str] | None = None,
                partition_cols: list[str] | None = None) -> None:
    """Write a named table through the catalog seam.

    Parquet fallback: bucketing requires saveAsTable, so bucket_by downgrades
    to repartition-on-key (same co-location for this session's joins).
    partition_cols writes hive-style directory partitions — the layout that
    turns literal equality/IN filters on those columns into PartitionFilters
    (e.g. the IVF-PQ codes table partitioned by list_id, where a probe scans
    only nprobe of nlist partitions)."""
    spark = df.sparkSession
    if iceberg_available(spark):
        w = df.writeTo(f"kg.{base}.{name}")
        if partition_cols:
            from pyspark.sql.functions import col

            w = w.partitionedBy(*[col(c) for c in partition_cols])
        (w.createOrReplace() if mode == "overwrite" else w.append())
        return
    if bucket_by:
        n, col = bucket_by
        df = df.repartition(n, col)
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(os.path.join(base, f"{name}.parquet"))


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-generated testdata tables (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as an EXTERNAL bucketed parquet table — the co-located
    layout the module header prescribes for triples (bucket by subj) and
    entities (bucket by name): two tables bucketed on the same key with
    the same bucket count join WITHOUT a shuffle exchange on either side,
    and groupBy on the bucket key skips its exchange too (plan-gated in
    tests/test_plans.py). At 100 TB this converts every subj-keyed join
    of the KG's hot path from a full shuffle to a zipped per-bucket merge.

    Catalog seam: Spark-native bucketing rides the session catalog
    (saveAsTable), with the files at the explicit external `path`; when an
    Iceberg catalog is configured the same call maps to a bucket(n, col)
    partition transform (this sandbox carries no Iceberg jar — the
    parquet path is the tested one, the documented posture since r1).

    `sort_cols` adds within-bucket ordering (sorted-bucket merge joins +
    better min/max pruning), at the usual write-time sort cost.
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = (
        df.write.format("parquet").mode(mode).option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


_TMP_COMPACT = ".tmp_compact."
_BAK_COMPACT = ".bak_compact."


def compact_table(
    spark: SparkSession,
    table_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet table directory into
    ceil(total_bytes / target_bytes) files (per partition directory when
    `partition_cols` is given) — the maintenance op every long-running
    ingest needs, because streaming/incremental sinks accrete
    KB-sized files until scan planning is metadata-bound (the parquet
    analogue of Iceberg's rewrite_data_files; with an Iceberg catalog
    this becomes that procedure call on the same seam as write_table).

    Returns {"files_before", "files_after", "bytes", "compacted"};
    no-ops (compacted=False) when the table already has no more files
    than the target layout — compaction never splits big files.

    Crash safety mirrors kgspark.catalog.delete_document: the rewrite
    lands in a dot-prefixed staging dir Hadoop file discovery ignores,
    the original is renamed to a dot-prefixed backup before the staging
    dir takes its place, and the backup is dropped last — a crash at any
    point leaves either the untouched original or a restorable backup,
    which `_recover_stale_compact` (run on entry) restores. Readers
    racing the swap see the full old or full new table, never a mix.

    Scale shape: one coalesce(n) read-rewrite — no shuffle; each output
    task streams whole input files. Hidden (`_`/`.`-prefixed) files are
    neither counted nor copied.
    """
    from kgspark.catalog import _child, _fs

    fs, root = _fs(spark, table_path)
    parent = root.getParent()
    name = root.getName()
    _recover_stale_compact(spark, fs, parent, name)
    if not fs.exists(root):
        raise FileNotFoundError(table_path)

    def _visible(path) -> bool:
        p = path
        while p is not None and str(p) != str(parent):
            n = p.getName()
            if n.startswith("_") or n.startswith("."):
                return False
            p = p.getParent()
        return True

    files = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        if _visible(st.getPath()) and st.getPath().getName().endswith(
            ".parquet"
        ):
            files.append(st.getLen())
    total = sum(files)
    n_out = max(1, -(-total // max(1, target_bytes)))
    if len(files) <= n_out:
        return {"files_before": len(files), "files_after": len(files),
                "bytes": total, "compacted": False}

    df = spark.read.parquet(table_path)
    staging = _child(spark, parent, _TMP_COMPACT + name)
    fs.delete(staging, True)
    w = df.coalesce(int(n_out)).write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(str(staging))

    backup = _child(spark, parent, _BAK_COMPACT + name)
    if not fs.rename(root, backup):
        raise IOError(f"compact swap: could not back up {table_path}")
    if not fs.rename(staging, root):
        # restore — the original is intact under the backup name
        fs.rename(backup, root)
        raise IOError(f"compact swap: could not publish {table_path}")
    fs.delete(backup, True)

    after = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        if _visible(st.getPath()) and st.getPath().getName().endswith(
            ".parquet"
        ):
            after.append(st.getLen())
    return {"files_before": len(files), "files_after": len(after),
            "bytes": total, "compacted": True}


def _recover_stale_compact(spark, fs, parent, name: str) -> None:
    """Entry-time recovery of a crashed prior compact of `name`: restore
    the backup when the primary vanished mid-swap, then drop staging."""
    from kgspark.catalog import _child

    bak = _child(spark, parent, _BAK_COMPACT + name)
    primary = _child(spark, parent, name)
    if fs.exists(bak):
        if not fs.exists(primary):
            if not fs.rename(bak, primary):
                raise IOError(
                    f"compact stale-recovery restore of {name} failed"
                )
        else:
            fs.delete(bak, True)
    tmp = _child(spark, parent, _TMP_COMPACT + name)
    fs.delete(tmp, True)


def append_check(df: DataFrame, spark: SparkSession, table_path: str) -> dict:
    """Pre-flight schema validation for an append: compare `df`'s schema
    to the parquet table at `table_path` and report, instead of letting
    the writer throw mid-job (or worse, silently NULL-fill a renamed
    column). Returns {"ok", "missing", "extra", "type_changed"} where
    missing = table columns absent from df (would write NULLs),
    extra = df columns the table lacks (readers pinning the table schema
    will not see them), type_changed = same name, different Spark type.
    `ok` is True only when all three lists are empty. Driver-side footer
    read only — no data scan."""
    existing = spark.read.parquet(table_path).schema
    new = {f.name: f.dataType for f in df.schema.fields}
    old = {f.name: f.dataType for f in existing.fields}
    missing = sorted(set(old) - set(new))
    extra = sorted(set(new) - set(old))
    changed = sorted(
        n for n in set(old) & set(new) if old[n] != new[n]
    )
    return {
        "ok": not (missing or extra or changed),
        "missing": missing,
        "extra": extra,
        "type_changed": changed,
    }


def zorder_key(df: DataFrame, col_a: str, col_b: str,
               bits: int = 16, out: str = "__z") -> DataFrame:
    """Morton / Z-order key over two non-negative integer columns: each
    column is affinely bucketed to [0, 2^bits) with EXACT integer
    arithmetic — bucket = ((x - min) * 2^bits) div (max - min + 1) — and
    the bucket bits are interleaved (a on odd positions). Rows close in
    the (a, b) plane land close on the Z-curve, so range-partitioning +
    sorting by the key clusters BOTH dimensions into the same files and
    parquet min/max row-group stats prune either predicate — the
    multi-dimensional data-skipping layout Delta/Iceberg OPTIMIZE ZORDER
    provides, as plain DataFrame arithmetic. Beyond-reference scope (the
    reference persists one pickle, knowledge_graph_builder.py:83-92).

    Column min/max ride in as a 1-row broadcast (the documented
    scalar-broadcast posture); everything else is a map-only integer
    expression tree (oracle-replicable: div truncates toward zero on
    both engines, inputs are non-negative).
    """
    mm = df.agg(
        F.min(F.col(col_a).cast("long")).alias("__mna"),
        F.max(F.col(col_a).cast("long")).alias("__mxa"),
        F.min(F.col(col_b).cast("long")).alias("__mnb"),
        F.max(F.col(col_b).cast("long")).alias("__mxb"),
    )
    scale = 1 << bits
    j = df.crossJoin(F.broadcast(mm))
    ba = F.expr(
        f"((cast({col_a} as bigint) - __mna) * {scale}L)"
        f" div (__mxa - __mna + 1L)"
    )
    bb = F.expr(
        f"((cast({col_b} as bigint) - __mnb) * {scale}L)"
        f" div (__mxb - __mnb + 1L)"
    )
    j = j.withColumn("__ba", ba).withColumn("__bb", bb)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(F.col("__ba"), i).bitwiseAND(F.lit(1)),
                          2 * i + 1)
            + F.shiftleft(F.shiftright(F.col("__bb"), i).bitwiseAND(F.lit(1)),
                          2 * i)
        )
    return j.withColumn(out, z.cast("long")).drop(
        "__mna", "__mxa", "__mnb", "__mxb", "__ba", "__bb"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write parquet clustered on the Z-curve: repartitionByRange on the
    Morton key (contiguous curve segments per file) + sortWithinPartitions
    so row groups inside each file stay tight too. One exchange total;
    the key column is dropped from the persisted schema."""
    keyed = zorder_key(df, col_a, col_b, bits=bits)
    (
        keyed.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def merge_table(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> dict:
    """MERGE/upsert into a parquet table — the Delta/Iceberg `MERGE INTO`
    shape on the plain-parquet seam: rows in `updates` REPLACE target
    rows with equal `key_cols` (last-writer-wins at the statement level),
    unmatched update rows INSERT, and when `delete_col` names a boolean
    column, its true rows DELETE their keys instead. Pipeline use: the
    incremental KG re-crawl — re-extracted pages replace their old
    triples by (subj, pred, source), retracted pages delete.

    Plan: target LEFT-ANTI-joins the (broadcastable, batch-sized) update
    keyset — one hash join, target never globally shuffled — then unions
    surviving target rows with the non-delete updates. Duplicate keys
    INSIDE one update batch are rejected (ambiguous MERGE per the SQL
    spec) rather than silently resolved.

    Crash safety is compact_table's staging/backup swap, verbatim:
    readers see the full old or full new table, never a mix; a crashed
    merge is recovered on the next entry.
    """
    from kgspark.catalog import _child, _fs

    if not key_cols:
        raise ValueError("merge_table: key_cols must be non-empty")
    dup = (
        updates.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"merge_table: duplicate keys inside the update batch: "
            f"{dict(zip(key_cols, [dup[0][k] for k in key_cols]))}"
        )
    fs, root = _fs(spark, table_path)
    parent = root.getParent()
    name = root.getName()
    _recover_stale_compact(spark, fs, parent, name)
    if not fs.exists(root):
        raise FileNotFoundError(table_path)
    target = spark.read.parquet(table_path)
    data_cols = [c for c in updates.columns if c != delete_col]
    if set(target.columns) != set(data_cols):
        raise ValueError(
            f"merge_table: update schema {sorted(data_cols)} != target "
            f"schema {sorted(target.columns)}"
        )
    keyset = updates.select(*key_cols)
    kept = target.join(F.broadcast(keyset), key_cols, "left_anti")
    ins = updates
    if delete_col is not None:
        ins = ins.where(~F.coalesce(F.col(delete_col), F.lit(False)))
    merged = kept.unionByName(ins.select(*target.columns))

    staging = _child(spark, parent, _TMP_COMPACT + name)
    fs.delete(staging, True)
    merged.write.mode("overwrite").parquet(str(staging))
    backup = _child(spark, parent, _BAK_COMPACT + name)
    if not fs.rename(root, backup):
        raise IOError(f"merge swap: could not back up {table_path}")
    if not fs.rename(staging, root):
        fs.rename(backup, root)
        raise IOError(f"merge swap: could not publish {table_path}")
    fs.delete(backup, True)
    n_after = spark.read.parquet(table_path).count()
    return {"rows_after": n_after, "merged": True}


# --------------------------------------------------------------------------
# snapshot log — Iceberg-style versioned reads over plain parquet
# --------------------------------------------------------------------------

_MANIFEST_DIR = "_manifests"


def snapshot_write(
    df: DataFrame,
    spark: SparkSession,
    table_dir: str,
    mode: str = "append",
) -> int:
    """Versioned snapshot write — the miniature Iceberg commit protocol
    over plain parquet (the runtime-jar-free slice of the north star's
    Iceberg posture; see module docstring): data files land first under
    `data/v{N}/`, then the version is PUBLISHED by renaming a hidden
    temp manifest to `_manifests/v{N}.json` listing every live data
    directory for version N (`append` = previous version's dirs + the
    new one; `overwrite` = the new one only). Readers trust only
    manifests, so a crash before publish leaves invisible orphan data
    (re-writable), never a torn table — the same
    write-then-atomic-rename contract as compact_table/merge_table.
    Returns the published version number (1-based).
    """
    import json

    from kgspark.catalog import _child, _fs

    if mode not in ("append", "overwrite"):
        raise ValueError("snapshot_write: mode must be append|overwrite")
    fs, root = _fs(spark, table_dir)
    fs.mkdirs(_child(spark, root, _MANIFEST_DIR))
    versions = snapshot_versions(spark, table_dir)
    last = versions[-1] if versions else 0
    n = last + 1
    data_rel = f"data/v{n}"
    df.write.mode("overwrite").parquet(
        os.path.join(table_dir, data_rel))
    if mode == "append" and last > 0:
        prev = _read_manifest(spark, table_dir, last)
        dirs = prev["dirs"] + [data_rel]
    else:
        dirs = [data_rel]
    payload = json.dumps({"version": n, "mode": mode, "dirs": dirs})
    mdir = _child(spark, root, _MANIFEST_DIR)
    tmp = _child(spark, mdir, f".tmp_v{n}.json")
    out = fs.create(tmp, True)
    out.write(bytearray(payload.encode("utf-8")))
    out.close()
    final = _child(spark, mdir, f"v{n}.json")
    if not fs.rename(tmp, final):
        fs.delete(tmp, True)
        raise IOError(f"snapshot_write: publish of v{n} lost a race")
    return n


def _read_manifest(spark: SparkSession, table_dir: str, version: int) -> dict:
    import json

    from kgspark.catalog import _child, _fs

    fs, root = _fs(spark, table_dir)
    p = _child(spark, _child(spark, root, _MANIFEST_DIR),
               f"v{version}.json")
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def snapshot_versions(spark: SparkSession, table_dir: str) -> list[int]:
    """Published versions, ascending (hidden temp manifests ignored)."""
    from kgspark.catalog import _child, _fs

    fs, root = _fs(spark, table_dir)
    mdir = _child(spark, root, _MANIFEST_DIR)
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
) -> DataFrame:
    """Time-travel read: the table AS OF `version` (default: latest).
    Only manifest-listed data directories are scanned — orphans from
    crashed writes never surface."""
    versions = snapshot_versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(
            f"read_snapshot: no published versions under {table_dir}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"read_snapshot: version {version} not published "
            f"(have {versions})")
    man = _read_manifest(spark, table_dir, version)
    paths = [os.path.join(table_dir, d) for d in man["dirs"]]
    return spark.read.parquet(*paths)


def parquet_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file parquet FOOTER census of a table directory: (file,
    n_rows, n_row_groups, n_cols, size_bytes, min_rg_rows, max_rg_rows,
    error) — the physical-layout companion to skew.partition_report
    (which profiles a DataFrame's logical partitions): footers answer
    the questions a 100 TB table's operator actually asks — are files
    tiny (compact_table work), are row groups too small for pruning,
    is one file a straggler. Footers only: a parquet footer is a few
    KB regardless of file size, so the census costs O(files), never a
    data scan.

    Listing goes through the Hadoop FS API (file://, hdfs://, s3a://
    alike — the catalog.py posture); footer reads run DISTRIBUTED in
    an Arrow-batched mapInPandas over the file list, with pyarrow
    opening each file directly (task-side plain paths for file:// —
    the warc-writer posture; remote FS URIs would thread through
    pyarrow's filesystem layer the same way). Per-file errors land in
    the error column, never fail the census.
    """
    from kgspark.catalog import _fs

    fs, root = _fs(spark, path)
    if not fs.exists(root):
        raise FileNotFoundError(path)
    files = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            files.append((p, int(st.getLen())))
    if not files:
        return spark.createDataFrame(
            [],
            "file string, n_rows long, n_row_groups long, n_cols long, "
            "size_bytes long, min_rg_rows long, max_rg_rows long, "
            "error string",
        )
    fdf = spark.createDataFrame(
        files, "file string, size_bytes long"
    ).repartition(min(len(files), 32))

    def footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        cols = ["file", "n_rows", "n_row_groups", "n_cols",
                "size_bytes", "min_rg_rows", "max_rg_rows", "error"]
        for pdf in batches:
            rows = []
            for p, sz in zip(pdf["file"], pdf["size_bytes"]):
                # Hadoop renders local URIs as file:/abs/path — strip
                # only the scheme, keep the absolute path
                local = p[5:] if p.startswith("file:") else p
                rec = {"file": p, "size_bytes": int(sz)}
                try:
                    md = pq.ParquetFile(local).metadata
                    rg = [md.row_group(i).num_rows
                          for i in range(md.num_row_groups)]
                    rec.update({
                        "n_rows": md.num_rows,
                        "n_row_groups": md.num_row_groups,
                        "n_cols": md.num_columns,
                        "min_rg_rows": min(rg) if rg else 0,
                        "max_rg_rows": max(rg) if rg else 0,
                        "error": None,
                    })
                except Exception as e:
                    rec.update({
                        "n_rows": None, "n_row_groups": None,
                        "n_cols": None, "min_rg_rows": None,
                        "max_rg_rows": None,
                        "error": f"{type(e).__name__}: {e}",
                    })
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return fdf.mapInPandas(
        footers,
        "file string, n_rows long, n_row_groups long, n_cols long, "
        "size_bytes long, min_rg_rows long, max_rg_rows long, "
        "error string",
    )
