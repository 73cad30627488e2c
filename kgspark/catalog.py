"""Document-catalog surface (ref S12/S13: GET /files + DELETE /files/<f>,
/root/reference/app.py:108-146, 173-183).

The reference lists processed JSON files with validity flags and deletes them
one at a time. Here the `documents` table IS the catalog: listing is a
metadata projection, deletion is a predicate rewrite (the parquet-seam
analogue of an Iceberg row-level DELETE — with an Iceberg catalog,
`delete_document` becomes `DELETE FROM documents WHERE filename = ?`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CATALOG_BUCKETS = 32  # filename-hash partitions of the documents table

# staging/backup names are DOT-PREFIXED so Spark/Hadoop file discovery
# ignores them: a concurrent (or post-crash) full-table read of table_path
# never sees a half-written staging dir as data or a backup as a duplicate
# partition. (Hadoop's default PathFilter hides '_'- and '.'-prefixed paths.)
_TMP_PREFIX = ".tmp_delete."
_BAK_PREFIX = ".bak_delete."


def _filename_bucket(col_name: str = "filename"):
    return F.pmod(F.crc32(F.coalesce(F.col(col_name), F.lit(""))),
                  F.lit(N_CATALOG_BUCKETS)).cast("int")


def write_documents_catalog(df: DataFrame, table_path: str,
                            mode: str = "overwrite") -> None:
    """Write the documents table hash-partitioned by filename so row-level
    deletes rewrite ONE partition, not the corpus (the parquet analogue of
    an Iceberg bucketed table)."""
    df.withColumn("__fbucket", _filename_bucket()).write.mode(
        mode
    ).partitionBy("__fbucket").parquet(table_path)


def list_documents(documents: DataFrame) -> DataFrame:
    """Catalog projection: one row per document with size + validity flag
    (ref checks JSON validity per file, app.py:127-139; here a document is
    valid when it has non-empty content)."""
    return documents.select(
        "filename",
        F.length("content").cast("long").alias("n_chars"),
        "ts",
        "source",
        (F.col("content").isNotNull() & (F.length("content") > 0)).alias("is_valid"),
    )


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) through Hadoop's API — works on file://, hdfs://
    and s3a:// URIs alike, where driver-local os.listdir/os.rename only see
    local disk."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def _child(spark: SparkSession, parent, name: str):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(parent, name)


def _recover_stale(spark: SparkSession, fs, root) -> None:
    """Clean up leftovers of a crashed prior delete under `root`.

    A crash can leave '.bak_delete.<name>' (the full pre-delete original) and
    '.tmp_delete.<name>' (the complete or partial rewrite). Recovery restores
    the ORIGINAL when the primary is missing — i.e. an interrupted delete
    never happened, callers simply re-run it — and drops every staging dir.
    No crash point loses data: the backup is only removed once the primary
    exists again."""
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(_BAK_PREFIX):
            primary = _child(spark, root, name[len(_BAK_PREFIX):])
            if not fs.exists(primary):
                # restore the original; Hadoop rename signals failure by
                # returning false — proceeding without the primary would
                # rewrite a partial table, so abort loudly instead
                if not fs.rename(st.getPath(), primary):
                    raise IOError(
                        f"stale-recovery restore {name} failed; original "
                        "preserved under the backup path"
                    )
            else:
                fs.delete(st.getPath(), True)
        elif name.startswith(_TMP_PREFIX):
            fs.delete(st.getPath(), True)


def delete_document(
    spark: SparkSession, table_path: str, filename: str
) -> int:
    """Row-level delete by filename; returns rows removed.

    Parquet fallback: rewrite-without-matching-rows via a hidden staging dir.
    The swap renames the original aside BEFORE promoting the staging dir, so
    no crash point loses data: before the first rename nothing changed;
    between the renames the hidden '.bak_delete.*' dir still holds the full
    original (auto-restored by the next call's stale-recovery pass); after
    the promote only the backup cleanup remains. Staging and backup live as
    DOT-PREFIXED children, invisible to partition discovery, so concurrent
    full-table reads during the swap window never double-count or misinfer
    the __fbucket partition type. All file ops go through Hadoop's
    FileSystem API, so the same path works on hdfs:// and s3a:// URIs.
    Rows with NULL filename are preserved (a bare `!=` predicate would
    silently drop them). With an Iceberg catalog this whole function is
    `DELETE FROM documents WHERE filename = ?`.

    When the table was written by `write_documents_catalog` (hash-partitioned
    on filename), only the one partition the filename hashes into is read and
    rewritten — at corpus scale that is 1/N_CATALOG_BUCKETS of the table
    instead of all of it. Unpartitioned tables fall back to the full-table
    swap."""
    fs, root = _fs(spark, table_path)
    _recover_stale(spark, fs, root)
    # a crashed UNPARTITIONED swap stages as siblings of the table dir
    parent = root.getParent()
    if parent is not None and fs.exists(parent):
        bak = _child(spark, parent, _BAK_PREFIX + root.getName())
        tmp = _child(spark, parent, _TMP_PREFIX + root.getName())
        if fs.exists(bak):
            if not fs.exists(root):
                if not fs.rename(bak, root):
                    raise IOError(
                        f"crash-recovery restore of {table_path} failed; "
                        "original preserved under the backup path"
                    )
            else:
                fs.delete(bak, True)
        if fs.exists(tmp):
            fs.delete(tmp, True)
    part_names = (
        [
            st.getPath().getName()
            for st in fs.listStatus(root)
            if st.isDirectory() and st.getPath().getName().startswith("__fbucket=")
        ]
        if fs.exists(root) and fs.getFileStatus(root).isDirectory()
        else []
    )

    def swap_rewrite(target_path: str, staging_parent, name: str) -> int:
        df = spark.read.parquet(target_path)
        n_before = df.count()
        kept = df.where(
            F.col("filename").isNull() | (F.col("filename") != filename)
        )
        tmp = _child(spark, staging_parent, _TMP_PREFIX + name)
        bak = _child(spark, staging_parent, _BAK_PREFIX + name)
        target = _child(spark, staging_parent, name)
        kept.write.mode("overwrite").parquet(tmp.toString())
        # Hadoop rename reports failure by RETURNING FALSE (unlike
        # os.replace, which raises) — and renaming onto an existing dir
        # nests the source INSIDE it, so an unchecked failure here would
        # silently corrupt the table. Abort loudly instead.
        if not fs.rename(target, bak):
            fs.delete(tmp, True)
            raise IOError(f"rename {target} -> {bak} failed; delete aborted")
        if not fs.rename(tmp, target):
            if not fs.rename(bak, target):  # roll the original back
                raise IOError(
                    f"promote failed AND rollback {bak} -> {target} failed; "
                    "original preserved under the backup path"
                )
            fs.delete(tmp, True)
            raise IOError(f"rename {tmp} -> {target} failed; delete rolled back")
        fs.delete(bak, True)
        return n_before - spark.read.parquet(target.toString()).count()

    if part_names:
        import zlib

        b = zlib.crc32(filename.encode("utf-8")) % N_CATALOG_BUCKETS
        pname = f"__fbucket={b}"
        if pname not in part_names:
            return 0
        return swap_rewrite(f"{table_path}/{pname}", root, pname)

    # unpartitioned: swap the whole table dir, staging as siblings of it
    return swap_rewrite(table_path, parent, root.getName())
