"""Document-catalog surface (ref S12/S13: GET /files + DELETE /files/<f>,
/root/reference/app.py:108-146, 173-183).

The reference lists processed JSON files with validity flags and deletes them
one at a time. Here the `documents` table IS the catalog: listing is a
metadata projection, deletion is a predicate rewrite (the parquet-seam
analogue of an Iceberg row-level DELETE — with an Iceberg catalog,
`delete_document` becomes `DELETE FROM documents WHERE filename = ?`)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CATALOG_BUCKETS = 32  # filename-hash partitions of the documents table


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


def delete_document(
    spark: SparkSession, table_path: str, filename: str
) -> int:
    """Row-level delete by filename; returns rows removed.

    Parquet fallback: rewrite-without-matching-rows via a staging dir. The
    swap renames the original aside BEFORE promoting the staging dir, so no
    crash point loses data: before the first rename nothing changed; between
    the renames the `.bak` dir still holds the full original (recoverable);
    after the promote only the backup cleanup remains. Rows with NULL
    filename are preserved (a bare `!=` predicate would silently drop them).
    With an Iceberg catalog this whole function is
    `DELETE FROM documents WHERE filename = ?`.

    When the table was written by `write_documents_catalog` (hash-partitioned
    on filename), only the one partition the filename hashes into is read and
    rewritten — at corpus scale that is 1/N_CATALOG_BUCKETS of the table
    instead of all of it. Unpartitioned tables fall back to the full-table
    swap."""
    part_dirs = [
        d for d in os.listdir(table_path) if d.startswith("__fbucket=")
    ] if os.path.isdir(table_path) else []
    if part_dirs:
        import zlib

        b = zlib.crc32(filename.encode("utf-8")) % N_CATALOG_BUCKETS
        pdir = os.path.join(table_path, f"__fbucket={b}")
        if not os.path.isdir(pdir):
            return 0
        df = spark.read.parquet(pdir)
        n_before = df.count()
        kept = df.where(
            F.col("filename").isNull() | (F.col("filename") != filename)
        )
        tmp, bak = pdir + ".tmp_delete", pdir + ".bak_delete"
        kept.write.mode("overwrite").parquet(tmp)
        os.rename(pdir, bak)
        os.replace(tmp, pdir)
        shutil.rmtree(bak)
        return n_before - spark.read.parquet(pdir).count()

    df = spark.read.parquet(table_path)
    n_before = df.count()
    kept = df.where(
        F.col("filename").isNull() | (F.col("filename") != filename)
    )
    tmp = table_path + ".tmp_delete"
    bak = table_path + ".bak_delete"
    kept.write.mode("overwrite").parquet(tmp)
    os.rename(table_path, bak)
    os.replace(tmp, table_path)
    shutil.rmtree(bak)
    return n_before - spark.read.parquet(table_path).count()
