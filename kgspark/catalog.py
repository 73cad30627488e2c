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
    `DELETE FROM documents WHERE filename = ?`."""
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
