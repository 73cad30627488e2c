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

    Parquet fallback: rewrite-without-matching-rows via a staging dir +
    atomic rename (same observable semantics as an Iceberg DELETE, minus
    snapshot history)."""
    df = spark.read.parquet(table_path)
    n_before = df.count()
    kept = df.where(F.col("filename") != filename)
    tmp = table_path + ".tmp_delete"
    kept.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(table_path)
    os.replace(tmp, table_path)
    return n_before - spark.read.parquet(table_path).count()
