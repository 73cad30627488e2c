"""Envelope validation + JSON repair (ref P5/P6: json_validator.py).

The reference validates every processed document against a fixed JSON-schema
envelope (ref /root/reference/json_validator.py:9-37) and repairs problem
bytes before writing (fix_json_content, :113-140). Spark-side: a typed
`from_json` parse (nulls on mismatch) plus explicit boolean checks produce an
`is_valid` column instead of raising, and the repair is the byte-cleaner UDF
over the serialized form — filter-don't-fail semantics for 10^12-doc runs."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

# ref json_validator.py:9-30 — {filename, file_type, timestamp?, data{content}}
ENVELOPE_SCHEMA = StructType(
    [
        StructField("filename", StringType()),
        StructField("file_type", StringType()),
        StructField("timestamp", StringType()),
        StructField(
            "data", StructType([StructField("content", StringType())])
        ),
    ]
)

ALLOWED_FILE_TYPES = [  # ref knowledgeGraph.py:85-97 extension dispatch
    "txt", "rtf", "csv", "xls", "xlsx", "doc", "docx", "pdf", "png", "jpg",
    "jpeg",
]


def parse_envelopes(df: DataFrame, json_col: str = "raw_json") -> DataFrame:
    """raw JSON strings -> typed envelope columns + is_valid flag.

    is_valid mirrors the reference's checks (json_validator.py:60-90):
    parseable, filename+file_type present, file_type whitelisted,
    content present and non-empty."""
    parsed = df.withColumn("env", F.from_json(F.col(json_col), ENVELOPE_SCHEMA))
    e = F.col("env")
    is_valid = (
        e.isNotNull()
        & e["filename"].isNotNull()
        & e["file_type"].isNotNull()
        & F.lower(e["file_type"]).isin(*ALLOWED_FILE_TYPES)
        & e["data"].isNotNull()
        & e["data"]["content"].isNotNull()
        & (F.length(e["data"]["content"]) > 0)
    )
    return parsed.select(
        e["filename"].alias("filename"),
        e["file_type"].alias("file_type"),
        e["timestamp"].cast("timestamp").alias("ts"),
        e["data"]["content"].alias("content"),
        F.coalesce(is_valid, F.lit(False)).alias("is_valid"),
    )


def envelope_json_udf():
    """Serialize envelope rows EXACTLY the way the reference sink does
    (ref knowledgeGraph.py:113-121): `json.dumps(..., indent=4,
    ensure_ascii=False, default=str)` — byte-compatible envelope JSON, which
    Spark's to_json (compact, ascii-escaped) is not. Runs as an Arrow UDF
    over a struct column."""
    import json as _json

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _udf(filename: pd.Series, file_type: pd.Series, content: pd.Series,
             timestamp: pd.Series) -> pd.Series:
        def ser(fn, ft, c, ts):
            env = {
                "filename": fn,
                "file_type": ft,
                "data": {"content": c},
                "timestamp": ts if ts is not None else None,
            }
            return _json.dumps(env, indent=4, ensure_ascii=False, default=str)

        return pd.Series(
            [ser(*args) for args in zip(filename, file_type, content, timestamp)]
        )

    return _udf


def write_envelopes(df: DataFrame, out_dir: str) -> None:
    """S8 sink: reference-format JSON envelopes, one string per document,
    written distributed as a single-column parquet table (multi-line JSON is
    not line-safe in a text sink; parquet preserves each envelope's bytes
    exactly and keeps the write parallel)."""
    # pipeline `documents` tables carry no file_type (the web corpus is all
    # html->text); derive it from the filename extension, defaulting to txt
    ft = (
        F.col("file_type")
        if "file_type" in df.columns
        else F.when(
            F.col("filename").rlike(r"\.[A-Za-z0-9]+$"),
            F.lower(F.regexp_extract("filename", r"\.([A-Za-z0-9]+)$", 1)),
        ).otherwise(F.lit("txt"))
    )
    env = df.select(
        envelope_json_udf()(
            F.col("filename"), ft, F.col("content"),
            F.col("ts").cast("string"),
        ).alias("envelope_json")
    )
    env.write.mode("overwrite").parquet(out_dir)


def fix_json_content(df: DataFrame, json_col: str = "raw_json") -> DataFrame:
    """Repair problem bytes in raw JSON the way the reference does
    (ref json_validator.py:113-140): CRLF -> LF, NUL/control strip — then the
    string re-parses cleanly. Byte-exactness via the shared cleaner UDF."""
    from kgspark.textnorm import clean_bytes_udf

    crlf_fixed = F.regexp_replace(F.col(json_col), "\r\n", "\n")
    return df.withColumn(json_col, clean_bytes_udf(crlf_fixed))
