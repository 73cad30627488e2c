"""Entity + relation extraction API surface (ref E3:
extract_entities_relations, /root/reference/knowledge_graph_builder.py:104-196).

Dead code in the reference's build path (never called by build_graph —
SURVEY.md §7.4.6) but part of its public API, so implemented as API surface
here too. The reference unions LLM-extracted entities with spaCy NER spans
(weight 0.5, ref :190), deduplicating by text with first-writer-wins priority
for the LLM set (ref :170-194). Deterministic twin:

  primary set   dictionary hits against the broadcast alias table
                (the "high-confidence" extractor), weight 1.0
  secondary set capitalized-span heuristic (NER stand-in), weight 0.5
  dedup         by lowercased text, primary wins (J6 semantics)

Everything is Arrow-vectorized; the per-row return is array<struct> so the
relational shape comes from one explode.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

ENTITY_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("label", StringType()),
        StructField("weight", DoubleType()),
        StructField("source", StringType()),  # dict | heuristic
    ]
)

# capitalized span: 1-4 capitalized/non-ascii words, not sentence-initial-only
_CAP_SPAN = re.compile(
    r"(?<![.!?]\s)(?<!^)\b([A-Z][\w#-]*(?:\s+[A-Z][\w#-]*){0,3})\b"
)


def extract_entities(text: str, alias_map: dict[str, str]) -> list[dict]:
    """One document -> entity dicts, dictionary hits first (dedup J6)."""
    if not isinstance(text, str) or not text:
        return []
    seen: dict[str, dict] = {}
    low = text.lower()
    # dictionary pass: longest-alias-first so "apache spark" beats "spark"
    for surface in sorted(alias_map, key=len, reverse=True):
        if surface in low:
            canon = alias_map[surface]
            key = canon.lower()
            if key not in seen:
                seen[key] = {
                    "text": canon, "label": "ENTITY", "weight": 1.0,
                    "source": "dict",
                }
    # heuristic pass: capitalized spans (weight 0.5, ref :190)
    for m in _CAP_SPAN.finditer(text):
        span = m.group(1)
        key = span.lower()
        if key not in seen:
            seen[key] = {
                "text": span, "label": "SPAN", "weight": 0.5,
                "source": "heuristic",
            }
    return sorted(seen.values(), key=lambda e: (-e["weight"], e["text"]))


def extract_entities_udf(spark: SparkSession, aliases: DataFrame):
    """Vectorized extractor with the alias dict shipped as a broadcast var."""
    amap = {r["surface"]: r["canonical"] for r in aliases.collect()}
    bc = spark.sparkContext.broadcast(amap)

    @pandas_udf(ArrayType(ENTITY_SCHEMA))
    def _udf(texts: pd.Series) -> pd.Series:
        m = bc.value
        return texts.map(lambda t: extract_entities(t, m))

    return _udf


def entities_table(
    docs: DataFrame,
    aliases: DataFrame,
    text_col: str = "content",
    id_col: str = "filename",
) -> DataFrame:
    """documents -> entities(doc, text, label, weight, source), globally
    deduplicated by entity text with highest weight winning (J6/A8)."""
    udf = extract_entities_udf(docs.sparkSession, aliases)
    ex = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(udf(F.col(text_col))).alias("e"),
    ).select(
        "doc",
        F.col("e.text").alias("text"),
        F.col("e.label").alias("label"),
        F.col("e.weight").alias("weight"),
        F.col("e.source").alias("entity_source"),
    )
    w = Window.partitionBy(F.lower("text")).orderBy(
        F.desc("weight"), F.asc("doc")
    )
    return (
        ex.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
