"""Dictionary + alias-table entity linking with candidate scoring.

The reference's entity surface forms are whatever the LLM / spaCy NER emits
(ref /root/reference/knowledge_graph_builder.py:104-196); linking them to
canonical entities is implicit (string identity). The north star upgrades this
to explicit dictionary+alias linking: a small alias table
(surface_lower -> canonical, score) is BROADCAST-joined against mention
columns; when a surface maps to several candidates the highest score wins
(deterministic tie-break on canonical name).

Scale note: the alias table is dimension-sized (« executors' memory) so the
join never shuffles the fact side — `F.broadcast` pins the build side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def alias_table(spark: SparkSession, rows=None) -> DataFrame:
    """alias(surface string, canonical string, score double), best-candidate
    resolved: one row per surface (max score, then lexicographic canonical)."""
    if rows is None:
        from kgspark.synth import alias_rows

        rows = alias_rows()
    df = spark.createDataFrame(rows, "surface string, canonical string, score double")
    w = Window.partitionBy("surface").orderBy(F.desc("score"), F.asc("canonical"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def link_array_udf(spark: SparkSession, aliases: DataFrame):
    """Vectorized alias resolution for array<string> mention columns.

    The resolved alias dict is dimension-sized, so it ships to executors as a
    Spark broadcast variable and linking happens map-side inside an Arrow UDF
    — zero shuffles (the join-based path would shuffle the fact side twice
    per array column: explode + re-group).
    """
    amap = {r["surface"]: r["canonical"] for r in aliases.collect()}
    bc = spark.sparkContext.broadcast(amap)

    @pandas_udf(ArrayType(StringType()))
    def _udf(arrs: pd.Series) -> pd.Series:
        m = bc.value

        def link(arr):
            if arr is None:
                return None
            seen: list[str] = []
            for v in arr:
                cv = m.get(v.lower(), v) if isinstance(v, str) else v
                if cv not in seen:
                    seen.append(cv)
            return seen

        return arrs.map(link)

    return _udf


def link_column(df: DataFrame, aliases: DataFrame, col: str) -> DataFrame:
    """Replace surface forms in `col` with their canonical entity when the
    (broadcast) alias dictionary knows them; unknown surfaces pass through."""
    a = aliases.select(
        F.col("surface").alias(f"__s_{col}"), F.col("canonical").alias(f"__c_{col}")
    )
    return (
        df.join(
            F.broadcast(a), F.lower(F.col(col)) == F.col(f"__s_{col}"), "left"
        )
        .withColumn(col, F.coalesce(F.col(f"__c_{col}"), F.col(col)))
        .drop(f"__s_{col}", f"__c_{col}")
    )
