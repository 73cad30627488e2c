"""Dynamic schema induction from nested JSON (ref create_dynamic_schema,
/root/reference/knowledge_graph_builder.py:408-427 — dead code in the
reference's build path, implemented as API surface per SURVEY.md §7.4.6).

Reference semantics, distributed: walk each JSON document's nesting and
accumulate DISTINCT
  classes        every dict key, Title-cased
  relationships  (Parent, hasChild, Child) for nested dicts
  properties     (Parent, python-type-name) for scalar leaves
The per-document walk runs in an Arrow-batched pandas UDF emitting
(kind, a, b) rows; global distinct is one shuffle (ref's set-accumulation as
a relational op, SURVEY.md A10/Set3)."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_ROW = StructType(
    [
        StructField("kind", StringType()),  # class | relationship | property
        StructField("a", StringType()),
        StructField("rel", StringType()),
        StructField("b", StringType()),
    ]
)

# python-type names matching the reference's str(type(value).__name__)
_TYPE_NAMES = {bool: "bool", int: "int", float: "float", str: "str",
               type(None): "NoneType"}


def analyze_document(json_text: str) -> list[dict]:
    """One JSON document -> schema observation rows (ref :412-426)."""
    try:
        data = json.loads(json_text) if isinstance(json_text, str) else None
    except (ValueError, TypeError):
        return []
    if data is None:
        return []
    out: list[dict] = []

    def walk(value, parent_key=None):
        if isinstance(value, dict):
            for k, v in value.items():
                out.append({"kind": "class", "a": k.title(), "rel": None, "b": None})
                if parent_key:
                    out.append({
                        "kind": "relationship", "a": parent_key.title(),
                        "rel": "has" + k.title(), "b": k.title(),
                    })
                walk(v, k)
        elif isinstance(value, list):
            for item in value:
                walk(item, parent_key)
        else:
            if parent_key:
                out.append({
                    "kind": "property", "a": parent_key.title(),
                    "rel": None,
                    "b": _TYPE_NAMES.get(type(value), type(value).__name__),
                })

    walk(data)
    return out


@pandas_udf(ArrayType(_ROW))
def _analyze_udf(texts: pd.Series) -> pd.Series:
    return texts.map(analyze_document)


def induce_schema(df: DataFrame, json_col: str = "raw_json") -> DataFrame:
    """documents of JSON text -> distinct (kind, a, rel, b) schema rows."""
    return (
        df.select(F.explode(_analyze_udf(F.col(json_col))).alias("r"))
        .select("r.kind", "r.a", "r.rel", "r.b")
        .distinct()
    )
