"""Geo-coordinate literal extraction + canonicalization — the third
literal front door beside kgspark.timex (dates) and kgspark.units
(quantities): turn degree-marked coordinate mentions in web text into
exact integer micro-degrees a KG can index and range-query.

The reference stores untyped string literals only (ref
/root/reference/knowledge_graph_builder.py:137-168); beyond-reference
KG-construction surface.

Recognized form: ``<deg>[.<frac>]° <H>`` with hemisphere H in N/S/E/W and
an optional space before the hemisphere letter (``40.7128° N``,
``74.006°W``). Canonical value = micro-degrees as BIGINT: deg·1e6 + frac
right-padded to 6 digits, negated for S/W. Out-of-range mentions
(lat > 90, lon > 180) are dropped — a lexical sanity bound, applied in
exact integers.

Scale shape: map-only JVM regex + integer arithmetic — no Python, no
joins, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P_COORD = r"\b([0-9]{1,3})(?:\.([0-9]{1,6}))?° ?([NSEW])\b"


def extract_coords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, mention, axis, hemi, microdeg): one row per coordinate
    mention (bag semantics); axis 'lat' for N/S, 'lon' for E/W; microdeg
    a signed BIGINT in micro-degrees."""
    t = docs.select(F.col(id_col), F.col(text_col).alias("__tx"))
    m = t.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all("__tx", F.lit(P_COORD), F.lit(0))
        ).alias("mention"),
    )
    deg = F.regexp_extract("mention", P_COORD, 1).cast("long")
    fr = F.rpad(
        F.coalesce(
            F.nullif(F.regexp_extract("mention", P_COORD, 2), F.lit("")),
            F.lit("0"),
        ),
        6, "0",
    ).cast("long")
    hemi = F.regexp_extract("mention", P_COORD, 3)
    axis = F.when(hemi.isin("N", "S"), F.lit("lat")).otherwise(F.lit("lon"))
    sign = F.when(hemi.isin("S", "W"), F.lit(-1)).otherwise(F.lit(1))
    micro = (deg * 1_000_000 + fr) * sign
    bound = F.when(axis == "lat", F.lit(90_000_000)).otherwise(
        F.lit(180_000_000)
    )
    return (
        m.select(
            F.col(id_col), "mention", axis.alias("axis"),
            hemi.alias("hemi"), micro.cast("long").alias("microdeg"),
            bound.alias("__b"),
        )
        .where(F.abs(F.col("microdeg")) <= F.col("__b"))
        .drop("__b")
    )
