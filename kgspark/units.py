"""Quantity-literal extraction + unit canonicalization — the measurement
counterpart to kgspark.timex: turn "2.5 kg" / "300 MB" surface mentions in
web text into exact base-unit integers a KG can compare and aggregate
(the quantity-KB normalization step, Ho et al. "Qsearch", ISWC 2019).

The reference stores object literals as raw strings (ref
/root/reference/knowledge_graph_builder.py:137-168 — no typed literals);
this is beyond-reference KG-construction surface.

Recognized: ``<number> <unit>`` (space optional) where number is an
integer with an optional ``.`` fraction (≤3 digits used) and unit is one
of the exact-case symbols below. Value is normalized to the dimension's
base unit in EXACT integer arithmetic: frac digits are right-padded to
milli-precision and scaled with truncating div — sub-base remainders
floor (documented; "1.5 mg" → 1 mg), which keeps every output a pure
integer both engines agree on.

  mass    mg g kg t         -> mg
  length  mm cm m km        -> mm
  data    B KB MB GB TB     -> B

Scale shape: map-only JVM regex + a CASE ladder over a fixed unit table —
no Python, no joins, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit -> (dimension, base symbol, scale in base units)
UNITS: dict[str, tuple[str, str, int]] = {
    "mg": ("mass", "mg", 1),
    "g": ("mass", "mg", 1_000),
    "kg": ("mass", "mg", 1_000_000),
    "t": ("mass", "mg", 1_000_000_000),
    "mm": ("length", "mm", 1),
    "cm": ("length", "mm", 10),
    "m": ("length", "mm", 1_000),
    "km": ("length", "mm", 1_000_000),
    "B": ("data", "B", 1),
    "KB": ("data", "B", 1_000),
    "MB": ("data", "B", 1_000_000),
    "GB": ("data", "B", 1_000_000_000),
    "TB": ("data", "B", 1_000_000_000_000),
}

# longest symbols first so alternation prefers 'mm' over 'm', 'KB' over 'B'
_SYMS = sorted(UNITS, key=lambda u: (-len(u), u))
P_QTY = (
    r"\b([0-9]{1,12})(?:\.([0-9]{1,3}))? ?("
    + "|".join(_SYMS) + r")\b"
)


def _case(col, mapping):
    out = None
    for k, v in mapping.items():
        cond = (col == k)
        out = F.when(cond, F.lit(v)) if out is None else out.when(cond, F.lit(v))
    return out


def extract_quantities(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, mention, dimension, unit, base_unit, base_value): one
    row per quantity mention (bag semantics), base_value a BIGINT in the
    dimension's base unit, fraction floored at milli-precision."""
    t = docs.select(F.col(id_col), F.col(text_col).alias("__tx"))
    m = t.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all("__tx", F.lit(P_QTY), F.lit(0))
        ).alias("mention"),
    )
    ip = F.regexp_extract("mention", P_QTY, 1).cast("long")
    fr = F.rpad(
        F.coalesce(
            F.nullif(F.regexp_extract("mention", P_QTY, 2), F.lit("")),
            F.lit("0"),
        ),
        3, "0",
    ).cast("long")
    un = F.regexp_extract("mention", P_QTY, 3)
    scale = _case(un, {k: v[2] for k, v in UNITS.items()}).cast("long")
    parsed = m.select(
        F.col(id_col), "mention",
        _case(un, {k: v[0] for k, v in UNITS.items()}).alias("dimension"),
        un.alias("unit"),
        _case(un, {k: v[1] for k, v in UNITS.items()}).alias("base_unit"),
        ip.alias("__ip"), fr.alias("__fr"), scale.alias("__sc"),
    )
    return parsed.select(
        F.col(id_col), "mention", "dimension", "unit", "base_unit",
        F.expr("__ip * __sc + (__fr * __sc) div 1000").cast("long")
        .alias("base_value"),
    )
