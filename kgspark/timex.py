"""TIMEX-lite date extraction + normalization — the temporal front door
for fact scoping: turn surface date mentions in web text into ISO
``yyyy-mm-dd`` literals that kgspark.temporal's interval/as-of operators
can consume.

The reference has no temporal layer at all (its triples are timeless,
ref /root/reference/knowledge_graph_builder.py:137-168); this is part of
the beyond-reference KG-construction surface (TimeML TIMEX3's lexical
core, restated as deterministic regex normalization).

Recognized forms (ASCII, the Java∩RE2 regex subset the PII module
established — both engines compile these identically):

  ISO    2024-05-13
  LONG   May 13, 2024   (full month name)
  ABBR   13 May 2024    (3-letter month)

Normalization is LEXICAL: the day is bounded 1..31 by the pattern itself,
but month-length/leap rules are not applied (February 30 normalizes; a
semantic validity pass is a separate concern — the standard TIMEX
lexical-vs-semantic split, stated here so nobody assumes otherwise).

Scale shape: pure JVM column work — regexp_extract_all per pattern over
the text column, one explode per pattern (output-sized, not corpus²), a
month CASE + lpad to render ISO. No Python, no joins, no shuffle; the
operator is map-only and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FULL = ["January", "February", "March", "April", "May", "June", "July",
         "August", "September", "October", "November", "December"]
_ABBR = [m[:3] for m in _FULL]

_DAY = "(3[01]|[12][0-9]|0[1-9])"          # zero-padded (ISO)
_DAY_BARE = "(3[01]|[12][0-9]|[1-9])"      # unpadded (prose)
_YEAR = "((?:19|20)[0-9]{2})"

P_ISO = rf"\b{_YEAR}-(1[0-2]|0[1-9])-{_DAY}\b"
P_LONG = rf"\b({'|'.join(_FULL)}) {_DAY_BARE}, {_YEAR}\b"
P_ABBR = rf"\b{_DAY_BARE} ({'|'.join(_ABBR)}) {_YEAR}\b"


def _month_case(col, names: list[str]):
    expr = F.lit(None).cast("string")
    out = None
    for i, n in enumerate(names):
        cond = (col == n)
        out = F.when(cond, F.lit(f"{i + 1:02d}")) if out is None \
            else out.when(cond, F.lit(f"{i + 1:02d}"))
    return out.otherwise(expr)


def extract_dates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, mention, fmt, iso_date): one row per date mention (bag
    semantics — repeated mentions repeat), fmt in {'iso','long','abbr'},
    iso_date = zero-padded yyyy-mm-dd."""
    t = docs.select(F.col(id_col), F.col(text_col).alias("__tx"))
    outs = []

    def grab(pat: str, fmt: str, iso_expr) -> DataFrame:
        # NB: F.regexp_extract_all (pattern as a literal Column), NOT
        # F.expr — SQL string literals escape-process backslashes, which
        # silently corrupts \b/\d
        m = t.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all("__tx", F.lit(pat), F.lit(0))
            ).alias("mention"),
        )
        return m.select(
            F.col(id_col), "mention", F.lit(fmt).alias("fmt"),
            iso_expr.alias("iso_date"),
        )

    outs.append(grab(P_ISO, "iso", F.col("mention")))

    lm = F.regexp_extract("mention", P_LONG, 1)
    ld = F.regexp_extract("mention", P_LONG, 2)
    ly = F.regexp_extract("mention", P_LONG, 3)
    outs.append(grab(
        P_LONG, "long",
        F.concat_ws("-", ly, _month_case(lm, _FULL), F.lpad(ld, 2, "0")),
    ))

    ad = F.regexp_extract("mention", P_ABBR, 1)
    am = F.regexp_extract("mention", P_ABBR, 2)
    ay = F.regexp_extract("mention", P_ABBR, 3)
    outs.append(grab(
        P_ABBR, "abbr",
        F.concat_ws("-", ay, _month_case(am, _ABBR), F.lpad(ad, 2, "0")),
    ))

    acc = outs[0]
    for o in outs[1:]:
        acc = acc.unionByName(o)
    return acc
