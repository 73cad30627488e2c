"""Hearst-pattern hypernym extraction: (hyponym, is_a, hypernym) triples.

Lexico-syntactic hypernym patterns (Hearst, COLING 1992) are the classic
rule-based taxonomy-induction step of KG construction from web text — the
reference's LLM prompt asks for exactly these parent/child concept links
(/root/reference/knowledge_graph_builder.py builds hierarchy edges via
prompting); here the high-precision pattern subset is a deterministic
column-expression pass, like kgspark/quotes.py and kgspark/openie.py.

Patterns (NP = one lowercase word — the documented scope; multiword NPs
are a pattern-table extension, not a structural change):

  such_as     "X such as A, B and C"      -> A/B/C is_a X
  including   "X including A or B"        -> A/B   is_a X
  especially  "X, especially A and B"     -> A/B   is_a X
  and_other   "A, B and other X"          -> A/B   is_a X

Design for 100 TB: each pattern is one regexp_extract_all column
expression — pure map work inside WholeStageCodegen, zero shuffles, no
Python. Hypernym/list capture slices are zipped positionally (the
arrays_zip idiom from kgspark/quotes.py), the coordinated list is split
with one regex. The regex subset is Java∩RE2∩DuckDB so contract oracles
run the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NP = "[a-z][a-z0-9_-]*"
# "A, B(,)? and|or C" — 1+ items, optional comma-separated middle, optional
# coordinated tail
_LIST = f"{_NP}(?:, {_NP})*(?:,? (?:and|or) {_NP})?"
# splitter for the captured list (same subset in DuckDB string_split_regex)
LIST_SEP = r",\s+(?:and\s+|or\s+)?|\s+(?:and|or)\s+"

# (name, pattern, hypernym_group, list_group)
PATTERNS = [
    ("such_as", f"({_NP}) such as ({_LIST})", 1, 2),
    ("including", f"({_NP}) including ({_LIST})", 1, 2),
    ("especially", f"({_NP}), especially ({_LIST})", 1, 2),
    ("and_other", f"({_LIST}) and other ({_NP})", 2, 1),
]


def _pattern_triples(df: DataFrame, id_col: str, text_col: str, name: str,
                     pattern: str, hyper_group: int,
                     list_group: int) -> DataFrame:
    hypers = F.regexp_extract_all(F.col(text_col), F.lit(pattern),
                                  hyper_group)
    lists = F.regexp_extract_all(F.col(text_col), F.lit(pattern), list_group)
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(hypers.alias("hyper"), lists.alias("l"))
            ).alias("z"),
        )
        .select(
            id_col,
            F.explode(F.split(F.col("z.l"), LIST_SEP)).alias("hyponym"),
            F.col("z.hyper").alias("hypernym"),
            F.lit(name).alias("pattern"),
        )
    )


def hearst_triples(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, hyponym, hypernym, pattern): taxonomy edges per document.

    Emitted as KG triples: subj=hyponym, pred='is_a', obj=hypernym.
    Duplicate extractions within a document are kept (frequency is
    extraction confidence signal); aggregate downstream — e.g.
    groupBy(hyponym, hypernym).count() for corpus-level edge weights.

    The literal word 'other' is dropped as a hyponym: in 'X such as A, B
    and other Y' the greedy coordinated-list tail absorbs 'and other', so
    the list split would otherwise emit the bogus (other, is_a, X) — and
    the lookbehind-free Java∩RE2∩DuckDB subset cannot exclude it in the
    pattern itself. (A, B still surface correctly under BOTH X via
    such_as and Y via and_other.)
    """
    out = None
    for name, pattern, hg, lg in PATTERNS:
        part = _pattern_triples(df, id_col, text_col, name, pattern, hg, lg)
        out = part if out is None else out.unionByName(part)
    return out.where(F.col("hyponym") != "other")
