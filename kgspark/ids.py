"""Scholarly/external identifier extraction — DOI and arXiv ids.

The identifier member of the literal-canonicalization family (timex.py
dates, units.py quantities, geo.py coordinates): a KG built from web text
wants stable external keys, and DOIs/arXiv ids are the highest-value ones
a crawl actually contains (every paper page, citation list and preprint
mirror). Patterns live in the Java∩RE2∩DuckDB regex subset (no
lookaround; '-' at class end) — the kgspark.pii convention — so the
DuckDB oracle runs the byte-same expressions.

Normalization pins: DOIs lowercase (Crossref's documented rule: DOIs are
case-insensitive, display-form lowercase) and strip trailing sentence
punctuation the regex's greedy tail may swallow; arXiv NEW-style ids
(YYMM.NNNNN, optional vN) keep their version suffix; the OLD-style
(archive/NNNNNNN) form is matched by a separate arm. The reference has no
identifier layer (knowledgeGraph.py extracts free-text triples only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOI_PATTERN = r"\b10[.][0-9]{4,9}/[A-Za-z0-9._;()/:-]+"
# YYMM.NNNNN with the month gated to 01-12 — an ungated [0-9]{4} arm
# matches any 4.4/4.5-digit decimal in prose (version numbers,
# coordinates, '2024.1234'-style dates); arXiv's own scheme promises a
# real month, so requiring MM in 01-12 is a plausibility gate, not a
# heuristic. Still inside the Java∩RE2∩DuckDB subset (alternation, no
# lookaround) so the oracle imports the byte-same pattern.
ARXIV_NEW = r"\b[0-9]{2}(0[1-9]|1[0-2])[.][0-9]{4,5}(v[0-9]+)?\b"
ARXIV_OLD = r"\b(astro-ph|cond-mat|hep-th|hep-ph|math|cs|quant-ph)/[0-9]{7}\b"
_TRAIL = r"[.,;)]+$"


def scholarly_ids(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per extracted identifier: (id, kind ∈ {'doi',
    'arxiv'}, raw, norm) — map-only regexp_extract_all arms unioned,
    DOIs lowercased + trailing-punctuation-stripped, arXiv ids kept
    verbatim (they are case-sensitive in neither form; the pattern
    admits only digits/lowercase archive names). Duplicate mentions
    emit once per (doc, kind, norm) with raw = min(raw) — set
    semantics with a deterministic representative."""
    t = F.coalesce(F.col(text_col), F.lit(""))

    def arm(kind, pat, norm_fn):
        raw = F.explode(
            F.regexp_extract_all(t, F.lit(pat), F.lit(0))
        ).alias("raw")
        base = df.select(F.col(id_col), raw)
        return base.select(
            id_col, F.lit(kind).alias("kind"), "raw",
            norm_fn(F.col("raw")).alias("norm"),
        )

    doi = arm(
        "doi", DOI_PATTERN,
        lambda c: F.lower(F.regexp_replace(c, _TRAIL, "")),
    )
    ax_new = arm("arxiv", ARXIV_NEW, lambda c: c)
    ax_old = arm("arxiv", ARXIV_OLD, lambda c: c)
    return (
        doi.unionByName(ax_new).unionByName(ax_old)
        .where(F.col("raw") != "")
        .groupBy(id_col, "kind", "norm")
        .agg(F.min("raw").alias("raw"))
        .select(id_col, "kind", "raw", "norm")
    )
