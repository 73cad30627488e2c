"""C4-style heuristic page cleaning (Raffel et al. 2020, the C4 recipe).

The cleaning pass behind the canonical web-scale pretraining corpus, as an
annotate-don't-drop DataFrame operator (same auditability contract as
kgspark.curate): per page, which lines survive the line rules and whether
the page survives the page rules, with the kept text re-assembled so the
caller can either filter on `keep_page` or inspect the counters.

Line rules (applied per newline-separated line):
  - ends in a terminal punctuation mark (. ! ? or closing quote)
  - has >= `min_words` whitespace words
  - does not contain the word "javascript" (browser-error boilerplate)
Page rules:
  - >= `min_kept_lines` surviving lines
  - no "lorem ipsum" anywhere (template placeholder pages)
  - no curly brace anywhere (code, not prose)

Everything is a pure JVM column expression — one map-side pass, one
split/filter/transform chain per page, no shuffle, no Python. At 10^12
pages this runs at scan speed and is the cheapest stage of the curation
funnel, which is why C4 runs it first; kgspark.curate's fused quality pass
is the natural next stage. The reference corpus ops have no line-level
cleaning analogue (its normalizer is character-level, SURVEY.md P1-P4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _line_ok(line, min_words: int):
    words = F.filter(F.split(F.trim(line), r"\s+"), lambda t: t != "")
    ends_ok = line.rlike(r"""[.!?"']\s*$""")
    no_js = ~F.lower(line).contains("javascript")
    return ends_ok & (F.size(words) >= min_words) & no_js


def c4_line_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """(id, n_lines, n_kept_lines, n_js_lines, has_lorem, has_brace,
    keep_page, kept_text): the C4 line+page filter as one select."""
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda l: F.trim(l) != ""
    )
    kept = F.filter(lines, lambda l: _line_ok(l, min_words))
    js = F.filter(lines, lambda l: F.lower(l).contains("javascript"))
    low = F.lower(F.col(text_col))
    has_lorem = low.contains("lorem ipsum")
    has_brace = low.contains("{") | low.contains("}")
    keep_page = (
        (F.size(kept) >= min_kept_lines) & ~has_lorem & ~has_brace
    )
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.size(js).cast("long").alias("n_js_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep_page.alias("keep_page"),
        F.concat_ws("\n", kept).alias("kept_text"),
    )
