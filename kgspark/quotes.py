"""Quotation-attribution extraction: (speaker, said, quote) triples from
running text.

A KG-construction operator the reference's LLM-prompt extractor covers
implicitly (/root/reference/knowledge_graph_builder.py builds concepts via
prompting); here it is a deterministic rule pass, like kgspark/openie.py's
SVO rules: quoted spans attributed to a capitalized speaker name on either
side of a 'said' cue. Rule extraction of reported speech is classic public
NLP (e.g. the PARC attribution corpus line of work); the regex subset is
Java∩RE2∩DuckDB so contract oracles can run the identical patterns.

Design for 100 TB: both patterns are regexp_extract_all column expressions
— pure map work inside WholeStageCodegen, zero shuffles, no Python. The
two capture-group slices of each pattern are zipped positionally (the
same arrays_zip idiom as kgspark/web.py anchor_pairs).

Scope (deliberate, documented): double straight quotes only; speaker =
1-3 capitalized words; cue word 'said'. Smart quotes, pronoun speakers
("he said") and other cues (told, asked) are a pattern-table extension,
not a structural change. Known limitation of the lookbehind-free subset:
a capitalized word immediately before the name joins the speaker span
('Later Bob said: "…"' -> speaker 'Later Bob').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# '"Quote[,]" said Speaker Name' — trailing ,/. inside the quotes is part
# of the captured span and trimmed afterwards
_SPEAKER = "([A-Z][a-zA-Z]+(?: [A-Z][a-zA-Z]+){0,2})"
QUOTE_THEN_SPEAKER = '"([^"]+)" said ' + _SPEAKER
SPEAKER_THEN_QUOTE = _SPEAKER + ' said:? "([^"]+)"'


def _zip_matches(df: DataFrame, id_col: str, text_col: str, pattern: str,
                 speaker_group: int, quote_group: int,
                 order: str) -> DataFrame:
    speakers = F.regexp_extract_all(F.col(text_col), F.lit(pattern),
                                    speaker_group)
    quotes = F.regexp_extract_all(F.col(text_col), F.lit(pattern),
                                  quote_group)
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(speakers.alias("speaker"), quotes.alias("q"))
            ).alias("z"),
        )
        .select(
            id_col,
            F.col("z.speaker").alias("speaker"),
            F.regexp_replace(F.col("z.q"), "[,.!?]+$", "").alias("quote"),
            F.lit(order).alias("cue_order"),
        )
    )


def quote_triples(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, speaker, quote, cue_order): attributed quotations per document.

    cue_order is 'quote_first' ('"…" said X') or 'speaker_first'
    ('X said "…"') — kept so downstream weighting can prefer one form.
    Emitted as KG triples: subj=speaker, pred='said', obj=quote.
    Duplicate attributions within a document are kept (frequency is
    signal); distinct() downstream if not.
    """
    return _zip_matches(
        df, id_col, text_col, QUOTE_THEN_SPEAKER, 2, 1, "quote_first"
    ).unionByName(
        _zip_matches(
            df, id_col, text_col, SPEAKER_THEN_QUOTE, 1, 2, "speaker_first"
        )
    )
