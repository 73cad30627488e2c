"""Coreference-lite: deterministic pronoun -> antecedent resolution.

Web-page triple extraction loses every fact asserted through a pronoun
("Marie Curie won the prize. She founded the institute." — the second
sentence extracts nothing useful). The reference's extractor operates
per-sentence with no discourse state (ref /root/reference/
knowledge_graph_builder.py:114-180), so pronoun-subject facts are
silently dropped. This operator applies the classic recency heuristic
(Hobbs 1978 baseline, the rule every shallow IE pipeline ships): a
sentence-initial pronoun resolves to the SUBJECT (leading capitalized
token) of the nearest preceding sentence that has one, within the same
document. Feeding `resolved` back through the extractor recovers those
facts.

Deterministic by construction: no model, one fixed pronoun list, first
match wins. All JVM-side (regexp columns + one window per document);
the regexes use the Java-and-RE2-safe ASCII subset (no lookbehind), so
a DuckDB oracle replicates byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRONOUNS = ("It", "He", "She", "They", "This")

# sentences = maximal runs ending in terminal punctuation (no lookbehind:
# RE2-safe), leading/trailing space trimmed afterwards
_SENT_PAT = r"[^.!?]+[.!?]"
_SUBJ_PAT = r"^([A-Z][A-Za-z0-9]*)"


def resolve_pronouns(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    pronouns: tuple[str, ...] = PRONOUNS,
) -> DataFrame:
    """(doc, sent_no, sentence, antecedent, resolved, had_pronoun).

    antecedent = '' when the sentence needs no resolution or no prior
    subject exists (never NULL — gate-sort safe); resolved = the sentence
    with its leading pronoun replaced by the antecedent, else unchanged.

    Caveat: the antecedent is spliced via regexp_replace's replacement
    argument, so subjects containing literal '$' or backslash would need
    escaping; entity surfaces here are word characters by construction
    (_SUBJ_PAT), so no escape path is required.

    Scale shape: map-only sentence explode, then ONE window keyed by
    document (documents are bounded-size rows, never corpus-wide — the
    partition key is the doc id, so skew equals the longest single page).
    """
    pron_pat = "^(" + "|".join(pronouns) + ") "
    sents = docs.select(
        F.col(doc_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(_SENT_PAT), F.lit(0))
        ).alias("__pos", "__raw"),
    ).select(
        F.col(doc_col),
        (F.col("__pos") + 1).cast("long").alias("sent_no"),
        F.trim(F.col("__raw")).alias("sentence"),
    )
    is_pron = F.col("sentence").rlike(pron_pat)
    subj = F.when(
        ~is_pron,
        F.nullif(F.regexp_extract(F.col("sentence"), _SUBJ_PAT, 1), F.lit("")),
    )
    w = (
        Window.partitionBy(doc_col)
        .orderBy("sent_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ante = F.last(subj, ignorenulls=True).over(w)
    need = is_pron & ante.isNotNull()
    return sents.select(
        F.col(doc_col),
        "sent_no",
        "sentence",
        F.when(need, ante).otherwise(F.lit("")).alias("antecedent"),
        F.when(
            need,
            F.regexp_replace(
                F.col("sentence"), pron_pat, F.concat(ante, F.lit(" "))
            ),
        )
        .otherwise(F.col("sentence"))
        .alias("resolved"),
        is_pron.cast("int").alias("had_pronoun"),
    )
