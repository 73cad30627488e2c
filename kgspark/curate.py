"""One-call corpus curation: the training-data filter pipeline.

Composes the curation operator family (kgspark.textstats language-ID /
quality / repetition + kgspark.dedup exact dedup) into a single auditable
pass over a document table. Rows are ANNOTATED, never dropped: every
document keeps a `keep` flag and the FIRST failing check as
`reject_reason` ('' when kept) — at corpus scale the rejected set is as
valuable as the kept set (audits, threshold tuning, re-runs), and the
filter itself stays one declarative plan Catalyst can optimize end to end.

Reject priority (fixed, deterministic): empty -> lang -> quality ->
repetition -> duplicate (non-canonical copies of an identical-text group;
the canonical min-id row is kept). The explicit `empty` check matters: NULL
text makes every downstream comparison NULL, which would otherwise fall
through the whole chain and silently KEEP the document."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.dedup import exact_duplicates
from kgspark.textstats import lang_id, quality_features, repetition_stats


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str | None = "en",
    min_quality: float = 0.5,
    max_top_2gram_frac: float = 0.5,
    dedup: bool = True,
) -> DataFrame:
    """(id, keep, reject_reason, detected_lang, quality_score,
    top_2gram_frac, canonical_id) — the curation verdict per document."""
    li = lang_id(docs, text_col, id_col).select(id_col, "detected_lang")
    q = quality_features(docs, text_col, id_col).select(id_col, "quality_score")
    rep = repetition_stats(docs, text_col, id_col).select(id_col, "top_2gram_frac")
    out = (
        docs.select(id_col)
        .join(li, id_col, "left")
        .join(q, id_col, "left")
        .join(rep, id_col, "left")
    )
    if dedup:
        dups = exact_duplicates(docs, text_col, id_col).select(
            id_col, "canonical_id"
        )
        out = out.join(dups, id_col, "left")
    else:
        out = out.withColumn("canonical_id", F.col(id_col))

    empty = docs.select(
        F.col(id_col),
        (F.col(text_col).isNull() | (F.length(text_col) == 0)).alias("__empty"),
    )
    out = out.join(empty, id_col)

    checks = [(F.col("__empty"), "empty")]
    if lang is not None:
        checks.append((F.col("detected_lang") != lang, "lang"))
    checks.append((F.col("quality_score") < min_quality, "quality"))
    checks.append((F.col("top_2gram_frac") > max_top_2gram_frac, "repetition"))
    if dedup:
        checks.append((F.col("canonical_id") != F.col(id_col), "duplicate"))

    reason = F.lit("")
    for cond, label in reversed(checks):
        reason = F.when(cond, F.lit(label)).otherwise(reason)
    return out.select(
        id_col,
        (reason == "").alias("keep"),
        reason.alias("reject_reason"),
        "detected_lang",
        "quality_score",
        "top_2gram_frac",
        "canonical_id",
    )
