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
from kgspark.textstats import lang_id_exprs, quality_score_expr, repetition_stats


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
    top_2gram_frac, canonical_id) — the curation verdict per document.

    Plan shape: language-ID, quality score and the empty check are pure
    column expressions, so they are all computed in ONE map-side select over
    the corpus — no join, no shuffle. Only the two signals that genuinely
    aggregate join back in: repetition (a per-doc 2-gram groupBy) and exact
    dedup (a content-hash window). That is 2 shuffling inputs instead of the
    5 self-joins a naive per-signal composition produces — at 100 TB the
    difference is the whole job."""
    pick, _ = lang_id_exprs(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        (F.col(text_col).isNull() | (F.length(text_col) == 0)).alias("__empty"),
        pick.alias("detected_lang"),
        quality_score_expr(F.col(text_col)).alias("quality_score"),
    )
    rep = repetition_stats(docs, text_col, id_col).select(id_col, "top_2gram_frac")
    out = base.join(rep, id_col, "left")
    if dedup:
        dups = exact_duplicates(docs, text_col, id_col).select(
            id_col, "canonical_id"
        )
        out = out.join(dups, id_col, "left")
    else:
        out = out.withColumn("canonical_id", F.col(id_col))

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
