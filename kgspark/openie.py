"""Deterministic rule-based hierarchical concept extraction.

Replaces the reference's LLM call (ref /root/reference/
knowledge_graph_builder.py:198-235, Mistral via mistral_wrapper.py:12-26) with
a deterministic, batched, Arrow-vectorized pattern extractor that emits the
SAME concept schema the reference's prompt demands (:209-222):

    {name, type, parents[], children[], related[], properties[], actions[],
     importance}

The LLM cannot be the scale path (non-deterministic + networked, SURVEY.md
§7.3); the north star sanctions "batched OpenIE-style triple extraction ...
inside pandas UDFs". On JSON/parse failure the reference returns [] (:230-235)
— mirrored here: unparseable sentences contribute nothing.

Patterns (checked in priority order, copula ambiguity resolved by specificity):
    X is related to Y   -> related
    X is a/an Y         -> parent (is_a)
    X has Y             -> child (has)
    X can V...          -> action
    X is ADJ            -> property
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, DoubleType, StringType, StructField, StructType,
)

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_TRAIL = re.compile(r"[.!?]+$")
# module-level compile: the per-sentence re.match cache lookup costs ~1us
# which is real at 10^8 sentences per bench leg
_ISA = re.compile(r"^(.+?) is an? (.+)$")

CONCEPT_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("type", StringType()),
        StructField("parents", ArrayType(StringType())),
        StructField("children", ArrayType(StringType())),
        StructField("related", ArrayType(StringType())),
        StructField("properties", ArrayType(StringType())),
        StructField("actions", ArrayType(StringType())),
        StructField("importance", DoubleType()),
    ]
)
CONCEPTS_TYPE = ArrayType(CONCEPT_SCHEMA)


def _is_entity_like(s: str) -> bool:
    """Cheap subject gate: short noun-phrase, entity-cased (or non-ASCII)."""
    if not s or len(s) > 60 or "," in s:
        return False
    c0 = s[0]
    return c0.isupper() or not c0.isascii()


def _append(lst: list[str], item: str) -> None:
    if item and item not in lst:
        lst.append(item)


def extract_concepts(text: str) -> list[dict]:
    """One document's text -> list of concept dicts (surface forms;
    alias->canonical resolution is the linker's job, kgspark.linking)."""
    if not isinstance(text, str) or not text:
        return []
    concepts: dict[str, dict] = {}

    def concept(name: str) -> dict:
        return concepts.setdefault(
            name,
            {"name": name, "type": "concept", "parents": [], "children": [],
             "related": [], "properties": [], "actions": [], "importance": 0.5},
        )

    for sent in _SENT_SPLIT.split(text):
        # rstrip(".!?") == sub(r"[.!?]+$") — saves a regex call per sentence
        sent = sent.strip().rstrip(".!?")
        if not sent:
            continue
        if " is related to " in sent:
            subj, _, obj = sent.partition(" is related to ")
            if _is_entity_like(subj) and obj:
                _append(concept(subj)["related"], obj)
            continue
        m = _ISA.match(sent)
        if m and _is_entity_like(m.group(1)):
            _append(concept(m.group(1))["parents"], m.group(2))
            continue
        if " has " in sent:
            subj, _, obj = sent.partition(" has ")
            if _is_entity_like(subj) and obj:
                _append(concept(subj)["children"], obj)
            continue
        if " can " in sent:
            subj, _, obj = sent.partition(" can ")
            if _is_entity_like(subj) and obj:
                _append(concept(subj)["actions"], obj)
            continue
        if " is " in sent:
            subj, _, obj = sent.partition(" is ")
            if _is_entity_like(subj) and obj and obj[0].islower():
                _append(concept(subj)["properties"], obj)
            continue

    out = []
    for c in concepts.values():
        c["type"] = sorted(c["parents"])[0] if c["parents"] else "concept"
        n_rel = len(c["parents"]) + len(c["children"]) + len(c["related"])
        c["importance"] = round(0.5 + 0.1 * min(n_rel, 5), 1)
        out.append(c)
    # Deterministic output order regardless of dict/iteration quirks.
    out.sort(key=lambda c: c["name"])
    return out


@pandas_udf(CONCEPTS_TYPE)
def extract_concepts_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched extraction: Series[str] -> Series[list[concept struct]]."""
    return texts.map(extract_concepts)


# --- sentence polarity (negation / hedge gating) -------------------------
# Extraction treats every sentence as an assertion; "X is not a member of
# Y" must NOT become (X, member_of, Y) at full confidence. The reference
# has no polarity handling at all (ref knowledge_graph_builder.py:114-180
# extracts through negation unchanged) — this is the standard cue-word
# gate (NegEx-style lexical baseline, Chapman et al. 2001) every IE
# pipeline applies before committing facts.
#
# JVM-side regex columns only (no UDF); the cue lists are ASCII literals
# in the Java-and-RE2-common subset so a DuckDB oracle replicates exactly.

NEGATION_CUES = ("not", "never", "cannot", "nor", "without")
HEDGE_CUES = ("may", "might", "possibly", "reportedly", "allegedly",
              "perhaps", "rumored")

POLARITY_PPM = {"asserted": 1_000_000, "hedged": 500_000, "negated": 100_000}


def sentence_polarity(df, text_col: str = "sentence"):
    """Append (polarity, confidence_ppm) to per-sentence rows.

    polarity: 'negated' if any negation cue appears as a whole word
    (case-insensitive), else 'hedged' if any hedge cue does, else
    'asserted'. confidence_ppm is the integer weight multiplier
    downstream edge generation applies (exact-integer: parity-safe).
    Negation outranks hedging ("may not" is negated).
    """
    from pyspark.sql import functions as F

    neg = r"\b(" + "|".join(NEGATION_CUES) + r")\b"
    hedge = r"\b(" + "|".join(HEDGE_CUES) + r")\b"
    low = F.lower(F.col(text_col))
    pol = (
        F.when(low.rlike(neg), F.lit("negated"))
        .when(low.rlike(hedge), F.lit("hedged"))
        .otherwise(F.lit("asserted"))
    )
    ppm = (
        F.when(pol == "negated", F.lit(POLARITY_PPM["negated"]))
        .when(pol == "hedged", F.lit(POLARITY_PPM["hedged"]))
        .otherwise(F.lit(POLARITY_PPM["asserted"]))
        .cast("long")
    )
    return df.withColumn("polarity", pol).withColumn("confidence_ppm", ppm)
