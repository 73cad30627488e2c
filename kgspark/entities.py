"""Entity + relation extraction API surface (ref E3:
extract_entities_relations, /root/reference/knowledge_graph_builder.py:104-196).

Dead code in the reference's build path (never called by build_graph —
SURVEY.md §7.4.6) but part of its public API, so implemented as API surface
here too. The reference unions LLM-extracted entities with spaCy NER spans
(weight 0.5, ref :190), deduplicating by text with first-writer-wins priority
for the LLM set (ref :170-194). Deterministic twin:

  primary set   dictionary hits against the broadcast alias table
                (the "high-confidence" extractor), weight 1.0
  secondary set capitalized-span heuristic (NER stand-in), weight 0.5
  dedup         by lowercased text, primary wins (J6 semantics)

Everything is Arrow-vectorized; the per-row return is array<struct> so the
relational shape comes from one explode.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ENTITY_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("label", StringType()),
        StructField("weight", DoubleType()),
        StructField("source", StringType()),  # dict | heuristic
        # ref knowledge_graph_builder.py:123-158: entities carry subtopics
        # (name/level) and relationships (target/type/strength). The LLM
        # filled these in the reference; the deterministic stand-in is alias
        # variants (subtopics) and same-document co-occurrence
        # (relationships). Heuristic spans get empty arrays, mirroring the
        # reference's spaCy path (ref :186-194).
        StructField(
            "subtopics",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField("level", IntegerType()),
                    ]
                )
            ),
        ),
        StructField(
            "relationships",
            ArrayType(
                StructType(
                    [
                        StructField("target", StringType()),
                        StructField("type", StringType()),
                        StructField("strength", DoubleType()),
                    ]
                )
            ),
        ),
    ]
)

# capitalized span: 1-4 capitalized/non-ascii words, not sentence-initial-only
_CAP_SPAN = re.compile(
    r"(?<![.!?]\s)(?<!^)\b([A-Z][\w#-]*(?:\s+[A-Z][\w#-]*){0,3})\b"
)


def build_automaton(surfaces) -> tuple[list[dict], list[int], list[frozenset]]:
    """Aho-Corasick automaton over the gazetteer surfaces: goto trie, BFS
    failure links, output sets (merged through failure links so every match
    ending at a position is reported). One scan of a document then costs
    O(len(text) + matches) regardless of gazetteer size — the naive
    `surface in text` loop is O(|aliases| * len(text)) and dies at real
    gazetteer scale (10^5-10^7 surfaces)."""
    from collections import deque

    goto: list[dict] = [{}]
    fail: list[int] = [0]
    out: list[set] = [set()]
    for s in surfaces:
        node = 0
        for ch in s:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                fail.append(0)
                out.append(set())
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].add(s)
    q = deque(goto[0].values())
    while q:
        u = q.popleft()
        for ch, v in goto[u].items():
            q.append(v)
            f = fail[u]
            while f and ch not in goto[f]:
                f = fail[f]
            cand = goto[f].get(ch, 0)
            fail[v] = cand if cand != v else 0
            out[v] |= out[fail[v]]
    return goto, fail, [frozenset(o) for o in out]


def match_surfaces(text: str, automaton) -> set:
    """All gazetteer surfaces occurring anywhere in `text`, one pass."""
    goto, fail, out = automaton
    node = 0
    found: set = set()
    for ch in text:
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        if out[node]:
            found |= out[node]
    return found


def extract_entities(
    text: str, alias_map: dict[str, str], automaton=None
) -> list[dict]:
    """One document -> entity dicts, dictionary hits first (dedup J6)."""
    if not isinstance(text, str) or not text:
        return []
    seen: dict[str, dict] = {}
    low = text.lower()
    if automaton is not None:
        matched = match_surfaces(low, automaton)
    else:
        matched = {s for s in alias_map if s in low}
    # longest-alias-first so "apache spark" beats "spark" (same dedup order
    # as the naive loop; sorted() is stable so ties keep dict order)
    surfaces_of: dict[str, list] = {}
    for surface in sorted(alias_map, key=len, reverse=True):
        if surface in matched:
            canon = alias_map[surface]
            key = canon.lower()
            if key not in seen:
                seen[key] = {
                    "text": canon, "label": "ENTITY", "weight": 1.0,
                    "source": "dict", "subtopics": [], "relationships": [],
                }
                surfaces_of[key] = []
            surfaces_of[key].append(surface)
    # deterministic ref-shaped extras: subtopics = matched alias variants
    # (level 2), relationships = same-document co-occurrence among dict hits
    dict_canons = sorted(e["text"] for e in seen.values())
    for key, entry in seen.items():
        entry["subtopics"] = [
            {"name": s, "level": 2} for s in sorted(surfaces_of[key])
        ]
        entry["relationships"] = [
            {"target": c, "type": "co_occurs", "strength": 0.5}
            for c in dict_canons if c != entry["text"]
        ]
    # heuristic pass: capitalized spans (weight 0.5, ref :190)
    for m in _CAP_SPAN.finditer(text):
        span = m.group(1)
        key = span.lower()
        if key not in seen:
            seen[key] = {
                "text": span, "label": "SPAN", "weight": 0.5,
                "source": "heuristic", "subtopics": [], "relationships": [],
            }
    return sorted(seen.values(), key=lambda e: (-e["weight"], e["text"]))


_AUTOMATON_CACHE: dict[int, tuple] = {}  # broadcast id -> built automaton
_AUTOMATON_CACHE_MAX = 4  # a few gazetteers may legitimately coexist


def extract_entities_udf(spark: SparkSession, aliases: DataFrame):
    """Vectorized extractor with the alias dict shipped as a broadcast var.
    The Aho-Corasick automaton is built ONCE per executor process, cached by
    the BROADCAST id (stable across UDF rebuilds over the same broadcast —
    e.g. per streaming micro-batch) and bounded to a handful of entries in
    FIFO order — a single-slot bound would make two gazetteers used in
    alternation evict each other every batch, rebuilding the
    O(gazetteer-size) automaton each time; an unbounded dict would leak one
    automaton per distinct broadcast in long-lived executors. Only the plain
    dict crosses the wire; scan cost per doc is O(len(text)), independent of
    gazetteer size."""
    amap = {r["surface"]: r["canonical"] for r in aliases.collect()}
    bc = spark.sparkContext.broadcast(amap)
    cache_key = bc._jbroadcast.id()  # stable JVM broadcast id

    @pandas_udf(ArrayType(ENTITY_SCHEMA))
    def _udf(texts: pd.Series) -> pd.Series:
        m = bc.value
        auto = _AUTOMATON_CACHE.get(cache_key)
        if auto is None:
            auto = build_automaton(m)
            while len(_AUTOMATON_CACHE) >= _AUTOMATON_CACHE_MAX:
                _AUTOMATON_CACHE.pop(next(iter(_AUTOMATON_CACHE)))
            _AUTOMATON_CACHE[cache_key] = auto
        return texts.map(lambda t: extract_entities(t, m, automaton=auto))

    return _udf


def entities_table(
    docs: DataFrame,
    aliases: DataFrame,
    text_col: str = "content",
    id_col: str = "filename",
) -> DataFrame:
    """documents -> entities(doc, text, label, weight, source), globally
    deduplicated by entity text with highest weight winning (J6/A8)."""
    udf = extract_entities_udf(docs.sparkSession, aliases)
    ex = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(udf(F.col(text_col))).alias("e"),
    ).select(
        "doc",
        F.col("e.text").alias("text"),
        F.col("e.label").alias("label"),
        F.col("e.weight").alias("weight"),
        F.col("e.source").alias("entity_source"),
        F.col("e.subtopics").alias("subtopics"),
        F.col("e.relationships").alias("relationships"),
    )
    w = Window.partitionBy(F.lower("text")).orderBy(
        F.desc("weight"), F.asc("doc")
    )
    return (
        ex.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def entity_cooccurrence(
    docs: DataFrame,
    aliases: DataFrame,
    text_col: str = "content",
    id_col: str = "filename",
    min_docs: int = 1,
) -> DataFrame:
    """(e1, e2, n_docs): entity co-mention edges — canonical entity pairs
    mentioned in the same document, counted over documents (e1 < e2, each
    unordered pair once). The bipartite doc×entity projection that turns
    gazetteer mentions into an entity-association graph (the edge-weight
    complement of the per-entity `relationships` arrays the E3 extractor
    carries; ref /root/reference/knowledge_graph_builder.py builds
    concept-pair links via prompting).

    Scale shape mirrors kgspark/cooc.py pmi_edges: mentions are distinct
    per (doc, canonical) BEFORE pairing, the within-doc pair join is
    quadratic only in per-document entity count (gazetteer-bounded), and
    the final aggregation is one (e1, e2) pair-key groupBy."""
    from kgspark.session import materialize

    udf = extract_entities_udf(docs.sparkSession, aliases)
    ments = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(udf(F.col(text_col))).alias("e"),
        )
        # gazetteer hits ONLY: the extractor also emits a weight-0.5 SPAN
        # pseudo-entity per distinct capitalized span, which would both
        # pollute the edge list with non-canonical strings and void the
        # gazetteer bound on the within-doc pair join (a page with 10k
        # capitalized names would otherwise pair ~5e7 rows)
        .where(F.col("e.source") == F.lit("dict"))
        .select("doc", F.col("e.text").alias("ent"))
        .distinct()
    )
    ments = materialize(ments)
    left = ments.select("doc", F.col("ent").alias("e1"))
    right = ments.select("doc", F.col("ent").alias("e2"))
    return (
        left.join(right, "doc")
        .where(F.col("e1") < F.col("e2"))
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def entity_salience(
    df: DataFrame,
    aliases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc, canonical, n_mentions, first_pos, salience_micro): how central
    each linked entity is to each document, scored frequency x earliness:

        salience = (n_mentions / n_tokens) * 2^(-first_pos / 16)

    — the classic position-decayed mention-rate prior used to rank entity
    candidates before expensive disambiguation. The score is quantized to
    integer micro-units at the END of an all-fp64 expression tree (one
    round, no summation of rounded terms), so it is cross-engine
    hash-stable.

    This is the JVM-only fast path for SINGLE-TOKEN alias surfaces: one
    tokenize+posexplode pass joined to the broadcast alias dimension.
    Multi-token surfaces go through the Aho-Corasick pandas UDF above
    (extract_entities_udf) — same output shape, higher per-row cost; a
    production run unions both. Reference scores candidates inside its
    LLM prompt (ref knowledge_graph_builder.py extract path) — here the
    prior is explicit, deterministic, and engine-side.

    Scale: alias table is dimension-sized (broadcast); the only shuffle is
    the (doc, canonical) agg, keyed by doc — uniform. No all-pairs shape.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                 lambda t: t != "").alias("__toks"),
    )
    pos = toks.select(
        "__id", F.size("__toks").alias("__n"),
        F.posexplode("__toks").alias("pos", "token"),
    )
    single = aliases.where(~F.col("surface").contains(" ")).select(
        F.col("surface").alias("token"), "canonical"
    )
    hits = pos.join(F.broadcast(single), "token")
    per = hits.groupBy("__id", "canonical").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min("pos").alias("first_pos"),
        F.first("__n").alias("__n"),
    )
    sal = F.round(
        (F.col("n_mentions") / F.col("__n"))
        * F.pow(F.lit(2.0), -(F.col("first_pos") / F.lit(16.0)))
        * 1000000.0,
        0,
    ).cast("long")
    return per.select(
        F.col("__id").alias(id_col),
        "canonical",
        F.col("n_mentions").cast("long").alias("n_mentions"),
        F.col("first_pos").cast("long").alias("first_pos"),
        sal.alias("salience_micro"),
    )


def acronym_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 6,
) -> DataFrame:
    """Acronym/long-form alias mining, the initial-letter subset of
    Schwartz & Hearst ("A simple algorithm for identifying abbreviation
    definitions", PSB 2003): a parenthesized 2..max_len-letter token
    "(ABC)" defines the |ABC| words immediately before it iff each
    word's initial matches the corresponding acronym letter
    (case-insensitive). The discovered (acronym -> long form) pairs feed
    the alias table the entity linker (extract_entities) matches on —
    alias DISCOVERY where the gazetteer is alias CONSUMPTION. The full
    Schwartz-Hearst inner-character alignment is deliberately out: the
    initial-letter rule is the deterministic, engine-parity-exact core
    that catches the dominant "Long Form (LF)" pattern.

    Emits (id, acronym, long_form, n_words), one row per definition
    occurrence (dedup downstream if set semantics are wanted).

    Scale shape: map-only — tokenize once (materialized against the
    HOF-reevaluation trap), posexplode, filter to parenthesized tokens
    (a tiny fraction), slice + zip the candidate window with JVM array
    HOFs. No shuffle at all.
    """
    from kgspark.session import materialize

    # case-PRESERVING whitespace split (ws_tokens lowercases — wrong
    # here: 'WHO' vs 'who' is signal for the alias table)
    raw = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    toks = materialize(
        df.select(F.col(id_col).alias("id"), raw.alias("__t"))
    )
    exploded = toks.select(
        "id", "__t", F.posexplode("__t").alias("__p", "__tok")
    )
    acr = F.regexp_extract(
        F.col("__tok"), r"^\(([A-Za-z]{2,%d})\)$" % max_len, 1
    )
    cand = exploded.select(
        "id", "__t", acr.alias("__a"),
        (F.col("__p") + 1).alias("__pos1"),  # 1-based token position
    ).where(
        (F.col("__a") != "") & (F.col("__pos1") - F.length("__a") >= 1)
    )
    words = F.slice(
        F.col("__t"),
        F.col("__pos1") - F.length("__a"),
        F.length("__a"),
    )
    initials = F.transform(
        words, lambda w: F.substring(F.lower(w), 1, 1)
    )
    letters = F.filter(
        F.split(F.lower(F.col("__a")), ""), lambda c: c != ""
    )
    return cand.where(initials == letters).select(
        "id", F.col("__a").alias("acronym"),
        F.array_join(words, " ").alias("long_form"),
        F.length("__a").cast("long").alias("n_words"),
    )


_AKA_NAME = r"[A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*){0,3}"
_AKA_RE = (
    "(" + _AKA_NAME + ") (?:aka|also known as) (" + _AKA_NAME + ")"
)


def aka_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Alias mining from explicit coreference markers: every
    "<Name> aka <Name>" / "<Name> also known as <Name>" occurrence,
    where a Name is a run of 1-4 capitalized tokens — the other
    high-precision alias source next to acronym_pairs, feeding the same
    alias table the entity linker consumes (and the sameAs smushing in
    kgspark.canon). The pattern is a single ASCII regex in the Java∩RE2
    parity subset — no lookaround, no backrefs — with greedy runs, so
    the LONGEST capitalized span on each side wins deterministically.

    Emits (id, alias_a, alias_b), one row per occurrence.

    Scale shape: map-only — two aligned regexp_extract_all passes (group
    1 and group 2 of the same pattern produce index-aligned arrays)
    zipped and exploded; no shuffle.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    g1 = F.regexp_extract_all(t, F.lit(_AKA_RE), 1)
    g2 = F.regexp_extract_all(t, F.lit(_AKA_RE), 2)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.arrays_zip(g1.alias("a"), g2.alias("b")))
            .alias("__m"),
        )
        .select(
            "id",
            F.col("__m.a").alias("alias_a"),
            F.col("__m.b").alias("alias_b"),
        )
    )
