"""Graph read API — the reference's query surface over the triples table.

The reference's rdflib store is never populated, so its `query_graph` always
returns [] (ref /root/reference/knowledge_graph_builder.py:27, 675-686); we
implement the DECLARED semantics against the real triples DataFrame
(SURVEY.md §7.4.2). Secondary APIs: node history (:688-715), relationship
confidence (:717-723), relationship validation (:725-738).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def query_graph(triples: DataFrame, query: str) -> DataFrame:
    """Case-insensitive substring match on subject OR object (ref :679-686),
    projected as (subject, relation, object)."""
    q = query.lower()
    return triples.where(
        F.lower(F.col("subj")).contains(q) | F.lower(F.col("obj")).contains(q)
    ).select(
        F.col("subj").alias("subject"),
        F.col("pred").alias("relation"),
        F.col("obj").alias("object"),
    )


def get_node_history(triples: DataFrame, nodes: DataFrame, node_id: str) -> DataFrame:
    """Union of node-created + relationship events for one node, ordered by
    timestamp (ref :688-715: `history.sort(key=timestamp)`)."""
    created = nodes.where(F.col("node_id") == node_id).select(
        F.lit("node_created").alias("event"),
        F.col("node_id").alias("subj"),
        F.lit(None).cast("string").alias("pred"),
        F.lit(None).cast("string").alias("obj"),
        "ts", "source", "confidence",
    )
    rels = triples.where(
        (F.col("subj") == node_id) | (F.col("obj") == node_id)
    ).select(
        F.lit("relationship").alias("event"),
        "subj", "pred", "obj", "ts", "source", "confidence",
    )
    return created.unionByName(rels).orderBy("ts", "event", "pred", "obj")


def get_relationship_confidence(triples: DataFrame, subj: str, obj: str) -> float:
    """Point lookup; 0.0 when the edge is absent (ref :717-723)."""
    row = (
        triples.where((F.col("subj") == subj) & (F.col("obj") == obj))
        .select("confidence")
        .limit(1)
        .collect()
    )
    return float(row[0]["confidence"]) if row else 0.0


def validate_relationship(
    triples: DataFrame, subj: str, pred: str, obj: str
) -> dict:
    """Lookup + predicate-equality verdict (ref :725-738)."""
    row = (
        triples.where((F.col("subj") == subj) & (F.col("obj") == obj))
        .select("pred", "confidence")
        .limit(1)
        .collect()
    )
    if not row:
        return {"exists": False, "type_matches": False, "confidence": 0.0}
    return {
        "exists": True,
        "type_matches": row[0]["pred"] == pred,
        "confidence": float(row[0]["confidence"]),
    }
