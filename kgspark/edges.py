"""Edge / triple generation (E5) + doc->topic similarity join (J1).

Reference semantics (ref /root/reference/knowledge_graph_builder.py:527-563):
for each concept, for each rel_type in {is_a: parents, has: children,
related_to: related}, for each target: a FORWARD edge (concept -> target,
pred=rel_type) and a REVERSE edge (target -> concept, pred per the reverse map
:548-552 — is_a->has_instance, has->belongs_to, related_to->related_to, else
reverse_<t>). Edge weight = hierarchy_weight(rel_type) * confidence (:538,
hierarchy table :65-74); lineage columns (timestamp, source, confidence,
bidirectional=true) ride on every edge (:536-543).

Spark shape: one explode over a literal array of (rel_type, targets) structs,
a second explode over targets, then a 2-row explode for fwd/rev — pure
DataFrame ops, whole-stage-codegen friendly, no Python crossing.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ref knowledge_graph_builder.py:65-74
HIERARCHY_WEIGHTS = {
    "is_a": 1.0,
    "has": 0.9,
    "part_of": 0.8,
    "belongs_to": 0.7,
    "related_to": 0.6,
    "similar_to": 0.5,
    "referenced_by": 0.4,
    "mentioned_in": 0.3,
}
# ref knowledge_graph_builder.py:548-552
REVERSE_REL = {"is_a": "has_instance", "has": "belongs_to", "related_to": "related_to"}
DEFAULT_HIERARCHY_WEIGHT = 0.5  # ref :534 `.get(rel_type, 0.5)`


def _weight_expr(pred_col):
    m = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(v)) for k, v in HIERARCHY_WEIGHTS.items()
    ))
    return F.coalesce(m[pred_col], F.lit(DEFAULT_HIERARCHY_WEIGHT))


def concept_edges(concepts: DataFrame) -> DataFrame:
    """concepts(name, parents, children, related, ts, source, confidence, ...)
    -> triples(subj, pred, obj, weight, ts, source, confidence, bidirectional).

    NOTE on the reverse of `has`: it is `belongs_to` (ref :551) — the same
    predicate as doc->topic edges. Collision preserved deliberately
    (SURVEY.md §7.4.4).
    """
    rels = concepts.select(
        "name", "ts", "source", "confidence",
        F.explode(
            F.array(
                F.struct(F.lit("is_a").alias("rel"), F.col("parents").alias("targets")),
                F.struct(F.lit("has").alias("rel"), F.col("children").alias("targets")),
                F.struct(F.lit("related_to").alias("rel"), F.col("related").alias("targets")),
            )
        ).alias("rt"),
    ).select(
        "name", "ts", "source", "confidence",
        F.col("rt.rel").alias("rel"),
        F.explode("rt.targets").alias("target"),
    )

    rev_map = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(v)) for k, v in REVERSE_REL.items()
    ))
    rev_pred = F.coalesce(rev_map[F.col("rel")], F.concat(F.lit("reverse_"), F.col("rel")))

    both = rels.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("name").alias("subj"), F.col("rel").alias("pred"),
                    F.col("target").alias("obj"),
                ),
                F.struct(
                    F.col("target").alias("subj"), rev_pred.alias("pred"),
                    F.col("name").alias("obj"),
                ),
            )
        ).alias("e"),
        # hierarchy weight keys off the FORWARD rel type for both directions
        # (ref :538 and :559 reuse the same hierarchy_weight).
        _weight_expr(F.col("rel")).alias("hw"),
        "ts", "source", "confidence",
    )
    return both.select(
        F.col("e.subj").alias("subj"),
        F.col("e.pred").alias("pred"),
        F.col("e.obj").alias("obj"),
        (F.col("hw") * F.col("confidence")).alias("weight"),
        "ts", "source", "confidence",
        F.lit(True).alias("bidirectional"),
    )


def doc_topic_edges(
    docs: DataFrame, topics: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """Theta join: every (doc, topic) pair with cosine(doc_emb, topic_emb)
    strictly > threshold (ref :501, :572) -> `belongs_to` edge whose weight is
    the similarity (ref :565-581).

    docs:   (filename, embedding, ts, source, confidence)
    topics: (topic_name, embedding)

    Topics are cluster-count-sized (tens) — broadcast, so the crossJoin is a
    BroadcastNestedLoopJoin with no shuffle of the doc side; cosine stays
    JVM-side (higher-order functions, no Python crossing).
    """
    from kgspark.embed import cosine_cols

    t = topics.select(
        F.col("topic_name").alias("__topic"), F.col("embedding").alias("__temb")
    )
    sim = cosine_cols(F.col("embedding"), F.col("__temb"))
    return (
        docs.crossJoin(F.broadcast(t))
        .withColumn("__sim", sim)
        .where(F.col("__sim") > threshold)
        .select(
            F.col("filename").alias("subj"),
            F.lit("belongs_to").alias("pred"),
            F.col("__topic").alias("obj"),
            F.col("__sim").alias("weight"),
            "ts", "source", "confidence",
            F.lit(False).alias("bidirectional"),
        )
    )
