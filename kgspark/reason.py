"""Ontology-rule materialization: RDFS (rho-df) + OWL-Horst property rules.

The reference stores a flat concept graph with a fixed edge vocabulary
(knowledge_graph_builder.py:  is_a / has_instance / has / belongs_to /
related_to) and answers queries against asserted edges only.  This module
adds the standard forward-chaining inference layer a KG-construction
pipeline runs before serving: materialize the entailed triples so query
time stays a plain scan.

Design (Spark-first, WebPIE-style — Urbani et al., "Scalable Distributed
Reasoning using MapReduce", ISWC 2009):

  1. The SCHEMA (subClassOf / subPropertyOf / domain / range /
     inverseOf / symmetric / transitive declarations) is ontology-sized —
     thousands of rows, not billions.  Close it transitively FIRST with a
     bounded semi-naive loop over the tiny schema table.
  2. With a closed schema, the instance-level rho-df rules reach their
     fixpoint in ONE structured pass (rdfs7 -> rdfs2/rdfs3 -> rdfs9); no
     iteration ever touches the instance stream more than a constant
     number of times, and every schema join is a broadcast.  This is the
     property that makes RDFS materialization feasible at 10^12 triples:
     the big table is only ever map-joined against a broadcast schema.

Rule names follow the RDFS entailment lemmas (W3C RDF Semantics):
  rdfs7  (s,p,o), (p subPropertyOf q)  ->  (s,q,o)
  rdfs2  (s,p,o), (p domain c)         ->  (s, type, c)
  rdfs3  (s,p,o), (p range  c)         ->  (o, type, c)
  rdfs9  (s, type, c), (c subClassOf d) -> (s, type, d)
and the OWL-Horst (pD*, ter Horst 2005) property rules:
  inv    (s,p,o), (p inverseOf q)      ->  (o,q,s)   [both directions]
  sym    (s,p,o), (p symmetric)        ->  (o,p,s)
  trans  (s,p,o),(o,p,o'), p transitive -> (s,p,o')  [bounded closure]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize

# deterministic dedup priority: an entailed triple that is also asserted
# reports 'asserted'; among rules, the lemma that fires "earliest" wins.
_RULE_PRIORITY = ["asserted", "rdfs7", "rdfs2", "rdfs3", "rdfs9",
                  "inv", "sym", "trans"]


def _rule_rank(name: str) -> int:
    return _RULE_PRIORITY.index(name)


def _rank_to_rule():
    expr = F.lit(_RULE_PRIORITY[-1])
    for i in range(len(_RULE_PRIORITY) - 2, -1, -1):
        expr = F.when(F.col("__rank") == i, F.lit(_RULE_PRIORITY[i])).otherwise(expr)
    return expr


def schema_closure(schema: DataFrame, pred: str, max_depth: int = 10) -> DataFrame:
    """Transitive closure of one schema predicate -> (s, o) pairs, s != o.

    The schema table is ontology-sized; the loop is bounded semi-naive
    (each round extends only the newest frontier).  Raises if the chain
    depth exceeds max_depth rather than silently under-closing.
    """
    e = materialize(
        schema.where(F.col("p") == pred)
        .select("s", "o")
        .where(F.col("s") != F.col("o"))
        .distinct()
    )
    closure = e
    frontier = e
    for _ in range(max_depth):
        nxt = (
            frontier.join(e.select(F.col("s").alias("o"), F.col("o").alias("o2")), "o")
            .select("s", F.col("o2").alias("o"))
            .where(F.col("s") != F.col("o"))
            .distinct()
            .join(closure, ["s", "o"], "left_anti")
        )
        nxt = materialize(nxt)
        if nxt.limit(1).count() == 0:
            return closure
        closure = materialize(closure.union(nxt))
        frontier = nxt
    if frontier.limit(1).count() != 0:
        raise RuntimeError(
            f"schema_closure({pred}) not closed after {max_depth} rounds — "
            "ontology chain deeper than max_depth; raise it"
        )
    return closure


def rdfs_materialize(
    triples: DataFrame,
    schema: DataFrame,
    type_pred: str = "is_a",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    max_schema_depth: int = 10,
) -> DataFrame:
    """Forward-chain the rho-df RDFS fragment to fixpoint.

    triples: instance stream (subj, pred, obj) — arbitrarily large.
    schema:  (s, p, o) rows with p in {'subClassOf','subPropertyOf',
             'domain','range'} — ontology-sized, broadcast everywhere.
    Returns distinct (subj, pred, obj, rule); rule = 'asserted' for input
    triples, else the highest-priority RDFS lemma that derives the triple.

    Completeness: with subPropertyOf and subClassOf transitively closed
    up front, applying rdfs7 then rdfs2/rdfs3 (over asserted + rdfs7
    output) then rdfs9 (over all type triples so far) reaches the rho-df
    fixpoint in this single pass (Urbani 2009, Thm. 1 ordering) — the
    instance table is never iterated.

    Scale shape: 3 broadcast hash joins + 1 union + 1 final groupBy on
    (subj,pred,obj).  No instance-side self-join, no loop over the big
    table; AQE handles any skew on hot predicates in the final collapse.
    """
    base = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    base = materialize(base)

    sp = schema_closure(schema, "subPropertyOf", max_schema_depth)
    sc = schema_closure(schema, "subClassOf", max_schema_depth)
    dom = schema.where(F.col("p") == "domain").select("s", "o").distinct()
    rng = schema.where(F.col("p") == "range").select("s", "o").distinct()

    def tag(df, rule):
        return df.select(
            "subj", "pred", "obj", F.lit(_rule_rank(rule)).alias("__rank")
        )

    # rdfs7: propagate along the CLOSED subPropertyOf — one broadcast join
    r7 = base.join(
        F.broadcast(sp.select(F.col("s").alias("pred"), F.col("o").alias("__q"))),
        "pred",
    ).select("subj", F.col("__q").alias("pred"), "obj")
    # instance triples visible to the typing rules: asserted + rdfs7
    t1 = tag(base, "asserted").unionByName(tag(r7, "rdfs7"))
    t1 = materialize(t1)

    # rdfs2 / rdfs3: domain/range typing over t1
    r2 = t1.join(
        F.broadcast(dom.select(F.col("s").alias("pred"), F.col("o").alias("__c"))),
        "pred",
    ).select("subj", F.lit(type_pred).alias("pred"), F.col("__c").alias("obj"))
    r3 = t1.join(
        F.broadcast(rng.select(F.col("s").alias("pred"), F.col("o").alias("__c"))),
        "pred",
    ).select(
        F.col("obj").alias("subj"),
        F.lit(type_pred).alias("pred"),
        F.col("__c").alias("obj"),
    )
    t2 = t1.unionByName(tag(r2, "rdfs2")).unionByName(tag(r3, "rdfs3"))
    t2 = materialize(t2)

    # rdfs9: supertype every type triple along the CLOSED subClassOf
    types = t2.where(F.col("pred") == type_pred)
    r9 = types.join(
        F.broadcast(sc.select(F.col("s").alias("obj"), F.col("o").alias("__d"))),
        "obj",
    ).select("subj", F.lit(type_pred).alias("pred"), F.col("__d").alias("obj"))

    out = t2.unionByName(tag(r9, "rdfs9"))
    return (
        out.groupBy("subj", "pred", "obj")
        .agg(F.min("__rank").alias("__rank"))
        .select("subj", "pred", "obj", _rank_to_rule().alias("rule"))
    )


def owl_property_rules(
    triples: DataFrame,
    schema: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    trans_depth: int = 4,
) -> DataFrame:
    """OWL-Horst property-axiom materialization (pD* property subset).

    schema rows: ('p','inverseOf','q') — applied BOTH directions;
    ('p','symmetric','true'); ('p','transitive','true').
    Transitive predicates are closed with a BOUNDED semi-naive expansion
    (trans_depth hops) per predicate subgraph — the k-core/LPA posture:
    a pinned bound keeps the operator deterministic and its oracle
    unrollable; real taxonomies are shallow.

    Returns distinct (subj, pred, obj, rule) with rule in
    {'asserted','inv','sym','trans'}.
    """
    base = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    base = materialize(base)

    inv = schema.where(F.col("p") == "inverseOf").select("s", "o")
    inv_both = inv.union(inv.select(F.col("o").alias("s"), F.col("s").alias("o"))).distinct()
    sym = schema.where(F.col("p") == "symmetric").select("s").distinct()
    trans = schema.where(F.col("p") == "transitive").select("s").distinct()

    def tag(df, rule):
        return df.select(
            "subj", "pred", "obj", F.lit(_rule_rank(rule)).alias("__rank")
        )

    r_inv = base.join(
        F.broadcast(inv_both.select(F.col("s").alias("pred"), F.col("o").alias("__q"))),
        "pred",
    ).select(
        F.col("obj").alias("subj"), F.col("__q").alias("pred"),
        F.col("subj").alias("obj"),
    )
    r_sym = base.join(
        F.broadcast(sym.select(F.col("s").alias("pred"))), "pred"
    ).select(
        F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj")
    )

    # bounded transitive closure per transitive predicate: frontier-join
    # rounds over the pred-filtered subgraph only (never the full stream)
    tbase = materialize(
        base.join(F.broadcast(trans.select(F.col("s").alias("pred"))), "pred")
        .where(F.col("subj") != F.col("obj"))
    )
    frontier = tbase
    closed = tbase
    for _ in range(trans_depth - 1):
        nxt = (
            frontier.alias("f")
            .join(
                tbase.alias("e"),
                (F.col("f.pred") == F.col("e.pred"))
                & (F.col("f.obj") == F.col("e.subj")),
            )
            .select(
                F.col("f.subj").alias("subj"), F.col("f.pred").alias("pred"),
                F.col("e.obj").alias("obj"),
            )
            .where(F.col("subj") != F.col("obj"))
            .distinct()
            .join(closed, ["subj", "pred", "obj"], "left_anti")
        )
        nxt = materialize(nxt)
        if nxt.limit(1).count() == 0:
            break
        closed = materialize(closed.unionByName(nxt))
        frontier = nxt
    r_trans = closed.join(tbase, ["subj", "pred", "obj"], "left_anti")

    out = (
        tag(base, "asserted")
        .unionByName(tag(r_inv, "inv"))
        .unionByName(tag(r_sym, "sym"))
        .unionByName(tag(r_trans, "trans"))
    )
    return (
        out.groupBy("subj", "pred", "obj")
        .agg(F.min("__rank").alias("__rank"))
        .select("subj", "pred", "obj", _rank_to_rule().alias("rule"))
    )
