"""Graph read API — the reference's query surface over the triples table.

The reference's rdflib store is never populated, so its `query_graph` always
returns [] (ref /root/reference/knowledge_graph_builder.py:27, 675-686); we
implement the DECLARED semantics against the real triples DataFrame
(SURVEY.md §7.4.2). Secondary APIs: node history (:688-715), relationship
confidence (:717-723), relationship validation (:725-738).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.session import materialize


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


def bgp_match(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct: bool = True,
    allow_product: bool = False,
    optional_patterns: Sequence[tuple[str, str, str]] = (),
) -> DataFrame:
    """Conjunctive triple-pattern (SPARQL basic-graph-pattern) matching.

    Each pattern is an (s, p, o) term triple; a term starting with ``?`` is
    a variable, anything else an exact-match constant. The result has one
    string column per distinct variable, one row per satisfying binding
    (set semantics by default). This upgrades the reference's query surface
    — substring scan only (ref /root/reference/knowledge_graph_builder.py:
    679-686) — to real conjunctive queries over the same triples table.

    Plan shape (the 100 TB posture): every pattern compiles to a constant
    filter + projection over the SAME triples scan — predicate constants
    reach the parquet reader as pushed filters, so a pred-partitioned
    triples table prunes to the touched predicates. Patterns are then
    joined pairwise on their shared variables in greedy most-constants-
    first order (the classic selectivity heuristic); every join is a hash
    join on binding columns, and AQE broadcasts whichever side a selective
    constant has made small. Nothing runs on the driver except plan
    construction over len(patterns) items.

    A pattern set whose join graph is disconnected requires a Cartesian
    product of binding tables; that is a scale error, so it raises unless
    ``allow_product=True`` (constants-only existence patterns are exempt —
    they join as broadcast 1-row guards).

    optional_patterns: SPARQL OPTIONAL semantics — each pattern LEFT-joins
    onto the required bindings via its shared variables (>= 1 required,
    else it raises: an unconstrained optional is a product). Variables
    bound only by optional patterns come back as '' for rows without a
    match (unbound-as-empty keeps the result a flat string table).
    Multiple optional matches multiply rows, exactly as SPARQL does.
    """
    if not patterns:
        raise ValueError("bgp_match: need at least one pattern")

    def is_var(t: str) -> bool:
        return isinstance(t, str) and t.startswith("?")

    cols = (subj, pred, obj)
    compiled: list[tuple[DataFrame, frozenset[str], int]] = []
    for pat_i, (s_t, p_t, o_t) in enumerate(patterns):
        terms = (s_t, p_t, o_t)
        df = triples
        n_const = 0
        for col, term in zip(cols, terms):
            if not is_var(term):
                df = df.where(F.col(col) == F.lit(term))
                n_const += 1
        # repeated variable inside one pattern => equality constraint
        seen: dict[str, str] = {}
        for col, term in zip(cols, terms):
            if is_var(term):
                if term in seen:
                    df = df.where(F.col(seen[term]) == F.col(col))
                else:
                    seen[term] = col
        proj = [F.col(c).alias(v[1:]) for v, c in seen.items()]
        if proj:
            df = df.select(*proj)
        else:  # constants-only existence guard: 1-row broadcast semi
            df = df.select(F.lit(1).alias(f"__exists_{pat_i}")).limit(1)
        compiled.append((df, frozenset(v[1:] for v in seen), n_const))

    # greedy join order: seed with the most-constant pattern that binds a
    # variable (existence guards attach as 1-row broadcasts), then always
    # attach a pattern sharing >= 1 already-bound variable
    compiled.sort(key=lambda t: (-bool(t[1]), -t[2]))
    acc, bound, _ = compiled[0]
    rest = compiled[1:]
    while rest:
        idx = next(
            (i for i, (_, vs, _) in enumerate(rest) if (vs & bound) or not vs),
            None,
        )
        if idx is None:
            if not allow_product:
                raise ValueError(
                    "bgp_match: pattern join graph is disconnected (would "
                    "need a Cartesian product); pass allow_product=True to "
                    "force it"
                )
            idx = 0
        nxt, vs, _ = rest.pop(idx)
        if not vs:  # existence guard
            acc = acc.crossJoin(F.broadcast(nxt))
        elif vs & bound:
            acc = acc.join(nxt, on=sorted(vs & bound), how="inner")
            bound |= vs
        else:
            acc = acc.crossJoin(nxt)
            bound |= vs
    if not bound:  # all patterns were existence guards: 0/1-row verdict
        return acc.select(F.lit(True).alias("exists")).limit(1)

    optional_only: set[str] = set()
    for s_t, p_t, o_t in optional_patterns:
        terms = (s_t, p_t, o_t)
        df = triples
        for col, term in zip(cols, terms):
            if not is_var(term):
                df = df.where(F.col(col) == F.lit(term))
        seen: dict[str, str] = {}
        for col, term in zip(cols, terms):
            if is_var(term):
                if term in seen:
                    df = df.where(F.col(seen[term]) == F.col(col))
                else:
                    seen[term] = col
        vs = frozenset(v[1:] for v in seen)
        shared = vs & bound
        if not shared:
            raise ValueError(
                "bgp_match: optional pattern shares no variable with the "
                "required patterns (would be a Cartesian product)"
            )
        df = df.select(*[F.col(c).alias(v[1:]) for v, c in seen.items()])
        acc = acc.join(df, on=sorted(shared), how="left")
        optional_only |= vs - bound
        bound |= vs

    out = acc.select(
        *[
            F.coalesce(F.col(v), F.lit("")).alias(v)
            if v in optional_only else F.col(v)
            for v in sorted(bound)
        ]
    )
    return out.distinct() if distinct else out


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


def relation_profile(triples: DataFrame) -> DataFrame:
    """Per-predicate cardinality profile: (pred, n_edges, n_subj, n_obj,
    max_out, max_in, functional, inverse_functional) — the KG schema
    quality census (OWL-style functionality detection from data). A
    predicate with max_out == 1 behaves as a function subj -> obj
    (safe to key a dimension table on); max_in == 1 marks an
    inverse-functional (identifier-like) predicate. Exact integers only.

    Shape: two two-level aggregations ((pred, subj) then pred; same for
    obj) plus one flat count — all partial-aggregated groupBys on keys
    the data is already skew-diluted on (pred alone is low-cardinality,
    but the first level groups on (pred, node), which spreads hot
    predicates across the cluster before the tiny per-pred rollup)."""
    out_deg = (
        triples.groupBy("pred", "subj")
        .agg(F.count(F.lit(1)).alias("__o"))
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subj"),
            F.max("__o").cast("long").alias("max_out"),
            F.sum("__o").cast("long").alias("n_edges"),
        )
    )
    in_deg = (
        triples.groupBy("pred", "obj")
        .agg(F.count(F.lit(1)).alias("__i"))
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obj"),
            F.max("__i").cast("long").alias("max_in"),
        )
    )
    return out_deg.join(in_deg, "pred").select(
        "pred", "n_edges", "n_subj", "n_obj", "max_out", "max_in",
        (F.col("max_out") == 1).alias("functional"),
        (F.col("max_in") == 1).alias("inverse_functional"),
    )


def entity_card(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    max_facts: int = 12,
) -> DataFrame:
    """Per-entity summary card — (subj, n_facts, card) where card is the
    first `max_facts` outgoing assertions rendered `pred=obj`, sorted
    lexicographically and pipe-joined: the concise-bounded-description
    export a serving layer or an LLM-context builder reads per entity.
    n_facts counts ALL facts, so a truncated card is detectable
    (n_facts > max_facts).

    The cap is applied BEFORE collect_list, so a hub entity with millions
    of assertions never materializes an unbounded array: one window +
    groupBy on the same key — a single shuffle, and the per-group state
    is max_facts strings.
    """
    fact = F.concat(F.col(pred_col), F.lit("="), F.col(obj_col))
    ranked = triples.select(
        F.col(subj_col).alias("subj"), fact.alias("__fact")
    ).select(
        "subj", "__fact",
        F.row_number().over(
            Window.partitionBy("subj").orderBy("__fact")
        ).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("subj")).alias("__tot"),
    )
    return (
        ranked.where(F.col("__rn") <= max_facts)
        .groupBy("subj")
        .agg(
            F.max("__tot").cast("long").alias("n_facts"),
            F.array_join(F.sort_array(F.collect_list("__fact")), "|")
            .alias("card"),
        )
    )


def paths_between(
    triples: DataFrame,
    starts: DataFrame,
    ends: DataFrame,
    max_hops: int = 3,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Enumerate SIMPLE directed paths from any start node to any end node
    within max_hops edges: (start, end_node, hops, path) where path is the
    human-readable chain "a -pred-> b -pred-> c" — the "how does X relate
    to Y" explanation query the reference's UI answers by eyeballing the
    rendered graph (ref templates/index.html force layout; no API exists).

    starts/ends: one-column DataFrames of node names (first column used).

    Semantics: simple paths only (a per-path visited set blocks revisits),
    every qualifying path is emitted (not just shortest — kg_sssp covers
    that), deterministic output. Path ENUMERATION is exponential in the
    worst case by nature; the hop bound is the contract (bounded_closure
    posture) and the intended inputs are pred-filtered or taxonomy-like
    subgraphs. Use bounded_closure for reachability-only questions.

    Scale shape: semi-naive frontier expansion — each round joins the
    CURRENT frontier (paths of length r) against the edge table on one
    key, shuffle partitioned by node; the visited check is a JVM-side
    array_contains on a bounded (<= max_hops) array. Ends are joined once
    per round so finished paths leave the frontier's lineage via
    materialize().
    """
    if max_hops < 1:
        raise ValueError(f"paths_between needs max_hops >= 1, got {max_hops}")
    e = materialize(
        triples.select(
            F.col(subj_col).alias("s"), F.col(pred_col).alias("p"),
            F.col(obj_col).alias("o"),
        ).distinct()
    )
    st = starts.select(F.col(starts.columns[0]).alias("start")).distinct()
    en = materialize(
        ends.select(F.col(ends.columns[0]).alias("end_node")).distinct()
    )
    frontier = st.select(
        "start",
        F.col("start").alias("node"),
        F.col("start").alias("path"),
        F.array(F.col("start")).alias("visited"),
    )
    out = None
    for hop in range(1, max_hops + 1):
        frontier = materialize(
            frontier.join(e, frontier["node"] == e["s"])
            .where(~F.array_contains(F.col("visited"), F.col("o")))
            .select(
                "start",
                F.col("o").alias("node"),
                F.concat(
                    F.col("path"), F.lit(" -"), F.col("p"), F.lit("-> "),
                    F.col("o"),
                ).alias("path"),
                F.array_append(F.col("visited"), F.col("o")).alias("visited"),
            )
        )
        hit = frontier.join(
            en, frontier["node"] == en["end_node"]
        ).select(
            "start", "end_node", F.lit(hop).cast("long").alias("hops"), "path"
        )
        out = hit if out is None else out.unionByName(hit)
        if frontier.limit(1).count() == 0:
            break
    return out
